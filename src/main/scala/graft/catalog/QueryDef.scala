package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query over the testdata corpus plus (when
  * SQL-expressible) the exact DuckDB oracle the driver hash-compares
  * against.
  *
  * Oracle-parity rules (why results hash-match with no tolerance):
  *   - Money columns in the corpus are exact 2-decimal doubles. All
  *     sums/products over them are done in DECIMAL (exact, associative,
  *     order-independent) and cast to DOUBLE only at the end — a decimal
  *     with <= 15 significant digits converts to the identical double in
  *     every IEEE-754 engine.
  *   - Derived double math (ratios, z-scores, cosines) is written with the
  *     IDENTICAL operation tree on both sides: bit-identical inputs +
  *     IEEE ops (+,-,*,/,sqrt are correctly rounded) = bit-identical
  *     outputs. No round() fuzzing needed.
  *   - Every computed column is aliased to the same name on both sides
  *     (the driver sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to TimestampType under schema inference. Supplying the read schema
    * explicitly (ts as BIGINT raw nanos) sidesteps inference entirely — no
    * session conf is touched, so caller-supplied sessions keep their own
    * behavior for every other nanos-typed parquet column. The nanos are
    * then truncated to microseconds — the same ns→µs truncation DuckDB
    * applies in `CAST(ts AS TIMESTAMP)`, keeping both engines on identical
    * values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
