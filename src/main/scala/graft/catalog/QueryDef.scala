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

  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) (earlier
    * corpora) and TIMESTAMP(MICROS) (current corpora), so the reader
    * detects the unit from the file footer instead of assuming one:
    *   - NANOS: Spark 4 refuses to map it to TimestampType under schema
    *     inference, so inference either throws or (with
    *     `spark.sql.legacy.parquet.nanosAsLong`) yields LongType. Either
    *     way we read ts explicitly as BIGINT raw nanos and truncate to
    *     microseconds — the same ns→µs truncation DuckDB applies in
    *     `CAST(ts AS TIMESTAMP)`.
    *   - MICROS: inference yields TimestampType/TimestampNTZType; read
    *     normally and normalize NTZ→TIMESTAMP (identity under the UTC
    *     session timezone every entry point sets), which is already
    *     exactly what DuckDB reads.
    * Both engines therefore see identical microsecond values on either
    * corpus vintage, and no session conf is touched.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    val path = s"$dir/events.parquet"
    val inferredTs = scala.util.Try(
      spark.read.parquet(path).schema("ts").dataType).toOption
    if (inferredTs.contains(TimestampType) ||
        inferredTs.contains(TimestampNTZType))
      spark.read.parquet(path).withColumn("ts", col("ts").cast(TimestampType))
    else
      spark.read
        .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
        .parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
