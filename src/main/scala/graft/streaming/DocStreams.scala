package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the `documents` domain: a training-data
  * pipeline ingests text continuously, so the scrub stages (quality
  * filter, token stats, exact dedup, per-source accounting) must run
  * incrementally with the SAME semantics as the batch catalog queries.
  * Every transform here takes a streaming OR batch DataFrame — the batch
  * twin is what the DuckDB oracle checks (d1/d2/d3), and DocStreamSpec
  * proves streaming == batch on the same corpus.
  */
object DocStreams {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** streaming twin of the documents table: parquet dir → typed stream */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "documents*.parquet")
      .parquet(dir)

  private def toks(c: org.apache.spark.sql.Column) = split(trim(c), " +")

  /** d3's keep/drop verdict as a stateless streaming filter — the SAME
    * `TextDocs.qualityKeep` predicate the oracle-checked batch query uses,
    * so the two surfaces cannot drift */
  def qualityFilter(docs: DataFrame): DataFrame =
    docs.filter(graft.catalog.TextDocs.qualityKeep(col("text")))

  /** d2's per-document token stats, stateless (append-mode safe) */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(toks(col("text"))).cast("long").as("n_tokens"),
      col("n_chars"))

  /** exact-dedup on the content hash. In an unbounded deployment this
    * needs `withWatermark` + `dropDuplicatesWithinWatermark` on an
    * event-time column (the corpus has none); plain dropDuplicates keeps
    * all-time state — correct semantics, bounded only by distinct
    * contents, which is the same bound the batch hash-groupBy (d1) has. */
  def dedupeExact(docs: DataFrame): DataFrame =
    docs.withColumn("fp", md5(col("text"))).dropDuplicates("fp")

  /** running per-source document counts (complete-mode aggregation —
    * `source` is a low-cardinality dimension, so state is tiny) */
  def sourceCounts(docs: DataFrame): DataFrame =
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
}
