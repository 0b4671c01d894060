package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the `embeddings` domain — the vector
  * ingestion tier. An embedding pipeline emits vectors continuously (as
  * documents clear the text gates), and the check that must run BEFORE a
  * vector reaches the training store is e16's semantic decontamination:
  * a vector within cosine tau of any eval vector would leak paraphrased
  * eval data into training. Same discipline as DocStreams: every
  * transform takes a streaming OR batch frame, the batch twin is what
  * the DuckDB oracle checks (e16), and the spec proves streaming ==
  * batch on the same corpus.
  */
object VecStreams {

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** streaming twin of the embeddings table: parquet dir → typed stream */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(vecSchema)
      .option("pathGlobFilter", "embeddings*.parquet")
      .parquet(dir)

  /** the eval-vector reference set (vec_id % 50 == 0, the e16/d18
    * convention) — tiny by construction: eval suites are thousands of
    * rows against a 100 TB corpus, so this side always broadcasts. */
  def evalVectors(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("eval_id"),
        transform(col("embedding"), x => x.cast("double")).as("edv"))

  /** e16 at INGEST time — the causal form of semantic decontamination:
    * each incoming vector is scored against the FULL eval set with
    * exact cosine (no index: the eval side is small enough that
    * brute-force beats any ANN structure, and exactness means zero
    * missed contamination by construction — stronger than e16's
    * multi-probe recall), and the verdict plus audit columns (neighbor
    * count, witness eval id, max cosine) fall out of a row-local fold.
    *
    * TRULY stateless: the eval set is collapsed batch-side into ONE row
    * holding all (eval_id, vector) pairs as an array, the stream-static
    * join against it is therefore 1:1 (broadcast, one copy per
    * executor), and the per-vector scoring is a higher-order-function
    * fold over that array — NO streaming aggregation, no state store,
    * append-mode output; restarts resume from source offsets alone. A
    * global collect_list always yields exactly one row, so an EMPTY
    * eval set still matches the left join and every vector passes
    * through as "ingest" (never swallows the stream). The eval split
    * itself passes through unjudged (it is not training data; e16
    * excludes it from the audit the same way). */
  /** hard ceiling on the eval side: beyond this the single collect_list
    * row would hit the row-size / broadcast limits with an opaque
    * executor OOM — fail fast at plan time instead. ~100k 64-dim double
    * vectors ≈ 60 MB, comfortably inside the 1 GB row and 8 GB
    * broadcast ceilings; a genuinely larger eval set should go through
    * the batch e16 IVF path, not this brute-force gate. */
  val MaxEvalVectors = 100000L

  def decontaminateIngest(incoming: DataFrame, evalVecs: DataFrame,
      tau: Double = 0.4): DataFrame = {
    // the smallness assumption is load-bearing, so enforce it: one
    // cheap batch-side count before the stream starts
    val evalN = evalVecs.count()
    require(evalN <= MaxEvalVectors,
      s"decontaminateIngest: eval set has $evalN vectors, above the " +
        s"$MaxEvalVectors ceiling for the single-row broadcast design " +
        "— route a corpus-scale reference set through the batch e16 " +
        "IVF decontamination instead")
    val evalRow = evalVecs
      .agg(collect_list(struct(col("eval_id"), col("edv"))).as("evs"))
      .withColumn("_k", lit(1))
    incoming
      .filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("dv"))
      .withColumn("_k", lit(1))
      .join(broadcast(evalRow), Seq("_k"), "left")
      .withColumn("scored", transform(col("evs"), e =>
        struct(graft.catalog.Vectors.cosine(col("dv"), e.getField("edv"))
          .as("cos"), e.getField("eval_id").as("eval_id"))))
      .withColumn("hits",
        filter(col("scored"), s => s.getField("cos") >= tau))
      .select(col("vec_id"),
        size(col("hits")).cast("long").as("n_near_eval"),
        coalesce(array_min(transform(col("hits"),
          s => s.getField("eval_id"))), lit(-1L)).as("witness_eval"),
        coalesce(array_max(transform(col("scored"),
          s => s.getField("cos"))), lit(-1.0)).as("max_cos"),
        when(size(col("hits")) > 0, lit("quarantine"))
          .otherwise(lit("ingest")).as("verdict"))
  }
}
