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
    * each incoming vector is scored against the FULL broadcast eval set
    * with exact cosine (no index: the eval side is small enough that
    * brute-force beats any ANN structure, and exactness means zero
    * missed contamination by construction — stronger than e16's
    * multi-probe recall), then one per-vector aggregate decides the
    * verdict and keeps the audit columns (neighbor count, witness eval
    * id, max cosine). Stream-static broadcast join + update-mode
    * aggregate; no state store — restarts resume from source offsets.
    * The eval split itself passes through unjudged (it is not training
    * data; e16 excludes it from the audit the same way). */
  def decontaminateIngest(incoming: DataFrame, evalVecs: DataFrame,
      tau: Double = 0.4): DataFrame =
    incoming
      .filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("dv"))
      // LEFT join on a constant key, not crossJoin: an EMPTY eval set
      // must pass every vector through as "ingest", never swallow the
      // stream (an inner cross join against zero rows emits nothing)
      .withColumn("_k", lit(1))
      .join(broadcast(evalVecs.withColumn("_k", lit(1))), Seq("_k"), "left")
      .withColumn("cos",
        when(col("eval_id").isNotNull,
          graft.catalog.Vectors.cosine(col("dv"), col("edv"))))
      .groupBy(col("vec_id"))
      .agg(
        sum(when(col("cos") >= tau, 1L).otherwise(0L)).as("n_near_eval"),
        min(when(col("cos") >= tau, col("eval_id"))).as("witness_raw"),
        max(col("cos")).as("max_cos_raw"))
      .select(col("vec_id"), col("n_near_eval"),
        coalesce(col("witness_raw"), lit(-1L)).as("witness_eval"),
        coalesce(col("max_cos_raw"), lit(-1.0)).as("max_cos"),
        when(col("n_near_eval") > 0, lit("quarantine"))
          .otherwise(lit("ingest")).as("verdict"))
}
