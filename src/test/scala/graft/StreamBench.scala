package graft

import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.streaming.{DocStreams, VecStreams}

/** Sustained-load throughput/latency measurement for the two streaming
  * ingest gates (the STREAMBENCH evidence SCALE.md cites): split the
  * sf corpus into ~100 files, drive them through the gate one file per
  * micro-batch (maxFilesPerTrigger=1), and record per-batch latency and
  * rows/s from the engine's own progress events. The historical index is
  * read from a parquet table (the durable-table discipline the gates
  * document), not recomputed per batch from raw text.
  *
  * Usage: Test/runMain graft.StreamBench [sfDir] [nBatches]
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nBatches = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Files.createTempDirectory("graft_streambench").toString

    // ---- corpus staged as nBatches files (one file = one micro-batch)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.repartition(nBatches).write.mode("overwrite")
      .parquet(s"$base/docs_in")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    embs.repartition(nBatches).write.mode("overwrite")
      .parquet(s"$base/vecs_in")

    // ---- durable historical band index (built once, read as a table)
    DocStreams.historySimhashBands(spark, sfDir)
      .write.mode("overwrite").parquet(s"$base/band_index")
    val history = spark.read.parquet(s"$base/band_index")
    val evalVecs = VecStreams.evalVectors(spark, sfDir)
      .localCheckpoint() // the tiny broadcast side, materialized once

    def drive(name: String, out: org.apache.spark.sql.DataFrame): Unit = {
      val batches = ArrayBuffer[(Long, Long)]() // (rows, durationMs)
      val listener = new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0)
            batches.synchronized {
              batches += ((e.progress.numInputRows, e.progress.batchDuration))
            }
      }
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      val q = out.writeStream.format("noop")
        .option("checkpointLocation", s"$base/cp_$name").start()
      try q.processAllAvailable() finally q.stop()
      val wallS = (System.nanoTime() - t0) / 1e9
      spark.streams.removeListener(listener)
      val snap = batches.synchronized(batches.toVector)
      val rows = snap.map(_._1).sum
      val durs = snap.map(_._2).sorted
      def pct(p: Double) =
        if (durs.isEmpty) 0L else durs(((durs.size - 1) * p).toInt)
      println(f"[streambench] $name%-12s batches=${snap.size}%3d " +
        f"rows=$rows%6d wall_s=$wallS%7.2f rows_per_s=${rows / wallS}%8.1f " +
        f"batch_ms p50=${pct(0.5)}%4d mean=${
          if (durs.isEmpty) 0L else durs.sum / durs.size}%4d " +
        f"p95=${pct(0.95)}%4d max=${durs.lastOption.getOrElse(0L)}%5d")
    }

    def docStream = spark.readStream.schema(DocStreams.docSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/docs_in")
    def vecStream = spark.readStream.schema(VecStreams.vecSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/vecs_in")

    // warm pass (JVM/codegen), then the measured pass
    drive("near_dedup_w", DocStreams.incrementalNearDedup(docStream, history))
    drive("near_dedup", DocStreams.incrementalNearDedup(docStream, history))
    drive("decontam_w", VecStreams.decontaminateIngest(vecStream, evalVecs))
    drive("decontam", VecStreams.decontaminateIngest(vecStream, evalVecs))
    spark.stop()
  }
}
