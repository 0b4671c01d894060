package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-loss fault injection for the STREAMING ingest gates — the
  * piece round 11's batch-only FaultInject left open: the exactly-once
  * claims (DocStreamSpec's kill/restart parity pins) cover restart of
  * the whole query, not loss of an executor JVM mid-batch.
  *
  * Protocol: under `local-cluster[2,16,4096]`, stage the corpus as N
  * parquet files and stream it with `maxFilesPerTrigger=1` so the run
  * spans N micro-batches; compute the batch twin's rows FIRST (the
  * baseline), start the streaming query into a memory sink, wait for
  * the first micro-batch to commit, `kill -9` one executor JVM, then
  * `processAllAvailable()` and compare the sink to the twin. Outcomes:
  *
  *   - `recovered` — the stream drained and rows == batch twin: the
  *     ingest gates are stateless stream-static plans (no state store,
  *     no truncated lineage — grep: zero stableCheckpoint sites in
  *     streaming/), so Spark re-runs the dead executor's tasks from
  *     lineage and the standalone Worker relaunches the executor. This
  *     is the expected outcome in BOTH checkpoint modes — the
  *     SPARK_GRAFT_RELIABLE_CKPT switch changes nothing here because
  *     the streaming tier never truncates lineage.
  *   - `parity_mismatch` — the stream drained but rows differ from the
  *     twin: an exactly-once violation, the failure this gate exists
  *     to catch.
  *   - `job_lost` — the query died: recorded loudly with the error.
  *   - `harness_error` — no executor found to kill.
  *
  * Targets: `near_dedup` (DocStreams.incrementalNearDedup over the
  * documents corpus, history = even docs' band index) and `decontam`
  * (VecStreams.decontaminateIngest over the embeddings corpus) — the
  * two gates the round-11 verdict named.
  */
object FaultInjectStream {

  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val spark = SparkEnv.builder("local-cluster[2,16,4096]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val driverPid = ProcessHandle.current().pid()

    // stage the source as N files so the stream spans N micro-batches
    // (a single-file source commits everything in batch 0 and the kill
    // can only land after the fact)
    val staging = java.nio.file.Files
      .createTempDirectory(s"fis_${name}_src").toString
    val ck = java.nio.file.Files
      .createTempDirectory(s"fis_${name}_ck").toString
    val nFiles = 6

    // (batch twin rows, streaming frame) per target — the twin is
    // materialized BEFORE the kill so baseline work never races it
    val (baseline, stream) = name match {
      case "near_dedup" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        docs.repartition(nFiles).write.mode("overwrite").parquet(staging)
        val history = graft.streaming.DocStreams
          .historySimhashBands(spark, sfDir)
          .filter(col("hist_id") % 2 === 0)
        val twin = graft.streaming.DocStreams
          .incrementalNearDedup(docs, history)
          .collect().map(_.toString).sorted.toSeq
        val src = spark.readStream
          .schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(staging)
        (twin, graft.streaming.DocStreams.incrementalNearDedup(src, history))
      case "decontam" =>
        val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
        vecs.repartition(nFiles).write.mode("overwrite").parquet(staging)
        val eval = graft.streaming.VecStreams.evalVectors(spark, sfDir)
        val twin = graft.streaming.VecStreams
          .decontaminateIngest(vecs, eval)
          .collect().map(_.toString).sorted.toSeq
        val src = spark.readStream
          .schema(vecs.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(staging)
        (twin, graft.streaming.VecStreams.decontaminateIngest(src, eval))
      case other => sys.error(s"unknown streaming fault target: $other")
    }

    @volatile var killedPid = -1L
    def killOne(): Unit =
      FaultInject.executorPids(driverPid).headOption.foreach { pid =>
        killedPid = pid
        Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor()
      }

    val q = stream.writeStream
      .format("memory").queryName("fis").outputMode("append")
      .option("checkpointLocation", ck)
      .start()
    val outcome =
      try {
        // wait for the first micro-batch to COMMIT (progress with rows),
        // then shoot an executor while later batches are in flight
        val deadline = System.nanoTime() + 120L * 1000000000L
        while (q.recentProgress.map(_.numInputRows).sum == 0 &&
            System.nanoTime() < deadline && q.isActive)
          Thread.sleep(50)
        val batchesBeforeKill = q.recentProgress.length
        killOne()
        if (killedPid < 0)
          s""""outcome":"harness_error","error":"no executor JVM found to kill""""
        else {
          q.processAllAvailable()
          val stateOps = Option(q.lastProgress)
            .map(_.stateOperators.length).getOrElse(-1)
          val rows = spark.table("fis")
            .collect().map(_.toString).sorted.toSeq
          if (rows == baseline)
            s""""outcome":"recovered","rows":${rows.size},""" +
              s""""batches_before_kill":$batchesBeforeKill,""" +
              s""""state_operators":$stateOps"""
          else
            s""""outcome":"parity_mismatch","rows":${rows.size},""" +
              s""""baseline_rows":${baseline.size}"""
        }
      } catch {
        case e: Throwable =>
          val head = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(3).mkString(" / ").take(300)
            .replace("\\", "\\\\").replace("\"", "\\\"")
          s""""outcome":"job_lost","error":"$head""""
      } finally {
        if (q.isActive) q.stop()
      }
    println(s"""{"fault_inject_stream":"$name",""" +
      s""""reliable":${Ckpt.reliableDir.isDefined},""" +
      s""""killed_pid":$killedPid,$outcome}""")
    spark.stop()
  }
}
