package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-loss fault injection for the STREAMING tier — the piece
  * round 11's batch-only FaultInject left open: the exactly-once claims
  * (DocStreamSpec's kill/restart parity pins) cover restart of the
  * whole query, not loss of an executor JVM mid-batch.
  *
  * Protocol: under `local-cluster[2,16,4096]`, stage the corpus as N
  * parquet files and stream it with `maxFilesPerTrigger=1` so the run
  * spans N micro-batches; compute the baseline FIRST, start the
  * streaming query into a memory sink, wait for the first micro-batch
  * to commit, `kill -9` one executor JVM, then `processAllAvailable()`
  * and compare the sink to the baseline. Outcomes:
  *
  *   - `recovered` — the stream drained and rows == baseline. For the
  *     STATELESS ingest gates (`near_dedup`, `decontam`) this means
  *     Spark re-ran the dead executor's tasks from lineage; for the
  *     STATEFUL targets (`dedup_state`, `session_state`,
  *     `join_state`, `left_join_state`) it additionally means the relaunched executor
  *     reloaded the state store from the checkpoint's delta/snapshot
  *     files mid-stream.
  *   - `parity_mismatch` — the stream drained but rows differ from the
  *     baseline: an exactly-once violation, the failure this gate
  *     exists to catch.
  *   - `inconclusive` — the kill landed only after every staged data
  *     batch had already committed (small corpora: N tiny micro-batches
  *     can all commit between the first-progress wait and the kill), so
  *     the run proves nothing about mid-stream loss. Recorded loudly
  *     instead of masquerading as `recovered`; re-run with a larger
  *     `SPARK_GRAFT_FIS_NFILES` (default 6) to slow the drain.
  *   - `job_lost` — the query died: recorded loudly with the error.
  *   - `harness_error` — no executor found to kill.
  *
  * Baselines per target family:
  *   - stateless (`near_dedup` = DocStreams.incrementalNearDedup,
  *     `decontam` = VecStreams.decontaminateIngest): the BATCH twin —
  *     the same plan over the same rows in batch mode, the strongest
  *     baseline, valid because a stateless stream-static plan emits
  *     exactly the batch answer regardless of micro-batch boundaries.
  *   - stateful (`dedup_state` = EventStreams.dedupe /
  *     dropDuplicatesWithinWatermark over the events corpus unioned
  *     with itself for real duplicate pressure; `session_state` =
  *     EventStreams.sessionWindows, a watermarked session-window
  *     aggregation; `join_state` = EventStreams.attributionJoin, a
  *     watermarked stream-stream interval join holding BOTH sides'
  *     rows in symmetric join state stores): a CONTROL streaming run — the same query over the
  *     same staged files with the same `maxFilesPerTrigger=1` cadence
  *     and its own checkpoint, run to completion WITHOUT a kill. The
  *     batch frame is the wrong baseline here (append mode holds back
  *     rows behind the final watermark, and watermark-late rows are
  *     dropped by arrival order), but the control run is deterministic:
  *     file→batch assignment is fixed by the staged listing, so the
  *     watermark sequence — hence the emitted row set — is identical
  *     unless the kill breaks exactly-once. `state_operators` (from
  *     the last progress) and `state_rows` (numRowsTotal summed) are
  *     recorded so a stateless run can never masquerade as stateful
  *     evidence.
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
    val nFiles = sys.env.get("SPARK_GRAFT_FIS_NFILES").map(_.toInt).getOrElse(6)

    def fileSrc(schema: org.apache.spark.sql.types.StructType): DataFrame =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(staging)

    // control streaming run: same staged files, same trigger cadence,
    // own checkpoint, no kill — the baseline for the stateful targets
    def runControl(frame: DataFrame): Seq[String] = {
      val ckc = java.nio.file.Files
        .createTempDirectory(s"fis_${name}_ckc").toString
      val cq = frame.writeStream
        .format("memory").queryName("fis_ctl").outputMode("append")
        .option("checkpointLocation", ckc)
        .start()
      try cq.processAllAvailable() finally cq.stop()
      spark.table("fis_ctl").collect().map(_.toString).sorted.toSeq
    }

    // (baseline rows, streaming frame, baseline kind) per target — the
    // baseline is materialized BEFORE the kill so baseline work never
    // races it
    val (baseline, stream, baselineKind) = name match {
      case "near_dedup" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        docs.repartition(nFiles).write.mode("overwrite").parquet(staging)
        val history = graft.streaming.DocStreams
          .historySimhashBands(spark, sfDir)
          .filter(col("hist_id") % 2 === 0)
        val twin = graft.streaming.DocStreams
          .incrementalNearDedup(docs, history)
          .collect().map(_.toString).sorted.toSeq
        (twin,
          graft.streaming.DocStreams
            .incrementalNearDedup(fileSrc(docs.schema), history),
          "batch_twin")
      case "decontam" =>
        val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
        vecs.repartition(nFiles).write.mode("overwrite").parquet(staging)
        val eval = graft.streaming.VecStreams.evalVectors(spark, sfDir)
        val twin = graft.streaming.VecStreams
          .decontaminateIngest(vecs, eval)
          .collect().map(_.toString).sorted.toSeq
        (twin,
          graft.streaming.VecStreams
            .decontaminateIngest(fileSrc(vecs.schema), eval),
          "batch_twin")
      case "dedup_state" | "session_state" | "join_state"
          | "left_join_state" =>
        val ev = graft.catalog.Tables.t(spark, sfDir, "events")
        // dedup needs real duplicate pressure: union the corpus with
        // itself so every event_id arrives twice, spread across files
        val toStage = if (name == "dedup_state") ev.union(ev) else ev
        toStage.repartition(nFiles).write.mode("overwrite").parquet(staging)
        val schema = spark.read.parquet(staging).schema
        val mk: DataFrame => DataFrame = name match {
          case "dedup_state" => graft.streaming.EventStreams.dedupe
          // join_state reads ONE staged source into both join sides
          // (purchase/click splits of the same stream) — the state
          // under test is the symmetric hash join's per-side stores;
          // left_join_state is the outer twin, where null-padded rows
          // emit only when the watermark PROVES no match can arrive —
          // a kill must also recover those expiry timers exactly
          case "join_state" => graft.streaming.EventStreams.attributionJoin
          case "left_join_state" =>
            graft.streaming.EventStreams.attributionLeftOuter
          case "session_state" => graft.streaming.EventStreams.sessionWindows
          // mirror the outer match's unknown-target guard: a stateful
          // target added to the outer case list but forgotten here must
          // fail loudly, not silently run sessionWindows and record
          // fault-tolerance evidence for the wrong query
          case other => sys.error(s"no stream builder for target: $other")
        }
        (runControl(mk(fileSrc(schema))), mk(fileSrc(schema)),
          "stream_control")
      case other => sys.error(s"unknown streaming fault target: $other")
    }

    // micro-batches that carry data == staged part files (repartition
    // can theoretically leave a partition empty, so count the files)
    val stagedBatches = new java.io.File(staging).listFiles
      .count(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))

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
        killOne()
        // snapshot AFTER the kill returns: if every staged data batch
        // had already committed by then, the kill landed post-drain and
        // proves nothing (conservative direction — a batch committing
        // between the signal and this read marks a genuinely-mid-stream
        // kill inconclusive, never a post-drain kill as recovered)
        val batchesAtKill = q.recentProgress.count(_.numInputRows > 0)
        if (killedPid < 0)
          s""""outcome":"harness_error","error":"no executor JVM found to kill""""
        else {
          q.processAllAvailable()
          val stateOps = Option(q.lastProgress)
            .map(_.stateOperators.length).getOrElse(-1)
          val stateRows = Option(q.lastProgress)
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
          val rows = spark.table("fis")
            .collect().map(_.toString).sorted.toSeq
          if (batchesAtKill >= stagedBatches)
            s""""outcome":"inconclusive","detail":"kill landed after all """ +
              s"""$stagedBatches data batches committed",""" +
              s""""batches_before_kill":$batchesAtKill"""
          else if (rows == baseline)
            s""""outcome":"recovered","rows":${rows.size},""" +
              s""""batches_before_kill":$batchesAtKill,""" +
              s""""staged_batches":$stagedBatches,""" +
              s""""state_operators":$stateOps,"state_rows":$stateRows"""
          else
            s""""outcome":"parity_mismatch","rows":${rows.size},""" +
              s""""baseline_rows":${baseline.size},""" +
              s""""state_operators":$stateOps"""
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
      s""""baseline":"$baselineKind",""" +
      s""""reliable":${Ckpt.reliableDir.isDefined},""" +
      s""""killed_pid":$killedPid,$outcome}""")
    spark.stop()
  }
}
