package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Executor-loss fault injection for the cross-JVM gate
  * (CORRECTNESS_CLUSTER.md, fault-injection section).
  *
  * Protocol (one target per JVM so a lost memo frame cannot leak into
  * the next target's run): under `local-cluster[2,16,4096]`, run the
  * target once to completion (baseline rows + wall time), re-run it
  * with a hard `kill -9` of one executor JVM mid-flight (at ~40% of
  * the baseline time), and print ONE JSON line recording the outcome:
  *
  *   - `recovered`  — the job finished and rows == baseline: Spark
  *     retried the dead executor's tasks from lineage (stateless
  *     plans), or re-read reliable checkpoint files when
  *     SPARK_GRAFT_RELIABLE_CKPT is set.
  *   - `job_lost`   — the action threw: for localCheckpoint-bearing
  *     plans this is the DOCUMENTED contract (lineage is truncated, a
  *     dead executor's blocks are unrecoverable — Spark fails loudly,
  *     never answers wrong). The `error` field carries the exception
  *     head for the record.
  *   - `inconclusive` — the kill landed after the job finished (too
  *     fast); rerun with a larger corpus or earlier killAtFrac.
  *
  * Targets: catalog names (g1_pagerank, d11_dedup_clusters,
  * d32_setsim_join → memo consumer d36_pair_mining) plus the synthetic
  * `rankselect_distributed`, which drives RankSelect.valueAtRanks with
  * `minDistributedBytes = 0` so the checkpointing distributed path runs
  * even on a small corpus (the catalog's q78 takes the windowed small
  * path below 32 MB and would never touch the checkpoint).
  */
object FaultInject {
  import Ckpt.StableCheckpoint

  private[graft] def executorPids(driverPid: Long): Seq[Long] = {
    import scala.sys.process._
    import scala.util.Try
    // ONE `ps -eo pid,ppid,args` snapshot feeds BOTH the executor list
    // and the ancestry map: with two separate snapshots, an executor
    // relaunched between them appeared in the grep list but not the
    // pid/ppid map, fell back to parent 1 in the ancestry walk, and was
    // silently dropped. An empty scan is still a legitimate result
    // (executor already dead, or the kill raced the job's end), so a
    // failed ps folds to empty instead of throwing
    val snap = Try(Seq("bash", "-c", "ps -eo pid,ppid,args").!!).getOrElse("")
    val rows: Seq[(Long, Long, String)] =
      snap.linesIterator.drop(1).flatMap { l =>
        l.trim.split("\\s+", 3) match {
          case Array(p, pp, args @ _*) =>
            Try((p.toLong, pp.toLong, args.headOption.getOrElse(""))).toOption
          case _ => None
        }
      }.toSeq
    // local-cluster executors are grandchildren (driver → Worker →
    // executor); walk ppid ancestry up to the driver so a concurrent
    // Spark job's executors on the same box are never kill targets
    val parentOf: Map[Long, Long] =
      rows.map { case (p, pp, _) => (p, pp) }.toMap
    def descendsFromDriver(pid: Long): Boolean = {
      var cur = pid
      var hops = 0
      while (cur > 1 && hops < 16) {
        if (cur == driverPid) return true
        cur = parentOf.getOrElse(cur, 1L)
        hops += 1
      }
      false
    }
    rows.collect {
      case (p, _, args)
          if args.contains("CoarseGrainedExecutorBackend") &&
            p != driverPid && descendsFromDriver(p) => p
    }.sorted
  }

  private def targetFrame(name: String, dir: String,
      spark: org.apache.spark.sql.SparkSession): DataFrame = name match {
    case "rankselect_distributed" =>
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_returnflag").as("grp"),
          col("l_extendedprice").cast("double").as("v"))
      val targets = li.groupBy("grp").agg(count(lit(1)).as("n"))
        .select(col("grp"), (col("n") / 2).cast("long").as("k"))
        .stableCheckpoint()
      graft.operators.RankSelect.valueAtRanks(li, "grp", "v", targets,
        parts = 16, minDistributedBytes = 0L)
    case q => SparkEntry.queries(q)(spark, dir)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val killAtFrac = args.lift(2).map(_.toDouble).getOrElse(0.4)
    val spark = SparkEnv.builder("local-cluster[2,16,4096]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val driverPid = ProcessHandle.current().pid()

    // baseline: run TWICE and time the warm pass — the cold pass pays
    // codegen/scan/memo warmup that the kill run won't, and a kill
    // scheduled off the cold time lands after the warm job finishes
    targetFrame(name, sfDir, spark).collect()
    val t0 = System.nanoTime()
    val baseline = targetFrame(name, sfDir, spark)
      .collect().map(_.toString).sorted.toSeq
    val baseMs = (System.nanoTime() - t0) / 1000000

    // kill run: same frame re-built (memo frames are REUSED by design —
    // that is exactly the exposure being measured), one executor shot
    // from a watchdog thread. killAtFrac = 0 kills BEFORE the run
    // starts — the deterministic form for fast consumers of
    // session-lifetime memo/checkpoint frames: the question is not
    // whether a kill can land mid-collect but what happens to a plan
    // whose truncated-lineage blocks half-lived on the dead executor.
    val killAtMs =
      if (killAtFrac == 0.0) 0L else math.max(300L, (baseMs * killAtFrac).toLong)
    @volatile var killedPid = -1L
    def killOne(): Unit =
      executorPids(driverPid).headOption.foreach { pid =>
        killedPid = pid
        Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor()
      }
    val watchdog = new Thread(() => { Thread.sleep(killAtMs); killOne() })
    watchdog.setDaemon(true)
    val t1 = System.nanoTime()
    val outcome =
      try {
        if (killAtMs == 0L) {
          killOne()
          // a kill-before-start run whose scan found no executor is a
          // HARNESS failure, not a target outcome — running the target
          // anyway would record a fault-free run as "inconclusive"
          require(killedPid > 0,
            "harness_error: no executor JVM found to kill (pre-start)")
        } else watchdog.start()
        val rows = targetFrame(name, sfDir, spark)
          .collect().map(_.toString).sorted.toSeq
        val ms = (System.nanoTime() - t1) / 1000000
        if (killedPid < 0)
          s""""outcome":"inconclusive","detail":"job finished in ${ms}ms before the ${killAtMs}ms kill""""
        else if (rows == baseline)
          s""""outcome":"recovered","rows":${rows.size},"ms":$ms"""
        else
          s""""outcome":"WRONG_ANSWER","rows":${rows.size},"baseline_rows":${baseline.size}"""
      } catch {
        case e: Throwable =>
          val head = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(3).mkString(" / ").take(300)
            .replace("\\", "\\\\").replace("\"", "\\\"")
          val kind =
            if (head.startsWith("requirement failed: harness_error"))
              "harness_error"
            else "job_lost"
          s""""outcome":"$kind","error":"$head""""
      }
    watchdog.join(1000)
    println(s"""{"fault_inject":"$name","reliable":${Ckpt.reliableDir.isDefined},""" +
      s""""baseline_ms":$baseMs,"kill_at_ms":$killAtMs,"killed_pid":$killedPid,$outcome}""")
    spark.stop()
  }
}
