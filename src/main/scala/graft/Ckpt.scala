package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** Checkpoint-durability switch for every lineage-truncation site.
  *
  * The engine truncates lineage (iterative plans, shared memo frames,
  * multi-consumer barriers) with `localCheckpoint()` by default: blocks
  * live on the executors, zero distributed-FS traffic — the right
  * default for a healthy cluster, and the only option on a box with no
  * checkpoint dir. The cost is fault-tolerance: a localCheckpointed
  * RDD's lineage is GONE, so losing an executor loses its blocks
  * unrecoverably and Spark fails the job with
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (observed, not theoretical — see
  * CORRECTNESS_CLUSTER.md's fault-injection section). That is the
  * documented localCheckpoint contract, not a bug; the JOB fails
  * loudly, results are never silently wrong.
  *
  * For deployments where executor loss must not kill multi-hour jobs
  * (spot/preemptible fleets — the 100 TB reality), setting
  * `SPARK_GRAFT_RELIABLE_CKPT=<dir>` swaps EVERY site to a reliable
  * `checkpoint()` into that directory (HDFS/object store on a real
  * cluster): executor loss then recovers by re-reading checkpoint
  * files instead of losing the job. Same semantics, same barriers —
  * strictly a durability/IO tradeoff, chosen once per deployment.
  *
  * Disk amplification: every call writes a full dataset copy, and the
  * iterative operators call once per iteration. SparkEnv therefore sets
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` whenever this
  * mode is active, so checkpoints whose Dataset reference is GC'd are
  * deleted by the ContextCleaner instead of accumulating for the life of
  * the job; the final checkpoint of a live frame still persists until
  * the session stops, so size the checkpoint volume for a few
  * concurrent copies per operator, not one.
  */
object Ckpt {
  private[graft] def reliableDir: Option[String] =
    sys.env.get("SPARK_GRAFT_RELIABLE_CKPT").filter(_.nonEmpty)

  implicit class StableCheckpoint[T](private val ds: Dataset[T]) extends AnyVal {
    /** lineage-truncation barrier: localCheckpoint by default, reliable
      * checkpoint under SPARK_GRAFT_RELIABLE_CKPT (eager either way) */
    def stableCheckpoint(): Dataset[T] = reliableDir match {
      case Some(dir) =>
        val sc = ds.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        ds.checkpoint()
      case None => ds.localCheckpoint()
    }
  }
}
