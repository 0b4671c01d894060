package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction — the table-maintenance operator every 100 TB
  * lake runs continuously: streaming ingest and per-partition writers
  * leave thousands of KB-scale parquet files whose per-file open/footer
  * cost dominates scans long before row count does. Compaction rewrites
  * a directory into ceil(totalBytes / targetBytes) files.
  *
  * Scale notes: the rewrite uses `coalesce`, not `repartition` — bin-
  * packing existing partitions into fewer write tasks without a shuffle
  * (a shuffle of the whole table is exactly what compaction must avoid;
  * the files being merged are already row-group-sized chunks of the same
  * table). Only file METADATA (names + lengths) touches the driver; at a
  * million files that is a listing, not a data read.
  */
object Compaction {

  final case class CompactStats(nFilesIn: Int, totalBytes: Long, nFilesOut: Int)

  /** The rewrite frame: scan → coalesce(nOut). Factored out so PlanSpec
    * can pin the shuffle-free property (coalesce bin-packs partitions
    * into fewer tasks; a repartition here would shuffle the whole
    * table, which is exactly what compaction must avoid). */
  def rewriteFrame(s: SparkSession, inDir: String, nOut: Int) =
    s.read.parquet(inDir).coalesce(nOut)

  /** Rewrite the parquet files under `inDir` into `outDir` as
    * ceil(totalBytes / targetBytes) files. Returns (input file count,
    * input bytes, output file count) for observability. */
  def compact(s: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new Path(inDir).getFileSystem(s.sparkContext.hadoopConfiguration)
    val parquetFiles = fs.listStatus(new Path(inDir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = parquetFiles.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    rewriteFrame(s, inDir, nOut)
      .write.mode("overwrite").parquet(outDir)
    val outFiles = fs.listStatus(new Path(outDir))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    CompactStats(parquetFiles.length, totalBytes, outFiles)
  }
}
