package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CSV sinks (reference K1/K2): fixed column order, header row, ONE file
  * per output (`csv.DictWriter`, `bigbugdata.py:208–222`).
  *
  * Spark writes a directory of part files; for the reference's
  * single-file contract we coalesce(1) and move the part into place.
  * Coalescing is a sink-only concession — every upstream stage stays
  * parallel, and at cluster scale the wide pivoted result is
  * organism-rows × sample-columns (small relative to the input).
  */
object CsvSink {

  /** K1: write `df` with exactly `fieldnames` in order to a single CSV. */
  def writeSingleCsv(df: DataFrame, fieldnames: Seq[String], target: String): Unit = {
    val tmp = Files.createTempDirectory("graft_csv").toString
    df.select(fieldnames.map(col): _*)
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
    val dest = Paths.get(target)
    if (dest.getParent != null) Files.createDirectories(dest.getParent)
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
  }

  /** K2: output layout `{out}/combined_{rank}.csv` etc.
    * (`bigbugdata.py:19–32`). */
  def outputPaths(resultsDir: String, rank: String): (String, String, String) = {
    Files.createDirectories(Paths.get(resultsDir))
    (s"$resultsDir/combined_$rank.csv",
      s"$resultsDir/rrpm_$rank.csv",
      s"$resultsDir/tophits_$rank.csv")
  }
}
