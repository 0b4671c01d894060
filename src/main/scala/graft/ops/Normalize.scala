package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.schema.ReportSchema.{Sample, TaxId, Reads}

/** Normalization operators: RPM, z-score, rRPM (reference F2/W2/J2+F3;
  * `bigbugdata.py:104–163, 320–331`).
  */
object Normalize {

  /** F2: rpm = reads / (total_reads / 1e6) per cell (`bigbugdata.py:122`).
    * Inner join on the broadcast per-sample totals: a sample missing from
    * totals KeyErrors in the reference; here the join would silently drop
    * its cells, so callers should validate the sample set (BigBugData.run
    * does). */
  def rpm(grid: DataFrame, totals: DataFrame): DataFrame =
    grid.join(broadcast(totals), Seq(Sample))
      .withColumn("rpm",
        col(Reads).cast("double") / (col("total_reads").cast("double") / lit(1e6)))

  /** W2: per-organism z-score of rpm ACROSS the dense sample vector,
    * population stddev (scipy zscore ddof=0, `bigbugdata.py:322–327`).
    * stddev = 0 (all-equal vector, incl. single sample) ⇒ NaN exactly like
    * scipy — made explicit rather than relying on 0/0 double semantics.
    */
  def zscore(rpmGrid: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(TaxId))
    rpmGrid
      .withColumn("_avg", avg(col("rpm")).over(w))
      .withColumn("_sd", stddev_pop(col("rpm")).over(w))
      .withColumn("z_score",
        when(col("_sd") === 0.0 || col("_sd").isNull, lit(Double.NaN))
          .otherwise((col("rpm") - col("_avg")) / col("_sd")))
      .drop("_avg", "_sd")
  }

  /** J2+F3: rRPM = floor(rpm) / max(floor(control rpm), 1), control rpm
    * defaulting to 1 for samples in no group (`bigbugdata.py:147–159`:
    * `int()` truncation on both operands — values are ≥0 so trunc ==
    * floor; 0-denominator clamped to 1).
    *
    * `sampleToNc` is dimension-sized → broadcast; the control lookup is a
    * self-join of the rpm grid keyed on (taxID, control sample).
    */
  def rrpm(spark: SparkSession, rpmGrid: DataFrame,
      sampleToNc: Map[String, String]): DataFrame = {
    import spark.implicits._
    val ncMap = sampleToNc.toSeq.toDF(Sample, "nc_sample")
    // only control-sample cells feed the denominator: prune before the
    // self-join so the shuffle carries |controls|·T rows, not S·T
    val controls = sampleToNc.values.toSet.toSeq
    val ncRpm = rpmGrid
      .filter(col(Sample).isInCollection(controls))
      .select(col(TaxId).as("nc_taxID"),
        col(Sample).as("nc_sample_key"), col("rpm").as("nc_rpm"))
    rpmGrid
      .join(broadcast(ncMap), Seq(Sample), "left")
      .join(ncRpm,
        col(TaxId) === col("nc_taxID") && col("nc_sample") === col("nc_sample_key"),
        "left")
      .withColumn("rrpm",
        floor(col("rpm")).cast("double") /
          greatest(floor(coalesce(col("nc_rpm"), lit(1.0))), lit(1L)).cast("double"))
      .drop("nc_taxID", "nc_sample_key")
  }
}
