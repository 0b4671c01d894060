package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation and salted broadcast
  * join enrichment.
  *
  * At 100 TB a handful of hot keys (one organism present in every
  * sample, one user generating 1% of events) turn a single reducer into
  * the straggler. Salting splits each hot key across `nSalts` reducers in
  * a partial aggregate, then combines the partials — same result, bounded
  * partition size. AQE's skew-join handling covers sort-merge joins; this
  * covers aggregations, which AQE does not rebalance.
  */
object SaltedAgg {

  /** groupBy(keys).agg(sum(valueCol)) with an `nSalts`-way salt:
    * phase 1 aggregates (keys, salt), phase 2 merges salts per key. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      as: String, nSalts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(nSalts)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(as))

  /** count(*) per key with the same two-phase shape */
  def saltedCount(df: DataFrame, keys: Seq[String],
      as: String, nSalts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(nSalts)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(as))
}
