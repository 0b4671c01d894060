package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed order-statistic selection: the value at the k-th smallest
  * rank (1-based, duplicates counted) per group, WITHOUT a per-group
  * global sort.
  *
  * `ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v)` funnels each whole
  * group through ONE task's sort — fatal when the group cardinality is
  * tiny (3 return flags over a 100 TB lineitem puts a third of the corpus
  * in one task). This operator keeps the discrete-percentile semantics
  * (an EXISTING value, the ceil-rank element — the q78/q88 contract) but
  * distributes the work with the q54/d27/q81 prefix-offset discipline:
  *
  *   1. collapse rows to a per-(grp, v) count histogram (map-side
  *      combine; one shuffle whose reduce keys are value-level, never
  *      group-level);
  *   2. range-partition the histogram by (grp, v) and pin the partition
  *      assignment with localCheckpoint (range sampling is seeded per
  *      execution — the counts job and the pick job must see the SAME
  *      pid);
  *   3. collect ONE subtotal per (partition, grp) — partition metadata
  *      (≤ parts × |grp| rows), not data — and turn it into per-partition
  *      prefix offsets on the driver;
  *   4. running-count WITHIN each (pid, grp) slice (a window over one
  *      range chunk, so every sort is bounded by the range-partition
  *      size, and slices of the same group sort in parallel), add the
  *      broadcast offset, and keep the rows whose global rank interval
  *      [start, end] covers a requested k.
  *
  * At 1000 executors the only serial state is the parts × |grp| subtotal
  * table; no task ever holds more than one range chunk of the VALUE
  * HISTOGRAM (already far smaller than the raw rows under duplicate-heavy
  * domains like 2-decimal prices).
  *
  * `targets` carries (grp, k) plus any caller passthrough columns (probe
  * labels etc.); it is broadcast — callers request a handful of ranks per
  * group. Ties: with duplicates the k-th smallest VALUE is identical
  * under any tie-breaking total order, so callers whose nominal order
  * adds unique-key tie-breaks (q88's (p, ok, ln)) select the same value.
  */
object RankSelect {

  def valueAtRanks(df: DataFrame, grp: String, v: String,
      targets: DataFrame, parts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val hist = df.groupBy(col(grp), col(v)).agg(count(lit(1)).as("_c"))
    val parted = hist.repartitionByRange(parts, col(grp), col(v))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // one subtotal per (partition, group): metadata, not rows
    val subtotals = parted.groupBy(col("_pid"), col(grp))
      .agg(sum(col("_c")).as("_pc"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    val offsets = subtotals.groupBy(_._2).iterator.flatMap {
      case (g, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, c) =>
          val o = (pid, g, acc); acc += c; o
        }
    }.toSeq
    val offSchema = StructType(Seq(
      StructField("_pid", IntegerType, nullable = false),
      parted.schema(grp).copy(name = grp),
      StructField("_off", LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        offsets.map { case (pid, g, off) => Row(pid, g, off) }, 1),
      offSchema)
    val w = Window.partitionBy(col("_pid"), col(grp)).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.join(broadcast(offDf), Seq("_pid", grp))
      .withColumn("_end", col("_off") + sum(col("_c")).over(w))
      .withColumn("_start", col("_end") - col("_c") + 1)
      .join(broadcast(targets), Seq(grp))
      .filter(col("k").between(col("_start"), col("_end")))
      .drop("_pid", "_c", "_off", "_start", "_end")
  }
}
