package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: for each left row, attach the latest right row
  * with the same key and `rightTime <= leftTime`.
  *
  * Composed from built-ins (SURVEY §7.3 preference order (a)): tag and
  * union both sides, then a single `last_value(..., ignoreNulls)` window
  * ordered by (time, side) — right rows sort before left rows at equal
  * timestamps, giving the inclusive `<=` match of a standard ASOF join.
  *
  * Scale shape: ONE shuffle on the key (same as any windowed op), no
  * range cross-product, no per-key driver loops — this is the formulation
  * that survives a 1000-executor cluster, unlike a non-equi join which
  * plans as a nested-loop.
  */
object AsOfJoin {

  /** @param left       left (probe) rows
    * @param right      right (reference) rows
    * @param keyCols    equi-key column names present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightVals  right columns to carry (attached as-of; null when
    *                   no earlier right row exists)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // side 0 = right (sorts first at equal time → inclusive match)
    val taggedRight = right.select(
      (keyCols.map(col) :+ col(rightTime).as("_t") :+ lit(0).as("_side")) ++
        rightVals.map(c => col(c).as(s"_r_$c")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(leftTime).as("_t") :+ lit(1).as("_side")) ++
        rightVals.map(c => lit(null).as(s"_r_$c")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    // (_t, _side) alone is not a total order: two right rows tied on
    // (key, time) would make the carried values nondeterministic run to
    // run. Break ties by the carried values themselves — the winner is the
    // lexicographically-greatest (by rightVals order) of the tied right
    // rows, deterministically. Left rows hold null in _r_* so their
    // relative order among themselves stays irrelevant to the result.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t") +: col("_side") +: rightVals.map(c => col(s"_r_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .select((keyCols.map(col) ++ Seq(col("_t"), col("_side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        rightVals.map(c =>
          last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))): _*)
      .filter(col("_side") === 1)
      .drop("_t", "_side")
  }

  /** Forward as-of join: for each left row, attach the EARLIEST right row
    * with the same key and `rightTime >= leftTime`. Same union+window
    * shape as [[asofBackward]] with the time ordering reversed: in
    * descending time order, the last non-null right value before the
    * current left row is the nearest right row at-or-after it. Same
    * deterministic tie resolution (greatest carried values win).
    */
  def asofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val taggedRight = right.select(
      (keyCols.map(col) :+ col(rightTime).as("_t") :+ lit(0).as("_side")) ++
        rightVals.map(c => col(c).as(s"_r_$c")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(leftTime).as("_t") :+ lit(1).as("_side")) ++
        rightVals.map(c => lit(null).as(s"_r_$c")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").desc +: col("_side").asc +:
        rightVals.map(c => col(s"_r_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .select((keyCols.map(col) ++ Seq(col("_t"), col("_side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        rightVals.map(c =>
          last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))): _*)
      .filter(col("_side") === 1)
      .drop("_t", "_side")
  }

  /** NEAREST as-of join: for each left row, attach the right row with
    * the same key that minimizes |rightTime − leftTime|; ties resolve
    * BACKWARD (the earlier right row — the match that was already known
    * at event time). Both time columns must be numeric (epoch micros —
    * callers convert timestamps first) so the distance compare is exact
    * integer math.
    *
    * Shape: ONE tagged union, ONE shuffle on the key, TWO window passes
    * (ascending + descending over the same partitioning — Spark reuses
    * the exchange, adding only the second sort) — still no range
    * cross-product. `asof_dir` reports which direction won ('b'/'f',
    * null when no right row exists at all). */
  def asofNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val rv = rightTime +: rightVals.filterNot(_ == rightTime)
    val taggedRight = right.select(
      (keyCols.map(col) :+ col(rightTime).as("_t") :+ lit(0).as("_side")) ++
        rv.map(c => col(c).as(s"_r_$c")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(leftTime).as("_t") :+ lit(1).as("_side")) ++
        rv.map(c => lit(null).as(s"_r_$c")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val wb = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc +: col("_side").asc +:
        rv.map(c => col(s"_r_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").desc +: col("_side").asc +:
        rv.map(c => col(s"_r_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val both = taggedRight.unionByName(taggedLeft)
      .select((keyCols.map(col) ++ Seq(col("_t"), col("_side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        rv.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(wb)
          .as(s"_b_$c")) ++
        rv.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(wf)
          .as(s"_f_$c"))): _*)
      .filter(col("_side") === 1)
    val bt = col(s"_b_$rightTime"); val ft = col(s"_f_$rightTime")
    val pickB = ft.isNull ||
      (bt.isNotNull && (col("_t") - bt) <= (ft - col("_t")))
    both
      .withColumn("asof_dir",
        when(bt.isNull && ft.isNull, lit(null).cast("string"))
          .otherwise(when(pickB, lit("b")).otherwise(lit("f"))))
      .select((keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        rv.map(c => when(pickB, col(s"_b_$c")).otherwise(col(s"_f_$c"))
          .as(s"asof_$c")) :+ col("asof_dir")): _*)
  }
}
