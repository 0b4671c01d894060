package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.functions.ZOrder

/** Measures the property z-ordering exists for: range-partitioning a
  * table by the z-value keeps per-partition min/max ranges tight in BOTH
  * dimensions, so predicates on EITHER column prune files at scan time.
  * A single-key sort only clusters its leading column — the second
  * dimension's per-file range stays ~the full domain and nothing prunes.
  */
class ZOrderSpec extends SparkSuite {

  private def log2ceil(n: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(math.max(n - 1, 1))

  test("z-order layout tightens the second dimension's per-partition " +
      "range vs a single-key sort, keeping the first bounded") {
    val li = Tables.t(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))

    // normalize each dimension to fill the 16-bit z-domain (the real
    // pipeline would use range-bucketed percentiles; the corpus keys are
    // dense from 1 so a power-of-two stretch is the same thing)
    val Array(maxP, maxS) = li.agg(max("l_partkey"), max("l_suppkey"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val pShift = ZOrder.Bits - log2ceil(maxP + 1)
    val sShift = ZOrder.Bits - log2ceil(maxS + 1)
    assert(pShift >= 0 && sShift >= 0, s"corpus outgrew 16 bits: $maxP $maxS")

    // avg per-partition (max-min) of both dims under a given layout
    def ranges(sortKey: Column): (Double, Double) = {
      val r = li.repartitionByRange(16, sortKey)
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("l_partkey") - min("l_partkey")).as("pr"),
          (max("l_suppkey") - min("l_suppkey")).as("sr"))
        .agg(avg("pr"), avg("sr")).collect().head
      (r.getDouble(0), r.getDouble(1))
    }

    val (sortP, sortS) = ranges(col("l_partkey"))
    val (zP, zS) = ranges(ZOrder.zvalue(
      shiftleft(col("l_partkey"), pShift), shiftleft(col("l_suppkey"), sShift)))

    // single-key sort: partkey clusters (~domain/16) but suppkey is
    // uniform per partition (~full domain)
    assert(sortS > maxS * 0.8,
      s"fixture no longer demonstrates the problem: sortS=$sortS max=$maxS")
    // z-order: 16 partitions ~= a 4x4 grid, so BOTH ranges ~domain/4;
    // generous margins keep the test robust to range-sampling noise
    assert(zS < sortS * 0.6, s"z-order must tighten suppkey: $zS vs $sortS")
    assert(zP < maxP * 0.6, s"z-order must keep partkey bounded: $zP vs $maxP")
  }

  test("zvalue is invertible: de-interleaving recovers both folded keys " +
      "(no bit lost or misplaced for any 16-bit input)") {
    val s2 = spark; import s2.implicits._
    def unzip(z: Long): (Long, Long) = {
      var a = 0L; var b = 0L
      (0 until ZOrder.Bits).foreach { i =>
        a |= ((z >>> (2 * i + 1)) & 1L) << i
        b |= ((z >>> (2 * i)) & 1L) << i
      }
      (a, b)
    }
    val cases = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 2L), (43690L, 21845L)) ++ // 0xAAAA / 0x5555 alternating bits
      (1 to 40).map(i => (i * 1621L % 65536, i * 2897L % 65536))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(unzip(z) == (a, b), s"zvalue($a, $b) = $z does not invert")
    }
  }

  test("zvalue bit math: interleave of small literals matches by hand") {
    val s2 = spark; import s2.implicits._
    // a=0b101 (bits at z-positions 1,5: a-bit i -> 2i+1), b=0b011
    // (z-positions 0,2) => z = 2 + 32 + 1 + 4 = 39
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect().head.getLong(0)
    assert(z == 39L, s"expected 39, got $z")
  }
}
