package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.operators.SaltedAgg

class ExtensionsSpec extends SparkSuite {

  test("SQL callers can use rolling_hash / min_hash_sig after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT rolling_hash('hello') AS h,
                min_hash_sig(array('a','b','c'), 8) AS sig""").collect().head
    val direct = graft.functions.RollingHash.hashBytes("hello".getBytes("UTF-8"))
    assert(r.getAs[Long]("h") == direct)
    assert(r.getAs[scala.collection.Seq[Long]]("sig").length == 8)
  }

  test("salted aggregation equals plain aggregation on skewed data") {
    val s2 = spark; import s2.implicits._
    // 90% of rows share one hot key
    val df = ((1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 37}", i.toLong))).toDF("k", "v")
    val salted = SaltedAgg.saltedSum(df, Seq("k"), "v", "total", nSalts = 8)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("total")).toMap
    val plain = df.groupBy("k").agg(sum("v").as("total"))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("total")).toMap
    assert(salted == plain)
    val counts = SaltedAgg.saltedCount(df, Seq("k"), "n", nSalts = 8)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("n")).toMap
    assert(counts("hot") == 9000L)
  }
}
