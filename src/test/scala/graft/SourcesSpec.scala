package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond the reference's TSV/CSV: parquet
  * (primary), ORC, JSON, partitioned layouts — each round-trips the same
  * relation. */
class SourcesSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("orc / json / csv round-trip the nation table") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val expect = nation.orderBy("n_nationkey").collect().toSeq
    val dir = Files.createTempDirectory("graft_src")

    nation.write.mode("overwrite").orc(s"$dir/orc")
    assert(spark.read.orc(s"$dir/orc").orderBy("n_nationkey")
      .collect().toSeq == expect)

    nation.write.mode("overwrite").json(s"$dir/json")
    val backJson = spark.read.schema(nation.schema).json(s"$dir/json")
    assert(backJson.orderBy("n_nationkey").collect().toSeq == expect)

    nation.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val backCsv = spark.read.schema(nation.schema)
      .option("header", "true").csv(s"$dir/csv")
    assert(backCsv.orderBy("n_nationkey").collect().toSeq == expect)
  }

  test("hive-style partitioned write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part")
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/orders")
    val back = spark.read.parquet(s"$dir/orders").filter(col("o_year") === 1995)
    val expect = spark.read.parquet(s"$sf/orders.parquet")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(back.count() == expect)
    // partition pruning: the physical plan must carry the partition filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"))
  }
}
