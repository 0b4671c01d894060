package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional runtime confs, e.g. SPARK_GRAFT_CONF=spark.graft.cc.algorithm=stars
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    args(0).split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[benchone] $name%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
