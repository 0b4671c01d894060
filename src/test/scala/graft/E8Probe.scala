package graft
import org.apache.spark.sql.SparkSession
object E8Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (c <- args(1).split(",").map(_.toInt)) {
      val t0 = System.nanoTime()
      val n = graft.catalog.Approx.ivfDedup(
        graft.catalog.Tables.t(spark, dir, "embeddings"),
        C = c, P = 4, tau = 0.4).count()
      println(f"[e8probe] C=$c%4d  ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
