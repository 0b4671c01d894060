package graft
import org.apache.spark.sql.SparkSession
object E8Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // "64" = literal-centroid path; "k64" = compiled IvfSims kernel path
    for (spec <- args(1).split(",")) {
      val kernel = spec.startsWith("k")
      val c = spec.stripPrefix("k").toInt
      val t0 = System.nanoTime()
      val n = graft.catalog.Approx.ivfDedup(
        graft.catalog.Tables.t(spark, dir, "embeddings"),
        C = c, P = 4, tau = 0.4, kernel = kernel).count()
      println(f"[e8probe] C=$spec%5s  ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
