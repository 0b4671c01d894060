package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per JVM (Test / fork := true ⇒ one JVM). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session
}

object SparkSuite {
  lazy val session: SparkSession = {
    // SparkEnv resolves the SPARK_GRAFT_MASTER/_JARS overrides so the
    // cross-executor gate can rerun the whole suite under
    // local-cluster[2,16,4096]; default stays the fast in-process local[4]
    val s = graft.SparkEnv.builder("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
