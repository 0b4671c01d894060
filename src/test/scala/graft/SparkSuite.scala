package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per JVM (Test / fork := true ⇒ one JVM). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session
}

object SparkSuite {
  lazy val session: SparkSession = {
    // SPARK_GRAFT_MASTER/_JARS: the cross-executor gate reruns the spec
    // suite under local-cluster[2,16,4096] (real serialization
    // boundaries); default stays the fast in-process local[4]
    val builder0 = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
    val s = sys.env.get("SPARK_GRAFT_JARS")
      .fold(builder0)(j => builder0.config("spark.jars", j))
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
