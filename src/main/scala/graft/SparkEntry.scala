package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog is assembled from per-domain modules; every entry
  * carries its DuckDB oracle SQL right next to the Spark implementation
  * (see QueryDef for the exactness strategy that makes hashes match).
  */
object SparkEntry {

  val catalog: Seq[QueryDef] =
    Relational.queries ++ Events.queries ++ TextDocs.queries ++
      Vectors.queries ++ Approx.queries ++ Extended.queries ++ E2E.queries ++
      Scripts.queries ++ TypedOps.queries ++ Warehouse.queries ++ Graph.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
