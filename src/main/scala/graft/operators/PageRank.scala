package graft.operators

import graft.Ckpt.StableCheckpoint
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank in exact integer fixed-point.
  *
  * Ranks are carried as BIGINT micro-units (init = 1,000,000 per node)
  * and every step is integer arithmetic:
  *
  *   contrib(u)  = rank(u) div outdeg(u)            (truncating div)
  *   inflow(v)   = SUM of contrib(u) over edges u->v (exact integer sum)
  *   rank'(v)    = base + (85 * inflow(v)) div 100   (damping 0.85)
  *
  * Integer sums are associative and order-free, so the result is
  * bit-identical at any parallelism AND matches a SQL re-derivation
  * exactly — which is what makes the g1_pagerank oracle possible where
  * a floating-point PageRank would drift by reduction order. The cost
  * is bounded truncation error (< outdeg micro-units per node per
  * iteration, i.e. < 0.0001% of a rank unit), irrelevant for ranking.
  *
  * Scale shape (the canonical distributed PageRank):
  *   - edges+outdeg are computed once, hash-partitioned on src, and
  *     localCheckpoint'ed — the loop never re-reads or re-shuffles the
  *     edge set's lineage.
  *   - each iteration is ONE equi-join (ranks ⋈ edges on node=src) +
  *     ONE groupBy(dst) partial-aggregated sum + ONE left join back to
  *     the node set: all shuffles key on node ids, never node×node.
  *   - ranks are localCheckpoint'ed per iteration so the plan stays
  *     constant-depth (same discipline as ConnectedComponents).
  *
  * Dangling nodes (no out-edges after self-loop removal) simply
  * contribute nothing — the simple-PageRank convention, applied
  * identically on the oracle side.
  */
object PageRank {

  val Init: Long = 1000000L
  val Base: Long = 150000L // (1 - 0.85) * Init

  /** @param edges (src BIGINT, dst BIGINT), self-loops already removed
    * @param nodes (node BIGINT) — the full node universe
    * @return (node BIGINT, rank_units BIGINT) after `iterations` steps
    */
  def run(edges: DataFrame, nodes: DataFrame, iterations: Int): DataFrame = {
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
      .stableCheckpoint()

    var ranks = nodes.select(col("node"), lit(Init).as("r")).stableCheckpoint()
    for (_ <- 1 to iterations) {
      val inflow = edgesDeg
        .join(ranks, edgesDeg("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
      ranks = nodes
        .join(inflow, nodes("node") === inflow("dst"), "left")
        .select(nodes("node"),
          expr(s"$Base + (85 * coalesce(inflow, CAST(0 AS BIGINT))) div 100")
            .as("r"))
        .stableCheckpoint()
    }
    ranks.select(col("node"), col("r").as("rank_units"))
  }
}
