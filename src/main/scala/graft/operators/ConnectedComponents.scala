package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by minimum-label propagation — the step AFTER
  * pairwise near-dup detection in a dedup pipeline: pairs → clusters →
  * one representative per cluster.
  *
  * Each iteration every node takes the minimum label among itself and its
  * neighbors; convergence is reached in O(component diameter) iterations.
  * Near-dup components are shallow (dups of a common source), so the
  * iteration count stays small even at corpus scale. All per-iteration
  * work is distributed (join + groupBy on the edge list); the driver only
  * steers the loop and checks the changed-row count. `localCheckpoint`
  * truncates the lineage each round — without it the plan doubles per
  * iteration.
  *
  * At 100 TB with adversarial (high-diameter) graphs, the alternating
  * large-star/small-star algorithm (Kiveris et al., "Connected Components
  * in MapReduce and Beyond") converges in O(log²) rounds with the same
  * join-shaped building blocks; min-label propagation is the right
  * default for the shallow components dedup actually produces.
  */
object ConnectedComponents {

  /** @param nodes single column `node` — every vertex (singletons kept)
    * @param edges columns `src`, `dst` — undirected (symmetrized here)
    * @return columns `node`, `cluster` (= min node id reachable)
    */
  def minLabel(nodes: DataFrame, edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    var labels = nodes.select(col("node")).distinct()
      .withColumn("cluster", col("node"))
      .localCheckpoint()
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("cluster")).as("_nbr_min"))
      // materialize: the pointer-doubling join below reads stepped TWICE
      // (as probe and as map) — without the checkpoint the edge join +
      // groupBy would run twice per iteration
      val stepped = labels
        .join(nbrMin, labels("node") === nbrMin("src"), "left")
        .select(labels("node"), col("cluster").as("_old"),
          least(col("cluster"), coalesce(col("_nbr_min"), col("cluster")))
            .as("cluster"))
        .localCheckpoint()
      // pointer doubling: also take the label OF the current label, so the
      // distance to the component minimum halves each round — convergence
      // in O(log diameter) instead of O(diameter), which is what keeps a
      // long near-dup chain (a deep path component) inside maxIter
      val asMap = stepped.select(col("node").as("_m_node"),
        col("cluster").as("_m_cluster"))
      // checkpoint next too: it becomes the next round's `labels`, which
      // is referenced twice (edge join + stepped base) — materializing
      // keeps per-iteration plans constant-depth
      val next = stepped
        .join(asMap, stepped("cluster") === col("_m_node"), "left")
        .select(stepped("node"), col("_old"),
          least(stepped("cluster"), coalesce(col("_m_cluster"), stepped("cluster")))
            .as("cluster"))
        .localCheckpoint()
      val changed = next.filter(col("cluster") =!= col("_old")).count()
      labels = next.drop("_old")
      done = changed == 0L
      it += 1
    }
    require(done, s"connected components did not converge in $maxIter iterations")
    labels
  }
}
