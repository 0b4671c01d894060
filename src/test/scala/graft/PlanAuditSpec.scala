package graft

/** Catalog-WIDE physical-plan audit — the per-query PlanSpec pins,
  * promoted to invariants over every entry in the catalog, so a future
  * query can't quietly reintroduce the shapes that die at 100 TB:
  *
  *  1. NO CartesianProduct, anywhere, ever. Zero current exceptions —
  *     even d6's bounded pedagogical all-pairs plans as a
  *     BroadcastNestedLoopJoin over its ≤150-doc slice.
  *  2. Every `Exchange SinglePartition` must feed FROM a keyless
  *     partial-aggregate (a global-aggregate merge): such an exchange
  *     moves one partial row per task — constant data — which is the
  *     only funnel-to-one-task shape that survives scale. A
  *     SinglePartition under anything else (a global window sort, a
  *     global row_number) is the single-reducer pattern q54/q81/q86/
  *     q93/d25/d27/RankSelect exist to avoid.
  *  3. BroadcastNestedLoopJoin only where a BOUNDED broadcast side
  *     justifies a non-equi or constant-key join (the allowlist below,
  *     each with its bound); a BNLJ outside the list means an unbounded
  *     side slipped into a nested loop.
  */
class PlanAuditSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  /** queries allowed a BroadcastNestedLoopJoin, and why the broadcast
    * side is bounded:
    * - bb_e2e_combined / bb_e2e_rrpm / bb_e2e_tophits: the 1-row
    *   control/total frame attaches to the sample universe
    * - d6_ngram_jaccard: the pedagogical exact baseline, hard-bounded
    *   to doc_id < 150 on BOTH sides (d32 is the full-corpus twin)
    * - d15/d28/d33/d35/q18/q84/q87: a 1-row global statistic (corpus
    *   size, total, mean, min/max) broadcasts onto the corpus
    * - e1/e4/e7/e10/e14/e15: the CONSTANT query batch (≤ a few hundred
    *   vectors) broadcasts against the corpus scan with a non-equi
    *   (q_id <> c_id) condition — the e1 discipline
    * - q31_range_join: the 3-row bucket dimension joins on a range
    *   predicate */
  private val bnljAllowed = Set(
    "bb_e2e_combined", "bb_e2e_rrpm", "bb_e2e_tophits",
    "d6_ngram_jaccard",
    "d15_tfidf_topterms", "d28_temperature_mix", "d33_heavy_hitters",
    "d35_bm25", "q18_scalar_subquery", "q84_ab_test", "q87_histogram",
    "e1_cosine_topk", "e4_embed_dedup", "e7_pq_adc", "e10_knn_classify",
    "e14_recall_eval", "e15_binary_ann",
    "q31_range_join")

  /** queries allowed a SinglePartition exchange whose child is NOT a
    * keyless partial aggregate, because the funneled frame is bounded
    * by CONSTRUCTION (post-aggregation metadata, not corpus rows):
    * - d28_temperature_mix: everything past the one groupBy runs on a
    *   #sources-row frame (~20 rows); its global apportionment window
    *   funnels that metadata frame, never the corpus */
  private val boundedSinglePartition = Set("d28_temperature_mix")

  test("catalog-wide plan audit: no CartesianProduct anywhere; every " +
      "SinglePartition exchange is a keyless partial-aggregate merge; " +
      "BNLJ only with a documented bounded broadcast side") {
    val bad = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        bad += s"$name: CartesianProduct"
      val lines = plan.linesIterator.toVector
      lines.indices.foreach { i =>
        if (lines(i).contains("Exchange SinglePartition")) {
          // the line below the exchange is its child — the side that
          // ships data. Constant-per-task iff it is a keyless partial
          // aggregate (HashAggregate(keys=[]...partial_...),
          // SortAggregate(key=[]...), ObjectHashAggregate(keys=[]...)).
          val child = lines.lift(i + 1).getOrElse("")
          val keyless = child.contains("keys=[],") || child.contains("key=[],")
          if (!(keyless && child.contains("partial_"))
              && !boundedSinglePartition(name))
            bad += s"$name: SinglePartition over non-aggregate child: " +
              child.trim.take(90)
        }
      }
      if (plan.contains("BroadcastNestedLoop") && !bnljAllowed(name))
        bad += s"$name: BroadcastNestedLoopJoin outside the bounded " +
          "allowlist — check the broadcast side's bound, then allowlist"
      spark.catalog.clearCache()
    }
    val b = bad.result()
    assert(b.isEmpty, s"catalog plan audit violations:\n  ${b.mkString("\n  ")}")
  }
}
