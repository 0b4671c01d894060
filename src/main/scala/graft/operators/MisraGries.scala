package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed `Aggregator`: at most
  * `k - 1` counters, one pass, mergeable (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012 — both public).
  *
  * Guarantee (the load-bearing one): every item with true frequency
  * `> n / k` is present in the final candidate set, under EVERY
  * partial-aggregation schedule Spark may pick. The candidate set itself
  * is NOT schedule-deterministic — different merge orders can retain
  * different sub-threshold items — so this summary is an intermediate:
  * callers must re-count candidates exactly (one filtered aggregation)
  * and filter by the true threshold, which makes the end-to-end result
  * deterministic and exact (d33 does exactly that; CatalogSpec pins the
  * superset property across partitionings).
  *
  * Scale shape: the buffer is O(k) regardless of input size, reduce is
  * O(1) amortized (the decrement-all case costs O(k) but is paid at most
  * once per k inputs), merge is O(k log k). At 100 TB this is the
  * pattern for "what are the hot keys" without a full groupBy when the
  * domain is huge: one narrow pass + one tiny verify aggregation.
  */
final class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 2, s"MisraGries needs k >= 2, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k - 1 => b.updated(x, 1L)
      case None =>
        // all k-1 counters occupied by other items: decrement everyone
        // (the arriving item and k-1 counters each give up one unit —
        // the deficit any true count can accumulate is bounded by n/k)
        b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (summed.size <= k - 1) summed
    else {
      // subtract the k-th largest count from every counter and drop the
      // non-positive ones: <= k-1 survive, and the subtraction is the
      // same charge argument as reduce's decrement-all
      val cut = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k - 1)
      summed.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
