package graft.catalog

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed `Dataset` surface (SURVEY §2.11's custom-aggregation tier): a
  * real `Aggregator[IN, BUF, OUT]` driven through
  * `groupByKey(...).agg(...)`, checked by the same DuckDB oracle as every
  * built-in query. The reference needs nothing beyond built-ins (§2.11);
  * this demonstrates the UDAF escape hatch the engine offers when a
  * future aggregation genuinely can't be composed from
  * `org.apache.spark.sql.functions`.
  *
  * Scale contract for ANY Aggregator here: `merge` must be associative
  * and commutative so the result is identical under every
  * partial-aggregation schedule Spark may pick (map-side combine, AQE
  * coalescing, speculative retries). `longestDoc` keeps that property by
  * making the pick a total order (n_chars desc, doc_id asc tiebreak).
  */
object TypedOps {

  final case class Doc(doc_id: Long, source: String, n_chars: Long)
  final case class Pick(doc_id: Long, n_chars: Long)

  /** per-group argmax(n_chars) with min-doc_id tiebreak — O(1) buffer,
    * order-independent merge. */
  val longestDoc: Aggregator[Doc, Pick, Pick] =
    new Aggregator[Doc, Pick, Pick] {
      def zero: Pick = Pick(Long.MaxValue, Long.MinValue)
      private def pick(a: Pick, b: Pick): Pick =
        if (b.n_chars > a.n_chars ||
          (b.n_chars == a.n_chars && b.doc_id < a.doc_id)) b
        else a
      def reduce(b: Pick, d: Doc): Pick = pick(b, Pick(d.doc_id, d.n_chars))
      def merge(a: Pick, b: Pick): Pick = pick(a, b)
      def finish(r: Pick): Pick = r
      def bufferEncoder: Encoder[Pick] = Encoders.product[Pick]
      def outputEncoder: Encoder[Pick] = Encoders.product[Pick]
    }

  val queries: Seq[QueryDef] = Seq(

    QueryDef(
      "q55_typed_agg",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars")).as[Doc]
          .groupByKey(_.source)
          .agg(longestDoc.toColumn.name("top"))
          .select(col("key").as("source"),
            col("top.doc_id").as("doc_id"), col("top.n_chars").as("n_chars"))
          .orderBy("source")
      },
      Some("""SELECT source, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
            ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY n_chars DESC, doc_id ASC) AS rk
          FROM documents) WHERE rk = 1 ORDER BY source"""),
      "typed Aggregator[IN,BUF,OUT] via groupByKey().agg(): per-source " +
        "argmax with deterministic tiebreak — the custom-UDAF escape " +
        "hatch, O(1) buffer, order-independent merge"),

    QueryDef(
      "q85_typed_cogroup",
      (s, dir) => {
        // KeyValueGroupedDataset.cogroup — the one typed escape hatch
        // q55's Aggregator doesn't cover: both sides group on the key
        // and an arbitrary function sees the two iterators together
        // (the imperative form of a full-outer join + aggregate, for
        // logic genuinely beyond declarative ops). Determinism
        // discipline inside the lambda: per-order money converts to
        // BigDecimal and sums exactly (decimal addition is
        // order-independent, so iterator order — which Spark does NOT
        // guarantee — cannot change the result), then one correctly-
        // rounded doubleValue at the end. Customers with no orders
        // emit the zero row the oracle's LEFT JOIN produces. Plans as
        // one CoGroup over two shuffles — same cost as the join it
        // mirrors; use the declarative form unless the lambda earns
        // its keep.
        import s.implicits._
        val c = Tables.t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
          .as[(Long, String)]
        val o = Tables.t(s, dir, "orders")
          .select(col("o_custkey"), col("o_totalprice"))
          .as[(Long, Double)]
        c.groupByKey(_._1).cogroup(o.groupByKey(_._1)) { (k, cs, os) =>
          val cl = cs.toList
          if (cl.isEmpty) Iterator.empty // orphan orders: none in TPC-H
          else {
            var n = 0L
            var total = java.math.BigDecimal.ZERO
            os.foreach { x =>
              n += 1
              total = total.add(java.math.BigDecimal.valueOf(x._2))
            }
            Iterator((k, cl.head._2, n, total.doubleValue))
          }
        }.toDF("c_custkey", "segment", "n_orders", "total_spend")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment AS segment,
          COUNT(o_custkey) AS n_orders,
          CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))),
            0) AS VARCHAR) AS DOUBLE) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY 1, 2 ORDER BY c_custkey"""),
      "typed cogroup (KeyValueGroupedDataset): both sides' iterators in " +
        "one lambda — the imperative escape hatch; BigDecimal sums keep " +
        "the result independent of Spark's unguaranteed iterator order, " +
        "matching the LEFT JOIN + aggregate oracle exactly")
  )
}
