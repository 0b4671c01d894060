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
        "hatch, O(1) buffer, order-independent merge")
  )
}
