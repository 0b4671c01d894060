package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: recognize the ubiquitous per-key top-K idiom
  *
  *   df.withColumn("rn",
  *       row_number().over(Window.partitionBy(keys).orderBy(ord)))
  *     .filter($"rn" <= K)
  *
  * in its raw logical form — `Filter(rn <= K, [Project(..,] Window(
  * row_number over (keys, ord)) [)])` — and swap in the native
  * [[TopKPerKey]] operator. The window formulation buffers and fully
  * sorts every key group on (keys ++ ord) even though only K rows
  * survive; the native operator sorts on KEYS ONLY and streams each
  * group through one bounded K-row heap (O(K) operator memory at any
  * key cardinality — see TopKPerKey's scaladoc).
  *
  * Legality: row_number() picks arbitrarily among order ties, and so
  * does the heap — the two formulations have the IDENTICAL contract
  * (bit-identical under a total order; arbitrary representative under
  * ties), which is what makes the swap safe. The rewrite fires only on
  * the exact shape it can prove:
  *   - the Window computes EXACTLY ONE expression, a row_number();
  *   - the Filter condition is a single `rn <= k` / `rn < k` (either
  *     operand order) against an integral literal, referencing the
  *     row_number output directly;
  *   - any Project between Filter and Window passes the rank attribute
  *     through untouched (the withColumn shape).
  * Everything else is left alone. The rank attribute is restored with
  * its ORIGINAL exprId (cast back to row_number's IntegerType) so
  * downstream references never dangle.
  *
  * Injected by [[graft.functions.GraftExtensions]] alongside the
  * [[TopKPerKeyStrategy]] that plans the logical node.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  /** the single-row_number window shape, or None */
  private def rnOf(w: Window): Option[Alias] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _, _)), _)) => Some(a)
    case _ => None
  }

  /** `cond` as "rank <= k", normalizing < to <= and operand order */
  private def kOf(cond: Expression, rn: Attribute): Option[Long] = {
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v, ByteType | ShortType | IntegerType | LongType) =>
        Some(v.toString.toLong)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case _ => None
    }
  }

  /** TopKPerKey + a Project restoring the original rank attribute.
    * Spark's own InferWindowGroupLimit has usually already planted a
    * WindowGroupLimit under the Window by the time extraOptimizations
    * run; keep it and it forces the full (keys ++ order) sort this
    * operator exists to avoid — TopKPerKey enforces the same limit, so
    * strip it. */
  private def rebuild(w: Window, rnAlias: Alias, k: Long): LogicalPlan = {
    val spec = rnAlias.child.asInstanceOf[WindowExpression]
      .windowSpec
    val input = w.child match {
      case wgl: WindowGroupLimit if wgl.limit >= k => wgl.child
      case other => other
    }
    val topk = TopKPerKey(spec.partitionSpec, spec.orderSpec, k.toInt, input)
    Project(w.child.output :+
      Alias(Cast(topk.rankAttr, IntegerType), rnAlias.name)(
        exprId = rnAlias.exprId),
      topk)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      (for {
        rnAlias <- rnOf(w)
        k <- kOf(cond, rnAlias.toAttribute) if k >= 1 && k <= Int.MaxValue
      } yield rebuild(w, rnAlias, k)).getOrElse(f)

    case f @ Filter(cond, p @ Project(projList, w: Window)) =>
      (for {
        rnAlias <- rnOf(w)
        // the rank must flow through the Project as a bare attribute
        if projList.exists {
          case a: Attribute => a.semanticEquals(rnAlias.toAttribute)
          case _ => false
        }
        k <- kOf(cond, rnAlias.toAttribute) if k >= 1 && k <= Int.MaxValue
      } yield p.copy(child = rebuild(w, rnAlias, k))).getOrElse(f)
  }
}
