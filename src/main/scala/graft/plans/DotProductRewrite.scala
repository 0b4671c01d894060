package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.DotProduct

/** Optimizer rule: rewrite the higher-order-function dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the compiled [[DotProduct]] expression. The HOF form is evaluated
  * interpreted (a lambda frame per element); the compiled form is a tight
  * loop — same left-to-right IEEE fold, bit-identical results (that
  * equivalence is what makes this rewrite legal). This is the engine's
  * `Rule[LogicalPlan]` surface (SURVEY §7.3 tier (c)), injected by
  * [[graft.functions.GraftExtensions]].
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(zero: Double, _),
          LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
            Seq(accDef: NamedLambdaVariable, vDef: NamedLambdaVariable), _),
          finish)
        // Bit-exact zero check: IEEE `==` accepts -0.0, but DotProduct folds
        // from +0.0, and a fold seeded with -0.0 differs on the empty array
        // (and flips the sign of an all-negative-zero sum). Only rewrite the
        // literal +0.0 seed.
        if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
          mx.exprId == zx.exprId && my.exprId == zy.exprId &&
          acc.exprId == accDef.exprId && v.exprId == vDef.exprId &&
          isIdentityFinish(finish) =>
        DotProduct(a, b)
    }

  /** the default finish lambda is `acc -> acc` */
  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }
}
