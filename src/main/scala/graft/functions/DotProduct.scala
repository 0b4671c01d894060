package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Sequential-fold dot product of two double arrays.
  *
  * EXACTLY the semantics of the higher-order formulation
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, (acc,x)=>acc+x)`:
  * same left-to-right IEEE addition order (results hash-match the DuckDB
  * `list_reduce` oracle bit-for-bit), AND the same null behavior —
  * zip_with pads the shorter array with nulls and `acc + null` is null,
  * so unequal lengths or any null element yield NULL. Matching the idiom
  * completely is what makes [[graft.plans.DotProductRewrite]] a legal
  * rewrite on arbitrary user queries, not just the engine's own.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // zip_with semantics: unequal lengths null-pad => product null =>
    // whole fold null; same for null elements
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
