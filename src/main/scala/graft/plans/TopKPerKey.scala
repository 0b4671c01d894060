package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator extension surface (SURVEY §7.3 tier (c)): a custom
  * logical node + planner strategy + physical operator for per-key top-K.
  *
  * `row_number().over(partitionBy(keys).orderBy(...)) <= k` plans as
  * shuffle → FULL SORT of every key group → window → filter: the sort
  * cost is O(group·log group) and the whole group is materialized even
  * though only k rows survive. This operator keeps a bounded k-row heap
  * per key instead — O(group·log k) time, O(keys·k) memory, same single
  * shuffle (`requiredChildDistribution` lets EnsureRequirements insert
  * the exchange), bit-identical output including the rank column.
  *
  * The reference's tophits (`bigbugdata.py:176–183`) is exactly this
  * shape; the oracle-paired q44 pins the operator against q8's window
  * formulation and the same DuckDB SQL.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    // constructor parameter (not a body val): tree copies during analysis/
    // optimization must KEEP the output attribute's exprId, or references
    // resolved against this node dangle after the first transform
    rankAttr: AttributeReference =
      AttributeReference("rk", LongType, nullable = false)()) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** planner strategy: logical TopKPerKey → physical TopKPerKeyExec */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      TopKPerKeyExec(t.keys, t.order, t.k, t.rankAttr, planLater(t.child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  /** one shuffle on the grouping keys — same boundary the window form
    * needs, inserted by EnsureRequirements */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val orderLocal = order
    val keysLocal = keys
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val ordering = GenerateOrdering.generate(orderLocal, childOutput)
      // max-heap under the rank ordering: head = worst kept row
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          scala.collection.mutable.PriorityQueue.empty[InternalRow](ordering))
        if (heap.size < kLocal) {
          heap.enqueue(row.copy())
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll yields worst→best; reverse for rank 1..m
        val best = heap.dequeueAll.reverse
        best.iterator.zipWithIndex.map { case (row, i) =>
          val rankRow = new GenericInternalRow(Array[Any]((i + 1).toLong))
          outProj(joined(row, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
