package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** A whole custom operator through the full Catalyst extension stack
  * (SURVEY.md §7.2 / builder-spec preference (c)): logical node →
  * planner strategy → physical node, registered via
  * SparkSessionExtensions (GraftExtensions) or
  * `spark.experimental.extraStrategies`.
  *
  * Semantics: per group key, the top-k rows under a sort order, with a
  * dense 1-based `rn` rank appended — i.e. the
  * `row_number().over(partitionBy.orderBy) <= k` pattern, but executed
  * with BOUNDED PER-KEY HEAPS instead of a full partition sort:
  *
  *  - the window formulation sorts every partition by (key, order) —
  *    O(n log n) comparisons and a full sort buffer (spill at scale);
  *  - this operator keeps k rows per key — O(n log k), memory bounded by
  *    k·#keys-per-partition, no sort of the non-surviving rows.
  *
  * The physical node declares `ClusteredDistribution(keys)`, so
  * EnsureRequirements inserts the single hash exchange — partitioning
  * comes from the planner, exactly like the built-in aggregates.
  */
case class TopKPerKeyPlan(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rn is PRODUCED here, not read from the child (analyzer coverage check)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Planner rule: TopKPerKeyPlan → TopKPerKeyExec. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(g, s, k, rank, child) =>
      TopKPerKeyExec(g, s, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  /** One hash exchange on the group key — inserted by the planner. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // codegen'd row comparator for the sort order (rank order)
      val ordering = GenerateOrdering.generate(sortOrders, childOutput)
      // heap head = WORST kept row → O(log k) eviction test per row
      val worstFirst = ordering.reverse
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = new java.util.PriorityQueue[InternalRow](k, worstFirst)
            h.add(row.copy())
            heaps.put(key.copy(), h)
          case Some(h) =>
            if (h.size < k) h.add(row.copy())
            else if (ordering.compare(row, h.peek()) < 0) {
              h.poll(); h.add(row.copy())
            }
        }
      }
      val outProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, h) =>
        val rows = new Array[InternalRow](h.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = h.poll(); i -= 1 } // drain worst→best, store reversed
        rows.iterator.zipWithIndex.map { case (r, idx) =>
          outProj(joined(r, new GenericInternalRow(Array[Any](idx + 1)))).copy()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Column-API wrapper. */
object TopK {
  /** Top-k rows per key with an appended `rn` rank column. `orderBy` is
    * (columnName, descending). */
  def topKPerKey(df: DataFrame, keys: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    // make the strategy available regardless of how the session was built
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output.map(_.name)}"))
    val orders = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    val rank = AttributeReference("rn", IntegerType, nullable = false)()
    GraftColumnBridge.ofRows(spark,
      TopKPerKeyPlan(keys.map(attr), orders, k, rank, plan))
  }
}
