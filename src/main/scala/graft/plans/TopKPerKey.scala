package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator (SURVEY.md §2.12 custom-operator
  * tier (c): LogicalPlan + SparkStrategy + SparkPlan).
  *
  * The stock formulation — `row_number() OVER (PARTITION BY k ORDER BY o)`
  * then `rank <= k` — shuffles EVERY row of the table before discarding all
  * but k per key. This operator keeps a bounded heap per key inside each map
  * partition (partial top-k), so at most k rows per (key, partition) reach
  * the exchange, then finishes with an exact per-key top-k after clustering.
  * At 100 TB that turns a full-table shuffle into a shuffle of ~k × |keys| ×
  * |partitions| rows — the same partial/final shape as hash aggregation.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

abstract class TopKPerKeyExecBase extends UnaryExecNode {
  def keys: Seq[Expression]
  def order: Seq[SortOrder]
  def k: Int

  override def output: Seq[Attribute] = child.output

  /** Bounded per-key heaps over one partition's rows. The heap's max (per
    * `order`) sits on top for eviction, so it always holds the best k. */
  protected def partitionTopK(iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, child.output)
    val ord = RowOrdering.create(order, child.output)
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val key = keyProj(row)
      val heap = heaps.get(key) match {
        case Some(h) => h
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), h)
          h
      }
      if (heap.size < k) heap.enqueue(row.copy())
      else if (ord.compare(row, heap.head) < 0) {
        heap.dequeue()
        heap.enqueue(row.copy())
      }
    }
    heaps.valuesIterator.flatMap(_.iterator)
  }
}

/** Map-side partial top-k: no distribution requirement, emits ≤ k rows per
  * (key, partition). */
case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends TopKPerKeyExecBase {
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(partitionTopK)
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Reduce-side exact top-k: requires all rows of a key in one partition
  * (EnsureRequirements inserts the hash exchange). */
case class TopKPerKeyFinalExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends TopKPerKeyExecBase {
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning match {
    case p if p.numPartitions > 0 => p
    case _ => UnknownPartitioning(0)
  }
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(partitionTopK)
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyFinalExec(keys, order, k,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Public API: top `k` rows per `keyCols`, "top" defined by `orderBy`
    * (column name, ascending?) with key+order tie-breaks supplied by the
    * caller for determinism. */
  def apply(df: DataFrame, keyCols: Seq[String], orderBy: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    GraftShim.addStrategy(spark, TopKStrategy)
    val keys = keyCols.map(c => UnresolvedAttribute.quoted(c))
    val order = orderBy.map { case (c, asc) =>
      SortOrder(UnresolvedAttribute.quoted(c), if (asc) Ascending else Descending)
    }
    GraftShim.ofRows(spark,
      TopKPerKeyNode(keys, order, k, df.queryExecution.analyzed))
  }
}
