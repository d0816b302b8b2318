package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan: bounded top-k per key.
  *
  * The declarative form — `row_number() OVER (PARTITION BY key ORDER BY o)
  * <= k` — plans as Window, which SORTS every key group in full
  * (O(n log n) per partition, spillable sort of the whole input) and only
  * then discards everything past rank k. For small k over huge groups
  * (reference shape: latest-2 reservations per category,
  * src/gomus/events.py:40-129) the sort is almost entirely wasted work.
  *
  * This operator keeps a bounded binary heap per key instead:
  *
  *  - `TopKPerKeyExec(partial = true)` runs BEFORE the shuffle and caps
  *    every (partition, key) at k rows — map-side pre-reduction, so the
  *    exchange moves O(partitions × keys × k) rows, not the full input
  *    (the same reason hash aggregation does partial combine).
  *  - The exchange is requested declaratively: the final exec's
  *    `requiredChildDistribution` is ClusteredDistribution(keys), and
  *    EnsureRequirements inserts the hash exchange — the operator
  *    composes with AQE like any built-in.
  *  - `TopKPerKeyExec(partial = false)` merges the per-partition
  *    survivors into the true per-key top k. Correct because topk is an
  *    idempotent, merge-decomposable reduction: topk(A ∪ B) =
  *    topk(topk(A) ∪ topk(B)).
  *
  * Memory is O(keys-per-partition × k) rows — the operator's documented
  * contract (same class of bound as hash aggregation state). Ordering
  * must be TOTAL (caller includes a unique tiebreak) for deterministic
  * results, same as every catalog window.
  *
  * Registered via `graft.functions.GraftFunctions.register`
  * (experimental.extraStrategies) and `GraftExtensions.
  * injectPlannerStrategy` — the SparkSessionExtensions route.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Public face: `TopK.perKey(df, keys, order, k)` — the order list is
  * (column, ascending) pairs and MUST be total (include a unique
  * tiebreak). */
object TopK {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}

  def perKey(df: DataFrame, keyCols: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val node = TopKPerKey(
      keyCols.map(UnresolvedAttribute(_)),
      order.map { case (c, asc) =>
        SortOrder(UnresolvedAttribute(c), if (asc) Ascending else Descending)
      },
      k, df.queryExecution.logical)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
  }
}

object TopKStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // Max-heap on the ordering: the heap head is the WORST retained
      // row, evicted when a better one arrives (for `orderBy(x.desc)`,
      // "better" = larger x; LazilyGeneratedOrdering already encodes
      // the direction, so worst = max under it).
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      rows.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(rowOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
