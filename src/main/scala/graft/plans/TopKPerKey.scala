package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.IntegerType

/** Whole-operator custom plan: per-key top-k with a bounded heap.
  *
  * The DataFrame phrasing — row_number() over (partition by key order
  * by ...) <= k — sorts every key group in full; at 100 TB the sort
  * state is O(group size). This operator keeps only k rows per key
  * (O(keys * k) memory), the same trick TakeOrderedAndProject plays
  * globally, per key. Exact same output as the window phrasing
  * (deterministic total sort order required), verified by the c6
  * oracle and TopKPerKeySpec.
  *
  * Wiring: logical node + planner strategy (injected via
  * GraftExtensions) + physical exec with ClusteredDistribution on the
  * key, so EnsureRequirements inserts exactly one hash shuffle.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: AttributeReference,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Shared per-partition bounded-heap pass: one k-heap per key seen in
  * the partition (max-heap on the sort order — peek = worst kept). */
private[plans] object TopKHeaps {
  def build(it: Iterator[InternalRow], keyExprs: Seq[Expression],
            sortOrder: Seq[SortOrder], childOutput: Seq[Attribute],
            k: Int): java.util.HashMap[UnsafeRow,
              java.util.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(keyExprs, childOutput)
    val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .create(sortOrder, childOutput)
    val heaps = new java.util.HashMap[UnsafeRow,
      java.util.PriorityQueue[InternalRow]]()
    while (it.hasNext) {
      val row = it.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k + 1, ord.reversed())
        heaps.put(key.copy(), heap)
      }
      if (heap.size() < k) heap.offer(row.copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.offer(row.copy())
      }
    }
    heaps
  }
}

/** Pre-shuffle (map-side) stage: per input partition, keep only the k
  * best rows per key — no rank yet, no distribution demand. This is
  * partial aggregation's trick applied to top-k: the exchange above
  * it moves at most partitions*keys*k rows instead of the full scan.
  * Load-bearing for low-cardinality keys (b3/b16 partition by ntype —
  * 5 values), where the final stage otherwise funnels the whole input
  * into <=5 reducers. */
case class TopKPerKeyPartialExec(keys: Seq[Expression],
                                 order: Seq[SortOrder], k: Int,
                                 child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    child.execute().mapPartitions { it =>
      val heaps = TopKHeaps.build(it, keyExprs, sortOrder, childOutput, kk)
      val res = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { heap =>
        while (!heap.isEmpty) res += heap.poll()
      }
      res.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: AttributeReference,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  // Empty keys = global top-k (e.g. a rewritten global pagination
  // window): ClusteredDistribution(Nil) fails Spark's require, the
  // correct demand is all rows in one partition.
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val outAttrs = output
    child.execute().mapPartitions { it =>
      val heaps = TopKHeaps.build(it, keyExprs, sortOrder, childOutput, kk)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val res = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { heap =>
        val arr = new Array[InternalRow](heap.size())
        var i = arr.length - 1
        while (!heap.isEmpty) { arr(i) = heap.poll(); i -= 1 } // worst out first
        var r = 0
        while (r < arr.length) {
          val rankRow = new GenericInternalRow(Array[Any](r + 1))
          res += outProj(joined(arr(r), rankRow)).copy()
          r += 1
        }
      }
      res.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, rankAttr, child) =>
      // partial -> (exchange inserted by EnsureRequirements) -> final,
      // exactly like partial/final hash aggregation
      TopKPerKeyExec(keys, order, k, rankAttr,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** df -> df + `rankName` int column, keeping only the k best rows per
    * key under `orderBy` (which must be a deterministic total order
    * within a key).
    *
    * Self-joins of the result resolve when GraftExtensions is enabled:
    * [[DeduplicateTopKRanks]] regenerates the rank exprId on the right
    * side of a conflicting join (DeduplicateRelations only does this
    * for Spark's own attribute-producing nodes). Without the
    * extensions, break the lineage first (localCheckpoint). */
  def apply(df: DataFrame, keyCols: Seq[Column], orderBy: Seq[Column],
            k: Int, rankName: String = "rank"): DataFrame = {
    // Self-registering: works with or without GraftExtensions.
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKPerKeyStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerKeyStrategy
    val keys = keyCols.map(ColumnBridge.expression)
    val order = orderBy.map(c => ColumnBridge.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keys, order, k, rankAttr, ColumnBridge.logicalPlan(df)))
  }
}
