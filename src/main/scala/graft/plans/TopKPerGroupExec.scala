package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Shared bounded-heap builder for both physical stages: one k-row
  * max-heap per group key, keeping the k least rows under `orderExprs`
  * (for DESC orders SortOrder reverses the comparison, so "least" is
  * the top of the ranking). Rows and keys are copied out of the
  * columnar/unsafe buffers they arrive in — heap entries outlive the
  * iterator step.
  */
private[plans] object TopKHeaps {

  type Heap = java.util.PriorityQueue[UnsafeRow]

  def build(iter: Iterator[InternalRow], groupExprs: Seq[Expression],
            orderExprs: Seq[SortOrder], k: Int, inputAttrs: Seq[Attribute])
    : java.util.HashMap[UnsafeRow, Heap] = {
    val keyProj = UnsafeProjection.create(groupExprs, inputAttrs)
    val rowProj = UnsafeProjection.create(inputAttrs, inputAttrs)
    val ord = RowOrdering.create(orderExprs, inputAttrs)
    // max-heap: peek() is the WORST retained row under the ranking
    val cmp = new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
    }
    val heaps = new java.util.HashMap[UnsafeRow, Heap]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        // capacity grows on demand: a huge k ("effectively unlimited"
        // top-k) must not eagerly allocate a k-slot array per group
        heap = new java.util.PriorityQueue[UnsafeRow](math.min(k, 16), cmp)
        heaps.put(key.copy(), heap)
      }
      if (heap.size() < k) heap.add(rowProj(row).copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.add(rowProj(row).copy())
      }
    }
    heaps
  }
}

/** Map-side stage: per input partition, reduce each group to ≤ k rows.
  * No distribution requirement — this is the partial-aggregation
  * analogue, and the whole point: the exchange above only ever sees
  * pre-filtered rows.
  */
case class TopKPerGroupPartialExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, attrs) = (groupExprs, orderExprs, k, child.output)
    child.execute().mapPartitions { iter =>
      val heaps = TopKHeaps.build(iter, g, o, kk, attrs)
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach(h => h.forEach(r => out += r))
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupPartialExec =
    copy(child = newChild)
}

/** Reduce-side stage: requires clustering on the group keys (planner
  * inserts the hash exchange), merges the partial heaps, sorts each
  * group's ≤ k survivors, and emits them with the 1-based `rn` rank.
  */
case class TopKPerGroupFinalExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rnAttr: AttributeReference,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    // empty grouping = one global group: like grouped aggregation's final
    // stage, all (pre-filtered, ≤k-per-partition) rows must meet on a
    // single partition or each partition would emit its own "global" top-k
    if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, attrs, outAttrs) = (groupExprs, orderExprs, k, child.output, output)
    child.execute().mapPartitions { iter =>
      import scala.jdk.CollectionConverters._
      val heaps = TopKHeaps.build(iter, g, o, kk, attrs)
      val ord = RowOrdering.create(o, attrs)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rnRow = new GenericInternalRow(1)
      heaps.values().iterator().asScala.flatMap { heap =>
        val rows = heap.toArray(new Array[UnsafeRow](heap.size()))
        java.util.Arrays.sort(rows, ord)
        rows.iterator.zipWithIndex.map { case (r, i) =>
          rnRow.update(0, i + 1)
          resultProj(joined(r, rnRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupFinalExec =
    copy(child = newChild)
}
