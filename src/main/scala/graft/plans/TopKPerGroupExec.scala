package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.SpillBridge

/** Shared bounded-heap builder for both physical stages: one k-row
  * max-heap per group key, keeping the k least rows under `orderExprs`
  * (for DESC orders SortOrder reverses the comparison, so "least" is
  * the top of the ranking). Rows and keys are copied out of the
  * columnar/unsafe buffers they arrive in — heap entries outlive the
  * iterator step.
  *
  * MEMORY HONESTY: the heap map is in-task memory with no spill, so
  * `build` takes a cap on NET retained rows (≥ group count, since every
  * group retains ≥ 1 row). When adding one more retained row would pass
  * the cap, building stops and the result carries the un-consumed
  * remainder — each stage then degrades to a plan that cannot OOM
  * (pass-through for the partial stage, disk-spillable sort + streaming
  * rank for the final stage) instead of growing without bound on
  * adversarial group cardinality.
  */
private[plans] object TopKHeaps {

  type Heap = java.util.PriorityQueue[UnsafeRow]

  /** heaps = groups built under the cap; degraded = cap was hit;
    * rest = un-heaped remainder (first row already a defensive copy).
    */
  final class BuildResult(
      val heaps: java.util.HashMap[UnsafeRow, Heap],
      val degraded: Boolean,
      val rest: Iterator[InternalRow])

  def build(iter: Iterator[InternalRow], groupExprs: Seq[Expression],
            orderExprs: Seq[SortOrder], k: Int, inputAttrs: Seq[Attribute],
            maxRetained: Int): BuildResult = {
    val keyProj = UnsafeProjection.create(groupExprs, inputAttrs)
    val rowProj = UnsafeProjection.create(inputAttrs, inputAttrs)
    val ord = RowOrdering.create(orderExprs, inputAttrs)
    // max-heap: peek() is the WORST retained row under the ranking
    val cmp = new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
    }
    val heaps = new java.util.HashMap[UnsafeRow, Heap]()
    var retained = 0
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        if (retained >= maxRetained) {
          return new BuildResult(heaps, true,
            Iterator.single(rowProj(row).copy(): InternalRow) ++ iter)
        }
        // capacity grows on demand: a huge k ("effectively unlimited"
        // top-k) must not eagerly allocate a k-slot array per group
        heap = new java.util.PriorityQueue[UnsafeRow](math.min(k, 16), cmp)
        heaps.put(key.copy(), heap)
      }
      if (heap.size() < k) {
        if (retained >= maxRetained) {
          return new BuildResult(heaps, true,
            Iterator.single(rowProj(row).copy(): InternalRow) ++ iter)
        }
        heap.add(rowProj(row).copy())
        retained += 1
      } else if (ord.compare(row, heap.peek()) < 0) {
        // replacement: no net growth, never triggers the cap
        heap.poll()
        heap.add(rowProj(row).copy())
      }
    }
    new BuildResult(heaps, false, Iterator.empty)
  }
}

/** Map-side stage: per input partition, reduce each group to ≤ k rows.
  * No distribution requirement — this is the partial-aggregation
  * analogue, and the whole point: the exchange above only ever sees
  * pre-filtered rows.
  *
  * Degrade path: the partial heaps are a pure OPTIMIZATION (they drop
  * rows provably outside their group's top-k); past the retained-rows
  * cap the stage emits what it heaped plus the remainder un-filtered —
  * still correct, memory bounded by the cap, and the final stage does
  * the real work.
  */
case class TopKPerGroupPartialExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // per-partition transform: rows never move, so the child's
  // partitioning survives — without this override SparkPlan defaults to
  // UnknownPartitioning and EnsureRequirements inserts a redundant
  // exchange between the partial and final stages whenever the child
  // was already clustered (e.g. below an upstream window)
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, attrs) = (groupExprs, orderExprs, k, child.output)
    val maxRetained = TopKRewriteRule.maxRetained(conf)
    child.execute().mapPartitions { iter =>
      val res = TopKHeaps.build(iter, g, o, kk, attrs, maxRetained)
      val heaped = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      res.heaps.values().forEach(h => h.forEach(r => heaped += r))
      heaped.iterator ++ res.rest
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupPartialExec =
    copy(child = newChild)
}

/** Reduce-side stage: requires clustering on the group keys (planner
  * inserts the hash exchange), merges the partial heaps, sorts each
  * group's ≤ k survivors, and emits them with the 1-based `rn` rank.
  *
  * Degrade path: past the retained-rows cap the stage falls back to
  * what the stock window plan would have done on this partition — an
  * EXTERNAL (disk-spillable) sort by (group keys, order keys) over the
  * already-heaped rows plus the remainder, then one streaming pass that
  * ranks within each group run and drops rank > k. Same results, spill
  * instead of OOM, and the fast heap path is untouched below the cap.
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

  // group-local heap merge: rows never cross partitions, so the
  // planner-inserted clustering below survives — downstream operators
  // keyed on (a subset of) the group keys must NOT re-shuffle
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    // empty grouping = one global group: like grouped aggregation's final
    // stage, all (pre-filtered, ≤k-per-partition) rows must meet on a
    // single partition or each partition would emit its own "global" top-k
    if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, attrs, outAttrs) = (groupExprs, orderExprs, k, child.output, output)
    val maxRetained = TopKRewriteRule.maxRetained(conf)
    child.execute().mapPartitions { iter =>
      import scala.jdk.CollectionConverters._
      val res = TopKHeaps.build(iter, g, o, kk, attrs, maxRetained)
      val ord = RowOrdering.create(o, attrs)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rnRow = new GenericInternalRow(1)
      if (!res.degraded) {
        res.heaps.values().iterator().asScala.flatMap { heap =>
          val rows = heap.toArray(new Array[UnsafeRow](heap.size()))
          java.util.Arrays.sort(rows, ord)
          rows.iterator.zipWithIndex.map { case (r, i) =>
            rnRow.update(0, i + 1)
            resultProj(joined(r, rnRow))
          }
        }
      } else {
        val rowProj = UnsafeProjection.create(attrs, attrs)
        val keyProj = UnsafeProjection.create(g, attrs)
        // group keys ascending first (any consistent direction groups
        // runs), then the ranking order within each run
        val fullOrd = RowOrdering.create(
          g.map(SortOrder(_, Ascending)) ++ o, attrs)
        val uord: Ordering[UnsafeRow] = new Ordering[UnsafeRow] {
          override def compare(a: UnsafeRow, b: UnsafeRow): Int = fullOrd.compare(a, b)
        }
        val heaped = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
        res.heaps.values().forEach(h => h.forEach(r => heaped += r))
        val all = heaped.iterator ++ res.rest.map(r => rowProj(r).copy())
        var curKey: UnsafeRow = null
        var rank = 0
        SpillBridge.sortSpillable(uord, all).flatMap { r =>
          val key = keyProj(r)
          if (curKey == null || key != curKey) { curKey = key.copy(); rank = 1 }
          else rank += 1
          if (rank <= kk) {
            rnRow.update(0, rank)
            Some(resultProj(joined(r, rnRow)))
          } else None
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupFinalExec =
    copy(child = newChild)
}
