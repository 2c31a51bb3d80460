package org.apache.spark.sql.graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.util.collection.ExternalSorter

/** Bridge to core's `private[spark]` disk-spillable sorter.
  *
  * TopKPerGroup's degrade path (per-task heap state past its bound)
  * needs exactly what the stock window plan has: an external sort that
  * spills under memory pressure instead of OOMing. `ExternalSorter` is
  * that machinery (sortByKey's backend — task-memory-manager
  * integrated, shuffle-spill configured), but it is private[spark];
  * this shim lives in an org.apache.spark subpackage for the same
  * reason ColumnBridge does.
  */
object SpillBridge {

  /** Sort `rows` under `ord` with disk spill. Rows MUST already be
    * defensive copies — the sorter buffers references between spills.
    */
  def sortSpillable(ord: Ordering[UnsafeRow],
                    rows: Iterator[UnsafeRow]): Iterator[UnsafeRow] = {
    val context = TaskContext.get()
    val sorter = new ExternalSorter[UnsafeRow, Null, Null](
      context, aggregator = None, partitioner = None, ordering = Some(ord))
    sorter.insertAll(rows.map(r => (r, null)))
    context.addTaskCompletionListener[Unit](_ => sorter.stop())
    sorter.iterator.map(_._1)
  }
}
