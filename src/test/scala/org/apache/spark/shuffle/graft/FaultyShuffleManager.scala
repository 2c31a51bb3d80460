package org.apache.spark.shuffle.graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.{SparkConf, SparkEnv, TaskContext}
import org.apache.spark.shuffle.{FetchFailedException, ShuffleHandle, ShuffleReader, ShuffleReadMetricsReporter}
import org.apache.spark.shuffle.sort.SortShuffleManager

/** A ShuffleManager that injects ONE `FetchFailedException` per shuffle
  * id while armed, otherwise delegating everything to the stock
  * SortShuffleManager. Test-only (TaskRetrySpec), installed via
  * `spark.shuffle.manager` at context construction; lives in an
  * org.apache.spark subpackage because SortShuffleManager is
  * private[spark] (the same reason sql.graft.ColumnBridge exists).
  *
  * This simulates the failure the open()-level injector cannot: loss of
  * an already-produced MAP OUTPUT after other reducers consumed it. On
  * the injected FetchFailed the DAGScheduler unregisters that map
  * output, resubmits the map stage, recomputes it, and reruns ONLY the
  * failed reduce partition — so the final result mixes reduce outputs
  * derived from the ORIGINAL map execution with ones derived from the
  * RECOMPUTE. If any map-side computation were nondeterministic, the
  * mix is silently inconsistent (the SPARK-23207 corruption class);
  * bit-identical fingerprints prove it is not.
  */
class FaultyShuffleManager(conf: SparkConf) extends SortShuffleManager(conf) {

  override def getReader[K, C](
      handle: ShuffleHandle,
      startMapIndex: Int,
      endMapIndex: Int,
      startPartition: Int,
      endPartition: Int,
      context: TaskContext,
      metrics: ShuffleReadMetricsReporter): ShuffleReader[K, C] = {
    val delegate = super.getReader[K, C](
      handle, startMapIndex, endMapIndex, startPartition, endPartition,
      context, metrics)
    // A shuffle with ZERO map tasks (empty-relation exchange) has no map
    // output 0 to lose — injecting there crashes the DAGScheduler's
    // removeMapOutput on an empty status array, not a retry path at all.
    // The handle's dependency.rdd is @transient (null when the reader
    // deserializes it), so ask the tracker — local mode means the Master
    // is in-process.
    val hasMapOutput = SparkEnv.get.mapOutputTracker match {
      case m: org.apache.spark.MapOutputTrackerMaster =>
        m.getNumAvailableOutputs(handle.shuffleId) > 0
      case _ => false
    }
    val first = FaultyShuffleManager.armed.get() && hasMapOutput &&
      FaultyShuffleManager.failedOnce
        .putIfAbsent(handle.shuffleId, java.lang.Boolean.TRUE) == null
    if (first) {
      new ShuffleReader[K, C] {
        override def read(): Iterator[Product2[K, C]] = {
          FaultyShuffleManager.injected.incrementAndGet()
          val bm = SparkEnv.get.blockManager.blockManagerId
          // mapIndex 0: the scheduler unregisters exactly map output 0
          // and recomputes it; completed sibling reduce partitions and
          // the other map outputs are reused — maximal original/
          // recomputed mixing.
          throw new FetchFailedException(
            bm, handle.shuffleId, -1L, 0, startPartition,
            "graft injected fetch failure (map output lost after production)")
        }
      }
    } else delegate
  }
}

object FaultyShuffleManager {
  val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
  val injected = new AtomicLong(0L)
  val failedOnce = new ConcurrentHashMap[Int, java.lang.Boolean]()

  /** Run `body` with one fetch failure injected per shuffle it runs. */
  def armedDuring[A](body: => A): A = {
    failedOnce.clear()
    armed.set(true)
    try body finally armed.set(false)
  }
}
