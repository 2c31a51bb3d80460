package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Bridge to core's `private[spark] var checkpointDir`.
  *
  * `SparkContext.setCheckpointDir` is one-way — there is no public
  * unset. Test suites that pin the RELIABLE-checkpoint behavior of
  * graft.Checkpoint consumers (GraphPassSpec's release-deletes-files
  * case) share one session with every other suite, so flipping the dir
  * on and never restoring it would silently switch ALL later
  * checkpoints in the JVM from local (executor-memory-speed) to
  * reliable (disk), changing their performance class and leaving
  * checkpoint dirs behind. This bridge restores the exact prior state.
  */
object CheckpointDirBridge {

  def get(sc: SparkContext): Option[String] = sc.getCheckpointDir

  /** Restore a previously-read value, including None (cleared). */
  def set(sc: SparkContext, dir: Option[String]): Unit =
    sc.checkpointDir = dir
}
