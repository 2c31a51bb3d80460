package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncation checkpoint with the cluster-grade escape hatch.
  *
  * The iterative (Pregel-posture) queries — connected components,
  * pagerank, k-core, the per-round graph survivor sets — MUST truncate
  * lineage each superstep or the plan tree grows with the iteration
  * count. `localCheckpoint(eager = true)` does that at executor-memory
  * speed, but its blocks live only in executor storage: on a real
  * 1000-executor run, losing ANY executor makes those blocks
  * unrecoverable (the lineage needed to recompute them was truncated by
  * design) and the job dies. Spark documents exactly this trade.
  *
  * This helper keeps the local fast path for single-JVM dev/bench runs
  * and switches to RELIABLE `checkpoint()` — blocks persisted to the
  * checkpoint directory, recoverable across executor loss — whenever a
  * checkpoint dir is configured:
  *
  *   - `SparkContext.setCheckpointDir(...)` set by the application, or
  *   - conf `spark.checkpoint.dir`, adopted on first use here (a plain
  *     conf key survives spark-submit --conf, which is how a cluster
  *     job would flip the switch without code changes).
  *
  * Call sites opt in via `.transform(Checkpoint.apply)` wherever they
  * previously called `.localCheckpoint(true)` — same eager semantics,
  * same truncated lineage, different durability class.
  *
  * RELIABLE-PATH DISK HYGIENE: `checkpoint()` data is never deleted by
  * default — Spark only cleans superseded checkpoints when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (GC-driven,
  * off by default). The iterative call sites here checkpoint every
  * round (connected components, k-core, BpeTrainer every 16 merges),
  * so a long cluster run MUST set that flag alongside
  * `spark.checkpoint.dir`, or the checkpoint dir grows without bound:
  *
  *   --conf spark.checkpoint.dir=hdfs://.../ckpt \
  *   --conf spark.cleaner.referenceTracking.cleanCheckpoints=true
  *
  * (Cleanup is tied to DataFrame GC on the driver, so superseded
  * rounds are reclaimed as the loop's old references die.)
  */
object Checkpoint {

  def apply(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      sc.getConf.getOption("spark.checkpoint.dir").foreach(sc.setCheckpointDir)
    }
    if (sc.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(true)
  }
}
