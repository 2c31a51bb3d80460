package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint-cost accounting for the graph family at scale — the
  * round-14 verdict's directive #5. The 100× skew runs showed balanced
  * max-tasks of 13–32 s that are edge-derivation/checkpoint WRITE
  * tasks, not hot keys: at 100 TB the graph family's real bottleneck is
  * that all five gated graph queries re-derive and re-checkpoint the
  * SAME co-purchase edge table. This main prices that, at the 100×
  * lineitem replica:
  *
  *   1. the edge derivation alone, with and without the checkpoint —
  *      the checkpoint WRITE share and the materialized block bytes
  *      (RDD storage info right after the eager localCheckpoint);
  *   2. each gated graph query as shipped (own derivation, min-of-2);
  *   3. the five post-edge bodies (`RelationalQueries.*Of`, the exact
  *      code the gated entries compose) fed from ONE shared
  *      checkpointed edge table — derive once, read five times.
  *
  * The before/after delta is the per-PASS saving a deployment gets by
  * materializing the edge table once (a user-level decision: the gated
  * entries stay independent because the driver contract runs each query
  * standalone and Bench's release discipline drops cross-query state by
  * design — the shared-edge recipe is the documented deployment form,
  * measured here, not a hidden cross-query cache).
  *
  * Usage: runMain graft.GraphCkptBench [sfDir] [copies]
  * Prints one JSON line; SCALE.md §"Graph checkpoint accounting" reads it.
  */
object GraphCkptBench {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 100
    val spark = ScaleBench.session()
    val tmp = System.getProperty("java.io.tmpdir")

    // reuse the Scale100Bench replica when compatible, else build a
    // lineitem-only one (coPurchaseEdges reads only lineitem)
    val full = new java.io.File(tmp, s"graft_scale$copies")
    val dir =
      if (ScaleBench.replicaCompatible(full.getAbsolutePath, sfDir, copies, Set("lineitem")))
        full.getAbsolutePath
      else {
        val d = new java.io.File(tmp, s"graft_scale${copies}_li").getAbsolutePath
        ScaleBench.buildTables(spark, sfDir, d, copies, Set("lineitem"))
        d
      }

    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def storageBytes(): (Long, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
    }
    import operators.RelationalQueries._

    // warm-up: compile every plan family once before anything is timed
    coPurchaseEdges(spark, sfDir).count()
    val warmE = coPurchaseEdges(spark, sfDir).transform(graft.Checkpoint.apply)
    Seq[DataFrame => DataFrame](graphCounts, pagerankOf, jaccardOf, degdistOf, kcoreOf)
      .foreach(f => f(warmE).count())
    release()

    def minOf2(body: => Unit): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); body
      val dt = (System.nanoTime() - t0) / 1e9
      release(); dt
    }.min

    // 1. derivation cost, with/without the eager checkpoint; block
    // bytes sampled INSIDE the rep (before release drops them)
    val deriveNoCkpt = minOf2 { coPurchaseEdges(spark, dir).count() }
    var ckptMem = -1L; var ckptDisk = -1L; var nEdges = -1L
    val deriveCkpt = minOf2 {
      val e = coPurchaseEdges(spark, dir).transform(graft.Checkpoint.apply)
      nEdges = e.count()
      val (m, dsk) = storageBytes(); ckptMem = m; ckptDisk = dsk
    }
    val writeShare = if (deriveCkpt > 0) (deriveCkpt - deriveNoCkpt) / deriveCkpt else -1.0

    // 2. the gated queries as shipped (each derives + checkpoints)
    val gated = Seq("q_graph_triangles", "q_graph_pagerank", "q_graph_jaccard",
      "q_graph_degdist", "q_graph_kcore")
    val own = gated.map { n => n -> ScaleBench.timeQuery(spark, n, dir) }

    // 3. derive once, feed all five post-edge bodies — since round 16
    // measured THROUGH the shipped product surface
    // (graft.functions.GraphPass, the promotion of this recipe;
    // GraphPassSpec pins result-identity with the gated queries).
    // Min-of-2 over the WHOLE pass (construction runs the derivation
    // job — GraphPass checkpoints eagerly — so it is inside the
    // measured wall, honestly)
    var sharedPer: Seq[(String, Double)] = Nil
    val sharedTotal = minOf2 {
      val pass = functions.GraphPass.coPurchase(spark, dir)
      sharedPer = pass.all.map { case (n, df) =>
        val t0 = System.nanoTime()
        df.count()
        n -> (System.nanoTime() - t0) / 1e9
      }
    }
    val ownTotal = own.map(_._2).sum

    import java.util.Locale.ROOT
    def f2(d: Double) = "%.2f".formatLocal(ROOT, d)
    val ownJson = own.map { case (n, t) => s""""$n":${f2(t)}""" }.mkString("{", ",", "}")
    val sharedJson = sharedPer.map { case (n, t) => s""""$n":${f2(t)}""" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"graph_ckpt","copies":$copies,"n_edges":$nEdges,""" +
        s""""derive_sec":${f2(deriveNoCkpt)},"derive_ckpt_sec":${f2(deriveCkpt)},""" +
        s""""ckpt_write_share":${f2(writeShare)},"ckpt_mem_mb":${f2(ckptMem / 1e6)},"ckpt_disk_mb":${f2(ckptDisk / 1e6)},""" +
        s""""own":$ownJson,"own_total":${f2(ownTotal)},""" +
        s""""shared":$sharedJson,"shared_total":${f2(sharedTotal)}}""")
    spark.stop()
  }
}
