package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Hot-vertex skew stress for the iterative graph family — the
  * round-14 directive. Every graph scale replica keeps per-vertex
  * degree CONSTANT by construction (disjoint per-copy key spaces), so
  * the measured slopes never met the 100 TB graph reality: power-law
  * degrees. This harness builds a SKEWED 10× replica — the balanced
  * 10× lineitem plus one synthetic hot part injected into ~1% of ALL
  * baskets across copies (a single co-purchase vertex whose degree is
  * 3-4 orders of magnitude above the median) — and measures each graph
  * query on balanced vs skewed input with per-task duration stats
  * (max-task / median-task ratio = the straggler number).
  *
  * Where the skew should and shouldn't bite, by plan shape:
  *  - `q_graph_triangles`: wedge generation is DEGREE-ORIENTED (each
  *    edge points from its (degree, id)-lower endpoint), so the hot
  *    vertex has ~zero out-edges and its O(deg²) wedge space is never
  *    enumerated — the orientation IS the skew treatment.
  *  - `q_graph_kcore` / `q_graph_degdist`: vertex-keyed counts are
  *    partial-aggregated map-side (the hot key arrives pre-combined),
  *    semi-joins never expand — bounded per-key work.
  *  - `q_graph_pagerank`: the contribution join fans the hot vertex's
  *    adjacency (deg rows) through one task per superstep — linear in
  *    deg, not deg², so elevated but bounded.
  *  - `q_graph_jaccard`: the common-neighbor closure expands N(a) per
  *    edge keyed on the canonical lower-ID endpoint — Σ_edges deg(a)
  *    lands deg(hot)² rows in ONE reduce task when the hot vertex is
  *    the expansion side. This is the query the directive predicts
  *    skews, and the min-degree orientation (expand the lower-DEGREE
  *    endpoint, the same treatment triangles already owns) is the fix
  *    this harness exists to validate.
  *
  * The hot part id (50,000,000) lives outside every per-copy key space
  * (copy i occupies i·1e8 + [0, ~2e5]), so the injection collides with
  * nothing; injected rows clone one existing lineitem row per selected
  * order with only l_partkey replaced, so the table schema and all
  * non-graph columns stay honest.
  *
  * Usage: runMain graft.SkewBench [sfDir] [pct] (default
  * /root/testdata/sf0.1, 1 — the hot part lands in ~pct% of baskets;
  * replicas under java.io.tmpdir — delete graft_scale10_skew* to
  * rebuild). Prints one JSON line: per query × {balanced, skewed} the
  * min-of-2 wall plus the straggler stats of the LAST rep.
  *
  * Measured (round 14): at pct=1 the hot vertex lands at degree 2360
  * (median 1) and NOTHING skews — support-2 thresholding sparsifies
  * the hot adjacency, the degree orientation caps triangles, partial
  * aggregation absorbs the hot keys, and jaccard's expansion task
  * stays inside the ambient max-task band. The straggler demonstration
  * needs pct≥5 (see SCALE.md §"Graph hot-vertex skew").
  */
object SkewBench {

  val HotPart = 50000000L

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val pct = if (args.length > 1) args(1).toInt else 1
    require(pct >= 1 && pct <= 50, s"pct=$pct out of range")
    val copies = if (args.length > 2) args(2).toInt else 10
    require(copies >= 2 && copies <= 100, s"copies=$copies out of range")
    val spark = ScaleBench.session()
    val tmp = System.getProperty("java.io.tmpdir")

    // Balanced replica: reuse ScaleBench's cached one when compatible
    // (same rule as Scale100Bench), else build a lineitem-only one.
    val dirFull = new java.io.File(tmp, s"graft_scale$copies")
    val balDir =
      if (ScaleBench.replicaCompatible(dirFull.getAbsolutePath, sfDir, copies, Set("lineitem")))
        dirFull.getAbsolutePath
      else {
        val d = new java.io.File(tmp, s"graft_scale${copies}_li").getAbsolutePath
        ScaleBench.buildTables(spark, sfDir, d, copies, Set("lineitem"))
        d
      }

    // Skewed: balanced lineitem ∪ one hot-part row per pct% of orders.
    val skewDir = new java.io.File(tmp,
      if (pct == 1 && copies == 10) "graft_scale10_skew"
      else s"graft_scale${copies}_skew$pct").getAbsolutePath
    val marker = new java.io.File(skewDir, "_built")
    // v2: selection is l_orderkey % 100 < pct, so the injection rate is
    // exactly pct% for ANY pct — the v1 form (% (100/pct) == 0) diverged
    // for non-divisors of 100 (pct=3 → 3.03%, pct=40 → 50%) while the
    // dir name and JSON were labeled by the requested pct (round-15 ADVICE)
    val sig = s"skew=v2 hot=$HotPart pct=$pct base=$balDir"
    if (!marker.exists() ||
        new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim != sig) {
      val li = spark.read.parquet(s"$balDir/lineitem.parquet")
      val hotRows = li.filter(pmod(col("l_orderkey"), lit(100)) < pct && col("l_linenumber") === 1)
        .withColumn("l_partkey", lit(HotPart))
      li.unionAll(hotRows).write.mode("overwrite").parquet(s"$skewDir/lineitem.parquet")
      java.nio.file.Files.write(marker.toPath,
        sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    // Per-task duration stats, listener-fed; drained before sampling so
    // attribution can't shift between reps (ListenerBridge rationale).
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) durations.add(t.taskInfo.duration)
    })
    def timedWithStats(n: String, d: String): (Double, Long, Long) = {
      val wall = ScaleBench.timeQuery(spark, n, d) // min-of-2, releases state
      org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
      durations.clear()
      // stats rep: one more run on the warm plan; its task set is the
      // one the straggler numbers describe
      SparkEntry.queries(n)(spark, d).count()
      org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val ds = {
        val it = durations.iterator(); val b = Seq.newBuilder[Long]
        while (it.hasNext) b += it.next(); b.result().sorted
      }
      val maxMs = if (ds.nonEmpty) ds.last else -1L
      val medMs = if (ds.nonEmpty) ds(ds.size / 2) else -1L
      (wall, maxMs, medMs)
    }

    // The skew fact itself: degree of the hot vertex vs the graph median.
    def degreeProfile(d: String): (Long, Long, Long) = {
      val edges = graft.operators.RelationalQueries.coPurchaseEdges(spark, d)
      val und = edges.select(col("a").as("u")).unionAll(edges.select(col("b").as("u")))
      val deg = und.groupBy("u").agg(count(lit(1)).as("dg"))
      val hot = deg.filter(col("u") === HotPart).select("dg").collect()
        .headOption.map(_.getLong(0)).getOrElse(0L)
      val Array(med) = deg.stat.approxQuantile("dg", Array(0.5), 0.0)
      val n = deg.count()
      (hot, med.toLong, n)
    }

    val names = Seq("q_graph_jaccard", "q_graph_triangles", "q_graph_pagerank", "q_graph_kcore")
    ScaleBench.warmup(spark, names)
    val (hotDeg, medDeg, nVerts) = degreeProfile(skewDir)

    val rows = names.map { n =>
      val (bw, bMax, bMed) = timedWithStats(n, balDir)
      val (sw, sMax, sMed) = timedWithStats(n, skewDir)
      (n, bw, bMax, bMed, sw, sMax, sMed)
    }
    val json = rows.map { case (n, bw, bMax, bMed, sw, sMax, sMed) =>
      f""""$n":{"bal_wall":$bw%.2f,"bal_max_task_ms":$bMax,"bal_med_task_ms":$bMed,""" +
        f""""skew_wall":$sw%.2f,"skew_max_task_ms":$sMax,"skew_med_task_ms":$sMed,""" +
        f""""skew_ratio":${if (sMed > 0) sMax.toDouble / sMed else -1.0}%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"graph_skew","copies":$copies,"hot_degree":$hotDeg,"median_degree":$medDeg,"n_vertices":$nVerts,"queries":$json}""")
    spark.stop()
  }
}
