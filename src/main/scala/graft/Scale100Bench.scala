package graft

import org.apache.spark.sql.SparkSession

/** A single 100× scale point for the three worst 10× slopes — the
  * round-11 verdict's residual #3: a 1×→10× span cannot distinguish
  * amortized fixed overhead (slope flattens toward linear as scale
  * grows) from a genuinely super-linear term (slope STEEPENS). One
  * 100× measurement of exactly those three queries settles it:
  *
  *  - `q_sink_rangeparts` (10× slope 3.2): real file I/O — bytes AND
  *    file count scale linearly (the pid = key div 1000 layout keeps
  *    rows-per-file constant), so the honest expectation is
  *    slope(10×→100×) ≈ 10 with the 1×→10× excess being fixed
  *    job/commit overhead amortizing away.
  *  - `q_assoc_rules` (3.1): basket-local pair explosion — pair volume
  *    is linear in baskets (disjoint per-copy part spaces), so linear.
  *  - `q_graph_jaccard` (2.8): triangle-through-edge closure — work is
  *    Σ_edges deg(a); disjoint per-copy graphs keep degrees constant,
  *    so edge volume (and work) is linear in copies.
  *
  * The 100× replica reuses ScaleBench's honesty rules (disjoint
  * per-copy key spaces via a 1e8 stride — 100 copies stay well inside
  * Long) and replicates ONLY the two tables these queries read
  * (orders, lineitem): a 100× copy of the full five-table set would
  * waste tens of minutes of build for inputs nothing here scans.
  *
  * Usage: runMain graft.Scale100Bench [sfDir]
  * (default /root/testdata/sf0.1; 10× at /tmp/graft_scale10 and 100×
  * at /tmp/graft_scale100 are built on demand — delete to rebuild).
  * Prints one JSON line with x1/x10/x100 wall seconds (min-of-2, warm
  * JVM, releaseState between reps) and both segment slopes.
  */
object Scale100Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKRewriteRule.register(spark)

    val tmp = System.getProperty("java.io.tmpdir")
    val dir10 = new java.io.File(tmp, "graft_scale10").getAbsolutePath
    val dir100 = new java.io.File(tmp, "graft_scale100").getAbsolutePath
    // the 10× point reuses ScaleBench's full replica (cached across
    // rounds); the 100× one carries only orders + lineitem
    ScaleBench.build(spark, sfDir, dir10)
    ScaleBench.buildTables(spark, sfDir, dir100, 100, Set("orders", "lineitem"))

    val names = Seq("q_sink_rangeparts", "q_assoc_rules", "q_graph_jaccard")
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())

    def time(n: String, d: String): Double = {
      val dts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        dt
      }
      dts.min
    }
    val rows = names.map { n =>
      (n, time(n, sfDir), time(n, dir10), time(n, dir100))
    }
    val json = rows.map { case (n, t1, t10, t100) =>
      f""""$n":{"x1":$t1%.2f,"x10":$t10%.2f,"x100":$t100%.2f,"slope10":${t10 / t1}%.1f,"slope100":${t100 / t10}%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_slope_100x","queries":$json}""")
    spark.stop()
  }
}
