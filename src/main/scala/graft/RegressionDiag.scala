package graft

import org.apache.spark.sql.SparkSession

/** Bench-regression bisection harness (round-10 directive #1).
  *
  * BENCH_r09 showed q_dedup_minhash 0.81→1.38 s and q_attribution
  * 0.34→1.05 s with zero code change to either query. Both numbers come
  * from a 204-query alphabetical run in ONE JVM, so the regression is
  * either (a) intrinsic to the query (reproduces solo), or (b) an
  * interaction with the queries that ran before it (block-manager /
  * code-cache / GC state), or (c) harness noise min-of-2 fails to
  * suppress. This main separates the three:
  *
  *   runMain graft.RegressionDiag q_dedup_minhash [sfDir]
  *
  *  - phase SOLO: warm-up at sf0.001, then time the target 5× fresh.
  *  - phase PREFIX: run every inventory query alphabetically before the
  *    target once (same releaseState() hygiene as Bench), then time the
  *    target 5× again.
  *
  * Same session posture as Bench (TopKRewriteRule up front). If SOLO is
  * fast and PREFIX is slow, the slowdown is state the prefix leaves
  * behind; the executed-plan dumps (printed once per phase) show whether
  * the PLAN changed or only the runtime.
  */
object RegressionDiag {

  def main(args: Array[String]): Unit = {
    val target = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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

    def releaseState(): Unit = {
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      } catch { case e: Throwable =>
        System.err.println(s"[diag] state release failed: ${e.getMessage}") }
    }

    val fn = SparkEntry.queries(target)

    def timeN(label: String, n: Int): Unit = {
      val times = (0 until n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        releaseState()
        dt
      }
      val s = times.map(t => f"$t%.2f").mkString(" ")
      println(f"[diag] $label%-28s runs=[$s]  min=${times.min}%.3f")
    }

    def dumpPlan(label: String): Unit = {
      val df = fn(spark, sfDir)
      df.collect()
      println(s"===== executed plan ($label) =====")
      println(df.queryExecution.executedPlan.toString)
      releaseState()
    }

    // ---- phase SOLO ----
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    fn(spark, warmDir).count(); releaseState()
    dumpPlan("solo")
    timeN("SOLO", 5)

    // ---- phase PREFIX ----
    val prefix = SparkEntry.queries.toSeq.sortBy(_._1).takeWhile(_._1 != target)
    println(s"[diag] running ${prefix.size} prefix queries (warmup + timed, like Bench)")
    prefix.foreach { case (name, f) =>
      try f(spark, warmDir).count()
      catch { case e: Throwable => System.err.println(s"[diag] warm $name: ${e.getMessage}") }
      releaseState()
    }
    prefix.foreach { case (name, f) =>
      try { f(spark, sfDir).count(); f(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[diag] run $name: ${e.getMessage}") }
      releaseState()
    }
    dumpPlan("after-prefix")
    timeN("AFTER-PREFIX", 5)

    spark.stop()
  }
}
