package graft

import org.apache.spark.sql.SparkSession

/** Solo per-query timer for targeted perf work: times each named query
  * min-of-5 on a warm JVM (full-inventory warm-up at sf0.001 first, the
  * Bench posture), with Bench's releaseState() hygiene between reps so
  * checkpointed blocks never accumulate across measurements.
  *
  *   runMain graft.SoloBench q_graph_pagerank,q_graph_triangles [sfDir]
  *
  * Unlike Bench (which measures the full-inventory alphabetical run —
  * the number the driver records), this isolates a handful of queries
  * for before/after comparisons while optimizing them; min-of-5 on a
  * fully-warm JVM is the steady-state number, free of the JIT-lag
  * windows SCALE.md §"Bench-noise root cause" documents.
  */
object SoloBench {

  def main(args: Array[String]): Unit = {
    val targets = args(0).split(",").map(_.trim).filter(_.nonEmpty)
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
        System.err.println(s"[solo] state release failed: ${e.getMessage}") }
    }

    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, warmDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[solo] warm-up $name failed: ${e.getMessage}") }
      releaseState()
    }

    targets.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        releaseState()
        dt
      }
      println(f"$name%-28s min=${times.min}%.3f  med=${times.sorted.apply(2)}%.3f  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
