package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * plus the Tier A generator's throughput, printing one JSON line.
  *
  * A warm-up pass (same queries at sf0.001) runs first so the timed
  * numbers are steady-state — JIT, codegen caches, and parquet footer
  * reads otherwise land entirely on whichever query runs first.
  *
  * The generator benchmark mirrors the reference's published run
  * (10M rows of the 7-column flagship spec ≈ 529k rows/s on one core,
  * BASELINE.md): output is forced through the noop sink so every
  * column is actually computed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: run the whole inventory once at the smallest SF; fall
    // back to the bench dir itself when sf0.001 is absent. Failures are
    // logged, not swallowed — a silent no-op warm-up would push JIT and
    // codegen cost into whichever timed query runs first.
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, warmDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}") }
    }

    // failed queries report -1.0, never a fake duration — a regression
    // must be visible in the JSON, not summed into total as a fast run
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    // Generator throughput: flagship 7-column spec, 10M rows, noop sink.
    val genSpec = "key,bigint,int(11),varchar(50),double,date,bigint(20)"
    val genRows = 10000000L
    gen.SqloadGen.table(spark, genSpec, 100000, numPartitions = cpus.toInt)
      .write.format("noop").mode("overwrite").save() // gen warm-up
    val g0 = System.nanoTime()
    gen.SqloadGen.table(spark, genSpec, genRows, numPartitions = cpus.toInt)
      .write.format("noop").mode("overwrite").save()
    val genSec = (System.nanoTime() - g0) / 1e9
    val genRate = (genRows / genSec).toLong

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","gen_rows":$genRows,"gen_sec":$genSec,"gen_rows_per_sec":$genRate}""")
    spark.stop()
  }
}
