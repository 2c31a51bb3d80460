package graft

import org.apache.spark.sql.SparkSession

/** Standalone calibration-probe runner: measures the fixed probe workload
  * (`Bench.probeOnce` — 4M-row hash-agg, constant by construction) 15
  * times on a warmed JVM and prints the series. Used to establish and
  * re-check the steady-state envelope pinned in SCALE.md §"Calibration
  * probe"; `graft.Bench` stamps three min-of-3 readings of the same
  * workload into BENCH_FULL.json (`probe_sec`) so any run's host window
  * is priced against that envelope from the artifact alone.
  */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach(_ => Bench.probeOnce(spark, cpus)) // JIT warm-up
    val reps = (1 to 15).map(_ => Bench.probeOnce(spark, cpus))
    // the IO probe (round 15 — the page-cache/disk axis the CPU probe
    // is blind to): fewer reps, it is ~5× heavier per rep
    Bench.probeIoOnce(spark) // warm-up
    val ioReps = (1 to 7).map(_ => Bench.probeIoOnce(spark))
    val load = Bench.readLoadavg()
    spark.stop()
    val sorted = reps.sorted
    val ioSorted = ioReps.sorted
    import java.util.Locale.ROOT
    val repsJson = reps.map("%.4f".formatLocal(ROOT, _)).mkString("[", ",", "]")
    val ioRepsJson = ioReps.map("%.4f".formatLocal(ROOT, _)).mkString("[", ",", "]")
    println(s"""{"probe_reps":$repsJson,"min":${"%.4f".formatLocal(ROOT, sorted.head)},"med":${"%.4f".formatLocal(ROOT, sorted(reps.size / 2))},"probe_io_reps":$ioRepsJson,"io_min":${"%.4f".formatLocal(ROOT, ioSorted.head)},"io_med":${"%.4f".formatLocal(ROOT, ioSorted(ioReps.size / 2))},"cpus":$cpus,"loadavg":$load}""")
  }
}
