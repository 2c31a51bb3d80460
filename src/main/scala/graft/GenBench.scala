package graft

import org.apache.spark.sql.SparkSession

/** SoloBench-style standalone for the two generator feeders — the
  * numbers `bench_vs_baseline` is derived from (noop-sink compute
  * throughput and end-to-end byte-parity CSV sink, 10M rows of the
  * flagship 7-column spec, same projections as graft.Bench).
  *
  * Round 12 measured a 1.7× same-code spread on the driver-run CSV
  * number (992k vs 1.69M rows/s) with no protocol to discriminate it;
  * this main is the discriminator: min-of-5 alternating reps
  * (gen, csv, gen, csv, ...) on a JVM warmed by a small run of each
  * feeder, with every rep printed — the steady-state envelope lives in
  * SCALE.md §"CSV-sink throughput envelope" and a driver-line number
  * outside it is ambient noise, not a generator regression.
  *
  *   runMain graft.GenBench
  */
object GenBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val genSpec = "key,bigint,int(11),varchar(50),double,date,bigint(20)"
    val genRows = 10000000L
    val csvDir = new java.io.File(System.getProperty("java.io.tmpdir"), "graft_genbench_csv")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }

    def genOnce(rows: Long): Double = {
      val t0 = System.nanoTime()
      gen.SqloadGen.table(spark, genSpec, rows, numPartitions = cpus.toInt)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def csvOnce(rows: Long): Double = {
      val t0 = System.nanoTime()
      gen.SqloadGen.textParity(
          gen.SqloadGen.table(spark, genSpec, rows, numPartitions = cpus.toInt))
        .write.mode("overwrite").option("header", "false").option("emptyValue", "")
        .csv(csvDir.getAbsolutePath)
      (System.nanoTime() - t0) / 1e9
    }

    try {
      genOnce(100000); csvOnce(100000) // warm both feeders' codegen paths
      val reps = (1 to 5).map(_ => (genOnce(genRows), csvOnce(genRows)))
      val (genReps, csvReps) = (reps.map(_._1), reps.map(_._2))
      def stats(ts: Seq[Double]) =
        (ts.min, ts.sorted.apply(ts.size / 2))
      val (gMin, gMed) = stats(genReps)
      val (cMin, cMed) = stats(csvReps)
      println(f"gen  min=${gMin}%.3f s (${(genRows / gMin / 1e6)}%.2f M rows/s)  " +
        f"med=${gMed}%.3f s  all=${genReps.map(t => f"$t%.2f").mkString(",")}")
      println(f"csv  min=${cMin}%.3f s (${(genRows / cMin / 1e6)}%.2f M rows/s)  " +
        f"med=${cMed}%.3f s  all=${csvReps.map(t => f"$t%.2f").mkString(",")}")
      println(s"""{"metric":"gen_solo","gen_rows":$genRows,""" +
        s""""gen_rps_min":${(genRows / gMin).toLong},"gen_rps_med":${(genRows / gMed).toLong},""" +
        s""""csv_rps_min":${(genRows / cMin).toLong},"csv_rps_med":${(genRows / cMed).toLong},""" +
        s""""gen_reps":${genReps.mkString("[", ",", "]")},"csv_reps":${csvReps.mkString("[", ",", "]")}}""")
    } finally {
      if (csvDir.exists()) rm(csvDir)
      spark.stop()
    }
  }
}
