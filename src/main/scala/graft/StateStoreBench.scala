package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HDFS-backed vs RocksDB state store cost measurement (round-11
  * follow-through on the RocksDB posture switch): RocksDbStateSpec
  * proves the two providers are bit-identical on the custom-state
  * streams; this main measures what the RocksDB posture costs at test
  * scale, which is the number an operator wants before flipping the
  * provider on a real deployment. (At 100 TB the comparison inverts:
  * the HDFS-backed provider keeps every key's state on executor heap
  * and starts GC-thrashing/OOMing long before RocksDB's native
  * memtable+SST tiering notices — this bench documents the small-state
  * regime where the JVM map is naturally faster, so the posture choice
  * is about state SIZE, not per-batch speed.)
  *
  *   runMain graft.StateStoreBench [sfDir]
  *
  * Times three custom-state streams (sessionize, debounce, LOCF — the
  * original RocksDbStateSpec set) plus — round 12 — the stream-stream
  * interval join, which buffers BOTH input sides in the store and so
  * carries the largest state of any operator in the tier (the most
  * provider-sensitive data point this inventory can produce). All run
  * to completion over the single-batch file source, min-of-2 per
  * provider, warm JVM, plus the on-disk state checkpoint size per
  * provider.
  */
object StateStoreBench {

  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

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

    def mkStreams(d: String): Seq[(String, () => DataFrame)] = Seq(
      "sessionize" -> (() => streaming.Sessionize.sessionsOfStream(
        streaming.EventsStreaming.eventsStream(spark, d)
          .selectExpr("user_id", "ts", "value"))),
      "debounce"   -> (() => streaming.DebounceStream.survivors(spark, d)),
      "locf"       -> (() => streaming.LocfStream.fills(spark, d)),
      "ss_join"    -> (() => streaming.EventsStreaming.viewPurchaseJoin(spark, d)))
    val streams = mkStreams(sfDir)

    def du(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }

    /** One run to completion in a memory sink with a throwaway
      * checkpoint; returns (seconds, state bytes).
      */
    def once(name: String, mk: () => DataFrame): (Double, Long) = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"ssb_$name").toFile
      val t0 = System.nanoTime()
      val q = mk().writeStream.outputMode("append").format("memory")
        .queryName(s"ssb_$name").option("checkpointLocation", ckpt.getAbsolutePath)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      val bytes = du(new java.io.File(ckpt, "state"))
      spark.sql(s"DROP VIEW IF EXISTS ssb_$name")
      rm(ckpt)
      (dt, bytes)
    }

    def withProvider[A](provider: Option[String])(body: => A): A = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      provider match {
        case Some(p) => spark.conf.set(key, p)
        case None    => spark.conf.unset(key)
      }
      try body
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }

    // warm-up both providers at the smallest SF
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    Seq(None, Some(Rocks)).foreach { p =>
      withProvider(p) {
        mkStreams(warmDir).foreach { case (n, mk) => once(s"warm_$n", mk) }
      }
    }

    streams.foreach { case (name, mk) =>
      val (hSec, hBytes) = withProvider(None) {
        val a = once(name, mk); val b = once(name, mk)
        (math.min(a._1, b._1), a._2)
      }
      val (rSec, rBytes) = withProvider(Some(Rocks)) {
        val a = once(name, mk); val b = once(name, mk)
        (math.min(a._1, b._1), a._2)
      }
      println(f"[state] $name%-12s hdfs=${hSec}%.2fs (${hBytes / 1e6}%.1f MB)  " +
        f"rocksdb=${rSec}%.2fs (${rBytes / 1e6}%.1f MB)  ratio=${rSec / hSec}%.2f")
    }
    spark.stop()
  }
}
