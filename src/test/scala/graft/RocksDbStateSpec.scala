package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.EventsStreaming

/** Streaming keyed state on the RocksDB state store provider — the
  * 100 TB posture (round-10 verdict residual #2). The default
  * HDFSBackedStateStoreProvider keeps every key's state on the JVM
  * heap of its executor; at 100 TB keyed state (per-user sessions,
  * bursts, carries over an unbounded user population) that heap
  * residency is the wrong posture — RocksDB spills keyed state to
  * local disk with bounded memory, which is why it is the production
  * default for large stateful pipelines. The switch is pure config
  * (`spark.sql.streaming.stateStore.providerClass`); these tests prove
  * the three custom-state operator families (sessionize, debounce,
  * LOCF carry) produce BIT-IDENTICAL results under it, including
  * cross-batch state chaining, and that the provider actually engaged
  * (the checkpoint's state dir carries RocksDB zip/changelog
  * artifacts, never the HDFS provider's .delta files).
  */
class RocksDbStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Runs `body` with the RocksDB provider set, restoring the prior
    * provider after — suites share one JVM/session, so the conf must
    * not leak into StreamingSpec's HDFS-backed runs.
    */
  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Append-mode run to completion with an explicit checkpoint dir;
    * asserts the state directory holds RocksDB artifacts.
    */
  private def runAppend(df: DataFrame, name: String): DataFrame = {
    val ckpt = java.nio.file.Files.createTempDirectory(s"rocksckpt_$name").toFile
    val q = df.writeStream.outputMode("append").format("memory")
      .queryName(name).option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val state = new java.io.File(ckpt, "state")
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
      else Seq(f.getName)
    val files = walk(state)
    assert(files.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"no RocksDB snapshot/changelog artifacts under $state — provider did not engage: $files")
    assert(!files.exists(_.endsWith(".delta")),
      s"HDFS-backed .delta files under $state — provider did not engage: $files")
    spark.table(name)
  }

  private def writeReplayFile(dir: java.io.File, df: DataFrame,
                              name: String, modMs: Long): Unit = {
    val stage = new java.io.File(dir, s"_stage_$name")
    df.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
    val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
    val target = new java.io.File(dir, s"$name.parquet")
    java.nio.file.Files.move(part.toPath, target.toPath)
    target.setLastModified(modMs)
    stage.listFiles().foreach(_.delete()); stage.delete()
  }

  test("RocksDB: streaming LOCF imputation == batch window fill, bitwise") {
    val streamed = withRocksDb {
      runAppend(streaming.LocfStream.fills(spark, sf), "r_locf")
    }.select("event_id", "user_id", "tus", "was_missing", "v_filled")
    val batch = operators.TimeWindowQueries.queries("q_impute_locf")(spark, sf)
      .select("event_id", "user_id", "tus", "was_missing", "v_filled")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("RocksDB: streaming debounce across 3 micro-batches == batch keep-first-per-burst, bitwise") {
    // StreamingSpec's multi-batch replay protocol, under RocksDB:
    // bursts straddle the time-split cut and must chain through
    // RocksDB-resident state; the far-future sentinel (user -1) pushes
    // the watermark so event-time timeouts flush every real burst.
    import org.apache.spark.sql.functions._
    val cols = Seq("event_id", "user_id", "event_type", "tus", "burst_n")
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
    val Array(cutUs, maxUs) = ev
      .agg(percentile_approx(unix_micros(col("ts")), lit(0.5), lit(100)),
        max(unix_micros(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val dir = java.nio.file.Files.createTempDirectory("rocks_debounce").toFile
    val t0 = System.currentTimeMillis() - 60000
    writeReplayFile(dir, ev.filter(unix_micros(col("ts")) < cutUs), "b1", t0)
    writeReplayFile(dir, ev.filter(unix_micros(col("ts")) >= cutUs), "b2", t0 + 10000)
    val sentinel = ev.limit(1).select(lit(-1L).as("user_id"),
      lit("view").as("event_type"), lit(-1L).as("event_id"),
      timestamp_micros(lit(maxUs + 46800000000L)).as("ts")) // +13 h
    writeReplayFile(dir, sentinel, "b3", t0 + 20000)
    val src = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)
    val streamed = withRocksDb {
      runAppend(streaming.DebounceStream.survivorsOf(src), "r_debounce")
    }.select(cols.head, cols.tail: _*)
    val batch = operators.TimeWindowQueries.queries("q_win_debounce")(spark, sf)
      .select(cols.head, cols.tail: _*)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("RocksDB: the late-purchase PIT guard holds across provider-resident state") {
    // The round-11 emit guard (a cross-batch late purchase must not
    // read a carried slot from its own future) exercised with the
    // carried state living in RocksDB — guards that compare carried
    // fields are exactly the code that breaks if a provider swap
    // mangles state round-tripping.
    import org.apache.spark.sql.functions._
    val T = 1700000000000000L
    def m(min: Long): Long = T + min * 60000000L
    val dir = java.nio.file.Files.createTempDirectory("rocks_latep").toFile
    val t0 = System.currentTimeMillis() - 60000
    def batch(name: String, mod: Long, rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
      import spark.implicits._
      writeReplayFile(dir,
        rows.toDF("user_id", "us", "event_id", "event_type", "value")
          .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
            col("event_id"), col("event_type"), col("value")),
        name, mod)
    }
    batch("b1", t0, Seq((70L, m(10), 2L, "view", 2.0)))
    batch("b2", t0 + 10000, Seq((70L, m(2), 1L, "purchase", 7.5))) // late purchase
    def src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, event_type STRING, value DOUBLE"))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)
    val (pit, attr) = withRocksDb {
      (runAppend(streaming.PitStream.featuresOf(src), "r_pit_latep")
         .collect().map(r => (r.getLong(1), Option(r.get(3)), r.getLong(5))).toSet,
       runAppend(streaming.AttributionStream.creditsOf(src), "r_attr_latep")
         .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet)
    }
    assert(pit == Set((70L, None, 0L)),
      s"got $pit — the late purchase must not read the m(10) view from its future")
    assert(attr == Set((70L, "none", 7.5)),
      s"got $attr — the late purchase must not credit the m(10) view from its future")
  }

  test("RocksDB: streaming sessionize across 3 micro-batches == batch custom-state sessions, bitwise") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
    val Array(cutUs, maxUs) = ev
      .agg(percentile_approx(unix_micros(col("ts")), lit(0.5), lit(100)),
        max(unix_micros(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val dir = java.nio.file.Files.createTempDirectory("rocks_session").toFile
    val t0 = System.currentTimeMillis() - 60000
    writeReplayFile(dir, ev.filter(unix_micros(col("ts")) < cutUs), "b1", t0)
    writeReplayFile(dir, ev.filter(unix_micros(col("ts")) >= cutUs), "b2", t0 + 10000)
    val sentinel = ev.limit(1).select(lit(-1L).as("user_id"),
      timestamp_micros(lit(maxUs + 3600000000L)).as("ts"), // +1 h > gap + wm delay
      lit(0.0).as("value"))
    writeReplayFile(dir, sentinel, "b3", t0 + 20000)
    val src = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)
    val cols = Seq("user_id", "start_us", "end_us", "n", "total")
    val streamed = withRocksDb {
      runAppend(streaming.Sessionize.sessionsOfStream(src), "r_sessionize")
    }.select(cols.head, cols.tail: _*)
    val batch = operators.TimeWindowQueries.queries("q_session_state")(spark, sf)
      .select(cols.head, cols.tail: _*)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
