package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  *   runMain graft.StateStoreBench [sfDir] [store|throughput|all]
  *
  * Mode `store` (the original section): times three custom-state
  * streams (sessionize, debounce, LOCF — the original RocksDbStateSpec
  * set) plus — round 12 — the stream-stream interval join, which
  * buffers BOTH input sides in the store and so carries the largest
  * state of any operator in the tier (the most provider-sensitive data
  * point this inventory can produce). All run to completion over the
  * single-batch file source, min-of-2 per provider, warm JVM, plus the
  * on-disk state checkpoint size per provider.
  *
  * Mode `throughput` (round 14): the tier's first rows/s, per-batch
  * latency, and state-growth numbers — sessionize + LOCF at 1× and 10×
  * event volume under BOTH providers. The corpus is re-laid-out as 16
  * event-time-ordered files (ntile over ts, written sequentially so
  * both file-source orderings — path and modification time — replay in
  * time order like a real ingestion feed; a random file order would
  * push the watermark to the end of the range on batch 1 and drop
  * everything after as late) and streamed with maxFilesPerTrigger=1:
  * 16 micro-batches at both scales, 10× the rows per batch at 10×.
  * Per run, from StreamingQueryProgress: total rows / wall (rows/s),
  * median and max triggerExecution ms, state rows after first/last
  * batch (growth per batch — the number that sizes RocksDB at 100 TB),
  * and the final on-disk state checkpoint bytes.
  */
object StateStoreBench {

  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "all"
    // fail loudly on a typo'd mode (round-16 ADVICE): the round-15 mode
    // gating made an unrecognized mode run only the warm-up and exit
    // with no output, which reads as a silent empty run
    require(Set("store", "throughput", "all", "batchsize", "keydepth", "restore").contains(mode),
      s"unknown mode '$mode' (expected store|throughput|all|batchsize|keydepth|restore)")
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

    if (mode == "store" || mode == "all") streams.foreach { case (name, mk) =>
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

    if (mode == "throughput" || mode == "all" || mode == "batchsize" ||
        mode == "keydepth" || mode == "restore")
      throughput(spark, sfDir, du, rm, mode, big = args.contains("100x"),
        hotOnly = args.contains("hotonly"), deep = args.contains("deep"))
    spark.stop()
  }

  /** Round-14 throughput section — see the object doc. Round 15 adds
    * mode `batchsize`: (a) the per-row regime — sessionize on the 10×
    * corpus at maxFilesPerTrigger 1/4/16 (62.5k / 250k / 1M rows per
    * batch), both providers, so the per-row cost is separable from the
    * 0.6–0.9 s per-batch fixed floor the round-14 numbers sat on; and
    * (b) the hot-entity config remedies as MEASURED rows — the 10xhot
    * corpus under RocksDB with the two levers round 14 named as
    * "config, not code": shuffle-partition sizing (non-hot keys spread
    * away from the hot task) and the RocksDB write-path configs
    * (trackTotalNumberOfRows=false removes the get-before-put on every
    * update; changelog checkpointing removes the per-commit snapshot).
    */
  private def throughput(spark: SparkSession, sfDir: String,
                         du: java.io.File => Long,
                         rm: java.io.File => Unit,
                         mode: String = "throughput",
                         big: Boolean = false,
                         hotOnly: Boolean = false,
                         deep: Boolean = false): Unit = {
    import org.apache.spark.sql.expressions.Window
    val tmp = System.getProperty("java.io.tmpdir")
    val Batches = 16

    /** Lay the events table out as `Batches` event-time-ordered files,
      * written sequentially (ascending names AND mod-times — whichever
      * key the file source sorts by, replay is in time order).
      */
    def prepCorpus(src: DataFrame, out: String, sig: String): String = {
      val dir = new java.io.File(tmp, out)
      val marker = new java.io.File(dir, "_built")
      // parameter-checked reuse (round-15 ADVICE): a bare existence check
      // would silently replay a stale corpus if sfDir, the hot fraction,
      // or the batch count changed — the exact failure mode
      // ScaleBench.replicaCompatible exists to prevent
      if (marker.exists() &&
          new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim == sig)
        return dir.getAbsolutePath
      rm(dir); dir.mkdirs()
      val sliced = src
        .withColumn("slice", ntile(Batches).over(Window.orderBy("ts", "event_id")))
      sliced.cache().count()
      (1 to Batches).foreach { i =>
        val stage = new java.io.File(dir, s"_stage$i")
        sliced.filter(col("slice") === i).drop("slice")
          .coalesce(1).write.parquet(stage.getAbsolutePath)
        val part = stage.listFiles().find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part under $stage"))
        java.nio.file.Files.move(part.toPath,
          new java.io.File(dir, f"ev_$i%02d.parquet").toPath)
        rm(stage)
      }
      sliced.unpersist()
      java.nio.file.Files.write(marker.toPath,
        sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      dir.getAbsolutePath
    }

    // 1×: the events table itself; 10×: ScaleBench's honest replica
    // (disjoint per-copy user spaces — identical per-user structure,
    // 10× the keys, which is what makes state growth comparable).
    // 10x_hot: the streaming analog of SkewBench's hot vertex — 20% of
    // ALL events reassigned to ONE user (id outside every copy's user
    // space), so the keyed-state shuffle hands one task 20% of each
    // micro-batch's rows and that key's group iterator processes them
    // serially; per-batch straggler stats say whether the per-key
    // state operators bend under a power-law entity.
    val ev1 = Tables.events(spark, sfDir)
    val rep10 = new java.io.File(tmp, "graft_ssb_ev10").getAbsolutePath
    ScaleBench.buildTables(spark, sfDir, rep10, 10, Set("events"))
    val ev10 = Tables.events(spark, rep10)
    val ev10hot = ev10.withColumn("user_id",
      when(pmod(col("event_id"), lit(5)) === 0, lit(77777777L)).otherwise(col("user_id")))
    val corpora = Seq(
      ("1x", prepCorpus(ev1, "graft_ssb_thr1",
        s"ssbthr=v2 sf=$sfDir src=1x batches=$Batches")),
      ("10x", prepCorpus(ev10, "graft_ssb_thr10",
        s"ssbthr=v2 sf=$sfDir src=$rep10 batches=$Batches")),
      ("10xhot", prepCorpus(ev10hot, "graft_ssb_thr10hot",
        s"ssbthr=v2 sf=$sfDir src=$rep10 hot=mod5->77777777 batches=$Batches")))

    def thrStream(dir: String, mft: Int = 1): DataFrame = {
      val schema = spark.read.parquet(dir).schema
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", mft)
        .option("pathGlobFilter", "ev_*.parquet")
        .parquet(dir)
    }
    val mkThr: Seq[(String, String => DataFrame)] = Seq(
      "sessionize" -> ((d: String) => streaming.Sessionize.sessionsOfStream(
        thrStream(d).selectExpr("user_id", "ts", "value"))),
      "locf" -> ((d: String) => streaming.LocfStream.fillsOf(thrStream(d))))

    // per-task durations for the straggler read (hot-key skew shows up
    // as one long task per micro-batch, not in the batch count)
    val taskDurs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskDurs.add(t.taskInfo.duration)
    })

    def runOnce(name: String, df: DataFrame): String = {
      val ckpt = java.nio.file.Files.createTempDirectory(s"ssbthr_$name").toFile
      org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
      taskDurs.clear()
      val t0 = System.nanoTime()
      val q = df.writeStream.outputMode("append").format("memory")
        .queryName(s"ssbthr_$name").option("checkpointLocation", ckpt.getAbsolutePath)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
      val ds = {
        val it = taskDurs.iterator(); val b = Seq.newBuilder[Long]
        while (it.hasNext) b += it.next(); b.result().sorted
      }
      val taskMax = if (ds.nonEmpty) ds.last else -1L
      val taskMed = if (ds.nonEmpty) ds(ds.size / 2) else -1L
      val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val rows = prog.map(_.numInputRows).sum
      val lat = prog.flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong)).sorted
      val stateRows = prog.flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
      val stateBytes = du(new java.io.File(ckpt, "state"))
      spark.sql(s"DROP VIEW IF EXISTS ssbthr_$name")
      rm(ckpt)
      f""""batches":${prog.size},"rows":$rows,"wall":$wall%.2f,"rows_per_sec":${(rows / wall).toLong},""" +
        f""""lat_med_ms":${if (lat.nonEmpty) lat(lat.size / 2) else -1},"lat_max_ms":${if (lat.nonEmpty) lat.last else -1},""" +
        f""""state_rows_first":${stateRows.headOption.getOrElse(-1L)},"state_rows_last":${stateRows.lastOption.getOrElse(-1L)},""" +
        f""""state_rows_per_batch":${if (stateRows.size > 1) (stateRows.last - stateRows.head) / (stateRows.size - 1) else -1L},""" +
        f""""task_max_ms":$taskMax,"task_med_ms":$taskMed,""" +
        f""""state_mb":${stateBytes / 1e6}%.1f"""
    }

    def mkSess(d: String, mft: Int): DataFrame =
      streaming.Sessionize.sessionsOfStream(
        thrStream(d, mft).selectExpr("user_id", "ts", "value"))

    // mode `restore` (round 17; VERDICT r16 #3): RESTART RECOVERY cost
    // under the shipped changelog default, priced. Changelog
    // checkpointing trades the per-commit snapshot upload for
    // replay-on-restore: recovery loads the latest snapshot and replays
    // every changelog file committed since it. Background maintenance is
    // parked at 1h so the changelog depth is EXACTLY the batch count —
    // the axis under measurement; the controls at each depth are RocksDB
    // snapshot-per-commit (restore = one snapshot load, zero replay —
    // same state, same restart batch) and the HDFS-backed provider
    // (delta replay is its native restore shape). Protocol per
    // (posture, depth): stream the first `depth` files to completion,
    // stop, unload every loaded state-store provider (StateStore.stop()
    // — a same-JVM restart would otherwise restore from the provider
    // cache and hide the recovery cost entirely), add ONE more file,
    // restart on the same checkpoint, and time the restarted query to
    // completion. The added file is the same row volume at every depth,
    // so the restart-wall spread across depths IS the replay cost. The
    // sink is a parquet file sink (the memory sink refuses to recover
    // from an existing checkpoint in append mode).
    if (mode == "restore") {
      // `restore deep` re-runs the grid on the keydepth mode's 1.5M-key
      // corpus (100× events, user_id×10 + event-salt, 625k rows/file) —
      // ~10× the per-commit changelog volume and ~10× the keys of the
      // default 10× grid, probing where replay depth starts to cost.
      val dirAll =
        if (!deep) corpora.find(_._1 == "10x").get._2
        else {
          val rep100 = new java.io.File(tmp, "graft_ssb_ev100").getAbsolutePath
          ScaleBench.buildTables(spark, sfDir, rep100, 100, Set("events"))
          prepCorpus(Tables.events(spark, rep100)
              .withColumn("user_id", expr("user_id * 10 + pmod(event_id, 10)")),
            "graft_ssb_kd_k1500k",
            s"ssbkd=v1 sf=$sfDir src=$rep100 keys=x10salt batches=$Batches")
        }
      val files = new java.io.File(dirAll).listFiles()
        .filter(_.getName.matches("ev_\\d+\\.parquet")).sortBy(_.getName)
      require(files.length == Batches, s"expected $Batches files, found ${files.length}")
      def withConfs[A](confs: Map[String, String])(body: => A): A = {
        val prevs = confs.keys.map(k => k -> spark.conf.getOption(k)).toSeq
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try body
        finally prevs.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      }
      val maint = Map("spark.sql.streaming.stateStore.maintenanceInterval" -> "3600s")
      val rp = "spark.sql.streaming.stateStore.rocksdb."
      val postures: Seq[(String, Option[String], Map[String, String])] = Seq(
        ("rocks_changelog", Some(Rocks),
          maint + (rp + "changelogCheckpointing.enabled" -> "true")),
        ("rocks_snapshot", Some(Rocks),
          maint + (rp + "changelogCheckpointing.enabled" -> "false")),
        ("hdfs", None, maint))
      val depths = Seq(4, 8, 15)
      def runTo(runDir: java.io.File, ckpt: java.io.File, out: java.io.File): Double = {
        val t0 = System.nanoTime()
        val q = mkSess(runDir.getAbsolutePath, 1).writeStream.outputMode("append")
          .format("parquet").option("path", out.getAbsolutePath)
          .option("checkpointLocation", ckpt.getAbsolutePath).start()
        try q.processAllAvailable() finally q.stop()
        (System.nanoTime() - t0) / 1e9
      }
      val rows = for ((pname, prov, confs) <- postures; depth <- depths) yield {
        val runDir = new java.io.File(tmp, "graft_ssb_restore")
        rm(runDir); runDir.mkdirs()
        files.take(depth).foreach { f =>
          java.nio.file.Files.copy(f.toPath, new java.io.File(runDir, f.getName).toPath)
        }
        val ckpt = java.nio.file.Files.createTempDirectory(s"ssbres_${pname}_$depth").toFile
        val out = java.nio.file.Files.createTempDirectory(s"ssbreso_${pname}_$depth").toFile
        val (phase1Wall, stateBytes) = withProvider(spark, prov) { withConfs(confs) {
          val w = runTo(runDir, ckpt, out)
          (w, du(new java.io.File(ckpt, "state")))
        }}
        // force cold recovery: drop every loaded provider instance
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        val next = files(depth)
        java.nio.file.Files.copy(next.toPath, new java.io.File(runDir, next.getName).toPath)
        val restartWall = withProvider(spark, prov) { withConfs(confs) {
          runTo(runDir, ckpt, out)
        }}
        rm(ckpt); rm(out); rm(runDir)
        System.err.println(f"[restore] $pname depth=$depth phase1=$phase1Wall%.1f " +
          f"state_mb=${stateBytes / 1e6}%.1f restart_wall=$restartWall%.2f")
        f""""${pname}_d$depth":{"phase1_wall":$phase1Wall%.1f,""" +
          f""""state_mb":${stateBytes / 1e6}%.1f,"restart_wall":$restartWall%.2f}"""
      }
      println(s"""{"metric":"streaming_restore","batch_rows":${if (deep) 625000 else 62500},""" +
        s""""deep":$deep,"runs":${rows.mkString("{", ",", "}")}}""")
      return
    }

    // mode `keydepth` (round 16; VERDICT r15 #5): the ACTIVE-KEYS axis,
    // isolated. The r15 per-row points confounded rows with keys (1M
    // rows/14.7k keys, then 10M/147k); here the SAME 10M rows (the 100×
    // events replica) are re-keyed three ways — user_id div 10 squeezes
    // to ~14.7k keys, identity keeps ~147k, user_id*10 + event-salt
    // spreads toward ~1.5M (bounded by per-user event counts; the
    // measured distinct count is reported) — so any per-row cost change
    // is store DEPTH, not volume. Sessionize at mft=4 (2.5M rows/batch,
    // the per-row regime), both providers, HDFS as the control that
    // prices the keyed-shuffle share. SCALE.md §"Streaming per-row
    // regime" carries the three-point keys-axis fit.
    if (mode == "keydepth") {
      val rep100 = new java.io.File(tmp, "graft_ssb_ev100").getAbsolutePath
      ScaleBench.buildTables(spark, sfDir, rep100, 100, Set("events"))
      val ev100 = Tables.events(spark, rep100)
      val shapes = Seq(
        ("k15k", ev100.withColumn("user_id", expr("user_id div 10")),
          s"ssbkd=v1 sf=$sfDir src=$rep100 keys=div10 batches=$Batches"),
        ("k147k", ev100,
          s"ssbthr=v2 sf=$sfDir src=$rep100 batches=$Batches"),
        ("k1500k", ev100.withColumn("user_id",
            expr("user_id * 10 + pmod(event_id, 10)")),
          s"ssbkd=v1 sf=$sfDir src=$rep100 keys=x10salt batches=$Batches"))
      val rows = shapes.map { case (name, df, sig) =>
        // k147k reuses the batchsize-100x corpus (same sig) when present
        val out = if (name == "k147k") "graft_ssb_thr100" else s"graft_ssb_kd_$name"
        val dir = prepCorpus(df, out, sig)
        val keys = spark.read.parquet(dir).select("user_id").distinct().count()
        val runs = Seq("hdfs" -> None, "rocksdb" -> Some(Rocks)).map { case (pname, prov) =>
          val body = withProvider(spark, prov) {
            runOnce(s"warm_kd_${name}_$pname", mkSess(dir, 4))
            runOnce(s"kd_${name}_$pname", mkSess(dir, 4))
          }
          System.err.println(s"[kd] $name $pname keys=$keys {$body}")
          s""""$pname":{$body}"""
        }
        s""""$name":{"keys":$keys,${runs.mkString(",")}}"""
      }
      println(s"""{"metric":"streaming_keydepth","rows_per_corpus":10000000,"runs":${rows.mkString("{", ",", "}")}}""")
      return
    }

    if (mode == "batchsize") {
      val dir10 = corpora.find(_._1 == "10x").get._2
      val dirHot = corpora.find(_._1 == "10xhot").get._2
      // (a) per-row regime: same 1M-row corpus, batches of 62.5k / 250k
      // / 1M rows — the fixed per-batch floor amortizes 1×/4×/16×, so
      // the rows/s spread IS the per-row cost becoming visible.
      // `batchsize hotonly` skips this sweep and runs only the (b)
      // lever grid — the cheap re-measurement path for a single lever
      // row (round 16 added the shipped-posture row there).
      val sweep = if (hotOnly) Nil else for {
        mft <- Seq(1, 4, 16)
        (pname, prov) <- Seq("hdfs" -> None, "rocksdb" -> Some(Rocks))
      } yield {
        val body = withProvider(spark, prov) {
          runOnce(s"warm_bs${mft}_$pname", mkSess(dir10, mft))
          runOnce(s"bs${mft}_$pname", mkSess(dir10, mft))
        }
        System.err.println(s"[bs] mft=$mft $pname {$body}")
        s""""mft${mft}_$pname":{$body}"""
      }
      // (a2) optional 100× extension (`batchsize 100x`): the same
      // per-row measurement a decade up — 10M rows in 16 files, 10×
      // the active keys — at mft=1 (625k/batch) and mft=4 (2.5M/batch),
      // both providers; extends the per-row-cost fit past the 10×
      // corpus without assuming the keys axis is free
      val sweep100 = if (!big) Nil else {
        val rep100 = new java.io.File(tmp, "graft_ssb_ev100").getAbsolutePath
        ScaleBench.buildTables(spark, sfDir, rep100, 100, Set("events"))
        val dir100 = prepCorpus(Tables.events(spark, rep100), "graft_ssb_thr100",
          s"ssbthr=v2 sf=$sfDir src=$rep100 batches=$Batches")
        for {
          mft <- Seq(1, 4)
          (pname, prov) <- Seq("hdfs" -> None, "rocksdb" -> Some(Rocks))
        } yield {
          val body = withProvider(spark, prov) {
            runOnce(s"warm_bs100_${mft}_$pname", mkSess(dir100, mft))
            runOnce(s"bs100_${mft}_$pname", mkSess(dir100, mft))
          }
          System.err.println(s"[bs100] mft=$mft $pname {$body}")
          s""""bs100_mft${mft}_$pname":{$body}"""
        }
      }
      // (b) hot-entity levers, RocksDB (the provider that paid the 2×
      // straggler in round 14), measured one at a time then combined
      def withConfs[A](confs: Map[String, String])(body: => A): A = {
        val prevs = confs.keys.map(k => k -> spark.conf.getOption(k)).toSeq
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try body
        finally prevs.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      }
      val rp = "spark.sql.streaming.stateStore.rocksdb."
      val levers: Seq[(String, Map[String, String])] = Seq(
        "base" -> Map.empty,
        "parts128" -> Map("spark.sql.shuffle.partitions" -> "128"),
        "notrack" -> Map(rp + "trackTotalNumberOfRows" -> "false"),
        "changelog" -> Map(rp + "changelogCheckpointing.enabled" -> "true"),
        "combined" -> Map(
          "spark.sql.shuffle.partitions" -> "128",
          rp + "trackTotalNumberOfRows" -> "false",
          rp + "changelogCheckpointing.enabled" -> "true"),
        // the SHIPPED defaults, measured through the helper itself
        // (round 16: graft.streaming.StatePosture turned the winning
        // changelog lever into the library default — this row confirms
        // the delta survives the flip, exactly as deployed)
        "posture" -> streaming.StatePosture.rocksDbConfs)
      val hot = levers.map { case (lname, confs) =>
        val body = withProvider(spark, Some(Rocks)) {
          withConfs(confs) {
            runOnce(s"warm_hot_$lname", mkSess(dirHot, 1))
            runOnce(s"hot_$lname", mkSess(dirHot, 1))
          }
        }
        System.err.println(s"[hot] $lname {$body}")
        s""""hot_$lname":{$body}"""
      }
      println(s"""{"metric":"streaming_batchsize","runs":${(sweep ++ sweep100 ++ hot).mkString("{", ",", "}")}}""")
      return
    }

    val results = for {
      (scale, dir) <- corpora
      (sname, mk) <- mkThr
      (pname, prov) <- Seq("hdfs" -> None, "rocksdb" -> Some(Rocks))
    } yield {
      val body = withProvider(spark, prov) {
        runOnce(s"warm_${sname}_$scale$pname", mk(dir)) // warm run
        runOnce(s"${sname}_$scale$pname", mk(dir))
      }
      System.err.println(s"[thr] $sname $scale $pname {$body}")
      s""""${sname}_${scale}_$pname":{$body}"""
    }
    println(s"""{"metric":"streaming_throughput","batches":$Batches,"runs":${results.mkString("{", ",", "}")}}""")
  }

  private def withProvider[A](spark: SparkSession, provider: Option[String])(body: => A): A = {
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
}
