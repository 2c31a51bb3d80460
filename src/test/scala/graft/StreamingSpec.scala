package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.streaming.EventsStreaming

/** Streaming tier validation: run the streaming window aggregations to
  * completion over the static sf0.001 events parquet and compare with
  * the equivalent batch queries.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("streaming tumbling counts == batch tumbling counts") {
    val streamed = EventsStreaming.runToCompletion(spark,
      EventsStreaming.tumblingCounts(spark, sf), "t_tumbling")
    val batch = operators.TimeWindowQueries.queries("q_win_tumbling")(spark, sf)
      .select("ws_us", "event_type", "n")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming session windows == batch session windows") {
    val streamed = EventsStreaming.runToCompletion(spark,
      EventsStreaming.sessionCounts(spark, sf), "t_session")
    val batch = operators.TimeWindowQueries.queries("q_win_session")(spark, sf)
      .select("user_id", "start_us", "end_us", "n")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming OHLC bars == batch OHLC bars") {
    val streamed = EventsStreaming.runToCompletion(spark,
      EventsStreaming.ohlcBars(spark, sf), "t_ohlc")
    val batch = operators.TimeWindowQueries.queries("q_win_bars")(spark, sf)
      .select("event_type", "ws_us", "open", "close", "high", "low", "n", "total")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream interval join == batch interval join") {
    import org.apache.spark.sql.functions._
    val streamed = EventsStreaming.runAppendToCompletion(spark,
      EventsStreaming.viewPurchaseJoin(spark, sf), "t_ssjoin")
    val e = Tables.events(spark, sf)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("vts_us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("pts_us"))
    val batch = purchases.join(views,
        col("v_user") === col("user_id")
          && col("vts_us") >= col("pts_us") - 3600000000L
          && col("vts_us") <= col("pts_us"))
      .select(col("event_id"), col("user_id"), col("pts_us"), col("vts_us"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming exact dedup == batch distinct key pairs") {
    import org.apache.spark.sql.functions._
    val streamed = EventsStreaming.runAppendToCompletion(spark,
      EventsStreaming.dedupPairs(spark, sf), "t_dedup")
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct()
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("watermark-bounded dedup == exact dedup over one micro-batch") {
    import org.apache.spark.sql.functions._
    val streamed = EventsStreaming.runAppendToCompletion(spark,
      EventsStreaming.dedupPairsBounded(spark, sf), "t_dedup_wm")
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct()
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("streaming EWMA (mapGroupsWithState) == batch EWMA fold, bitwise") {
    import org.apache.spark.sql.functions._
    val streamed = EventsStreaming.runUpdateToCompletion(spark,
      streaming.EwmaStream.ewma(spark, sf), "t_ewma")
      .select(col("user_id"), col("n_events").cast("int").as("n_events"),
        col("ewma"))
    val batch = operators.TimeWindowQueries.queries("q_win_ewma")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming funnel stages (mapGroupsWithState) == batch funnel counts") {
    import org.apache.spark.sql.functions._
    val perUser = EventsStreaming.runUpdateToCompletion(spark,
      streaming.FunnelStream.stages(spark, sf), "t_funnel")
    // fold per-user reached stages into the batch query's 3-row shape:
    // n_users at stage k = users whose reached stage >= k
    val streamed = Seq(("1_view", 1), ("2_click", 2), ("3_purchase", 3))
      .map { case (label, k) =>
        perUser.filter(col("stage") >= k)
          .agg(count(lit(1)).as("n_users"))
          .select(lit(label).as("stage"), col("n_users"))
      }.reduce(_ unionAll _)
    val batch = operators.TimeWindowQueries.queries("q_win_funnel")(spark, sf)
    assert(perUser.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming sliding counts == batch sliding counts") {
    val streamed = EventsStreaming.runToCompletion(spark,
      EventsStreaming.slidingTotals(spark, sf), "t_sliding")
    val batch = operators.TimeWindowQueries.queries("q_win_sliding")(spark, sf)
      .select("ws_us", "n")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming transition pairs (flatMapGroupsWithState) == batch transition matrix") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val pairs = EventsStreaming.runAppendToCompletion(spark,
      streaming.TransitionStream.pairs(spark, sf), "t_transitions")
    // fold the streamed (from, to) pairs into the batch query's matrix:
    // exact integer counts, identical double division for p
    val streamed = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy("from_type")))
    val batch = operators.TimeWindowQueries.queries("q_win_transitions")(spark, sf)
      .select("from_type", "to_type", "n", "p")
    assert(pairs.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-static enrichment join == batch dim join") {
    import org.apache.spark.sql.functions._
    val streamed = EventsStreaming.runUpdateToCompletion(spark,
      EventsStreaming.enrichedSegmentCounts(spark, sf), "t_enrich")
    val batch = Tables.events(spark, sf)
      .join(spark.read.parquet(s"$sf/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("max_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming drift counts (watermarked agg) == batch drift monitor") {
    import org.apache.spark.sql.functions._
    val counts = EventsStreaming.runUpdateToCompletion(spark,
      streaming.DriftStream.halfCounts(spark, sf), "t_drift")
    // fold the |types|-row streamed counts with the batch query's exact
    // rate/drift arithmetic (double division of exact ints)
    val tot = counts.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    val ra = col("n_a").cast("double") / col("t_a").cast("double")
    val rb = col("n_b").cast("double") / col("t_b").cast("double")
    val streamed = counts.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_a"), col("n_b"),
        ra.as("rate_a"), rb.as("rate_b"), abs(ra - rb).as("abs_drift"))
    val batch = operators.TimeWindowQueries.queries("q_drift")(spark, sf)
    assert(counts.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming PIT features (flatMapGroupsWithState) == batch point-in-time join") {
    import org.apache.spark.sql.functions._
    val streamed = EventsStreaming.runAppendToCompletion(spark,
      streaming.PitStream.features(spark, sf), "t_pit")
      .select("event_id", "user_id", "purchase_us",
        "f_last_view_value", "f_last_click_value", "f_n_signups")
    val batch = operators.TimeWindowQueries.queries("q_join_pit")(spark, sf)
      .select("event_id", "user_id", "purchase_us",
        "f_last_view_value", "f_last_click_value", "f_n_signups")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming last-touch attribution (flatMapGroupsWithState) == batch attribution") {
    import org.apache.spark.sql.functions._
    val credits = EventsStreaming.runAppendToCompletion(spark,
      streaming.AttributionStream.credits(spark, sf), "t_attribution")
    // fold the streamed per-purchase credits with the batch query's
    // exact decimal arithmetic (order-independent, so stream == batch)
    val streamed = credits.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast(Tables.Dec2)).cast(Tables.Dec382).as("total_value"))
    val batch = operators.TimeWindowQueries.queries("q_attribution")(spark, sf)
    assert(credits.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming rolling median (flatMapGroupsWithState) == batch window median") {
    val streamed = EventsStreaming.runAppendToCompletion(spark,
      streaming.RollMedianStream.medians(spark, sf), "t_rollmedian")
      .select("event_id", "user_id", "n_frame", "roll_median")
    val batch = operators.TimeWindowQueries.queries("q_win_rollmedian")(spark, sf)
      .select("event_id", "user_id", "n_frame", "roll_median")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-static anti-join incremental dedup == batch incremental dedup") {
    val streamed = EventsStreaming.runAppendToCompletion(spark,
      streaming.IncrementalDedupStream.survivors(spark, sf), "t_incdedup")
    val batch = operators.DedupQueries.queries("q_dedup_incremental")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming CUSUM (flatMapGroupsWithState) == batch closed-form windows, bitwise") {
    val (n, sumCents) = streaming.CusumStream.referenceStats(spark, sf)
    val streamed = EventsStreaming.runAppendToCompletion(spark,
      streaming.CusumStream.stats(spark, sf, n, sumCents), "t_cusum")
      .select("event_id", "user_id", "tus", "cusum", "alarm")
    val batch = operators.TimeWindowQueries.queries("q_win_cusum")(spark, sf)
      .select("event_id", "user_id", "tus", "cusum", "alarm")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming LOCF imputation (flatMapGroupsWithState) == batch window fill") {
    val streamed = EventsStreaming.runAppendToCompletion(spark,
      streaming.LocfStream.fills(spark, sf), "t_locf")
      .select("event_id", "user_id", "tus", "was_missing", "v_filled")
    val batch = operators.TimeWindowQueries.queries("q_impute_locf")(spark, sf)
      .select("event_id", "user_id", "tus", "was_missing", "v_filled")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming debounce across 3 micro-batches == batch keep-first-per-burst, bitwise") {
    // The round-9 advisor finding: the old replay-only implementation
    // flushed + cleared state every invocation, so a burst spanning
    // micro-batches silently split in two. This drives the REAL
    // multi-batch path: events time-split into two files (bursts
    // straddle the cut and must chain through state), processed one
    // file per trigger, plus a far-future sentinel row (user -1, never
    // emitted: its own burst stays open) whose only job is to push the
    // watermark past every real burst's last_tus + gap so the
    // event-time timeouts fire and flush them.
    import org.apache.spark.sql.functions._
    val cols = Seq("event_id", "user_id", "event_type", "tus", "burst_n")
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
    val Array(cutUs, maxUs) = ev
      .agg(percentile_approx(unix_micros(col("ts")), lit(0.5), lit(100)),
        max(unix_micros(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val dir = java.nio.file.Files.createTempDirectory("debounce_replay").toFile
    def writeFile(df: org.apache.spark.sql.DataFrame, name: String, modMs: Long): Unit = {
      val stage = new java.io.File(dir, s"_stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val target = new java.io.File(dir, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(modMs) // file source replays oldest-first
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
    val t0 = System.currentTimeMillis() - 60000
    writeFile(ev.filter(unix_micros(col("ts")) < cutUs), "b1", t0)
    writeFile(ev.filter(unix_micros(col("ts")) >= cutUs), "b2", t0 + 10000)
    val sentinel = ev.limit(1).select(lit(-1L).as("user_id"),
      lit("view").as("event_type"), lit(-1L).as("event_id"),
      timestamp_micros(lit(maxUs + 46800000000L)).as("ts")) // +13 h
    writeFile(sentinel, "b3", t0 + 20000)
    val src = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)
    val streamed = EventsStreaming.runAppendToCompletion(spark,
      streaming.DebounceStream.survivorsOf(src), "t_debounce")
      .select(cols.head, cols.tail: _*)
    val batch = operators.TimeWindowQueries.queries("q_win_debounce")(spark, sf)
      .select(cols.head, cols.tail: _*)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
