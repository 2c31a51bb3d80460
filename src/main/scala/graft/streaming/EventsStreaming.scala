package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming tier over the events table — the same windowed
  * aggregations as TimeWindowQueries, expressed as readStream →
  * watermark → window agg → sink. Outside the DuckDB oracle contract
  * (the driver gate is batch); validated by StreamingSpec, which runs
  * the stream to completion over the static parquet and compares
  * against the batch result.
  *
  * Scale posture: watermark bounds state (late data beyond 30 min is
  * dropped); the aggregation state store partitions by (window, type)
  * — the same single-shuffle shape as the batch query. For continuous
  * ingestion swap the file source for Kafka; the plan below the source
  * is unchanged. For large keyed state apply the shipped RocksDB
  * posture before starting queries —
  * `graft.streaming.StatePosture.set(spark)` (provider + changelog
  * checkpointing, the round-16 default; see its scaladoc for the
  * measurements and the partitions-sized-to-state rule).
  */
object EventsStreaming {

  /** Streaming source over the static events parquet (file source; one
    * file = one micro-batch here). The file source requires a
    * directory, so we point at the sf dir and glob-filter to the
    * events file. The required schema is DERIVED from a batch read of
    * the same file rather than hardcoded — a user-provided schema
    * matches parquet columns by name, so a hardcoded copy would turn
    * schema drift into silent all-null columns instead of a loud
    * failure.
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema: StructType = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    // Same ts normalization as Tables.events: nanos-Long or NTZ micros.
    // Any OTHER physical encoding throws, exactly like the batch twin —
    // a third encoding must fail loudly, not stream silently-wrong rows.
    schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts has unexpected physical type $other; expected BIGINT nanos, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  /** Tumbling 1-hour counts per event type with a 30-minute watermark. */
  def tumblingCounts(spark: SparkSession, sfDir: String): DataFrame =
    eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"), col("n"))

  /** Sliding-window counts. Note: the batch counterpart
    * (q_win_sliding) also computes countDistinct(user_id), which is
    * unsupported in streaming aggregations — this streaming variant
    * covers the count only, and StreamingSpec compares against the
    * matching projection.
    */
  def slidingTotals(spark: SparkSession, sfDir: String): DataFrame =
    eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("ws_us"), col("n"))

  /** OHLC time bars per event_type × hour — the streaming twin of
    * q_win_bars. The batch form picks open/close through two
    * row_number orders; windowed row_number is unsupported in
    * streaming, so the stream uses min_by/max_by on the (ts, event_id)
    * total order — the same unique tie-broken extremes, expressible as
    * a mergeable aggregate whose state is O(1) per bar (one candidate
    * row per extreme). high/low/count are plain aggregates; the volume
    * total goes through exact DECIMAL like every money sum. Watermark
    * closes a bar 30 min after its hour passes.
    */
  def ohlcBars(spark: SparkSession, sfDir: String): DataFrame =
    eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        max("value").as("high"), min("value").as("low"),
        count(lit(1)).as("n"),
        sum(col("value").cast(graft.Tables.Dec2)).cast(graft.Tables.Dec382).as("total"))
      .select(col("event_type"), unix_micros(col("w.start")).as("ws_us"),
        col("open"), col("close"), col("high"), col("low"), col("n"), col("total"))

  /** Native session windows (shared 10-min gap) per user — the
    * streaming form of q_win_session's built-in operator, completing
    * the pair with Sessionize's flatMapGroupsWithState form: same
    * semantics, merged-session state managed by Spark instead of
    * custom code. Watermark bounds the mergeable-session state.
    */
  def sessionCounts(spark: SparkSession, sfDir: String): DataFrame =
    eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"),
        s"${Sessionize.GapUs / 60000000L} minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"), col("n"))

  /** Stream-stream interval self-join: each purchase joined to the same
    * user's views in the preceding hour — the streaming form of the
    * q_join_range batch query. Both sides carry watermarks, so the join
    * state for a view is dropped once the purchase-side watermark
    * passes vts + 1 hour: state is bounded by (watermark + interval) ×
    * arrival rate, not by history. Inner join (streaming outer joins
    * only emit unmatched rows when the watermark passes them, which
    * never happens for the tail of a finite replay).
    */
  def viewPurchaseJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val src = eventsStream(spark, sfDir)
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("vts"))
      .withWatermark("vts", "30 minutes")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"), col("ts").as("pts"))
      .withWatermark("pts", "30 minutes")
    purchases.join(views,
      expr("v_user = p_user AND vts >= pts - INTERVAL 1 HOUR AND vts <= pts"))
      .select(col("event_id"), col("p_user").as("user_id"),
        unix_micros(col("pts")).as("pts_us"), unix_micros(col("vts")).as("vts_us"))
  }

  /** Streaming exact dedup: first-seen (user_id, event_type) pairs —
    * the streaming form of keep-first dedup. dropDuplicates keeps all
    * seen keys in state (exact global dedup); production pipelines that
    * can tolerate a horizon switch to dropDuplicatesWithinWatermark so
    * state is bounded by the watermark window. Output columns are just
    * the key pair, so the surviving SET is deterministic even though
    * which duplicate row wins depends on arrival order.
    */
  def dedupPairs(spark: SparkSession, sfDir: String): DataFrame =
    eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"))

  /** Watermark-bounded dedup (dropDuplicatesWithinWatermark): the
    * state-bounded production form of [[dedupPairs]] — duplicates are
    * suppressed only while their key is inside the watermark horizon,
    * so state is O(keys per horizon) instead of O(all keys ever): the
    * 100 TB/continuous-ingest contract. Over the single-micro-batch
    * file source every row sits inside the horizon, so the RESULT SET
    * equals exact dedup (StreamingSpec asserts it) — what changes is
    * the state-eviction guarantee, not this output.
    */
  def dedupPairsBounded(spark: SparkSession, sfDir: String): DataFrame =
    eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))

  /** Stream-static enrichment join: the streaming event feed joins the
    * STATIC customer dimension (the canonical enrichment shape — fact
    * stream × slowly-changing dim), then aggregates per (segment,
    * type). The static side is planned per micro-batch as an ordinary
    * batch relation — it broadcasts below the threshold exactly as in
    * batch, carries NO streaming state, and picks up a refreshed dim
    * table on the next trigger — so join state is zero and aggregation
    * state is |segments × types| rows regardless of stream length.
    * max(value) rather than sum(value): max is arrival-order-invariant
    * over doubles, keeping the parity check exact.
    */
  def enrichedSegmentCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("max_value"))
  }

  /** Run an append-mode streaming query (e.g. a stream-stream join)
    * over the static input to completion in a memory sink.
    */
  def runAppendToCompletion(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  /** Run an update-mode streaming query (e.g. mapGroupsWithState)
    * over the static input to completion in a memory sink. The sink
    * table accumulates one row per updated key per micro-batch; over
    * a single-batch file source that's the final state per key.
    */
  def runUpdateToCompletion(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  /** Run a streaming aggregate over the static input to completion,
    * materialized in a memory sink (complete mode), and return the
    * final table.
    */
  def runToCompletion(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q: StreamingQuery = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    // always stop: a failed processAllAvailable would otherwise leave
    // the named query active and block any re-run under the same name
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
