package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming LOCF imputation via flatMapGroupsWithState — the
  * unbounded-stream form of TimeWindowQueries.q_impute_locf. State per
  * user is ONE small record (the last observed value plus its
  * (ts_us, event_id) coordinates and the activity horizon) — O(1)
  * regardless of stream length; each incoming event emits exactly one
  * row, filled with the carried value when its own measurement is
  * missing (the same deterministic event_id mod 7 mask as the batch
  * query) and the carry lies strictly before the event in event time.
  * No arithmetic touches the carried double, so stream == batch
  * bitwise (StreamingSpec asserts both directions).
  *
  * Watermarked with the standard 30-minute bound and an event-time
  * idle eviction 24 h past the user's last activity. Evicting LOCF
  * state is a real semantic choice at 100 TB (a user returning after
  * eviction restarts from the 0.0 fallback) — the 24 h horizon is the
  * documented staleness bound on carried observations, which a
  * training pipeline wants anyway: a day-old sensor reading is not a
  * fill, it's a lie. Over the single-batch file source no timeout
  * fires and parity with batch is exact.
  */
object LocfStream {

  // State schema note: Carry changed shape in rounds 10 (1→3 fields)
  // and 11 (3→4: the obs slot carries its winning event_id so the
  // carry guard uses the exact (ts_us, event_id) total order).
  // Streaming checkpoints from prior builds are NOT resumable across
  // these boundaries — fresh replays only.
  case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                event_id: Long, v: Option[Double])
  case class Carry(last: Option[Double], lastObsTsUs: Long, lastObsEid: Long,
                   lastTsUs: Long)
  case class Out(event_id: Long, user_id: Long, tus: Long,
                 was_missing: Boolean, v_filled: Double)

  private val IdleEvictMs = 86400000L

  private def step(uid: Long, events: Iterator[Ev],
                   state: GroupState[Carry]): Iterator[Out] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toArray.sortBy(e => (e.ts_us, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(Carry(None, Long.MinValue, Long.MinValue, Long.MinValue))
    val out = sorted.map { e =>
      // the fill reads the carried observation only when it lies
      // strictly BEFORE this event in the (ts_us, event_id) total
      // order — the same never-serve-the-future guard PIT and
      // attribution apply on emit. For a cross-batch late missing
      // event this matches the batch window exactly when no older
      // observation preceded it (batch also finds nothing and serves
      // the 0.0 fallback). The residual an O(1) carry cannot close:
      // if an OLDER observation existed but was superseded by a newer
      // one, batch fills the late event with the older value, which
      // is gone from state here — the stream serves the fallback
      // instead of either value (never a future one). Bounded by the
      // 30 min watermark. In-batch the guard is a no-op: events are
      // folded in (ts_us, event_id) order, so the carry is always
      // strictly before the current event.
      val carriedBefore = st.lastObsTsUs < e.ts_us ||
        (st.lastObsTsUs == e.ts_us && st.lastObsEid < e.event_id)
      val filled = e.v.orElse(if (carriedBefore) st.last else None).getOrElse(0.0)
      // the carried observation is the max-(ts_us, event_id) PRESENT
      // value (TransitionStream's predecessor rule): a cross-batch late
      // observation (bounded by the watermark delay) — including one at
      // an EQUAL timestamp with a smaller event_id — must not replace a
      // NEWER carried value for every future fill, and a late batch
      // must not regress the idle-eviction horizon
      val obsWins = e.v.isDefined && (e.ts_us > st.lastObsTsUs ||
        (e.ts_us == st.lastObsTsUs && e.event_id >= st.lastObsEid))
      st = Carry(
        if (obsWins) e.v else st.last,
        if (obsWins) e.ts_us else st.lastObsTsUs,
        if (obsWins) e.event_id else st.lastObsEid,
        math.max(st.lastTsUs, e.ts_us))
      Out(e.event_id, uid, e.ts_us, e.v.isEmpty, filled)
    }
    state.update(st)
    state.setTimeoutTimestamp(st.lastTsUs / 1000L + IdleEvictMs)
    out.iterator
  }

  /** Streaming per-event LOCF fills, append mode (one output row per
    * input event).
    */
  def fills(spark: SparkSession, sfDir: String): DataFrame =
    fillsOf(EventsStreaming.eventsStream(spark, sfDir))

  /** Same stream over an arbitrary source with (user_id, ts: TIMESTAMP,
    * event_id, value) — the entry point multi-micro-batch replay tests
    * use to drive cross-batch carry chaining and idle eviction.
    */
  def fillsOf(stream: DataFrame): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        when(pmod(col("event_id"), lit(7)) < 3, lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(step)
      .toDF()
  }
}
