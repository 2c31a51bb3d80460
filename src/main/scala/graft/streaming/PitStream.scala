package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time feature assembly via flatMapGroupsWithState
  * — the unbounded-stream form of TimeWindowQueries.q_join_pit. State
  * per user is O(1) regardless of history length: the last view value,
  * the last click value, and the running signup count. Each purchase
  * emits its feature vector from the state AS OF strictly before it —
  * events fold in (ts_us, event_id) order within a micro-batch, and a
  * purchase reads the state BEFORE the batch's later events apply, so
  * the zero-leakage contract of the batch window (frame ending at -1,
  * ties broken on event_id) is reproduced exactly.
  *
  * Watermarked: 30-minute watermark, event-time timeout 24 h past the
  * user's last activity. PIT features legitimately reach far back, so
  * the idle-eviction horizon is generous — it bounds state for the
  * long tail of one-visit users without truncating live feature
  * history; over the single-batch file source no timeout fires, so
  * parity with batch is exact (StreamingSpec proves it).
  *
  * Across micro-batches the same per-key event-time ordering contract
  * as EwmaStream/TransitionStream applies (late rows beyond the
  * watermark are dropped, in-watermark rows arrive in order per key).
  *
  * Bounded-disorder residuals (all bounded by the 30 min watermark):
  *  - A cross-batch LATE purchase never reads a carried slot whose
  *    (ts_us, event_id) is AFTER it — the emit guard serves None for
  *    that slot instead of a future value (PIT-safe: an earlier true
  *    observation may have been overwritten by the newer carry, so the
  *    slot can under-report, but it can never leak the future).
  *  - f_n_signups is a monotone count and CANNOT be rewound for a late
  *    purchase with O(1) state: a late purchase may see signups that
  *    happened after it, bounded by the watermark delay. This is the
  *    one residual future-leak direction, by design.
  *
  * State schema note: PitState changed shape in rounds 10 (4→6 fields)
  * and 11 (6→8: the slots carry their winning event_id so the carry
  * guard and the purchase emit guard use the exact (ts_us, event_id)
  * total order). Streaming checkpoints written by prior builds are NOT
  * resumable across these boundaries — fresh replays only, which is
  * the only posture the suite exercises.
  */
object PitStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                event_id: Long, event_type: String, value: Double)
  case class PitState(lastView: Option[Double], lastViewUs: Long, lastViewEid: Long,
                      lastClick: Option[Double], lastClickUs: Long, lastClickEid: Long,
                      nSignups: Long, lastTsUs: Long)
  case class Feat(event_id: Long, user_id: Long, purchase_us: Long,
                  f_last_view_value: Option[Double],
                  f_last_click_value: Option[Double], f_n_signups: Long)

  private val IdleEvictMs = 86400000L

  private def step(uid: Long, events: Iterator[Ev],
                   state: GroupState[PitState]): Iterator[Feat] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toArray.sortBy(e => (e.ts_us, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(
      PitState(None, Long.MinValue, Long.MinValue, None, Long.MinValue, Long.MinValue,
        0L, Long.MinValue))
    // (slotUs, slotEid) strictly before e in the (ts_us, event_id)
    // total order — the batch window frame ending at -1 with event_id
    // tie-break
    def strictlyBefore(slotUs: Long, slotEid: Long, e: Ev): Boolean =
      slotUs < e.ts_us || (slotUs == e.ts_us && slotEid < e.event_id)
    // the new observation wins the carried slot iff it is >= in the
    // same total order — TransitionStream's predecessor rule, so a
    // cross-batch late event at an EQUAL timestamp with a smaller
    // event_id cannot overwrite the carried winner
    def wins(slotUs: Long, slotEid: Long, e: Ev): Boolean =
      e.ts_us > slotUs || (e.ts_us == slotUs && e.event_id >= slotEid)
    val out = scala.collection.mutable.ArrayBuffer.empty[Feat]
    sorted.foreach { e =>
      e.event_type match {
        case "purchase" =>
          // feature vector strictly before the purchase: a cross-batch
          // LATE purchase must not read a carried slot from its own
          // future — serve None for that slot (PIT-safe; see scaladoc)
          out += Feat(e.event_id, uid, e.ts_us,
            st.lastView.filter(_ => strictlyBefore(st.lastViewUs, st.lastViewEid, e)),
            st.lastClick.filter(_ => strictlyBefore(st.lastClickUs, st.lastClickEid, e)),
            st.nSignups)
        // last-observation slots follow the (ts_us, event_id) total
        // order, not arrival order: a cross-batch late touch (bounded
        // by the watermark delay) must not replace a newer carried
        // value — the LocfStream rule
        case "view" if wins(st.lastViewUs, st.lastViewEid, e) =>
          st = st.copy(lastView = Some(e.value), lastViewUs = e.ts_us,
            lastViewEid = e.event_id)
        case "click" if wins(st.lastClickUs, st.lastClickEid, e) =>
          st = st.copy(lastClick = Some(e.value), lastClickUs = e.ts_us,
            lastClickEid = e.event_id)
        case "signup" => st = st.copy(nSignups = st.nSignups + 1L)
        case _        => ()
      }
      st = st.copy(lastTsUs = math.max(st.lastTsUs, e.ts_us))
    }
    state.update(st)
    state.setTimeoutTimestamp(st.lastTsUs / 1000L + IdleEvictMs)
    out.iterator
  }

  /** Streaming per-purchase PIT feature vectors, append mode. */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    featuresOf(EventsStreaming.eventsStream(spark, sfDir))

  /** Same stream over an arbitrary source with (user_id, ts: TIMESTAMP,
    * event_id, event_type, value) — the entry point multi-micro-batch
    * replay tests use to drive cross-batch chaining and disorder.
    */
  def featuresOf(stream: DataFrame): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(step)
      .toDF()
  }
}
