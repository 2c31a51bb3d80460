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
  */
object PitStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                event_id: Long, event_type: String, value: Double)
  case class PitState(lastView: Option[Double], lastViewUs: Long,
                      lastClick: Option[Double], lastClickUs: Long,
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
      PitState(None, Long.MinValue, None, Long.MinValue, 0L, Long.MinValue))
    val out = scala.collection.mutable.ArrayBuffer.empty[Feat]
    sorted.foreach { e =>
      e.event_type match {
        case "purchase" =>
          // feature vector strictly before the purchase: state reflects
          // only earlier (ts_us, event_id) rows — same as the batch
          // window frame ending at -1
          out += Feat(e.event_id, uid, e.ts_us,
            st.lastView, st.lastClick, st.nSignups)
        // last-observation slots follow event time, not arrival order:
        // a cross-batch late touch (bounded by the watermark delay)
        // must not replace a newer carried value — the LocfStream rule
        case "view" if e.ts_us >= st.lastViewUs =>
          st = st.copy(lastView = Some(e.value), lastViewUs = e.ts_us)
        case "click" if e.ts_us >= st.lastClickUs =>
          st = st.copy(lastClick = Some(e.value), lastClickUs = e.ts_us)
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
