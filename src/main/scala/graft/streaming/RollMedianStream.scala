package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling exact median via flatMapGroupsWithState — the
  * unbounded-stream form of TimeWindowQueries.q_win_rollmedian. State
  * per user is the last ≤ 7 values in arrival-frame order (a bounded
  * ring, O(1) regardless of stream length); each incoming event emits
  * exactly one row carrying the median of its 7-row frame, computed
  * with the SAME arithmetic as the batch window — frame sorted
  * ascending, odd frame → middle element verbatim, even frame →
  * (lo + hi) / 2 — so the doubles match the batch query bitwise
  * (StreamingSpec asserts both directions).
  *
  * Watermarked with the standard 30-minute bound and an event-time
  * idle eviction 24 h past the user's last activity (the frame is
  * position-based, not time-based, so eviction is a state-size bound,
  * not a semantic boundary; over the single-batch file source no
  * timeout fires and parity is exact). Across micro-batches the same
  * per-key event-time ordering contract as EwmaStream applies.
  */
object RollMedianStream {

  // ts rides along (as in PitStream) so the watermark column survives
  // the typed projection — EventTimeTimeout needs it downstream
  case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                event_id: Long, value: Double)
  case class Ring(vals: Seq[Double], lastTsUs: Long)
  case class Out(event_id: Long, user_id: Long, n_frame: Long,
                 roll_median: Double)

  private val FrameLen = 7
  private val IdleEvictMs = 86400000L

  private def medianOf(frame: Seq[Double]): Double = {
    val s = frame.sorted.toArray
    val m = s.length
    if (m % 2 == 1) s(m / 2)
    else (s(m / 2 - 1) + s(m / 2)) / 2.0
  }

  private def step(uid: Long, events: Iterator[Ev],
                   state: GroupState[Ring]): Iterator[Out] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toArray.sortBy(e => (e.ts_us, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(Ring(Seq.empty, 0L))
    val out = sorted.map { e =>
      val frame = (st.vals :+ e.value).takeRight(FrameLen)
      // max: the ring itself is a sequential statistic under the
      // documented ordering contract, but a late batch must not
      // regress the idle-eviction horizon
      st = Ring(frame, math.max(st.lastTsUs, e.ts_us))
      Out(e.event_id, uid, frame.length.toLong, medianOf(frame))
    }
    state.update(st)
    state.setTimeoutTimestamp(st.lastTsUs / 1000L + IdleEvictMs)
    out.iterator
  }

  /** Streaming per-event rolling medians, append mode (one output row
    * per input event).
    */
  def medians(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    EventsStreaming.eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(step)
      .toDF()
  }
}
