package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-type transition pairs via flatMapGroupsWithState —
  * the unbounded-stream form of TimeWindowQueries.q_win_transitions'
  * pair-extraction stage. State per user is ONE event (the last seen),
  * regardless of stream length; each micro-batch emits the (from, to)
  * pairs formed by [carried last] ++ sorted batch events, and the
  * downstream count/probability aggregation is ordinary relational
  * code over the emitted pairs (StreamingSpec folds them into the
  * batch query's matrix and asserts equality).
  *
  * Watermarked: the stream carries a 30-minute watermark and the state
  * uses an event-time timeout one hour past the user's last activity —
  * an idle user's single-row state is evicted instead of living
  * forever, the keyed-state hygiene an unbounded user population
  * requires. Eviction only suppresses cross-gap pairs (> 1 h), the
  * session boundary a deployment would want anyway; over the
  * single-batch file source no timeout fires, so parity with batch is
  * exact.
  *
  * Within a micro-batch events fold in (ts_us, event_id) order — the
  * batch query's lead() order. Across micro-batches the same per-key
  * event-time ordering contract as EwmaStream applies.
  */
object TransitionStream {

  // ts carries the watermark: the event-time-timeout checker requires
  // the watermarked attribute itself to reach the grouped Dataset, so
  // the projection keeps it alongside the long form used for sorting
  case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                event_id: Long, event_type: String)
  case class Last(ts_us: Long, event_id: Long, event_type: String)
  case class Pair(user_id: Long, from_type: String, to_type: String)

  private val IdleEvictMs = 3600000L

  private def step(uid: Long, events: Iterator[Ev],
                   state: GroupState[Last]): Iterator[Pair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toArray.sortBy(e => (e.ts_us, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Pair]
    var last = state.getOption
    sorted.foreach { e =>
      last.foreach(l => out += Pair(uid, l.event_type, e.event_type))
      // the carried predecessor follows the (ts_us, event_id) total
      // order: a cross-batch late event (bounded by the watermark
      // delay) must not become "last" over a newer carried one — its
      // own pair above is the bounded-disorder approximation, but
      // every FUTURE pair keeps the right predecessor. Also keeps the
      // idle-eviction horizon from regressing.
      if (last.forall(l => e.ts_us > l.ts_us ||
          (e.ts_us == l.ts_us && e.event_id >= l.event_id)))
        last = Some(Last(e.ts_us, e.event_id, e.event_type))
    }
    state.update(last.get)
    state.setTimeoutTimestamp(last.get.ts_us / 1000L + IdleEvictMs)
    out.iterator
  }

  /** Streaming per-user consecutive (from, to) event-type pairs,
    * append mode.
    */
  def pairs(spark: SparkSession, sfDir: String): DataFrame =
    pairsOf(EventsStreaming.eventsStream(spark, sfDir))

  /** Same stream over an arbitrary source with (user_id, ts: TIMESTAMP,
    * event_id, event_type) — the entry point multi-micro-batch replay
    * tests use to drive cross-batch chaining and disorder.
    */
  def pairsOf(stream: DataFrame): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(step)
      .toDF()
  }
}
