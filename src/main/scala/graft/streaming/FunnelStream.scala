package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming conversion funnel via mapGroupsWithState — the
  * unbounded-stream form of TimeWindowQueries.q_win_funnel. State per
  * user is THREE timestamps (first view, first click strictly after
  * it, first purchase strictly after that) regardless of stream
  * length; the per-event transition is a 3-slot state machine, so a
  * user's funnel stage is always available with O(1) state — the
  * real-time-attribution serving shape.
  *
  * Within a micro-batch events fold in (ts_us, event_id) order — the
  * same total order the batch query's min-aggregates induce, so the
  * reached stages agree exactly (StreamingSpec folds the streamed
  * per-user stages into the batch query's stage counts and asserts
  * equality). Across micro-batches the same per-key event-time
  * ordering contract as EwmaStream applies — and the same lifetime
  * state posture: NoTimeout because a funnel stage is a lifetime
  * fact (evicting an idle user would reset their stage to 0 on
  * return), state is #distinct-users × three longs, and bounding a
  * too-large key space is a snapshot-and-reseed sink policy, not an
  * in-operator TTL.
  */
object FunnelStream {

  private val Unset = Long.MinValue

  case class Ev(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  case class Acc(view_us: Long, click_us: Long, purch_us: Long)
  case class Out(user_id: Long, stage: Int)

  private def step(uid: Long, events: Iterator[Ev], state: GroupState[Acc]): Out = {
    val sorted = events.toArray.sortBy(e => (e.ts_us, e.event_id))
    var st = state.getOption.getOrElse(Acc(Unset, Unset, Unset))
    sorted.foreach { e =>
      // each slot is the MIN qualifying event time, not first-arrival:
      // a cross-batch late event (bounded by the watermark delay) can
      // move a slot EARLIER — always consistency-preserving (the next
      // slot was strictly after the old value, hence still after the
      // new minimum) and strictly closer to the batch min-aggregates.
      // For in-order arrival the min conditions reduce to the original
      // fill-once machine. Residual: an event REJECTED before a late
      // earlier view/click arrived cannot be retro-accepted — the
      // O(1)-state trade.
      e.event_type match {
        case "view" if st.view_us == Unset || e.ts_us < st.view_us =>
          st = st.copy(view_us = e.ts_us)
        case "click" if st.view_us != Unset && e.ts_us > st.view_us &&
          (st.click_us == Unset || e.ts_us < st.click_us) =>
          st = st.copy(click_us = e.ts_us)
        case "purchase" if st.click_us != Unset && e.ts_us > st.click_us &&
          (st.purch_us == Unset || e.ts_us < st.purch_us) =>
          st = st.copy(purch_us = e.ts_us)
        case _ => ()
      }
    }
    state.update(st)
    val stage =
      if (st.purch_us != Unset) 3
      else if (st.click_us != Unset) 2
      else if (st.view_us != Unset) 1
      else 0
    Out(uid, stage)
  }

  /** Streaming per-user funnel stage; one updated row per user per
    * micro-batch (update output mode).
    */
  def stages(spark: SparkSession, sfDir: String): DataFrame =
    stagesOf(EventsStreaming.eventsStream(spark, sfDir))

  /** Same stream over an arbitrary source with (user_id, ts: TIMESTAMP,
    * event_id, event_type) — the entry point multi-micro-batch replay
    * tests use to drive cross-batch chaining and disorder.
    */
  def stagesOf(stream: DataFrame): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(step)
      .toDF()
  }
}
