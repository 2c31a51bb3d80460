package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Custom-state sessionization via the typed
  * KeyValueGroupedDataset.flatMapGroupsWithState API — the arbitrary-
  * state operator of the streaming tier, in BOTH execution modes:
  *
  *  - `sessions` (batch): each group arrives complete in one
  *    invocation, so the open session flushes at end-of-group. This
  *    form sits under the DuckDB oracle as q_session_state, matching
  *    the declarative session_window query
  *    (TimeWindowQueries.q_win_session) exactly.
  *  - `sessionsOfStream` (streaming): the open session STAYS in state
  *    across micro-batches with an event-time timeout at
  *    last_us + gap — the timeout firing is the session-close signal
  *    (watermark ≥ last + gap means no in-order event can extend it)
  *    and doubles as staleness eviction, the same burst-close protocol
  *    as DebounceStream. A session spanning micro-batches is therefore
  *    ONE session (StreamingSpec proves parity with the batch query
  *    over a time-split multi-batch replay).
  *
  * Both modes fold events through the same `foldEvents` chain rule, so
  * the two forms cannot silently sessionize differently.
  *
  * Semantics match session_window(ts, 10 min) exactly: a session
  * breaks when the gap is >= 10 minutes; end = last event + gap.
  * Money is accumulated in exact integer cents (inputs are on the
  * 0.01 grid) and converted to DECIMAL at the boundary — same values
  * as the decimal-sum path, no float-order sensitivity.
  *
  * Scale: one shuffle on user_id; state per user is O(1) (current
  * session accumulator — four longs, regardless of session length).
  */
object Sessionize {

  case class EventIn(user_id: Long, ts_us: Long, cents: Long)

  /** Streaming input: `ts` duplicates `ts_us` as a timestamp — the
    * watermark column must survive into the Dataset feeding
    * flatMapGroupsWithState or the analyzer rejects the event-time
    * timeout (same constraint as DebounceStream.Ev).
    */
  case class EventTs(user_id: Long, ts_us: Long, cents: Long,
                     ts: java.sql.Timestamp)
  case class SessionAcc(start_us: Long, last_us: Long, n: Long, cents: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n: Long, total_cents: Long)

  val GapUs: Long = 10L * 60 * 1000000

  /** The shared chain rule: fold time-sorted events onto an optional
    * carried-over open session; returns (closed sessions, open
    * session). Ties at equal ts_us need no tie-break — they land in
    * the same session either way and cents addition commutes.
    *
    * Disorder tolerance: within one micro-batch events are sorted, but
    * ACROSS batches an event may precede the carried open session
    * (bounded by the 30 min watermark delay — and the 10 min gap is
    * SMALLER than that bound, so this is reachable, not theoretical).
    * The open-session fold is therefore order-INSENSITIVE inside the
    * merge window (start = min, last = max): a late arrival can never
    * shrink the session's end — and with it the close timeout — or
    * misreport its start. A straggler a full gap before the open
    * session emits as its own closed singleton session (emitting the
    * OPEN session instead would close a session future events can
    * still extend). Residual divergence from full batch parity: two
    * stragglers within one gap of each other under-merge (each emits
    * alone), and a straggler landing exactly in a gap the batch sort
    * would bridge cannot retro-merge already-emitted sessions —
    * both reachable only when disorder exceeds the gap, and bounded
    * by the watermark delay; full parity there requires an
    * O(disorder-window) reorder buffer, which the O(1)-state design
    * deliberately trades away.
    */
  private def foldEvents(userId: Long, acc0: Option[SessionAcc],
                         sorted: Array[EventIn]): (Vector[SessionOut], Option[SessionAcc]) = {
    val out = Vector.newBuilder[SessionOut]
    var acc = acc0
    sorted.foreach { e =>
      acc match {
        case Some(a) if e.ts_us - a.last_us < GapUs && a.start_us - e.ts_us < GapUs =>
          acc = Some(SessionAcc(math.min(a.start_us, e.ts_us),
            math.max(a.last_us, e.ts_us), a.n + 1, a.cents + e.cents))
        case Some(a) if e.ts_us <= a.start_us - GapUs =>
          out += SessionOut(userId, e.ts_us, e.ts_us + GapUs, 1, e.cents)
        case Some(a) =>
          out += SessionOut(userId, a.start_us, a.last_us + GapUs, a.n, a.cents)
          acc = Some(SessionAcc(e.ts_us, e.ts_us, 1, e.cents))
        case None =>
          acc = Some(SessionAcc(e.ts_us, e.ts_us, 1, e.cents))
      }
    }
    (out.result(), acc)
  }

  private def sessionsOf(userId: Long, events: Iterator[EventIn],
                         state: GroupState[SessionAcc]): Iterator[SessionOut] = {
    val (closed, open) =
      foldEvents(userId, state.getOption, events.toArray.sortBy(_.ts_us))
    // batch mode: groups are complete, flush the open session
    state.remove()
    (closed ++ open.map(a =>
      SessionOut(userId, a.start_us, a.last_us + GapUs, a.n, a.cents))).iterator
  }

  private def sessionsOfStreaming(userId: Long, events: Iterator[EventTs],
                                  state: GroupState[SessionAcc]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      // watermark passed last_us + gap: no in-order event can extend
      // the session — emit it and clear the key's state
      val a = state.get
      state.remove()
      Iterator.single(SessionOut(userId, a.start_us, a.last_us + GapUs, a.n, a.cents))
    } else {
      val sorted = events.toArray.sortBy(_.ts_us)
        .map(e => EventIn(e.user_id, e.ts_us, e.cents))
      val (closed, open) = foldEvents(userId, state.getOption, sorted)
      var out = closed
      open.foreach { a =>
        val closeMs = (a.last_us + GapUs) / 1000L
        if (closeMs <= state.getCurrentWatermarkMs()) {
          // already provably closed (a slow key replayed behind the
          // watermark) — setTimeoutTimestamp would reject a timestamp
          // at/behind the watermark, and no timeout is needed
          out :+= SessionOut(userId, a.start_us, a.last_us + GapUs, a.n, a.cents)
          state.remove()
        } else {
          state.update(a)
          state.setTimeoutTimestamp(closeMs)
        }
      }
      out.iterator
    }
  }

  /** Batch sessionization over the events table; output schema matches
    * q_win_session (user_id, start_us, end_us, n, total).
    */
  def sessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(sessionsOf)
      .toDF()
      .select(col("user_id"), col("start_us"), col("end_us"), col("n"),
        (col("total_cents").cast(graft.Tables.Dec382) / lit(100)).cast(graft.Tables.Dec382)
          .as("total"))
      .orderBy("user_id", "start_us")
  }

  /** Streaming sessionization over an events stream with columns
    * (user_id, ts: TIMESTAMP, value); output schema matches
    * q_win_session. The watermark is applied here so the event-time
    * timeout always has its required watermark regardless of source.
    * Sessions still open at end-of-input (not yet gap + watermark-delay
    * behind the last observed event time) stay in state awaiting more
    * data — a finite-replay parity check must push the watermark past
    * them (see StreamingSpec's far-future sentinel row).
    */
  def sessionsOfStream(stream: DataFrame): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"), col("ts"))
      .as[EventTs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(sessionsOfStreaming)
      .toDF()
      .select(col("user_id"), col("start_us"), col("end_us"), col("n"),
        (col("total_cents").cast(graft.Tables.Dec382) / lit(100)).cast(graft.Tables.Dec382)
          .as("total"))
  }
}
