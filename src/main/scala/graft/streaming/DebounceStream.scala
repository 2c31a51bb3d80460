package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event debouncing via flatMapGroupsWithState — the
  * unbounded-stream form of TimeWindowQueries.q_win_debounce: within
  * each (user, event_type), events closer than 12 h to their
  * predecessor chain into one burst, and only the burst's FIRST event
  * survives, carrying the burst size.
  *
  * The Sessionize pattern at the suppression gap, with the state
  * being the OPEN burst only — four longs (first event_id, first
  * tus, last tus, count): O(1) per key regardless of burst length,
  * because a debouncer never needs the events between first and last.
  *
  * Burst-close protocol (the real continuous-ingestion path, not a
  * replay-only approximation): a burst emits either
  *
  *  - in-batch, the moment an event arrives ≥ 12 h after its
  *    predecessor (the burst provably closed — same chain rule as the
  *    batch lag/brk windows), or
  *  - via EVENT-TIME TIMEOUT: the open burst stays in state with a
  *    timeout at last_tus + gap; the timeout firing IS the burst-close
  *    signal (watermark ≥ last + gap means no in-order event can
  *    extend it), which doubles as staleness eviction — state for an
  *    idle key dies with its final emit.
  *
  * A burst that spans micro-batches is therefore ONE burst: the open
  * burst carries over in state and the next batch's events chain onto
  * it (StreamingSpec proves bitwise parity with the batch query over a
  * 3-micro-batch time-split replay). The corollary of correct
  * streaming semantics: bursts still open at end-of-input (not yet
  * 12 h + watermark-delay behind the last observed event time) stay
  * in state awaiting more data — a finite-replay parity check must
  * push the watermark past them (StreamingSpec's far-future sentinel
  * row) rather than expect an unconditional flush.
  */
object DebounceStream {

  /** `ts` duplicates `tus` as a timestamp: the watermark column must
    * survive into the Dataset feeding flatMapGroupsWithState or the
    * analyzer rejects the event-time timeout.
    */
  case class Ev(user_id: Long, event_type: String, event_id: Long, tus: Long,
                ts: java.sql.Timestamp)
  case class Burst(first_id: Long, first_tus: Long, last_tus: Long, n: Long)
  case class Out(event_id: Long, user_id: Long, event_type: String,
                 tus: Long, burst_n: Long)

  /** 12 h suppression window — single-sourced with the batch query so
    * the two forms can never silently debounce at different gaps.
    */
  val GapUs: Long = 43200000000L

  private def debounceOf(key: (Long, String), events: Iterator[Ev],
                         state: GroupState[Burst]): Iterator[Out] = {
    if (state.hasTimedOut) {
      // watermark passed last_tus + gap: no in-order event can extend
      // the burst — emit it and clear the key's state
      val b = state.get
      state.remove()
      Iterator.single(Out(b.first_id, key._1, key._2, b.first_tus, b.n))
    } else {
      // same total order as the batch windows: (tus, event_id); the
      // open burst from prior batches (if any) seeds the chain. The
      // open-burst fold is order-INSENSITIVE inside the merge window
      // (first follows the (tus, event_id) total order, last never
      // regresses) so a cross-batch late arrival — bounded by the
      // 30 min watermark delay, far inside the 12 h gap — can never
      // shrink the burst-close timeout horizon or misreport the
      // surviving first event (the Sessionize.foldEvents rule).
      val sorted = events.toArray.sortBy(e => (e.tus, e.event_id))
      val out = Vector.newBuilder[Out]
      var acc: Option[Burst] = state.getOption
      sorted.foreach { e =>
        acc match {
          case Some(b) if e.tus - b.last_tus < GapUs && b.first_tus - e.tus < GapUs =>
            val takeFirst = e.tus < b.first_tus ||
              (e.tus == b.first_tus && e.event_id < b.first_id)
            acc = Some(Burst(
              if (takeFirst) e.event_id else b.first_id,
              if (takeFirst) e.tus else b.first_tus,
              math.max(b.last_tus, e.tus), b.n + 1))
          case Some(b) if e.tus <= b.first_tus - GapUs =>
            // a straggler a full gap before the open burst: its own
            // single-event burst (unreachable while gap >> watermark
            // delay — a 12 h-late event is dropped upstream — kept for
            // structural symmetry with Sessionize.foldEvents)
            out += Out(e.event_id, key._1, key._2, e.tus, 1L)
          case Some(b) =>
            out += Out(b.first_id, key._1, key._2, b.first_tus, b.n)
            acc = Some(Burst(e.event_id, e.tus, e.tus, 1))
          case None =>
            acc = Some(Burst(e.event_id, e.tus, e.tus, 1))
        }
      }
      acc.foreach { b =>
        val closeMs = (b.last_tus + GapUs) / 1000L
        if (closeMs <= state.getCurrentWatermarkMs()) {
          // already provably closed (a slow key replayed behind the
          // watermark) — setTimeoutTimestamp would reject a timestamp
          // at/behind the watermark, and no timeout is needed: emit now
          out += Out(b.first_id, key._1, key._2, b.first_tus, b.n)
          state.remove()
        } else {
          state.update(b)
          state.setTimeoutTimestamp(closeMs)
        }
      }
      out.result().iterator
    }
  }

  /** Debounce over an events stream with columns (user_id, event_type,
    * event_id, ts: TIMESTAMP); schema matches q_win_debounce
    * (event_id, user_id, event_type, tus, burst_n). The watermark is
    * applied here so the event-time timeout always has its required
    * watermark regardless of the source.
    */
  def survivorsOf(stream: DataFrame): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tus"), col("ts"))
      .as[Ev]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(debounceOf)
      .toDF()
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("tus"), col("burst_n"))
  }

  /** Debounced survivors over the standard events file replay. */
  def survivors(spark: SparkSession, sfDir: String): DataFrame =
    survivorsOf(EventsStreaming.eventsStream(spark, sfDir))
}
