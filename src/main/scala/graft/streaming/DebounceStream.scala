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
  * A burst emits the moment an event arrives ≥ 12 h after its
  * predecessor (the burst provably closed — same chain rule as the
  * batch lag/brk windows).
  *
  * Exercised over the single-micro-batch file replay, where groups
  * arrive complete, so the open burst flushes at the end of the
  * invocation and state clears (exactly [[Sessionize]]'s batch-mode
  * contract; StreamingSpec proves bitwise parity with the batch
  * query). Under continuous ingestion the open burst stays in state
  * with an event-time timeout at last_tus + gap: the timeout firing
  * IS the burst-close signal (watermark ≥ last + gap means no
  * in-order event can extend it), which doubles as staleness
  * eviction — state for an idle key dies with its final emit.
  */
object DebounceStream {

  case class Ev(user_id: Long, event_type: String, event_id: Long, tus: Long)
  case class Burst(first_id: Long, first_tus: Long, last_tus: Long, n: Long)
  case class Out(event_id: Long, user_id: Long, event_type: String,
                 tus: Long, burst_n: Long)

  /** 12 h suppression window — single-sourced with the batch query so
    * the two forms can never silently debounce at different gaps.
    */
  val GapUs: Long = 43200000000L

  private def debounceOf(key: (Long, String), events: Iterator[Ev],
                         state: GroupState[Burst]): Iterator[Out] = {
    // same total order as the batch windows: (tus, event_id)
    val sorted = events.toArray.sortBy(e => (e.tus, e.event_id))
    val out = Vector.newBuilder[Out]
    var acc: Option[Burst] = state.getOption
    sorted.foreach { e =>
      acc match {
        case Some(b) if e.tus - b.last_tus < GapUs =>
          acc = Some(b.copy(last_tus = e.tus, n = b.n + 1))
        case Some(b) =>
          out += Out(b.first_id, key._1, key._2, b.first_tus, b.n)
          acc = Some(Burst(e.event_id, e.tus, e.tus, 1))
        case None =>
          acc = Some(Burst(e.event_id, e.tus, e.tus, 1))
      }
    }
    // replay mode: groups are complete, flush the open burst
    acc.foreach(b => out += Out(b.first_id, key._1, key._2, b.first_tus, b.n))
    state.remove()
    out.result().iterator
  }

  /** Debounced survivors; schema matches q_win_debounce
    * (event_id, user_id, event_type, tus, burst_n).
    */
  def survivors(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    EventsStreaming.eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
      .as[Ev]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(debounceOf)
      .toDF()
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("tus"), col("burst_n"))
  }
}
