package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Custom-state sessionization via the typed
  * KeyValueGroupedDataset.flatMapGroupsWithState API — the arbitrary-
  * state operator of the streaming tier, exercised here in batch mode
  * (each group arrives complete; state machinery identical) so it can
  * sit under the same DuckDB oracle as the declarative
  * session_window query (TimeWindowQueries.q_win_session).
  *
  * Semantics match session_window(ts, 10 min) exactly: a session
  * breaks when the gap is >= 10 minutes; end = last event + gap.
  * Money is accumulated in exact integer cents (inputs are on the
  * 0.01 grid) and converted to DECIMAL at the boundary — same values
  * as the decimal-sum path, no float-order sensitivity.
  *
  * Scale: one shuffle on user_id; state per user is O(1) (current
  * session accumulator). Under readStream the same code runs with
  * EventTimeTimeout + watermark to emit sessions incrementally.
  */
object Sessionize {

  case class EventIn(user_id: Long, ts_us: Long, cents: Long)
  case class SessionAcc(start_us: Long, last_us: Long, n: Long, cents: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n: Long, total_cents: Long)

  val GapUs: Long = 10L * 60 * 1000000

  private def sessionsOf(userId: Long, events: Iterator[EventIn],
                         state: GroupState[SessionAcc]): Iterator[SessionOut] = {
    val sorted = events.toArray.sortBy(_.ts_us)
    val out = Vector.newBuilder[SessionOut]
    var acc: Option[SessionAcc] = state.getOption
    sorted.foreach { e =>
      acc match {
        case Some(a) if e.ts_us - a.last_us < GapUs =>
          acc = Some(SessionAcc(a.start_us, e.ts_us, a.n + 1, a.cents + e.cents))
        case Some(a) =>
          out += SessionOut(userId, a.start_us, a.last_us + GapUs, a.n, a.cents)
          acc = Some(SessionAcc(e.ts_us, e.ts_us, 1, e.cents))
        case None =>
          acc = Some(SessionAcc(e.ts_us, e.ts_us, 1, e.cents))
      }
    }
    // batch mode: groups are complete, flush the open session
    acc.foreach(a => out += SessionOut(userId, a.start_us, a.last_us + GapUs, a.n, a.cents))
    state.remove()
    out.result().iterator
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
}
