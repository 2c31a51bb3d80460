package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming exponential smoothing via mapGroupsWithState — the
  * unbounded-stream form of TimeWindowQueries.q_win_ewma. State per
  * user is ONE (count, ewma) pair regardless of stream length: the
  * recurrence s_i = (s_{i-1} + x_i)/2 folds each micro-batch into the
  * carried accumulator, exactly the arithmetic the batch query's HOF
  * fold performs (same IEEE ops in the same order, so the doubles
  * match bitwise — StreamingSpec asserts it).
  *
  * Within a micro-batch events are sorted by (ts_us, event_id) — the
  * same deterministic order the batch query's sort_array pins.
  * ACROSS micro-batches the fold follows arrival order, the standard
  * streaming contract: correctness for the recurrence requires
  * per-key event-time ordering across batches, which ingestion
  * provides when the source is partitioned by key and time (e.g. a
  * log compacted per user); otherwise pair it with a watermark +
  * reorder buffer upstream.
  *
  * State posture: NoTimeout is deliberate — the semantic is a LIFETIME
  * recurrence, so evicting an idle user's accumulator would silently
  * restart their series on return. Store growth is #distinct-users ×
  * O(1) (16 bytes of state per key), the minimum any lifetime
  * aggregate can hold; a deployment that cannot carry its full key
  * space bounds it by snapshotting idle keys to a compacted store and
  * re-seeding on reappearance — a sink-side policy, not a semantics
  * change this operator should impose.
  */
object EwmaStream {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long, value: Double)
  case class Acc(n: Long, ewma: Double)
  case class Out(user_id: Long, n_events: Long, ewma: Double)

  private def fold(uid: Long, events: Iterator[Ev], state: GroupState[Acc]): Out = {
    val sorted = events.toArray.sortBy(e => (e.ts_us, e.event_id))
    var st = state.getOption.getOrElse(Acc(0L, 0.0))
    sorted.foreach { e =>
      st =
        if (st.n == 0L) Acc(1L, e.value)
        else Acc(st.n + 1L, 0.5 * st.ewma + 0.5 * e.value)
    }
    state.update(st)
    Out(uid, st.n, st.ewma)
  }

  /** Streaming per-user EWMA over the events stream; one updated row
    * per user per micro-batch (update output mode).
    */
  def ewma(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    EventsStreaming.eventsStream(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
      .toDF()
  }
}
