package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM change detection via flatMapGroupsWithState — the
  * unbounded-stream form of TimeWindowQueries.q_win_cusum. State per
  * user is TWO longs (the running cumsum of scaled deviations and its
  * running minimum) — the closed form S_t = cs_t − min(cs) needs
  * nothing else, which is exactly why the closed form matters for
  * streaming: the textbook recursion and this form produce the same
  * alarm sequence, but this one's state is O(1) and order-robust
  * within a micro-batch sort.
  *
  * The corpus mean enters the same way as the batch query — scaled
  * through by n (dev = n·x − Σx in CENTS, exact integer arithmetic; no
  * doubles until the output cast). n and Σx come from a one-off batch
  * aggregate over the historical corpus: in production the reference
  * distribution IS a frozen training-period statistic (a drift monitor
  * that re-estimates its own baseline from the drifting stream defeats
  * itself), so a static broadcast value is the honest semantics, not a
  * shortcut. Watermarked with the standard 30-minute bound and a 24 h
  * event-time idle eviction.
  */
object CusumStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                event_id: Long, cents: Long)
  case class St(cs: Long, minCs: Long, lastTsUs: Long)
  case class Out(event_id: Long, user_id: Long, tus: Long,
                 cusum: Double, alarm: Boolean)

  private val IdleEvictMs = 86400000L

  /** Per-event CUSUM stat stream. `n` and `sumCents` are the frozen
    * reference statistics (count and value-sum in cents over the
    * reference corpus).
    */
  /** The state-step function closes over ONLY the two reference longs
    * (a nested def inside `stats` would capture the whole enclosing
    * scope, SparkSession included — Task not serializable).
    */
  private def stepFn(n: Long, sumCents: Long)
      : (Long, Iterator[Ev], GroupState[St]) => Iterator[Out] =
    (uid, events, state) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val sorted = events.toArray.sortBy(e => (e.ts_us, e.event_id))
        if (sorted.isEmpty) Iterator.empty
        else {
          // running min starts at +inf: the batch running-min window
          // includes the current row, so the first row's stat is always 0
          var st = state.getOption.getOrElse(St(0L, Long.MaxValue, 0L))
          val out = sorted.map { e =>
            val cs = st.cs + (e.cents * n - sumCents)
            val minCs = math.min(st.minCs, cs)
            // max: a cross-batch late batch must not regress the
            // idle-eviction horizon (the cumsum itself commutes; the
            // running-min statistic keeps the documented per-key
            // event-time ordering contract)
            st = St(cs, minCs, math.max(st.lastTsUs, e.ts_us))
            val stat = cs - minCs
            // stat is in cents·n; the batch decimal is (cents/100)·n, and
            // both renderings are correctly-rounded doubles of the same
            // rational, hence bit-identical
            Out(e.event_id, uid, e.ts_us, stat / 100.0, stat > n * 500L * 100L)
          }
          state.update(st)
          state.setTimeoutTimestamp(st.lastTsUs / 1000L + IdleEvictMs)
          out.iterator
        }
      }
    }

  def stats(spark: SparkSession, sfDir: String, n: Long, sumCents: Long): DataFrame =
    statsOf(EventsStreaming.eventsStream(spark, sfDir), n, sumCents)

  /** Same stream over an arbitrary source with (user_id, ts: TIMESTAMP,
    * event_id, value) — the entry point multi-micro-batch replay tests
    * use to drive cross-batch state chaining and idle eviction.
    */
  def statsOf(stream: DataFrame, n: Long, sumCents: Long): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        (col("value").cast(graft.Tables.Dec2) * 100).cast("long").as("cents"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(stepFn(n, sumCents))
      .toDF()
  }

  /** Reference statistics from the batch corpus: (n, Σ value in cents),
    * the frozen baseline the stream measures drift against.
    */
  def referenceStats(spark: SparkSession, sfDir: String): (Long, Long) = {
    val row = spark.read.parquet(s"$sfDir/events.parquet")
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast(graft.Tables.Dec2) * 100).cast("long")).as("sc"))
      .head()
    (row.getLong(0), row.getLong(1))
  }
}
