package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming input-distribution drift counts — the unbounded-stream
  * form of TimeWindowQueries.q_drift's counting stage. The split-window
  * tag is a row-local CASE (exactly as in batch), so the whole monitor
  * is ONE watermarked streaming aggregation keyed by event_type: state
  * is |event types| rows regardless of stream length, updated
  * incrementally per micro-batch — the always-on pipeline health check
  * that batch q_drift re-derives per run.
  *
  * The 30-minute watermark bounds late data the same way the windowed
  * aggregations do; counts are exact integers, so the downstream
  * rate/drift derivation (plain relational code over the |types|-row
  * output, see StreamingSpec) is identical double division of identical
  * ints — stream == batch exactly. In deployment the fixed split
  * boundary becomes a sliding reference-vs-current boundary; the plan
  * is unchanged.
  */
object DriftStream {

  /** Per-event-type counts in the two halves of the split window,
    * update mode (|types|-row state, incrementally maintained).
    */
  def halfCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val split = lit(graft.operators.TimeWindowQueries.DriftSplit).cast("timestamp")
    EventsStreaming.eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .groupBy(col("event_type"))
      .agg(count(when(col("ts") < split, 1)).as("n_a"),
        count(when(col("ts") >= split, 1)).as("n_b"))
  }
}
