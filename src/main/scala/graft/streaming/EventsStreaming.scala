package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming tier over the events table — the same windowed
  * aggregations as TimeWindowQueries, expressed as readStream →
  * watermark → window agg → sink. Outside the DuckDB oracle contract
  * (the driver gate is batch); validated by StreamingSpec, which runs
  * the stream to completion over the static parquet and compares
  * against the batch result.
  *
  * Scale posture: watermark bounds state (late data beyond 30 min is
  * dropped); the aggregation state store partitions by (window, type)
  * — the same single-shuffle shape as the batch query. For continuous
  * ingestion swap the file source for Kafka; the plan below the source
  * is unchanged.
  */
object EventsStreaming {

  /** Streaming source over the static events parquet (file source; one
    * file = one micro-batch here). The file source requires a
    * directory, so we point at the sf dir and glob-filter to the
    * events file. The required schema is DERIVED from a batch read of
    * the same file rather than hardcoded — a user-provided schema
    * matches parquet columns by name, so a hardcoded copy would turn
    * schema drift into silent all-null columns instead of a loud
    * failure.
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema: StructType = spark.read.parquet(s"$sfDir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour counts per event type with a 30-minute watermark. */
  def tumblingCounts(spark: SparkSession, sfDir: String): DataFrame =
    eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"), col("n"))

  /** Sliding-window counts. Note: the batch counterpart
    * (q_win_sliding) also computes countDistinct(user_id), which is
    * unsupported in streaming aggregations — this streaming variant
    * covers the count only, and StreamingSpec compares against the
    * matching projection.
    */
  def slidingTotals(spark: SparkSession, sfDir: String): DataFrame =
    eventsStream(spark, sfDir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("ws_us"), col("n"))

  /** Run a streaming aggregate over the static input to completion,
    * materialized in a memory sink (complete mode), and return the
    * final table.
    */
  def runToCompletion(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q: StreamingQuery = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    // always stop: a failed processAllAvailable would otherwise leave
    // the named query active and block any re-run under the same name
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
