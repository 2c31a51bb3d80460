package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Continuous-ingest form of DedupQueries.q_dedup_incremental: the
  * delta arrives as a STREAM of new documents and is deduplicated
  * against the static historical corpus by a stream-static LEFT ANTI
  * join on the content fingerprint — each micro-batch drops arrivals
  * whose fingerprint already exists in the corpus. The static side is
  * planned per micro-batch like any batch join (broadcastable once the
  * corpus-side filter reduces it), and the join is STATELESS on the
  * stream side — no keyed state store at all, the cheapest possible
  * streaming operator. At 100 TB the static side is the bloom-pruned
  * candidate scan of the batch query; over the single-batch file
  * source here the semantics are proven equal to the batch query in
  * StreamingSpec.
  *
  * (Arrivals are NOT deduplicated against each other within the
  * stream — same as the batch query, which keeps intra-delta
  * duplicates; dropDuplicates on fp upstream adds that if wanted.)
  */
object IncrementalDedupStream {

  private val DeltaSrc = Seq("src18", "src19")

  /** Streaming source over the static documents parquet (file source;
    * one file = one micro-batch), schema derived from a batch read as
    * in EventsStreaming.eventsStream.
    */
  def docsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema: StructType =
      spark.read.parquet(s"$sfDir/documents.parquet").schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
  }

  private def fp = md5(concat_ws(" ", slice(split(col("text"), " "), 1, 3)))

  /** Surviving (new, never-seen) delta docs as an append stream. */
  def survivors(spark: SparkSession, sfDir: String): DataFrame = {
    val corpusFps = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(!col("source").isin(DeltaSrc: _*))
      .select(fp.as("cfp"))
    docsStream(spark, sfDir)
      .filter(col("source").isin(DeltaSrc: _*))
      .select(col("doc_id"), col("source"), fp.as("fp"))
      .join(corpusFps, col("fp") === col("cfp"), "left_anti")
      .select(col("doc_id"), col("source"))
  }
}
