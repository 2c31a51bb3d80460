package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Testdata table loaders + cross-engine determinism conventions.
  *
  * Every query in the inventory must hash-match a DuckDB oracle on the
  * same parquet (driver contract). The rules that make that possible:
  *
  *  1. Money/metric doubles are cast to DECIMAL(18,2) *before* any
  *     aggregation: decimal sums are exact integer arithmetic in both
  *     engines, so they are independent of partial-aggregation order —
  *     raw double sums are not. (Sources are on a 0.01 grid, so the
  *     cast itself is unambiguous.)
  *  2. Averages/ratios are derived as CAST(exact_sum AS DOUBLE)/count:
  *     identical operands ⇒ identical IEEE result ⇒ no rounding needed.
  *     Engine round() on doubles is never used for output columns
  *     (Spark rounds via shortest-decimal-repr, DuckDB on the binary
  *     value — they disagree exactly at .5 boundaries).
  *  3. Derived timestamps are emitted as epoch microseconds (BIGINT):
  *     Spark unix_micros ≡ DuckDB epoch_us, no timezone ambiguity.
  *  4. Every result defines a total order (ORDER BY with unique
  *     tie-break keys); DuckDB ORDER BY gets explicit NULLS FIRST on
  *     ASC keys to match Spark's default null ordering.
  *  5. Cross-engine hashing uses md5 (same bytes in, same hex out):
  *     a 60-bit integer hash is conv(substr(md5(x),1,15),16,10) in
  *     Spark ≡ ('0x'||substr(md5(x),1,15))::BIGINT in DuckDB.
  *  6. Wide-decimal → double casts in oracle SQL go through VARCHAR:
  *     DuckDB's direct DECIMAL→DOUBLE conversion is not correctly
  *     rounded once the decimal exceeds ~15 significant digits (it can
  *     be 1 ulp off), while Spark's BigDecimal.doubleValue is exact.
  *     CAST(CAST(x AS VARCHAR) AS DOUBLE) re-parses via strtod, which
  *     rounds correctly and matches Spark (see q_agg_stats).
  */
object Tables {
  val Dec2: DecimalType  = DecimalType(18, 2)
  val Dec380: DecimalType = DecimalType(38, 0)
  val Dec382: DecimalType = DecimalType(38, 2)
  val Dec384: DecimalType = DecimalType(38, 4)

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")

  /** events.ts normalization — the testdata has shipped two physical
    * encodings of this column, so the loader adapts to the schema it
    * finds rather than assuming one:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *    unless `spark.sql.legacy.parquet.nanosAsLong=true`, which
    *    surfaces a raw nanos Long. Floor-`div` 1000 → microseconds
    *    (matching DuckDB's ns→us truncation on read; `div` keeps the
    *    arithmetic in Long — `/` would go through Double and lose
    *    precision above 2^53), re-typed as a session-TZ (UTC)
    *    timestamp.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as
    *    TIMESTAMP_NTZ; cast to session-TZ timestamp (sessions pin UTC,
    *    so the instant is unchanged and unix_micros ≡ DuckDB epoch_us).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
