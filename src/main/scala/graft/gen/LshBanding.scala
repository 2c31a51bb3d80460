package graft.gen

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The calibrated MinHash/LSH banding scheme, shared by
  * DedupQueries.q_dedup_minhash and PipelineQueries.q_pipeline_e2e so
  * the two can never desynchronize — both the Spark columns and the
  * DuckDB oracle-SQL fragments are generated from these constants.
  *
  * 16 hashes in 2 bands of 8 rows, calibrated on the testdata corpus:
  * random doc pairs have shingle J ≈ 0.15-0.27 (shared synthetic
  * vocabulary), planted near-dups J ≈ 0.98. P(candidate) = 1-(1-J^8)^2:
  * ~1e-5 at J=0.23 (noise suppressed), ~0.98 at J=0.98 (dups caught).
  */
object LshBanding {
  val NumHashes = 16
  val Bands = 2
  val RowsPerBand: Int = NumHashes / Bands
  val ShingleLen = 5

  /** All signatures via the native expression (one md5 pass). */
  def minhashSigs(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashSigsExpr(
      ColumnBridge.expression(text), ShingleLen, NumHashes))
  }

  /** Per-band keys over sig0..sig{n-1} columns. */
  def bandKeys: Seq[Column] = (0 until Bands).map { j =>
    md5(concat_ws(",",
      (0 until RowsPerBand).map(r => col(s"sig${RowsPerBand * j + r}")): _*))
  }

  /** sig column projections from a `sigs` array column. */
  def sigCols: Seq[Column] =
    (0 until NumHashes).map(i => element_at(col("sigs"), i + 1).as(s"sig$i"))

  // ---- DuckDB oracle fragments (same constants) ----

  /** `hs` (hashed shingles) list from a `text` column. Uses length()
    * (characters), NOT strlen() (bytes) — substr is character-based, and
    * the Spark expression shingles codepoints, so the two agree on
    * non-ASCII corpora too.
    */
  def shinglesHashSql: String =
    s"""list_transform(
       |      list_distinct(list_transform(
       |        generate_series(1, greatest(length(text) - ${ShingleLen - 1}, 1)),
       |        i -> substr(text, i, $ShingleLen))),
       |      x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % ${MinHashImpl.P}::BIGINT)""".stripMargin

  /** sig0..sig{n-1} selections from an `hs` list column. */
  def sigsSql: String = (0 until NumHashes).map { i =>
    val (a, b) = MinHashImpl.hashParams(i)
    s"list_min(list_transform(hs, h -> (h * ${a}::BIGINT + ${b}::BIGINT) % ${MinHashImpl.P}::BIGINT)) AS sig$i"
  }.mkString(",\n    ")

  /** CASE mapping band index k.j → band key. */
  def bandCaseSql: String = (0 until Bands).map { j =>
    val cat = (0 until RowsPerBand).map(r => s"sig${RowsPerBand * j + r}")
      .mkString("concat_ws(',', ", ", ", ")")
    s"WHEN $j THEN md5($cat)"
  }.mkString(" ")

  /** VALUES list of band indices. */
  def bandIdxValuesSql: String = (0 until Bands).map(j => s"($j)").mkString(",")
}
