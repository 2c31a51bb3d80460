package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** The end-to-end training-data pipeline as ONE oracle-gated query:
  * quality filter → exact dedup (keep-first) → MinHash near-dup
  * removal → per-language corpus stats. The proof that the individual
  * operators compose into the actual workload the engine exists for.
  *
  * Every stage reuses the exact semantics of its standalone query
  * (q_text_quality, q_dedup_exact, q_dedup_minhash), and the DuckDB
  * oracle recomputes the whole pipeline in CTEs — so a drift in any
  * stage breaks the hash.
  *
  * Scale shape: quality is a narrow pass; exact dedup shuffles once on
  * the digest; near-dup shuffles ×2 band rows; the final agg is tiny.
  * No stage is quadratic.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private val NumHashes = 16
  private val Bands = 2
  private val RowsPerBand = NumHashes / Bands

  private def minhashSigs(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.gen.MinHashSigsExpr(
      ColumnBridge.expression(text), 5, NumHashes))
  }

  def queries: Map[String, Q] = Map(
    "q_pipeline_e2e" -> ((s, d) => {
      val toks = split(col("text"), " ")

      // stage 1: quality filter (q_text_quality's keep rule)
      val kept = documents(s, d)
        .withColumn("n_toks", size(toks))
        .withColumn("char_sum", aggregate(toks, lit(0L), (acc, t) => acc + length(t)))
        .withColumn("mean_len", col("char_sum").cast("double") / col("n_toks"))
        .withColumn("dratio", size(array_distinct(toks)).cast("double") / col("n_toks"))
        .filter(col("n_toks").between(10, 1000)
          && col("mean_len").between(2.0, 12.0) && col("dratio") > 0.2)
        .select("doc_id", "lang", "source", "text", "n_toks")

      // stage 2: exact dedup, keep lowest doc_id per md5(text)
      val exact = kept
        .withColumn("rn", row_number().over(
          Window.partitionBy(md5(col("text"))).orderBy("doc_id")))
        .filter(col("rn") === 1)
        .drop("rn")

      // stage 3: near-dup candidates via MinHash banding; drop the
      // higher doc_id of every candidate pair
      val sigs = exact
        .withColumn("sigs", minhashSigs(col("text")))
        .select(col("doc_id") +: (0 until NumHashes)
          .map(i => element_at(col("sigs"), i + 1).as(s"sig$i")): _*)
      val bandKeys = (0 until Bands).map { j =>
        md5(concat_ws(",",
          (0 until RowsPerBand).map(r => col(s"sig${RowsPerBand * j + r}")): _*))
      }
      val bands = sigs.select(col("doc_id"),
        posexplode(array(bandKeys: _*)).as(Seq("bidx", "bkey")))
      val drops = bands.as("a")
        .join(bands.as("b"),
          col("a.bidx") === col("b.bidx") && col("a.bkey") === col("b.bkey")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("b.doc_id").as("doc_id")).distinct()
      val fin = exact.join(drops, Seq("doc_id"), "left_anti")

      // stage 4: corpus stats
      fin.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks").cast("long")).as("total_toks"),
          countDistinct(col("source")).as("nd_sources"))
        .orderBy("lang")
    }),
  )

  def oracles: Map[String, String] = {
    val sigsSql = (0 until NumHashes).map { i =>
      val (a, b) = graft.gen.MinHashImpl.hashParams(i)
      s"list_min(list_transform(hs, h -> (h * ${a}::BIGINT + ${b}::BIGINT) % ${graft.gen.MinHashImpl.P}::BIGINT)) AS sig$i"
    }.mkString(",\n    ")
    val bandCase = (0 until Bands).map { j =>
      val cat = (0 until RowsPerBand).map(r => s"sig${RowsPerBand * j + r}")
        .mkString("concat_ws(',', ", ", ", ")")
      s"WHEN $j THEN md5($cat)"
    }.mkString(" ")
    val bandIdxValues = (0 until Bands).map(j => s"($j)").mkString(",")

    Map(
      "q_pipeline_e2e" ->
        s"""WITH kept AS (
           |  SELECT doc_id, lang, source, text,
           |    CAST(len(string_split(text, ' ')) AS INT) AS n_toks
           |  FROM documents
           |  WHERE len(string_split(text, ' ')) BETWEEN 10 AND 1000
           |    AND (list_sum(list_transform(string_split(text, ' '), x -> strlen(x)))::DOUBLE
           |         / len(string_split(text, ' '))) BETWEEN 2.0 AND 12.0
           |    AND (len(list_distinct(string_split(text, ' ')))::DOUBLE
           |         / len(string_split(text, ' '))) > 0.2
           |), exact AS (
           |  SELECT doc_id, lang, source, text, n_toks FROM (
           |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           |    FROM kept)
           |  WHERE rn = 1
           |), sh AS (
           |  SELECT doc_id,
           |    list_transform(
           |      list_distinct(list_transform(
           |        generate_series(1, greatest(strlen(text) - 4, 1)),
           |        i -> substr(text, i, 5))),
           |      x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % ${graft.gen.MinHashImpl.P}::BIGINT) AS hs
           |  FROM exact
           |), sig AS (
           |  SELECT doc_id,
           |    $sigsSql
           |  FROM sh
           |), band AS (
           |  SELECT doc_id, k.j AS bidx,
           |    CASE k.j $bandCase END AS bkey
           |  FROM sig CROSS JOIN (VALUES $bandIdxValues) k(j)
           |), drops AS (
           |  SELECT DISTINCT b.doc_id AS doc_id
           |  FROM band a JOIN band b
           |    ON a.bidx = b.bidx AND a.bkey = b.bkey AND a.doc_id < b.doc_id
           |), final AS (
           |  SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM drops)
           |)
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_toks) AS BIGINT) AS total_toks,
           |  count(DISTINCT source) AS nd_sources
           |FROM final GROUP BY lang ORDER BY lang""".stripMargin,
    )
  }
}
