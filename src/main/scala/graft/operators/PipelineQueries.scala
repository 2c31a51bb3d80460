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

  import graft.gen.LshBanding

  def queries: Map[String, Q] = Map(
    "q_pipeline_e2e" -> ((s, d) => {
      val toks = split(col("text"), " ")

      // stage 1: quality filter (shared QualityRule — same thresholds
      // as q_text_quality by construction). char_sum via the exact
      // identity sum(len(tok)) == length(text) - (n_toks - 1): split on
      // a single space partitions the string, so total chars = token
      // chars + (n_toks - 1) separators — no interpreted HOF lambda.
      val kept = documents(s, d)
        .withColumn("n_toks", size(toks))
        .withColumn("char_sum", length(col("text")).cast("long") - col("n_toks") + 1L)
        .filter(QualityRule.keep(col("n_toks"),
          col("char_sum").cast("double") / col("n_toks"),
          size(array_distinct(toks)).cast("double") / col("n_toks")))
        .select("doc_id", "lang", "source", "text", "n_toks")

      // stage 2: exact dedup, keep lowest doc_id per md5(text)
      val exact = kept
        .withColumn("rn", row_number().over(
          Window.partitionBy(md5(col("text"))).orderBy("doc_id")))
        .filter(col("rn") === 1)
        .drop("rn")

      // stage 3: near-dup removal via MinHash banding. The standalone
      // q_dedup_minhash must OUTPUT the candidate pairs, so it joins
      // band-to-band; here only the drop-set matters, so the pair join
      // collapses to a window-min per band bucket: doc d is dropped iff
      // some bucket it lands in contains a lower doc_id. One pass over
      // the corpus, no self-join, no anti-join, and the quality+exact
      // subtree is computed once instead of twice. Bucket sizes are
      // LSH-bounded, so the window shuffle has no skewed key at scale.
      val carry = Seq(col("doc_id"), col("lang"), col("source"), col("n_toks"))
      val sigs = exact
        .withColumn("sigs", LshBanding.minhashSigs(col("text")))
        .select(carry ++ LshBanding.sigCols: _*)
      val bands = sigs.select(
        carry :+ posexplode(array(LshBanding.bandKeys: _*)).as(Seq("bidx", "bkey")): _*)
      val fin = bands
        .withColumn("minid",
          min(col("doc_id")).over(Window.partitionBy(col("bidx"), col("bkey"))))
        .groupBy("doc_id", "lang", "source", "n_toks")
        .agg(min(col("minid")).as("m"))
        .filter(col("m") === col("doc_id")) // own the min of EVERY bucket ⇔ no lower partner anywhere

      // stage 4: corpus stats
      fin.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks").cast("long")).as("total_toks"),
          countDistinct(col("source")).as("nd_sources"))
        .orderBy("lang")
    }),
  )

  def oracles: Map[String, String] =
    Map(
      "q_pipeline_e2e" ->
        s"""WITH kept AS (
           |  SELECT doc_id, lang, source, text,
           |    CAST(len(string_split(text, ' ')) AS INT) AS n_toks
           |  FROM documents
           |  WHERE ${QualityRule.keepSqlOverText}
           |), exact AS (
           |  SELECT doc_id, lang, source, text, n_toks FROM (
           |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           |    FROM kept)
           |  WHERE rn = 1
           |), sh AS (
           |  SELECT doc_id,
           |    ${LshBanding.shinglesHashSql} AS hs
           |  FROM exact
           |), sig AS (
           |  SELECT doc_id,
           |    ${LshBanding.sigsSql}
           |  FROM sh
           |), band AS (
           |  SELECT doc_id, k.j AS bidx,
           |    CASE k.j ${LshBanding.bandCaseSql} END AS bkey
           |  FROM sig CROSS JOIN (VALUES ${LshBanding.bandIdxValuesSql}) k(j)
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
