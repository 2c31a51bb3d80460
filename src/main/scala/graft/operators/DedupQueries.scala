package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Deduplication suite over the documents/embeddings tables — the
  * training-data-pipeline operators: exact, MinHash+LSH banding,
  * SimHash, token-n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Cross-engine determinism: every hash is md5 over identical bytes
  * (Spark and DuckDB agree on md5 hex), min-hash signatures are
  * lexicographic minima of md5 strings (no hex→int parsing needed),
  * and float-valued scores are either exact integer-ratio doubles or
  * omitted from output entirely (pairs-only results), so no rounding
  * is required anywhere.
  *
  * 100 TB posture per operator is noted on each query; the shared
  * principle: never materialize O(n²) candidate pairs globally —
  * always bucket first (hash group, LSH band, block key) so pair
  * enumeration happens within bounded buckets after a single shuffle.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  // 16 hashes in 2 bands of 8 rows: calibrated on the testdata corpus —
  // random doc pairs have shingle J ≈ 0.15-0.27 (shared synthetic
  // vocabulary), planted near-dups J ≈ 0.98. P(candidate) = 1-(1-J^8)^2:
  // ~1e-5 at J=0.23 (noise suppressed), ~0.98 at J=0.98 (dups caught).
  private val NumHashes = 16
  private val Bands = 2
  private val RowsPerBand = NumHashes / Bands

  /** Distinct character 5-shingles of the text column. */
  private def shingles(text: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - 4, lit(1))),
      i => text.substr(i, lit(5))))

  /** MinHash signature i: lexicographic min of md5(i ++ shingle). */
  private def minhashSig(sh: Column, i: Int): Column =
    array_min(transform(sh, x => md5(concat(lit(i.toString), x))))

  def queries: Map[String, Q] = Map(
    // Exact dedup, keep-first semantics: group on md5(text) (at 100 TB
    // you group on the 128-bit digest, never the raw text — constant-
    // width shuffle keys), row_number picks the lowest doc_id
    // deterministically (dropDuplicates' keep is arbitrary; this isn't).
    "q_dedup_exact" -> ((s, d) => {
      val byHash = Window.partitionBy("h")
      documents(s, d)
        .withColumn("h", md5(col("text")))
        .withColumn("rn", row_number().over(byHash.orderBy("doc_id")))
        .withColumn("n_dups", count(lit(1)).over(byHash))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("h"), col("n_dups"), col("lang"))
        .orderBy("doc_id")
    }),

    // MinHash + LSH banding: 8 hashes, 4 bands × 2 rows. Candidate
    // pairs = docs sharing any band key. At 100 TB: the band explode is
    // ×4 rows, the self-join shuffles on (band_idx, band_key) so pairs
    // are enumerated only within buckets; bucket skew (giant clusters
    // of identical docs) is the thing to monitor — cap bucket size or
    // pre-collapse exact dups first.
    "q_dedup_minhash" -> ((s, d) => {
      val sigs = documents(s, d)
        .withColumn("sh", shingles(col("text")))
        .select(col("doc_id") +: (0 until NumHashes)
          .map(i => minhashSig(col("sh"), i).as(s"sig$i")): _*)
      val bandKeys = (0 until Bands).map { j =>
        md5(concat((0 until RowsPerBand).map(r => col(s"sig${RowsPerBand * j + r}")): _*))
      }
      val bands = sigs
        .select(col("doc_id"), posexplode(array(bandKeys: _*)).as(Seq("bidx", "bkey")))
      val a = bands.select(col("doc_id").as("a_id"), col("bidx"), col("bkey"))
      val b = bands.select(col("doc_id").as("b_id"), col("bidx").as("bidx2"), col("bkey").as("bkey2"))
      a.join(b, col("bidx") === col("bidx2") && col("bkey") === col("bkey2")
          && col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
        .orderBy("a_id", "b_id")
    }),

    // SimHash: 32-bit fingerprint from per-token md5s — bit b is set
    // when the majority of tokens have the high bit of hex digit b set.
    // Linear in tokens, embarrassingly parallel, no shuffle at all
    // until the final (optional) grouping — the 100 TB-friendly sketch.
    "q_dedup_simhash" -> ((s, d) => {
      val md5s = transform(split(col("text"), " "), t => md5(t))
      val bitSums = (0 until 32).map { b =>
        aggregate(col("tok_md5"), lit(0L),
          (acc, h) => acc + when(h.substr(b + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L).otherwise(-1L))
      }
      val simhash = bitSums.zipWithIndex
        .map { case (s0, b) => when(s0 > 0, lit(1L << b)).otherwise(0L) }
        .reduce(_ + _)
      documents(s, d)
        .withColumn("tok_md5", md5s)
        .select(col("doc_id"), simhash.as("simhash"), col("lang"))
        .orderBy("doc_id")
    }),

    // Token-3-gram Jaccard within blocks: block on (lang, n_tokens/10)
    // so pair enumeration is bounded per block — the blocking-key
    // pattern that keeps near-dup joins sub-quadratic at scale.
    // J = |A∩B|/|A∪B| over distinct 3-grams; the double is an exact
    // small-integer ratio, identical bits in both engines.
    "q_dedup_ngram" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val grams = array_distinct(transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      val base = documents(s, d)
        .select(col("doc_id"), col("lang"), grams.as("g"),
          (size(toks) / 10).cast("int").as("bkt"))
      val a = base.select(col("doc_id").as("a_id"), col("lang"), col("bkt"), col("g").as("ga"))
      val b = base.select(col("doc_id").as("b_id"), col("lang").as("lang2"), col("bkt").as("bkt2"), col("g").as("gb"))
      a.join(b, col("lang") === col("lang2") && col("bkt") === col("bkt2")
          && col("a_id") < col("b_id"))
        .withColumn("inter", size(filter(col("ga"), x => array_contains(col("gb"), x))))
        .withColumn("uni", size(col("ga")) + size(col("gb")) - col("inter"))
        .withColumn("j", col("inter").cast("double") / col("uni"))
        .filter(col("j") >= 0.3)
        .select(col("a_id"), col("b_id"), col("j"))
        .orderBy("a_id", "b_id")
    }),

    // Embedding-cosine near-dup: brute-force pair scan (fine at test
    // scale; the LSH-bucketed scale path is q_sim_ann). Score is NOT
    // output — only pairs — so last-ulp float divergence can't affect
    // the hash compare (threshold flips need |cos-0.45| < 1e-13).
    // Products/accumulation forced to double, left-fold order.
    "q_dedup_embedding" -> ((s, d) => {
      def dot(x: Column, y: Column): Column =
        aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"),
        sqrt(aggregate(transform(col("embedding"), p => p.cast("double") * p.cast("double")),
          lit(0.0), (acc, v) => acc + v)).as("nrm"))
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"), col("nrm").as("nb"))
      a.join(b, col("a_id") < col("b_id"))
        .filter(dot(col("ea"), col("eb")) / (col("na") * col("nb")) >= 0.45)
        .select("a_id", "b_id")
        .orderBy("a_id", "b_id")
    }),
  )

  /** DuckDB mirrors. The simhash bit expressions are generated by the
    * same loop bounds as the Spark side.
    */
  def oracles: Map[String, String] = {
    val simhashTerms = (0 until 32).map { b =>
      s"""CASE WHEN list_sum(list_transform(tok_md5,
         |  h -> CASE WHEN substr(h, ${b + 1}, 1) >= '8' THEN 1 ELSE -1 END)) > 0
         |  THEN ${1L << b}::BIGINT ELSE 0::BIGINT END""".stripMargin
    }.mkString(" + ")

    val minhashSigsSql = (0 until NumHashes)
      .map(i => s"list_min(list_transform(sh, x -> md5('$i' || x))) AS sig$i")
      .mkString(",\n    ")
    val bandCase = (0 until Bands).map { j =>
      val cat = (0 until RowsPerBand).map(r => s"sig${RowsPerBand * j + r}").mkString(" || ")
      s"WHEN $j THEN md5($cat)"
    }.mkString(" ")
    val bandIdxValues = (0 until Bands).map(j => s"($j)").mkString(",")

    Map(
      "q_dedup_exact" ->
        """SELECT doc_id, h, n_dups, lang FROM (
          |  SELECT doc_id, md5(text) AS h, lang,
          |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
          |    count(*) OVER (PARTITION BY md5(text)) AS n_dups
          |  FROM documents)
          |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

      "q_dedup_minhash" ->
        s"""WITH sh AS (
           |  SELECT doc_id,
           |    list_distinct(list_transform(
           |      generate_series(1, greatest(strlen(text) - 4, 1)),
           |      i -> substr(text, i, 5))) AS sh
           |  FROM documents
           |), sig AS (
           |  SELECT doc_id,
           |    $minhashSigsSql
           |  FROM sh
           |), band AS (
           |  SELECT doc_id, k.j AS bidx,
           |    CASE k.j $bandCase END AS bkey
           |  FROM sig CROSS JOIN (VALUES $bandIdxValues) k(j)
           |)
           |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           |FROM band a JOIN band b
           |  ON a.bidx = b.bidx AND a.bkey = b.bkey AND a.doc_id < b.doc_id
           |ORDER BY a_id, b_id""".stripMargin,

      "q_dedup_simhash" ->
        s"""SELECT doc_id, $simhashTerms AS simhash, lang
           |FROM (SELECT doc_id, lang,
           |        list_transform(string_split(text, ' '), t -> md5(t)) AS tok_md5
           |      FROM documents)
           |ORDER BY doc_id""".stripMargin,

      "q_dedup_ngram" ->
        """WITH base AS (
          |  SELECT doc_id, lang,
          |    len(string_split(text, ' ')) // 10 AS bkt,
          |    list_distinct(list_transform(
          |      generate_series(1, len(string_split(text, ' ')) - 2),
          |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS g
          |  FROM documents
          |)
          |SELECT a_id, b_id, j FROM (
          |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          |    len(list_filter(a.g, x -> list_contains(b.g, x)))::DOUBLE
          |      / (len(a.g) + len(b.g) - len(list_filter(a.g, x -> list_contains(b.g, x)))) AS j
          |  FROM base a JOIN base b
          |    ON a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id)
          |WHERE j >= 0.3 ORDER BY a_id, b_id""".stripMargin,

      "q_dedup_embedding" ->
        """WITH e AS (
          |  SELECT vec_id, embedding,
          |    sqrt(list_reduce(list_transform(generate_series(1, 64),
          |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
          |  FROM embeddings
          |)
          |SELECT a.vec_id AS a_id, b.vec_id AS b_id
          |FROM e a JOIN e b ON a.vec_id < b.vec_id
          |WHERE list_reduce(list_transform(generate_series(1, 64),
          |        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), (x, y) -> x + y)
          |      / (a.nrm * b.nrm) >= 0.45
          |ORDER BY a_id, b_id""".stripMargin,
    )
  }
}
