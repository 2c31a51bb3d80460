package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-slope measurement for the most expensive queries —
  * bench-only (no oracle): builds a 10× replica of the tables the seven
  * most expensive BENCH queries read, times each query at 1× (sf0.1)
  * and at 10×, and prints one JSON line with the wall times and the
  * measured slope. A near-linear slope (≈ 10 for a 10× input) is the evidence
  * behind the 100 TB claims in SCALE.md; anything superlinear is a
  * plan bug this harness exists to catch.
  *
  * The 10× corpus is NOT ten verbatim copies: verbatim text copies
  * would be exact near-duplicates, inflating every LSH bucket tenfold
  * and making q_dedup_cluster look quadratic for a reason that has
  * nothing to do with scale. Copy i > 0 rewrites each document through
  * a per-copy consonant/vowel substitution (translate with a rotated
  * alphabet), which preserves length, token structure, and trigram
  * VOLUME (the ngram_lm cost driver) while making cross-copy shingle
  * sets disjoint. Ids shift by a copy stride so keys stay unique;
  * embeddings keep their float values (cell geometry unchanged) with
  * only vec_id shifted, so the 10 query vectors and 8 centroids remain
  * exactly the copy-0 ones.
  *
  * Usage: runMain graft.ScaleBench [sfDir] (default /root/testdata/sf0.1)
  */
object ScaleBench {

  private val Stride = 100000000L
  private val Copies = 10
  private val Rot = "etaoinshr"

  private def rotated(i: Int): String =
    (Rot.substring(i % Rot.length) + Rot.substring(0, i % Rot.length))

  /** The shared bench session (also used by Scale100Bench so the two
    * harnesses can never diverge in session config).
    */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKRewriteRule.register(spark)
    spark
  }

  /** JIT/codegen warm-up at the smallest SF — shared with Scale100Bench. */
  def warmup(spark: SparkSession, names: Seq[String]): Unit =
    names.foreach(n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())

  /** min-of-2 per point with state release between reps: a one-shot
    * measurement lands inside whatever C2 compile window the bigger
    * plan triggers on first execution and reports 2x steady state as a
    * slope blowup (observed: kcore's first 10x run 12-28 s vs 5.8 s
    * steady — the JIT-lag mechanism SCALE.md §"Bench-noise root cause"
    * pins for Bench). The release cures cross-query contamination: the
    * graph queries pin localCheckpoint intermediates that would
    * otherwise skew every later slope. Shared with Scale100Bench so a
    * protocol fix lands in both harnesses at once.
    */
  def timeQuery(spark: SparkSession, n: String, d: String): Double = {
    val dts = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      dt
    }
    dts.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = session()

    val big = new java.io.File(System.getProperty("java.io.tmpdir"), "graft_scale10")
    val bigDir = big.getAbsolutePath
    build(spark, sfDir, bigDir)

    val names = Seq("q_text_ngram_lm", "q_sink_rangeparts", "q_dedup_cluster",
      "q_profile", "q_sim_ivf", "q_graph_triangles", "q_text_perplexity",
      "q_dedup_contain", "q_impute_locf",
      // round-8 additions: the new graph/text/similarity/time-series
      // members of the slow set
      "q_graph_kcore", "q_text_invindex", "q_sim_silhouette", "q_ts_autocorr",
      // round-9 additions: the four newest operators — slope is the
      // harness that catches an unbounded per-group collect or a
      // dense-bucket pair blowup automatically
      "q_win_pattern", "q_win_debounce", "q_bpe_apply", "q_multimodal_phash",
      // round-10 additions: the rest of the co-purchase graph family on
      // the basket-local derivation (the replica's shifted order AND
      // part keys make the 10x graph 10 disjoint copies, so slopes
      // measure the derivation + closure/supersteps, not densification)
      "q_graph_pagerank", "q_graph_jaccard", "q_graph_degdist", "q_assoc_rules",
      // round-11 additions: q_bpe_encode (3rd most expensive, verdict
      // residual #3 — its encode pass is shuffle-free, so anything
      // superlinear would mean the nested-replace chain's eval cost
      // grows with corpus size, which this row exists to refute) and
      // q_sink_overwrite (the new idempotent bulk-load sink — scales
      // with bytes written ×3 loads, like rangeparts)
      "q_bpe_encode", "q_sink_overwrite")
    warmup(spark, names)
    val rows = names.map { n =>
      val t1 = timeQuery(spark, n, sfDir)
      val t10 = timeQuery(spark, n, bigDir)
      (n, t1, t10)
    }
    val json = rows.map { case (n, t1, t10) =>
      f""""$n":{"x1":$t1%.2f,"x10":$t10%.2f,"slope":${t10 / t1}%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_slope","copies":$Copies,"queries":$json}""")
    spark.stop()
  }

  /** Replicate the measured queries' input tables 10× into `out`
    * (skips work when the output already exists — delete to rebuild).
    */
  def build(spark: SparkSession, sfDir: String, out: String): Unit =
    buildTables(spark, sfDir, out, Copies,
      Set("documents", "embeddings", "orders", "lineitem", "events"))

  /** The generalized builder behind both the 10× replica and
    * Scale100Bench's 100× one: `nCopies` alphabet-substituted,
    * key-shifted copies of just the tables in `tables`. Same honesty
    * rules as the 10× build (disjoint shingle sets, disjoint per-copy
    * part/order/user key spaces) — see the per-table comments.
    *
    * The `_built` marker records the build parameters (copies, table
    * set, source dir): a cached replica is reused ONLY when they match
    * the request; a mismatch fails fast instead of silently measuring
    * wrong-scale or missing-table data. (An empty marker from a
    * pre-parameterized build is accepted only for the original
    * five-table 10× shape it could have meant.)
    */
  def buildTables(spark: SparkSession, sfDir: String, out: String,
                  nCopies: Int, tables: Set[String]): Unit = {
    val marker = new java.io.File(out, "_built")
    val sig = s"copies=$nCopies tables=${tables.toSeq.sorted.mkString(",")} sf=$sfDir"
    if (marker.exists()) {
      val prev = new String(
        java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim
      val legacyOk = prev.isEmpty && nCopies == Copies &&
        tables == Set("documents", "embeddings", "orders", "lineitem", "events")
      if (prev == sig || legacyOk) return
      sys.error(s"replica at $out was built with different parameters " +
        s"('$prev' vs requested '$sig') — delete the directory to rebuild")
    }
    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until nCopies).map(i => f(df, i)).reduce(_ unionAll _)

    if (tables("documents")) {
      val docs = Tables.documents(spark, sfDir)
      copies(docs) { (d, i) =>
        d.select((col("doc_id") + i * Stride).as("doc_id"),
          (if (i == 0) col("text")
           else translate(col("text"), Rot, rotated(i))).as("text"),
          col("lang"), col("source"))
      }.write.mode("overwrite").parquet(s"$out/documents.parquet")
    }

    if (tables("embeddings")) {
      val emb = Tables.embeddings(spark, sfDir)
      copies(emb) { (e, i) =>
        e.withColumn("vec_id", col("vec_id") + i * Stride)
      }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }

    if (tables("orders")) {
      val ord = Tables.orders(spark, sfDir)
      copies(ord) { (o, i) =>
        o.withColumn("o_orderkey", col("o_orderkey") + i * Stride)
      }.write.mode("overwrite").parquet(s"$out/orders.parquet")
    }

    // l_partkey shifts per copy too: the graph queries threshold
    // co-purchase SUPPORT, and copies that reuse the same part space
    // would multiply every pair's support by `Copies` — every
    // once-co-occurring pair would pass the support-2 threshold and the
    // "10×" graph would be a categorically denser one, not a bigger
    // one. Disjoint per-copy part spaces give 10× orders, 10× edges,
    // 10× triangles with identical per-copy structure — the honest
    // scale-up for slope measurement (same spirit as the rotated-text
    // document copies keeping shingle sets disjoint).
    if (tables("lineitem")) {
      val li = Tables.lineitem(spark, sfDir)
      copies(li) { (l, i) =>
        l.withColumn("l_orderkey", col("l_orderkey") + i * Stride)
          .withColumn("l_partkey", col("l_partkey") + i * Stride)
      }.write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    }

    // disjoint per-copy user spaces: 10× users with identical per-user
    // event structure, so per-entity windows (LOCF) scale honestly
    if (tables("events")) {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      copies(ev) { (e, i) =>
        e.withColumn("event_id", col("event_id") + i * Stride)
          .withColumn("user_id", col("user_id") + i * Stride)
      }.write.mode("overwrite").parquet(s"$out/events.parquet")
    }

    java.nio.file.Files.write(marker.toPath,
      sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }
}
