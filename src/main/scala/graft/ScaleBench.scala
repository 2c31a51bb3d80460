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
  * a per-copy letter substitution (translate with two independently
  * rotated letter groups — injective across 100 copies), which
  * preserves length, token structure, and trigram VOLUME (the ngram_lm
  * cost driver) while making cross-copy shingle sets disjoint. Ids
  * shift by a copy stride so keys stay unique; embeddings get a
  * per-copy coordinate rotation + block sign-flip (an orthogonal
  * transform applied uniformly within the copy, so every within-copy
  * inner product and norm is preserved EXACTLY while cross-copy
  * vectors decorrelate — verbatim vector copies would be exact
  * cosine-1 near-duplicates, the same dishonesty as verbatim text).
  * Copy 0 is always untransformed, so the 10 query vectors and 8
  * centroids remain exactly the copy-0 ones.
  *
  * Usage: runMain graft.ScaleBench [sfDir] (default /root/testdata/sf0.1)
  */
object ScaleBench {

  private[graft] val Stride = 100000000L
  private val Copies = 10
  // Two independently-rotated 10-letter groups (high-frequency English
  // letters, disjoint): copy i substitutes G1 by rotation (i % 10) and
  // G2 by rotation (i / 10), so the combined substitution is INJECTIVE
  // for i in 0..99 — every copy of a 100x replica gets a distinct
  // alphabet and cross-copy shingle sets stay disjoint at 100 copies.
  // (The round-12 form rotated one 9-letter group by i % 9, so copies
  // 0, 9, 18, ... were byte-identical originals: distinct trigrams
  // stopped growing past 9 copies and the 100x docs slopes were
  // measured against partially-duplicated text — the round-13 ADVICE
  // finding. SubstVersion in the _built marker forces stale replicas
  // to fail fast instead of being silently reused.)
  private val G1 = "etaoinshrd"
  private val G2 = "lcumwfgypb"
  private[graft] val SubstVersion = "2x10"

  private def rot(s: String, k: Int): String =
    s.substring(k % s.length) + s.substring(0, k % s.length)

  private[graft] def substFrom: String = G1 + G2

  private[graft] def substTo(i: Int): String = {
    require(i >= 0 && i < G1.length * G2.length,
      s"copy index $i exceeds the injective substitution range")
    rot(G1, i % G1.length) + rot(G2, i / G1.length)
  }

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
    * The `_built` marker records the build parameters (substitution
    * version, copies, table set, source dir): a cached replica is
    * reused ONLY when they match the request; a mismatch fails fast
    * instead of silently measuring wrong-scale, wrong-alphabet, or
    * missing-table data. (Round-13 change: markers without the subst
    * version — i.e. replicas built with the old non-injective 9-letter
    * rotation — always mismatch and must be rebuilt.)
    */
  def buildTables(spark: SparkSession, sfDir: String, out: String,
                  nCopies: Int, tables: Set[String]): Unit = {
    val marker = new java.io.File(out, "_built")
    val sig = sigOf(sfDir, nCopies, tables)
    if (marker.exists()) {
      val prev = new String(
        java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim
      if (prev == sig) return
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
           else translate(col("text"), substFrom, substTo(i))).as("text"),
          col("lang"), col("source"))
      }.write.mode("overwrite").parquet(s"$out/documents.parquet")
    }

    // Per-copy orthogonal transform: circular coordinate shift by
    // (i % 64) composed with a block sign-flip chosen by (i / 64)
    // (negate 8-coordinate block b iff bit b of the flip id is set).
    // Both are applied uniformly to every vector of the copy, so all
    // within-copy inner products and norms are preserved (a
    // permutation matrix times a ±1 diagonal is orthogonal; the
    // per-coordinate products are the exact same multiset, re-summed
    // in permuted order — equal up to last-ulp float accumulation) —
    // cell geometry, top-k sets, and near-dup pair structure inside
    // each copy match copy 0 —
    // while cross-copy cosines decorrelate, keeping near-dup pair
    // volume linear in copies. Injective for i in 0..511 (64 shifts ×
    // 8 flip patterns); embeddings are fixed 64-dim corpus-wide. The
    // replica is also written in 64 files: the all-pairs operators are
    // CPU-bound (O(n²) dots on O(n) bytes), and a byte-sized split of
    // a ~50 MB parquet dir would hand 2e10 dot products to one task.
    if (tables("embeddings")) {
      val emb = Tables.embeddings(spark, sfDir)
      copies(emb) { (e, i) =>
        val shift = i % 64
        val flip = i / 64
        val shifted =
          if (shift == 0) col("embedding")
          else concat(slice(col("embedding"), shift + 1, 64 - shift),
            slice(col("embedding"), 1, shift))
        val negBlocks = (0 until 8).filter(b => ((flip >> b) & 1) == 1)
        val flipped =
          if (negBlocks.isEmpty) shifted
          else transform(shifted, (x, j) =>
            when((j / 8).cast("int").isin(negBlocks: _*), -x).otherwise(x))
        e.withColumn("vec_id", col("vec_id") + i * Stride)
          .withColumn("embedding", flipped)
      }.repartition(64).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
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

  private def sigOf(sfDir: String, nCopies: Int, tables: Set[String]): String =
    s"subst=$SubstVersion copies=$nCopies " +
      s"tables=${tables.toSeq.sorted.mkString(",")} sf=$sfDir"

  /** True iff the replica at `dir` carries a `_built` marker whose
    * substitution version, copy count, and source dir match the
    * request and whose table set is a SUPERSET of the needed tables —
    * the only conditions under which reusing a cached replica measures
    * the same data a fresh build would. Scale100Bench's 10× reuse path
    * goes through this instead of a bare existence check (round-13
    * ADVICE: an existence-only check silently reused a replica built
    * from a different source dir, skewing both reported slopes).
    */
  def replicaCompatible(dir: String, sfDir: String, nCopies: Int,
                        tables: Set[String]): Boolean = {
    val marker = new java.io.File(dir, "_built")
    if (!marker.exists()) return false
    val prev = new String(
      java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim
    val kv = prev.split(" ").flatMap { t =>
      t.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap
    kv.get("subst").contains(SubstVersion) &&
      kv.get("copies").contains(nCopies.toString) &&
      kv.get("sf").contains(sfDir) &&
      kv.get("tables").exists(ts => tables.subsetOf(ts.split(",").toSet))
  }
}
