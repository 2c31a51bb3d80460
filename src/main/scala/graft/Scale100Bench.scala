package graft

/** A single 100× scale point for the three worst 10× slopes — the
  * round-11 verdict's residual #3: a 1×→10× span cannot distinguish
  * amortized fixed overhead (slope flattens toward linear as scale
  * grows) from a genuinely super-linear term (slope STEEPENS). One
  * 100× measurement of exactly those three queries settles it:
  *
  *  - `q_sink_rangeparts` (10× slope 3.2): real file I/O — bytes AND
  *    file count scale linearly (the pid = key div 1000 layout keeps
  *    rows-per-file constant), so the honest expectation is
  *    slope(10×→100×) ≈ 10 with the 1×→10× excess being fixed
  *    job/commit overhead amortizing away.
  *  - `q_assoc_rules` (3.1): basket-local pair explosion — pair volume
  *    is linear in baskets (disjoint per-copy part spaces), so linear.
  *  - `q_graph_jaccard` (2.8): triangle-through-edge closure — work is
  *    Σ_edges deg(a); disjoint per-copy graphs keep degrees constant,
  *    so edge volume (and work) is linear in copies.
  *
  * Measured result (round 12, SCALE.md §"100× scale point"): all
  * three land SUB-linear per decade (7.9 / 8.2 / 5.9 vs linear 10) —
  * amortizing fixed overhead, no super-linear term.
  *
  * The replicas reuse ScaleBench's honesty rules (disjoint per-copy
  * key spaces via a 1e8 stride — 100 copies stay well inside Long) and
  * replicate ONLY the two tables these queries read (orders,
  * lineitem). The 10× point reuses ScaleBench's cached five-table
  * replica when one exists; on a cold machine it builds an
  * orders+lineitem-only 10× replica instead of paying for the three
  * tables nothing here scans. Session config, warm-up, and the
  * min-of-2 timing protocol are ScaleBench's own helpers, so the two
  * harnesses cannot diverge in methodology.
  *
  * Round-12 extension, group `docs`: the same harness over the
  * documents-backed heavy hitters — `q_dedup_cluster` (banded MinHash
  * LSH at 5M docs: bucket sizes stay constant under the
  * alphabet-substituted copies, so pair volume is linear — the
  * empirical backing for "never all-pairs" at scale),
  * `q_text_ngram_lm` and `q_text_perplexity` (both near-flat at 10×,
  * i.e. fixed-overhead-dominated; the 100× point shows where true
  * linearity takes over for the two most expensive bench queries).
  *
  * Group `graph`: the iterative co-purchase family (triangles, kcore,
  * pagerank — checkpointed supersteps over disjoint per-copy graphs,
  * so vertex/edge volume is linear in copies and each superstep's
  * shuffle should scale with it).
  *
  * Group `sim` (round 13): the embeddings-backed ANN/near-dup family —
  * the last group argued from construction rather than measured at
  * scale. `q_sim_ivfpq` (IVF probe + PQ rank: per-vector work is
  * O(k + probed-cell candidates), so linear), `q_dedup_semantic`
  * (fixed 8-cell SemDeDup: pair volume is n²/k BY DESIGN at fixed k —
  * the measurement verifies wall tracks that prediction and nothing
  * more; the 100 TB path raises k with n), and `q_dedup_embedding`
  * (all-pairs with automatic delegation: the group adds a ~260× point
  * PAST the 500k-vector broadcast bound and asserts — via the same
  * `DedupQueries.embeddingDelegates` decision the query itself makes —
  * that the blocked plan is the one measured, proving the delegation
  * engages by measurement rather than by the bounded-count unit test).
  * Replica honesty: per-copy orthogonal vector transforms (see
  * ScaleBench.buildTables) keep within-copy geometry exact while
  * decorrelating cross-copy cosines — verbatim copies would be exact
  * cosine-1 near-dups and near-dup pair volume would grow
  * quadratically in copies for reasons that have nothing to do with
  * scale.
  *
  * Usage: runMain graft.Scale100Bench [sfDir] [core|graph|docs|sim]
  * (defaults /root/testdata/sf0.1, core; replicas under
  * java.io.tmpdir — delete graft_scale100* / graft_scale10_* to
  * rebuild). Prints one JSON line with x1/x10/x100 wall seconds and
  * both segment slopes.
  */
object Scale100Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val group = if (args.length > 1) args(1) else "core"
    val (names, tables, suffix) = group match {
      case "core" => (Seq("q_sink_rangeparts", "q_assoc_rules", "q_graph_jaccard"),
        Set("orders", "lineitem"), "")
      // graph shares core's replica (tables ⊆ core's; same dir+marker)
      // — the co-purchase family reads lineitem only, and the heaviest
      // iterative queries deserve the 100× point as much as the
      // steepest slopes do
      case "graph" => (Seq("q_graph_triangles", "q_graph_kcore", "q_graph_pagerank"),
        Set("orders", "lineitem"), "")
      case "docs" => (Seq("q_dedup_cluster", "q_text_ngram_lm", "q_text_perplexity"),
        Set("documents"), "_docs")
      case "sim" => (Seq("q_sim_ivfpq", "q_dedup_semantic", "q_dedup_embedding"),
        Set("embeddings"), "_sim")
      case other => sys.error(s"unknown group '$other' (core|graph|docs|sim)")
    }
    val spark = ScaleBench.session()

    val tmp = System.getProperty("java.io.tmpdir")
    val dir10full = new java.io.File(tmp, "graft_scale10")
    val dir10 =
      // Reuse ScaleBench's cached five-table replica only when its
      // _built marker proves it was built from THIS source dir at 10
      // copies with (at least) the tables this group reads — an
      // existence-only check would silently measure a replica of
      // different-scale data (round-13 ADVICE).
      if (ScaleBench.replicaCompatible(dir10full.getAbsolutePath, sfDir, 10, tables)) {
        dir10full.getAbsolutePath
      } else {
        val d = new java.io.File(tmp, s"graft_scale10$suffix" + (if (suffix.isEmpty) "_ol" else "")).getAbsolutePath
        ScaleBench.buildTables(spark, sfDir, d, 10, tables)
        d
      }
    val dir100 = new java.io.File(tmp, s"graft_scale100$suffix").getAbsolutePath
    ScaleBench.buildTables(spark, sfDir, dir100, 100, tables)

    ScaleBench.warmup(spark, names)
    val rows = names.map { n =>
      (n, ScaleBench.timeQuery(spark, n, sfDir),
        ScaleBench.timeQuery(spark, n, dir10),
        ScaleBench.timeQuery(spark, n, dir100))
    }
    val json = rows.map { case (n, t1, t10, t100) =>
      f""""$n":{"x1":$t1%.2f,"x10":$t10%.2f,"x100":$t100%.2f,"slope10":${t10 / t1}%.1f,"slope100":${t100 / t10}%.1f}"""
    }.mkString("{", ",", "}")

    // sim only: one extra q_dedup_embedding point PAST the 500k-vector
    // broadcast bound (sf0.1 × 260 copies = 520k vectors). Asserting
    // embeddingDelegates — the exact decision the query evaluates —
    // on both the 100× (must NOT delegate: 200k ≤ bound) and 260×
    // (must delegate) corpora pins WHICH branch each measurement took.
    val extra = if (group == "sim") {
      val dir260 = new java.io.File(tmp, "graft_scale260_sim").getAbsolutePath
      ScaleBench.buildTables(spark, sfDir, dir260, 260, Set("embeddings"))
      val d100 = graft.operators.DedupQueries.embeddingDelegates(spark, dir100)
      val d260 = graft.operators.DedupQueries.embeddingDelegates(spark, dir260)
      assert(!d100, "100x corpus unexpectedly past the broadcast bound")
      assert(d260, "260x corpus must engage the blocked delegation")
      val t260 = ScaleBench.timeQuery(spark, "q_dedup_embedding", dir260)
      f""","dedup_embedding_delegation":{"x260":$t260%.2f,"delegated_x100":$d100,"delegated_x260":$d260}"""
    } else ""
    println(s"""{"metric":"scale_slope_100x","queries":$json$extra}""")
    spark.stop()
  }
}
