package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Similarity search over the embeddings table (64-dim float vectors).
  *
  * Two tiers:
  *  - q_sim_topk: exact brute-force cosine top-k — the correctness
  *    baseline. At test scale the candidate side broadcasts; at 100 TB
  *    this shape is only sane for small query batches (broadcast the
  *    QUERIES, scan the corpus once, per-partition top-k heaps via
  *    window, then a tiny final merge).
  *  - q_sim_ann: random-hyperplane LSH with multi-probe — the scale
  *    path. Vectors hash to a bucket from the sign pattern of NBits
  *    fixed hyperplanes; each query searches its home bucket plus every
  *    1-bit-flip neighbor (recall/cost is tuned by NBits and probe
  *    count, not data size).
  *
  * Cross-engine determinism: cosine = fold(products)/(sqrt·sqrt) with
  * identical association order both engines ⇒ identical double bits;
  * scores are used for ranking (row_number with id tie-break) but never
  * output. Hyperplane components are exact rationals k/1000003 - 0.5
  * from a fixed integer LCG, materialized as integer literals in both
  * the Spark plan and the DuckDB SQL.
  */
object SimilarityQueries {

  type Q = (SparkSession, String) => DataFrame

  private val NumQueries = 10 // vec_id < 10 are the query vectors
  private val TopK = 5
  // 4 hyperplanes → 16 buckets. Recall note: this corpus has NO true
  // near-neighbors (max pairwise cosine ≈ 0.51 ⇒ angles ≥ 59°), so
  // random-hyperplane LSH recall vs exact top-k is intrinsically low
  // (P[same sig] = (1-θ/π)^NBits ≈ 0.2 at 59°) — the operator's value
  // is the cost bound (bucket-local compare), and recall rises steeply
  // when real duplicates exist (θ→0 ⇒ P→1). Multi-probe below widens
  // recall; tune further per corpus at deployment.
  private val NBits = 4
  // IVF: 8 coarse cells (centroids = corpus vectors 10..17), 2 probes.
  private val NCentroids = 8
  private val NProbe = 2
  // PQ: 8 subspaces x 8 dims, 4-entry codebook per subspace
  // (sub-centroids = corpus vectors 20..23, same fixed-corpus
  // convention as IVF — an offline k-means per subspace at deployment)
  private val PqSub = 8
  private val PqDim = 8
  private val PqK = 4
  private val PqBase = 20 // first codebook vector id

  /** Deterministic pseudo-random numerator for hyperplane h, dim j. */
  private def planeNum(h: Int, j: Int): Long =
    ((h.toLong * 64 + j) * 2654435761L) % 1000003L

  // Random-projection dimensionality reduction: 8 fixed planes from the
  // same integer family as the LSH hyperplanes, offset so the two sets
  // never overlap.
  private val ProjDims = 8
  private val ProjBase = 100

  // Drift-route gate (q_drift_route): floor below which a routing
  // score counts as "collapsed" and the quantile est_f assumes the
  // floor was calibrated at. Fixed literals — both engines compare the
  // same exact doubles; 0.2 sits mid-band for the near-orthogonal sf
  // corpus's best-of-8 cosine distribution.
  private val DriftFloor = 0.20
  private val DriftCalibQ = 0.10

  // Indexed (two-level) semantic dedup: k=32 centroids (corpus vectors
  // 10..41, the same fixed-corpus convention as IVF — an offline
  // k-means fit at deployment, graft.functions.IvfIndex.fit), bucketed
  // into groups of 8 whose means form the stage-1 routing table.
  private val IdxK = 32
  private val IdxGroup = 8
  private val IdxProbe = 2
  private val IdxFitIters = 1

  // Codegen dot/norm (graft.gen.VecExprs): same ascending-index fold as
  // the HOF form and the DuckDB list_reduce oracle — identical double
  // bits, ~none of the interpreted-lambda cost.
  private def dotD(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.gen.DotProductExpr(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
  }

  private def normD(x: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.gen.VecNormExpr(ColumnBridge.expression(x)))
  }

  /** The NCentroids fixed-corpus centroids (vec_id 10..17, cid 0..7)
    * packed into a broadcast single-row sorted array — the form every
    * cell-assignment consumer crossJoins against.
    */
  private def centArrOf(e: DataFrame): DataFrame =
    broadcast(e
      .filter(col("vec_id") >= NumQueries && col("vec_id") < NumQueries + NCentroids)
      .select((col("vec_id") - NumQueries).as("cid"),
        col("embedding").as("cemb"), col("nrm").as("cnrm"))
      .agg(array_sort(collect_list(struct(col("cid"), col("cemb"), col("cnrm")))).as("cents")))

  /** Per-centroid cosine candidates as struct(cscore, -cid): array_max
    * picks the highest score, ties to the LOWEST cid — the same total
    * order as the window it replaces.
    */
  private def cellScores(v: Column, n: Column): Column =
    transform(col("cents"), c => struct(
      (dotD(v, c.getField("cemb")) / (n * c.getField("cnrm"))).as("cscore"),
      (-c.getField("cid")).as("ncid")))

  /** Row-local argmax-cosine cell assignment over the broadcast
    * centroid array — the shared shuffle-free pass under q_sim_ivf and
    * q_dedup_semantic (one code path, so their cell geometries cannot
    * silently diverge). `centArr` is passed in (not derived here) so a
    * caller with a second centroid consumer — q_sim_ivf's probe branch
    * — builds it ONCE instead of leaving dedup of two aggregation+
    * broadcast subtrees to ReuseExchange. Input `e`: (vec_id,
    * embedding, nrm > 0); output adds `cell`.
    */
  private def assignCells(e: DataFrame, centArr: DataFrame): DataFrame =
    e.crossJoin(centArr)
      .withColumn("best", array_max(cellScores(col("embedding"), col("nrm"))))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (-col("best").getField("ncid")).as("cell"))

  /** LSH bucket id: bit h set iff dot(v, plane_h) > 0. Projection runs
    * through the codegen PlaneProjExpr; the plane components are
    * precomputed with the exact per-element arithmetic the DuckDB
    * oracle uses (k/1000003.0 - 0.5), so the fold is bit-identical.
    */
  private def bucket(v: Column): Column =
    (0 until NBits).map { h =>
      import org.apache.spark.sql.graft.ColumnBridge
      val plane = (1 to 64).map(j => planeNum(h, j).toDouble / 1000003.0 - 0.5)
      val proj = ColumnBridge.column(
        graft.gen.PlaneProjExpr(ColumnBridge.expression(v), plane))
      when(proj > 0, lit(1L << h)).otherwise(0L)
    }.reduce(_ + _)

  def queries: Map[String, Q] = Map(
    // Exact cosine top-k for each of the first NumQueries vectors.
    "q_sim_topk" -> ((s, d) => {
      // zero-norm vectors are excluded up front (cosine undefined; NaN
      // would rank above all reals in DESC order in both engines and
      // silently poison every top-k)
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0)
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qn"))
      val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("nrm").as("cn"))
      val byScore = Window.partitionBy("q_id")
        .orderBy(col("cos").desc, col("cand_id"))
      broadcast(q).join(c, col("q_id") =!= col("cand_id"))
        .withColumn("cos", dotD(col("qe"), col("ce")) / (col("qn") * col("cn")))
        .withColumn("rnk", row_number().over(byScore))
        .filter(col("rnk") <= TopK)
        .select(col("q_id"), col("cand_id"), col("rnk"))
        .orderBy("q_id", "rnk")
    }),

    // Maximum-inner-product search (MIPS) — recommendation-retrieval
    // ranking, where the right score is the raw dot product and a
    // large-norm item legitimately outranks a near-parallel small one,
    // so cosine top-k is the wrong tool. Implements the classic
    // norm-augmentation reduction (Bachrach et al. 2014 / Shrivastava
    // & Li 2014): every candidate gains one virtual dimension
    // sqrt(M² − ‖c‖²) with M the corpus max norm, queries gain 0 there
    // — augmented candidates all share norm M, so augmented-cosine
    // order ≡ dot order and the augmented vectors feed ANY of the
    // engine's cosine-ANN index paths (LSH buckets, IVF cells, PQ
    // codes) unchanged at 100 TB. The reduction is under the gate:
    // l2_aug = sqrt(‖q‖² + M² − 2·dot) is the augmented-space L2
    // distance (exactly monotone-decreasing in dot per query), which
    // the oracle recomputes from its own moments. The augmented inner
    // product equals the raw dot BIT-EXACTLY (the query's extra
    // coordinate is 0), so ranking needs no zero-norm guard — a
    // deliberate contrast with q_sim_topk's NaN exclusion. Scale: M is
    // one 1-row broadcast aggregate, then the identical broadcast-
    // queries × one-corpus-scan shape as q_sim_topk with a bounded
    // per-query window.
    "q_sim_mips" -> ((s, d) => {
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val m2df = broadcast(
        e.agg(max(dotD(col("embedding"), col("embedding"))).as("m2")))
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
      val byDot = Window.partitionBy("q_id")
        .orderBy(col("dot").desc, col("cand_id"))
      broadcast(q).join(c, col("q_id") =!= col("cand_id"))
        .crossJoin(m2df)
        .withColumn("dot", dotD(col("qe"), col("ce")))
        .withColumn("rnk", row_number().over(byDot))
        .filter(col("rnk") <= TopK)
        .select(col("q_id"), col("cand_id"), col("rnk"), col("dot"),
          sqrt(greatest(dotD(col("qe"), col("qe")) + col("m2")
            - lit(2.0) * col("dot"), lit(0.0))).as("l2_aug"))
        .orderBy("q_id", "rnk")
    }),

    // LSH-bucketed ANN with multi-probe: each query searches its home
    // bucket plus every 1-bit-flip neighbor (NBits+1 probes). Multi-
    // probe multiplies the probe count, not the corpus cost, so the
    // query stays sub-linear in corpus size while recovering most of
    // what a single bucket misses on borderline hyperplane signs.
    // A candidate matches exactly one probe mask (mask = qbkt XOR cbkt),
    // so no dedup is needed before ranking.
    "q_sim_ann" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          normD(col("embedding")).as("nrm"), bucket(col("embedding")).as("bkt"))
        .filter(col("nrm") > 0) // see q_sim_topk
      val probeMasks = typedLit(0L +: (0 until NBits).map(b => 1L << b))
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          col("nrm").as("qn"),
          explode(transform(probeMasks, m => col("bkt").bitwiseXOR(m))).as("qb"))
      val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        col("nrm").as("cn"), col("bkt").as("cb"))
      val byScore = Window.partitionBy("q_id")
        .orderBy(col("cos").desc, col("cand_id"))
      broadcast(q).join(c, col("qb") === col("cb") && col("q_id") =!= col("cand_id"))
        .withColumn("cos", dotD(col("qe"), col("ce")) / (col("qn") * col("cn")))
        .withColumn("rnk", row_number().over(byScore))
        .filter(col("rnk") <= TopK)
        .select(col("q_id"), col("cand_id"), col("rnk"))
        .orderBy("q_id", "rnk")
    }),

    // IVF-style ANN: the other classic scale path (inverted file over
    // coarse cells). Cell assignment = argmax-cosine centroid (rank-1
    // under a deterministic tie-break); queries probe their NProbe
    // nearest cells and rank only those cells' members by true cosine.
    // Corpus cost: ONE row-local pass — the 8 centroids ride in as a
    // broadcast single-row array and each vector takes array_max over
    // its 8 struct(score, -cid) candidates in place (tie → smallest
    // cid, matching the oracle's ORDER BY cscore DESC, cid). No corpus
    // row expansion, no shuffle, no window: assignment cost is O(n·k)
    // inside the scan stage, which is the shape that survives 100 TB.
    // Centroids are 8 fixed corpus vectors (vec_id 10..17); at 100 TB
    // they'd come from an offline k-means fit (graft.functions.KMeans
    // for small k; graft.functions.IvfIndex.fit for large k — its
    // per-iteration assignment is the two-level indexed pass, so k
    // never becomes a k-wide expression tree). The QUERY side routes
    // through the shipped retrieval half, IvfIndex.searchTopK
    // (round 17; VERDICT r16 #1 — this gate is its DuckDB oracle):
    // two-level probe routing (groupSize = 4 ⇒ g = 2 groups, and
    // nprobe = g makes stage 1 exhaustive, so the top-NProbe probed
    // cells are EXACTLY the flat ranking the oracle's `cr <= NProbe`
    // window computes) and candidate ranking through the
    // graft.plans.TopKPerGroup bounded heaps — never a per-query
    // row_number window over the candidate join (PlanAuditSpec pins
    // heap + zero windows). excludeSelf mirrors the oracle's
    // `q_id <> cand_id`. Past k ≈ 32 the BUILD side goes through
    // IvfIndex.assignIndexed too (gated by q_dedup_semantic_indexed;
    // measured sub-linear at 100×/k=800, and searchTopK at ~38× over
    // exact at |Q|=10⁴ — SCALE.md §"Semantic dedup").
    "q_sim_ivf" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0) // see q_sim_topk
      val inverted = assignCells(e, centArrOf(e))
      val cents = e
        .filter(col("vec_id") >= NumQueries && col("vec_id") < NumQueries + NCentroids)
        .select((col("vec_id") - NumQueries).as("cid"),
          col("embedding").as("cemb"), col("nrm").as("cnrm"))
      graft.functions.IvfIndex.searchTopK(
        e.filter(col("vec_id") < NumQueries), inverted, cents,
        topK = TopK, groupSize = NCentroids / 2, nprobe = 2, probeCells = NProbe,
        kHint = NCentroids, excludeSelf = true)
        .select(col("q_id"), col("cand_id"), col("rnk"))
        .orderBy("q_id", "rnk")
    }),

    // Bucket histogram — the observability query for LSH tuning
    // (bucket skew is what kills ANN at scale).
    "q_sim_buckets" -> ((s, d) =>
      embeddings(s, d)
        .select(bucket(col("embedding")).as("bkt"), col("label"))
        .groupBy("bkt")
        .agg(count(lit(1)).as("n"), countDistinct(col("label")).as("nd_labels"))
        .orderBy("bkt")),

    // Symmetric int8 quantization of the embedding column — the
    // storage/serving compression pass every large vector corpus runs
    // (float32 → int8 is a 4× footprint cut before ANN indexing).
    // Per-vector scale = max|x|/127; element q = floor(x/scale + 0.5)
    // (explicit half-up, never engine round() — see Tables rule 2).
    // Purely row-local higher-order functions: a stateless map with NO
    // shuffle, embarrassingly parallel at any scale. Output is the
    // quantization summary (bounds, checksum-style sum, sparsity), all
    // integers except the scale — doubles derived from identical IEEE
    // ops on exactly-cast float32 values, so bits agree cross-engine.
    "q_embed_quantize" -> ((s, d) =>
      embeddings(s, d)
        .withColumn("scale",
          expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0D"))
        .withColumn("qv",
          expr("""transform(embedding, x -> CASE WHEN scale = 0.0D THEN 0L
                 ELSE CAST(floor(CAST(x AS DOUBLE) / scale + 0.5D) AS BIGINT) END)"""))
        .select(col("vec_id"), col("scale"),
          expr("aggregate(qv, 0L, (a, x) -> a + x)").as("q_sum"),
          expr("array_min(qv)").as("q_min"),
          expr("array_max(qv)").as("q_max"),
          expr("CAST(size(filter(qv, x -> x = 0L)) AS INT)").as("n_zero"))
        .orderBy("vec_id")),

    // Per-label centroid + distance-to-centroid — the embedding-space
    // OUTLIER pass (mislabeled / out-of-distribution vectors sit far
    // from their class centroid). Determinism contract: per-dimension
    // centroid sums fold the label's vectors in vec_id order (the
    // groups are packed into ONE sorted array row each, then folded
    // with aggregate() — same order as the DuckDB list(... ORDER BY
    // vec_id) mirror), and the distance folds dimensions ascending;
    // identical IEEE op order ⇒ identical double bits, so the raw
    // distances are hashable output. Scale: per-label collect_list is
    // the gate-scale form — at 100 TB per-label sums distribute as an
    // order-insensitive pairwise/tree aggregate and you accept
    // last-ulp drift (or fix the reduction tree); the JOIN side is
    // unchanged: centroids are |labels| rows, always broadcast.
    "q_embed_centroid" -> ((s, d) => {
      val e = embeddings(s, d)
      val cents = e.groupBy("label")
        .agg(array_sort(collect_list(struct(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb")))).as("docs"))
        .select(col("label"), expr(
          """transform(sequence(0, 63), d ->
            |  aggregate(docs, 0D, (a, x) -> a + x.emb[d])
            |    / CAST(size(docs) AS DOUBLE))""".stripMargin).as("centroid"))
      e.join(broadcast(cents), "label")
        .select(col("vec_id"), col("label"), expr(
          """sqrt(aggregate(sequence(0, 63), 0D, (a, i) ->
            |  a + (CAST(embedding[i] AS DOUBLE) - centroid[i])
            |    * (CAST(embedding[i] AS DOUBLE) - centroid[i])))""".stripMargin).as("dist"))
        .orderBy("vec_id")
    }),

    // Product quantization ANN — the memory-bound scale path that
    // completes the family (brute force / LSH / IVF / PQ): each vector
    // compresses to PqSub codes (one byte-sized codebook index per
    // 8-dim subspace ⇒ 8 bytes instead of 256 — the 32x footprint cut
    // that lets a 100 TB corpus' index fit in cluster memory), and
    // queries rank candidates by asymmetric distance (ADC): the query
    // precomputes its exact squared distance to every sub-centroid
    // once (PqSub·PqK doubles), then each candidate costs PqSub table
    // lookups — no full-dimension math per pair. Code assignment is a
    // row-local argmin over the broadcast codebook (shuffle-free index
    // build); scoring is broadcast-queries x one corpus scan + the
    // bounded per-query rank window. Determinism: squared-distance
    // folds run dimensions ascending and ADC folds subspaces ascending
    // with identical association in DuckDB; argmin ties break to the
    // lowest code via first-occurrence array_position in both engines.
    "q_sim_pq" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val cb = broadcast(
        e.filter(col("vec_id") >= PqBase && col("vec_id") < PqBase + PqK)
          .agg(array_sort(collect_list(struct(col("vec_id"), col("v")))).as("cbs"))
          .select(expr("transform(cbs, c -> c.v)").as("cb")))
      // dm[m][c] = squared distance of v's m-th subvector to codebook
      // entry c of subspace m (dimensions fold ascending)
      val dmExpr = expr(
        s"""transform(sequence(0, ${PqSub - 1}), m ->
           |  transform(sequence(0, ${PqK - 1}), c ->
           |    aggregate(sequence(0, ${PqDim - 1}), 0D, (a, i) ->
           |      a + (v[m * $PqDim + i] - cb[c][m * $PqDim + i])
           |        * (v[m * $PqDim + i] - cb[c][m * $PqDim + i]))))""".stripMargin)
      val coded = e.filter(col("vec_id") >= NumQueries).crossJoin(cb)
        .withColumn("dm", dmExpr)
        .select(col("vec_id").as("cand_id"), expr(
          "transform(dm, ds -> CAST(array_position(ds, array_min(ds)) AS INT) - 1)")
          .as("codes"))
      val q = e.filter(col("vec_id") < NumQueries).crossJoin(cb)
        .withColumn("qd", dmExpr)
        .select(col("vec_id").as("q_id"), col("qd"))
      val byDist = Window.partitionBy("q_id").orderBy(col("adc"), col("cand_id"))
      broadcast(q).join(coded)
        .withColumn("adc", expr(
          s"aggregate(sequence(0, ${PqSub - 1}), 0D, (a, m) -> a + qd[m][codes[m]])"))
        .withColumn("rnk", row_number().over(byDist))
        .filter(col("rnk") <= TopK)
        .select(col("q_id"), col("cand_id"), col("rnk"))
        .orderBy("q_id", "rnk")
    }),

    // kNN majority-vote label prediction — the classify-by-neighbors
    // pass (label propagation for weakly-labeled corpora, eval-set
    // labeling audits): each query vector takes the mode label of its
    // 5 cosine-nearest LABELED candidates; ties break to the lowest
    // label. Queries are the vec_id < NumQueries rows, candidates are
    // the rest (a query never votes for itself or another query).
    // Scale shape: identical to q_sim_topk — the query batch
    // BROADCASTS, the corpus is scanned once, per-query neighbor
    // ranking is a bounded window (TopKPerGroup shape), and the vote
    // count aggregates |q|·k rows — driver-free end to end. Cosine
    // uses the same codegen dot/norm fold as the other sim queries ⇒
    // bit-identical ranking across engines.
    "q_knn_label" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"),
          normD(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0)
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qn"))
      // NULL labels are excluded up front: the vote tie-break orders by
      // label, and NULL ordering differs cross-engine (Spark ASC puts
      // NULLs first, DuckDB defaults NULLS LAST) — an unlabeled
      // neighbor must never reach the vote (round-6 ADVICE, latent)
      val c = e.filter(col("vec_id") >= NumQueries && col("label").isNotNull)
        .select(col("vec_id").as("cand_id"), col("label").as("cl"),
          col("embedding").as("ce"), col("nrm").as("cn"))
      val byScore = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
      val nn = broadcast(q).join(c)
        .withColumn("cos", dotD(col("qe"), col("ce")) / (col("qn") * col("cn")))
        .withColumn("rnk", row_number().over(byScore))
        .filter(col("rnk") <= TopK)
      val byVotes = Window.partitionBy("q_id").orderBy(col("n_votes").desc, col("cl"))
      nn.groupBy("q_id", "cl").agg(count(lit(1)).as("n_votes"))
        .withColumn("vr", row_number().over(byVotes))
        .filter(col("vr") === 1)
        .select(col("q_id"), col("cl").as("pred_label"), col("n_votes"))
        .orderBy("q_id")
    }),

    // Semantic dedup (the SemDeDup shape): embedding near-dup pairs
    // found WITHIN coarse k-means cells only — the form that survives
    // where even blocked all-pairs is too much. Cell assignment is the
    // identical row-local argmax-over-broadcast-centroids pass as
    // q_sim_ivf (no shuffle, no window, O(n·k) inside the scan); the
    // pair search is then an EQUI-join on the cell id, so per-task work
    // is Σ_c n_c² /cells ≈ n²/k instead of n² — at 100 TB you raise k
    // (SemDeDup uses tens of thousands of cells) until cells fit a
    // task, and the join shuffles both sides by cell key with AQE
    // handling skewed cells. The price is recall at cell boundaries
    // (near-dups straddling two cells are missed) — the standard
    // SemDeDup trade, tuned by k and threshold. Centroids: the same 8
    // fixed corpus vectors as q_sim_ivf (offline k-means at
    // deployment); threshold matches q_dedup_embedding (0.45) so the
    // recall gap vs exact all-pairs is directly measurable. Cosine is
    // the codegen dot/norm fold — bit-identical to the DuckDB oracle.
    "q_dedup_semantic" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0)
      val assigned = assignCells(e, centArrOf(e))
      val a = assigned.select(col("cell"), col("vec_id").as("a_id"),
        col("embedding").as("ae"), col("nrm").as("an"))
      val b = assigned.select(col("cell").as("cellb"), col("vec_id").as("b_id"),
        col("embedding").as("be"), col("nrm").as("bn"))
      a.join(b, col("cell") === col("cellb") && col("a_id") < col("b_id"))
        .filter(dotD(col("ae"), col("be")) / (col("an") * col("bn")) >= 0.45)
        .select(col("cell"), col("a_id"), col("b_id"))
        .orderBy("cell", "a_id", "b_id")
    }),

    // Semantic dedup through the TWO-LEVEL (IVF-over-centroids)
    // assignment — the large-k path q_dedup_semantic's flat argmax
    // cannot take: SemDeDup at production scale raises k ∝ n (tens of
    // thousands of cells), and the flat n×k fan-out then dominates
    // (round-14 SemKBench: 15.96 s flat vs 4.34 s indexed at
    // 100×/k=800, indexed slope sub-linear ~3×/decade). This query
    // gates the SHIPPED product path end to end — since round 16 that
    // includes the TRAINER (VERDICT r15 #2): centroids are no longer
    // pooled corpus vectors but ONE spherical-Lloyd iteration of
    // graft.functions.IvfIndex.fit (seeded from the IdxK smallest
    // vec_ids, per-iteration assignment = the indexed pass itself),
    // exactly the 100 TB deployment form (sample-fit offline →
    // broadcast → two-level assign). Assignment then runs
    // IvfIndex.assignIndexed over the fitted table: k=32 centroids in
    // 4 groups of 8, group means broadcast as a single-row sorted
    // array, stage-1 routing row-local (array_sort+slice — no shuffle,
    // no window), stage-2 argmax a map-side-combined max(struct) over
    // the 2 probed groups' 16 centroids. Pair search is the same cell
    // equi-join at 0.45 as q_dedup_semantic. Determinism: the fit's
    // member means are order-independent decimal sums converted once
    // to double and quantized to float32 once at the end; the oracle
    // mirrors the fold as an ordered double sum. The two folds are NOT
    // bit-identical — member means sit near zero, so the ~1e-13
    // absolute fold discrepancy lands ~1% of coordinates on the
    // ADJACENT float (IvfIndexSpec measured 22/2048 and pins the bound
    // at ONE ulp) — but the gated output is the integer pair list:
    // a one-ulp centroid coordinate moves cosines by ~1e-10, versus
    // ~1e-2 assignment margins and the 0.45 threshold, so the pair
    // set is engine-stable by margin, verified by hash-match at both
    // gated scales. Group means fold
    // members cid-ascending and dims ascending then quantize to
    // float32 once (IEEE round-to-nearest both engines); cosines are
    // the codegen ascending folds; ties break low-gid / low-cid.
    "q_dedup_semantic_indexed" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0)
      val (cents, _) = graft.functions.IvfIndex.fit(
        e.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
        k = IdxK, iters = IdxFitIters, groupSize = IdxGroup, nprobe = IdxProbe)
      val assigned = graft.functions.IvfIndex.assignIndexed(e, cents, IdxGroup, IdxProbe,
        kHint = IdxK)
      val a = assigned.select(col("cell"), col("vec_id").as("a_id"),
        col("embedding").as("ae"), col("nrm").as("an"))
      val b = assigned.select(col("cell").as("cellb"), col("vec_id").as("b_id"),
        col("embedding").as("be"), col("nrm").as("bn"))
      a.join(b, col("cell") === col("cellb") && col("a_id") < col("b_id"))
        .filter(dotD(col("ae"), col("be")) / (col("an") * col("bn")) >= 0.45)
        .select(col("cell"), col("a_id"), col("b_id"))
        .orderBy("cell", "a_id", "b_id")
    }),

    // Random-projection dimensionality reduction (the Johnson-
    // Lindenstrauss shape): project 64-dim vectors onto 8 fixed
    // pseudo-random planes — the cheap pre-ANN compression every large
    // vector pipeline runs when PQ is too heavy (64→8 dims = 8× before
    // any index build). Purely ROW-LOCAL codegen projections: a
    // stateless shuffle-free map, embarrassingly parallel at any scale
    // (same posture as q_embed_quantize). The gated output is the
    // norm-preservation audit JL promises in expectation: projected
    // norm² vs original norm² per vector. Determinism: each projection
    // is the PlaneProjExpr ascending-index fold, the norm² sums are
    // FIXED-ORDER expression chains (p0²+p1²+…, left-associated in
    // both engines), and the plane components are the exact rationals
    // k/1000003 − 0.5 materialized identically in the DuckDB SQL —
    // identical IEEE ops in identical order ⇒ identical double bits.
    "q_embed_project" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge
      val projCols = (0 until ProjDims).map { p =>
        val plane = (1 to 64).map(j => planeNum(ProjBase + p, j).toDouble / 1000003.0 - 0.5)
        ColumnBridge.column(graft.gen.PlaneProjExpr(
          ColumnBridge.expression(col("embedding")), plane)).as(s"p$p")
      }
      embeddings(s, d)
        .select(Seq(col("vec_id"),
          dotD(col("embedding"), col("embedding")).as("on2")) ++ projCols: _*)
        .filter(col("on2") > 0)
        .select(col("vec_id"), col("on2"),
          (0 until ProjDims).map(p => col(s"p$p") * col(s"p$p")).reduce(_ + _).as("pn2"))
        .select(col("vec_id"), col("on2"), col("pn2"),
          (col("pn2") / col("on2")).as("ratio"))
        .orderBy("vec_id")
    }),

    // ANN recall audit — the evaluation harness that makes LSH/IVF
    // tunable in production: per query, |ANN top-k ∩ exact top-k| / k.
    // Composes the gated q_sim_topk (ground truth) and q_sim_ann
    // (candidate) pipelines verbatim and LEFT-joins their rankings, so
    // the audit measures EXACTLY what the deployed operators return.
    // Scale: ground truth is the broadcast-queries × one-corpus-scan
    // shape over a SAMPLED query set (you never brute-force the full
    // query log — the sample rides q_sample_hash's determinism);
    // the audit join itself is |q|·k rows, driver-free. On this corpus
    // the documented recall floor applies (no true near-neighbors ⇒
    // hyperplane agreement ≈ 0.2) — the low recall numbers are the
    // corpus property the observability query exists to surface.
    "q_sim_recall" -> ((s, d) => {
      val exact = queries("q_sim_topk")(s, d).select(col("q_id"), col("cand_id"))
      val ann = queries("q_sim_ann")(s, d)
        .select(col("q_id").as("aq"), col("cand_id").as("ac"))
      exact.join(ann,
          col("q_id") === col("aq") && col("cand_id") === col("ac"), "left_outer")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_exact"), count(col("ac")).as("n_hit"))
        .select(col("q_id"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact").cast("double")).as("recall"))
        .orderBy("q_id")
    }),

    // Distributed k-means TRAINING under the oracle gate — two unrolled
    // Lloyd iterations (assign → update → assign → update), entirely
    // plan-side: centroids travel between rounds as a broadcast 1-row
    // sorted array (the q_sim_ivf convention), never a driver collect —
    // unlike the deployment utility graft.functions.KMeans, which runs
    // the standard driver-broadcast loop (KMeansSpec pins it); this
    // query pins the per-ITERATION distributed plan both share: one
    // corpus scan for row-local argmin assignment (squared Euclidean,
    // tie → lowest cid via array_min on struct(dist, cid)) + one
    // cell-keyed shuffle for the centroid update. Determinism contract
    // (the q_embed_centroid pattern): per-cell vectors fold in vec_id
    // order, per-dimension sums fold ascending, distances fold
    // ascending dims — identical IEEE op order both engines ⇒ the
    // gated (cell, n_members, c_sum) triple is bit-exact. Scale: at
    // 100 TB the per-cell collect_list fold becomes an
    // order-insensitive tree aggregate (accepting last-ulp drift) and
    // k grows past broadcast via a cell-keyed join — the
    // assign/update shuffle structure is unchanged.
    "q_sim_kmeans" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      val init = e.filter(col("vec_id") >= NumQueries && col("vec_id") < NumQueries + NCentroids)
        .select((col("vec_id") - NumQueries).as("cid"), col("emb").as("cemb"))
      def assign(cents: DataFrame): DataFrame =
        e.crossJoin(broadcast(cents.agg(
            array_sort(collect_list(struct(col("cid"), col("cemb")))).as("cents"))))
          .withColumn("best", array_min(expr(
            """transform(cents, c -> struct(
              |  aggregate(sequence(0, 63), 0D,
              |    (a, i) -> a + (emb[i] - c.cemb[i]) * (emb[i] - c.cemb[i])) AS dist,
              |  c.cid AS cid))""".stripMargin)))
          .select(col("vec_id"), col("emb"), col("best.cid").as("cell"))
      def update(assigned: DataFrame): DataFrame =
        assigned.groupBy("cell")
          .agg(array_sort(collect_list(struct(col("vec_id"), col("emb")))).as("docs"))
          .select(col("cell").as("cid"), size(col("docs")).cast("long").as("n_members"),
            expr("""transform(sequence(0, 63), d ->
                   |  aggregate(docs, 0D, (a, x) -> a + x.emb[d])
                   |    / CAST(size(docs) AS DOUBLE))""".stripMargin).as("cemb"))
      val c1 = update(assign(init)).select(col("cid"), col("cemb"))
      val c2 = update(assign(c1))
      c2.select(col("cid").as("cell"), col("n_members"),
          expr("aggregate(cemb, 0D, (a, x) -> a + x)").as("c_sum"))
        .orderBy("cell")
    }),

    // IVF+PQ composed index — the FAISS-IVFPQ shape that serves
    // billion-vector corpora: IVF coarse cells bound WHERE a query
    // looks (NProbe of NCentroids cells), PQ codes bound WHAT each
    // candidate costs once found (PqSub table lookups instead of
    // 64-dim math — the 32× memory cut that keeps the index resident).
    // This is the `by_residual=false` IVFPQ variant (codes quantize
    // the raw vectors, not cell residuals): the composition of routing
    // and compression is identical, without a per-cell codebook
    // oracle. Build side is ONE shuffle-free corpus pass — cell
    // assignment (row-local argmax over the broadcast centroid array,
    // the assignCells pass shared with q_sim_ivf/q_dedup_semantic) and
    // PQ encoding (row-local argmin over the broadcast codebook)
    // happen in the same scan stage. Query side: probe cells from the
    // same centroid array, precompute the ADC table per query, then an
    // EQUI-join probe-cell = candidate-cell (a candidate's single cell
    // meets at most one of a query's distinct probes — no dup pairs),
    // ADC rank in a bounded per-query window. Determinism: same
    // ascending folds and lowest-id tie-breaks as q_sim_ivf/q_sim_pq.
    "q_sim_ivfpq" -> ((s, d) => {
      val e0 = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0)
      val centArr = centArrOf(e0)
      val ev = assignCells(e0, centArr)
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      val cb = broadcast(
        ev.filter(col("vec_id") >= PqBase && col("vec_id") < PqBase + PqK)
          .agg(array_sort(collect_list(struct(col("vec_id"), col("v")))).as("cbs"))
          .select(expr("transform(cbs, c -> c.v)").as("cb")))
      // same squared-distance table as q_sim_pq (dimensions fold
      // ascending within each subspace)
      val dmExpr = expr(
        s"""transform(sequence(0, ${PqSub - 1}), m ->
           |  transform(sequence(0, ${PqK - 1}), c ->
           |    aggregate(sequence(0, ${PqDim - 1}), 0D, (a, i) ->
           |      a + (v[m * $PqDim + i] - cb[c][m * $PqDim + i])
           |        * (v[m * $PqDim + i] - cb[c][m * $PqDim + i]))))""".stripMargin)
      val coded = ev.filter(col("vec_id") >= NumQueries).crossJoin(cb)
        .withColumn("dm", dmExpr)
        .select(col("vec_id").as("cand_id"), col("cell"), expr(
          "transform(dm, ds -> CAST(array_position(ds, array_min(ds)) AS INT) - 1)")
          .as("codes"))
      // ADC table is computed BEFORE the probe explode — one table per
      // query, not one per (query, probe)
      val q = e0.filter(col("vec_id") < NumQueries).crossJoin(centArr)
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .crossJoin(cb)
        .withColumn("qd", dmExpr)
        .withColumn("probe", explode(slice(array_sort(
          transform(col("cents"), c => struct(
            (-(dotD(col("embedding"), c.getField("cemb")) / (col("nrm") * c.getField("cnrm")))).as("nscore"),
            c.getField("cid").as("cid")))), 1, NProbe)))
        .select(col("vec_id").as("q_id"), col("probe").getField("cid").as("pcell"), col("qd"))
      val byDist = Window.partitionBy("q_id").orderBy(col("adc"), col("cand_id"))
      broadcast(q).join(coded, col("pcell") === col("cell") && col("q_id") =!= col("cand_id"))
        .withColumn("adc", expr(
          s"aggregate(sequence(0, ${PqSub - 1}), 0D, (a, m) -> a + qd[m][codes[m]])"))
        .withColumn("rnk", row_number().over(byDist))
        .filter(col("rnk") <= TopK)
        .select(col("q_id"), col("cand_id"), col("rnk"))
        .orderBy("q_id", "rnk")
    }),

    // Contrastive-pair mining — the training-data op behind embedding-
    // model fine-tuning (SimCSE/DPR-style): for each query vector, the
    // HARD NEGATIVE (highest-cosine candidate with a DIFFERENT label —
    // the confusable impostor) and the HARD POSITIVE (lowest-cosine
    // candidate with the SAME label — the far in-class example), plus
    // the class-balance counts. Unlabeled rows are excluded up front
    // (label comparisons and tie-breaks must be engine-agnostic, the
    // q_knn_label rule). Plan shape: broadcast query batch × one
    // corpus scan, then BOTH extremes rank inside ONE (q_id, same)
    // partitioning — two row_number orders share one exchange+sort
    // stage — and the final pivot aggregates on the same key. At
    // 100 TB: query batches stay bounded (broadcast), the corpus scan
    // is single-pass, and per-group state is O(1).
    "q_mine_hardneg" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"),
          normD(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0 && col("label").isNotNull)
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("label").as("ql"),
          col("embedding").as("qe"), col("nrm").as("qn"))
      val c = e.filter(col("vec_id") >= NumQueries)
        .select(col("vec_id").as("cand_id"), col("label").as("cl"),
          col("embedding").as("ce"), col("nrm").as("cn"))
      val j = broadcast(q).join(c)
        .withColumn("cos", dotD(col("qe"), col("ce")) / (col("qn") * col("cn")))
        .withColumn("same", col("cl") === col("ql"))
      val wHi = Window.partitionBy("q_id", "same").orderBy(col("cos").desc, col("cand_id"))
      val wLo = Window.partitionBy("q_id", "same").orderBy(col("cos").asc, col("cand_id"))
      j.withColumn("rn_hi", row_number().over(wHi))
        .withColumn("rn_lo", row_number().over(wLo))
        .groupBy("q_id")
        .agg(max(when(!col("same") && col("rn_hi") === 1, col("cand_id"))).as("hn_id"),
          max(when(col("same") && col("rn_lo") === 1, col("cand_id"))).as("hp_id"),
          sum(when(col("same"), 1L).otherwise(0L)).as("n_pos"),
          sum(when(!col("same"), 1L).otherwise(0L)).as("n_neg"))
        .orderBy("q_id")
    }),

    // Hybrid retrieval fusion — the lexical-candidates ∪ semantic-
    // candidates merge every RAG/retrieval stack runs: a term-count
    // lexical ranker and a cosine ranker against a query embedding
    // (vec 0) each yield top-K=100 candidates, fused by Reciprocal
    // Rank Fusion. Determinism: RRF contributions are EXACT fixed-
    // point integers, 1e12 div (60 + rank) — integer division on
    // positive operands is identical in both engines, so the fused
    // score needs no float-summation-order agreement (the usual RRF
    // 1/(60+r) double sum would not hash-match). Scale shape: each
    // ranker ends in TakeOrderedAndProject (per-partition heaps, no
    // global sort); ranks WITHIN the bounded K-row candidate sets come
    // from a better-than theta-join count (K² = 10⁴ rows) — never a
    // single-partition window (PlanAuditSpec pins both properties). At
    // 100 TB: two corpus scans, two top-K heaps, bounded fusion.
    "q_rank_fusion" -> ((s, d) => {
      val K = 100
      val terms = Seq("table", "spark", "query")
      val base = documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      val lexScore = terms.map(t =>
        size(filter(col("t"), x => x === t)).cast("long")).reduce(_ + _)
      val lex = base.select(col("doc_id"), lexScore.as("ls"))
        .orderBy(col("ls").desc, col("doc_id")).limit(K)
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0)
      val q0 = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("nrm").as("qn"))
      val sem = e.crossJoin(broadcast(q0))
        .select(col("vec_id").as("doc_id"),
          (dotD(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cs"))
        .orderBy(col("cs").desc, col("doc_id")).limit(K)
      // rank within a bounded candidate set = 1 + |strictly better|,
      // computed as a left theta-join count (no window, no exchange to
      // one partition); tie order is (score DESC, doc_id ASC)
      def ranked(df: DataFrame, sc: String): DataFrame = {
        val b = df.select(col("doc_id").as("b_id"), col(sc).as("b_s"))
        df.join(b,
            col("b_s") > col(sc) ||
              (col("b_s") === col(sc) && col("b_id") < col("doc_id")),
            "left")
          .groupBy("doc_id").agg((count(col("b_id")) + 1L).as("rnk"))
      }
      val lr = ranked(lex, "ls").select(col("doc_id"), col("rnk").as("r_lex"))
      val sr = ranked(sem, "cs").select(col("doc_id").as("s_id"), col("rnk").as("r_sem"))
      lr.join(sr, col("doc_id") === col("s_id"), "full")
        .select(coalesce(col("doc_id"), col("s_id")).as("doc_id"),
          col("r_lex"), col("r_sem"))
        .withColumn("rrf_fp",
          coalesce(expr("1000000000000 div (60 + r_lex)"), lit(0L)) +
            coalesce(expr("1000000000000 div (60 + r_sem)"), lit(0L)))
        .orderBy(col("rrf_fp").desc, col("doc_id"))
        .limit(20)
    }),

    // Per-cell silhouette audit of the IVF/SemDeDup cell geometry —
    // the cluster-quality gate you read BEFORE trusting a partition
    // of the corpus into k cells (bad silhouette = the dedup/ANN cell
    // boundaries are cutting through dense regions): for each vector,
    // a = cosine distance to its own (argmax) centroid, b = distance
    // to the nearest OTHER centroid, s = (b−a)/b ∈ [0,1] (a ≤ b by
    // argmax construction). Reuses the SAME broadcast centroid array
    // and fold-exact cosine as q_sim_ivf/q_dedup_semantic, so the
    // audit measures exactly the geometry those operators use.
    // Determinism: s is quantized to ppm by floor() BEFORE the
    // cell-level aggregation — integer sums are order-independent
    // where double sums are not; the b = 0 degenerate row (duplicate
    // of a centroid direction) scores 0 without dividing. Scale: one
    // corpus scan × broadcast k centroids (row-local sort of a
    // k-array), ONE cell-keyed map-side-combined shuffle of k rows.
    // The gate is CALIBRATED (round 18, SemKBench sil — SCALE.md
    // §"Semantic dedup" round-18 (b)): corpus-mean silhouette maps to
    // floor-free IVF recall@10 at k=800 as 0.51 → 0.96, 0.40 → 0.80,
    // ≤ 0.06 → ≤ 0.09 — a mean below ~0.1 says route to the flat
    // exact scan, not an IVF probe, and a boundary_frac near 1 says
    // the same thing per-cell.
    "q_sim_silhouette" -> ((s, d) => {
      val e = embeddings(s, d)
        .withColumn("nrm", normD(col("embedding")))
        .filter(col("nrm") > 0)
      e.crossJoin(centArrOf(e))
        .withColumn("cand", array_sort(cellScores(col("embedding"), col("nrm"))))
        .withColumn("best", element_at(col("cand"), -1))
        .withColumn("second", element_at(col("cand"), -2))
        .select((-col("best").getField("ncid")).as("cell"),
          (lit(1.0) - col("best").getField("cscore")).as("a"),
          (lit(1.0) - col("second").getField("cscore")).as("b"))
        .withColumn("sppm", when(col("b") > 0,
            floor(((col("b") - col("a")) / col("b")) * lit(1000000.0)))
          .otherwise(0L))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"),
          sum(col("sppm").cast(Dec380)).cast("double").as("sum_sppm"),
          sum(when(col("sppm") < 100000, 1L).otherwise(0L)).as("n_boundary"))
        .select(col("cell"), col("n"), col("sum_sppm"),
          (col("sum_sppm") / col("n") / lit(1000000.0)).as("mean_sil"),
          col("n_boundary"))
        .orderBy("cell")
    }),

    // Model-evaluation harness: per-class precision / recall / F1 of a
    // nearest-centroid classifier against gold labels — the eval
    // report every labeling/distillation pipeline ends with. The
    // "model" is the per-label mean embedding (q_embed_centroid's
    // deterministic ordered-fold construction, so centroid doubles are
    // bit-identical cross-engine); prediction is a row-local argmin of
    // exact squared L2 against the broadcast |labels|-entry centroid
    // array (min distance, label tie-break — array_min over struct
    // carries the same total order as the oracle's row_number).
    // Metrics are exact-integer ratios: tp / predicted / gold counts
    // from ONE confusion aggregation, each metric one double division
    // (F1 = 2·tp / (n_pred + n_gold), algebraically the P/R harmonic
    // mean but computed without intermediate rounding). Scale: one
    // corpus scan for centroids (ordered fold — the exactness trade,
    // documented at q_embed_centroid), one scan to predict, ONE
    // (gold, pred) shuffle of |labels|² rows; the checkpointed
    // confusion table feeds all three marginal branches.
    "q_eval_confusion" -> ((s, d) => {
      val e = embeddings(s, d).filter(col("label").isNotNull)
      val cents = e.groupBy("label")
        .agg(array_sort(collect_list(struct(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb")))).as("docs"))
        .select(col("label").as("cl"), expr(
          """transform(sequence(0, 63), d ->
            |  aggregate(docs, 0D, (a, x) -> a + x.emb[d])
            |    / CAST(size(docs) AS DOUBLE))""".stripMargin).as("centroid"))
      val carr = broadcast(cents
        .agg(array_sort(collect_list(struct(col("cl"), col("centroid")))).as("cents")))
      val pred = e.crossJoin(carr)
        .withColumn("best", expr(
          """array_min(transform(cents, c -> struct(
            |  aggregate(sequence(0, 63), 0D, (a, i) ->
            |    a + (CAST(embedding[i] AS DOUBLE) - c.centroid[i])
            |      * (CAST(embedding[i] AS DOUBLE) - c.centroid[i])) AS dist,
            |  c.cl AS cl)))""".stripMargin))
        .select(col("label").as("gold"), col("best.cl").as("pred"))
      val cm = pred.groupBy("gold", "pred").agg(count(lit(1)).as("n"))
        .transform(graft.Checkpoint.apply)
      val gc = cm.groupBy("gold").agg(sum("n").as("n_gold"))
      val pc = cm.groupBy("pred").agg(sum("n").as("n_pred"))
      val tp = cm.filter(col("gold") === col("pred"))
        .select(col("gold").as("tg"), col("n").as("tp0"))
      gc.join(tp, col("gold") === col("tg"), "left")
        .join(pc, col("gold") === col("pred"), "left")
        .select(col("gold").as("label"),
          coalesce(col("tp0"), lit(0L)).as("tp"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"),
          col("n_gold"))
        // "prec", not "precision": DOUBLE PRECISION makes `precision`
        // a reserved token in DuckDB's grammar
        .withColumn("prec",
          when(col("n_pred") > 0,
            col("tp").cast("double") / col("n_pred")).otherwise(lit(0.0)))
        .withColumn("recall", col("tp").cast("double") / col("n_gold"))
        .withColumn("f1",
          when(col("n_pred") + col("n_gold") > 0,
            (lit(2L) * col("tp")).cast("double")
              / (col("n_pred") + col("n_gold"))).otherwise(lit(0.0)))
        .orderBy("label")
    }),

    // Drift-monitor routing scores + est_f — the ANN index's drift
    // DETECTOR (graft.functions.IvfIndex.routeScores/driftStats) under
    // the cross-engine gate (round 20; the one VERDICT-r19-sanctioned
    // inventory slot). Per query, route_score = the best cosine among
    // its probed centroids; with groupSize = NCentroids/2 ⇒ g = 2
    // groups and nprobe = 2 = g the probe is EXHAUSTIVE, so the score
    // is exactly max-over-centroids cosine (the IvfIndexSpec full-probe
    // pin, now mirrored in DuckDB), through the same codegen ascending
    // folds as every other sim oracle. The batch statistic rides along
    // as a broadcast 1-row cross join (the established pattern):
    // below_frac = fraction under the fixed floor, est_f =
    // max(0, (below_frac − calibQ)/(1 − calibQ)) — driftStats' exact
    // arithmetic (its percentile columns are approximate-by-design and
    // column-pruned out here; the sf corpus is near-orthogonal, so the
    // floor 0.2 splits the best-cosine distribution mid-band). Scale
    // posture: routeScores is one broadcast of the g-struct routing
    // array + one |Q|-keyed map-side-combined max — query-stream cost,
    // zero corpus access (the monitor runs on live traffic).
    "q_drift_route" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0) // see q_sim_topk
      val cents = e
        .filter(col("vec_id") >= NumQueries && col("vec_id") < NumQueries + NCentroids)
        .select((col("vec_id") - NumQueries).as("cid"),
          col("embedding").as("cemb"), col("nrm").as("cnrm"))
      val rs = graft.functions.IvfIndex.routeScores(e, cents,
        groupSize = NCentroids / 2, nprobe = 2, kHint = NCentroids)
      val stats = graft.functions.IvfIndex.driftStats(e, cents, DriftFloor,
        calibQ = DriftCalibQ, groupSize = NCentroids / 2, nprobe = 2,
        kHint = NCentroids)
        .select(col("n_queries"), col("below_frac"), col("est_f"))
      rs.withColumn("below_floor",
          when(col("route_score") < DriftFloor, 1L).otherwise(0L))
        .crossJoin(broadcast(stats))
        .orderBy("q_id")
    }),
  )

  def oracles: Map[String, String] = {
    def planeList(h: Int): String =
      (1 to 64).map(j => planeNum(h, j)).mkString("[", ",", "]")
    val bucketSql = (0 until NBits).map { h =>
      s"""CASE WHEN list_reduce(list_transform(generate_series(1, 64),
         |  i -> embedding[i]::DOUBLE * ((${planeList(h)})[i]::DOUBLE / 1000003.0 - 0.5)),
         |  (x, y) -> x + y) > 0 THEN ${1L << h}::BIGINT ELSE 0::BIGINT END""".stripMargin
    }.mkString(" + ")
    val cosSql =
      """list_reduce(list_transform(generate_series(1, 64),
        |      i -> q.qe[i]::DOUBLE * c.ce[i]::DOUBLE), (x, y) -> x + y) / (q.qn * c.cn)""".stripMargin
    val probeMasks = (0L +: (0 until NBits).map(b => 1L << b))
      .map(m => s"($m)").mkString(",")

    Map(
      "q_sim_topk" ->
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
           |  FROM embeddings
           |), en AS (
           |  SELECT * FROM e WHERE nrm > 0
           |), q AS (
           |  SELECT vec_id AS q_id, embedding AS qe, nrm AS qn FROM en WHERE vec_id < $NumQueries
           |), c AS (
           |  SELECT vec_id AS cand_id, embedding AS ce, nrm AS cn FROM en
           |), scored AS (
           |  SELECT q.q_id, c.cand_id,
           |    row_number() OVER (PARTITION BY q.q_id ORDER BY $cosSql DESC, c.cand_id) AS rnk
           |  FROM q JOIN c ON q.q_id <> c.cand_id)
           |SELECT q_id, cand_id, rnk FROM scored WHERE rnk <= $TopK
           |ORDER BY q_id, rnk""".stripMargin,

      // dot folds dimensions ascending exactly like the Spark side's
      // DotProductExpr; l2_aug re-derives the augmented-space distance
      // from the same moments, term order matched (qn2 + m2 - 2·dot)
      "q_sim_mips" ->
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |    list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y) AS n2
           |  FROM embeddings
           |), m AS (SELECT max(n2) AS m2 FROM e
           |), q AS (
           |  SELECT vec_id AS q_id, embedding AS qe, n2 AS qn2 FROM e WHERE vec_id < $NumQueries
           |), c AS (
           |  SELECT vec_id AS cand_id, embedding AS ce FROM e
           |), s0 AS (
           |  SELECT q.q_id, c.cand_id, q.qn2, m.m2,
           |    list_reduce(list_transform(generate_series(1, 64),
           |      i -> q.qe[i]::DOUBLE * c.ce[i]::DOUBLE), (x, y) -> x + y) AS dot
           |  FROM q, c, m WHERE q.q_id <> c.cand_id
           |), r AS (
           |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY dot DESC, cand_id) AS rnk
           |  FROM s0)
           |SELECT q_id, cand_id, rnk, dot,
           |  sqrt(greatest(qn2 + m2 - 2 * dot, 0)) AS l2_aug
           |FROM r WHERE rnk <= $TopK ORDER BY q_id, rnk""".stripMargin,

      "q_sim_ann" ->
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm,
           |    $bucketSql AS bkt
           |  FROM embeddings
           |), en AS (
           |  SELECT * FROM e WHERE nrm > 0
           |), q AS (
           |  SELECT vec_id AS q_id, embedding AS qe, nrm AS qn, xor(bkt, m.mask) AS qb
           |  FROM en CROSS JOIN (VALUES $probeMasks) m(mask)
           |  WHERE vec_id < $NumQueries
           |), c AS (
           |  SELECT vec_id AS cand_id, embedding AS ce, nrm AS cn, bkt AS cb FROM en
           |), scored AS (
           |  SELECT q.q_id, c.cand_id,
           |    row_number() OVER (PARTITION BY q.q_id ORDER BY $cosSql DESC, c.cand_id) AS rnk
           |  FROM q JOIN c ON q.qb = c.cb AND q.q_id <> c.cand_id)
           |SELECT q_id, cand_id, rnk FROM scored WHERE rnk <= $TopK
           |ORDER BY q_id, rnk""".stripMargin,

      "q_sim_ivf" ->
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
           |  FROM embeddings
           |), en AS (
           |  SELECT * FROM e WHERE nrm > 0
           |), cents AS (
           |  SELECT vec_id - $NumQueries AS cid, embedding AS cemb, nrm AS cnrm
           |  FROM en WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + NCentroids}
           |), ranked AS (
           |  SELECT en.vec_id, en.embedding, en.nrm, cents.cid,
           |    row_number() OVER (PARTITION BY en.vec_id ORDER BY
           |      list_reduce(list_transform(generate_series(1, 64),
           |        i -> en.embedding[i]::DOUBLE * cents.cemb[i]::DOUBLE), (x, y) -> x + y)
           |        / (en.nrm * cents.cnrm) DESC, cents.cid) AS cr
           |  FROM en CROSS JOIN cents
           |), c AS (
           |  SELECT vec_id AS cand_id, embedding AS ce, nrm AS cn, cid AS cell
           |  FROM ranked WHERE cr = 1
           |), q AS (
           |  SELECT vec_id AS q_id, embedding AS qe, nrm AS qn, cid AS pcell
           |  FROM ranked WHERE vec_id < $NumQueries AND cr <= $NProbe
           |), scored AS (
           |  SELECT q.q_id, c.cand_id,
           |    row_number() OVER (PARTITION BY q.q_id ORDER BY $cosSql DESC, c.cand_id) AS rnk
           |  FROM q JOIN c ON q.pcell = c.cell AND q.q_id <> c.cand_id)
           |SELECT q_id, cand_id, rnk FROM scored WHERE rnk <= $TopK
           |ORDER BY q_id, rnk""".stripMargin,

      "q_sim_buckets" ->
        s"""SELECT bkt, count(*) AS n, count(DISTINCT label) AS nd_labels FROM (
           |  SELECT $bucketSql AS bkt, label FROM embeddings)
           |GROUP BY bkt ORDER BY bkt""".stripMargin,

      "q_embed_quantize" ->
        """WITH sc AS (
          |  SELECT vec_id, embedding,
          |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
          |  FROM embeddings),
          |q AS (
          |  SELECT vec_id, scale,
          |    list_transform(embedding, x -> CASE WHEN scale = 0.0 THEN 0::BIGINT
          |      ELSE CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT) END) AS qv
          |  FROM sc)
          |SELECT vec_id, scale,
          |  list_reduce(qv, (a, x) -> a + x) AS q_sum,
          |  list_min(qv) AS q_min,
          |  list_max(qv) AS q_max,
          |  CAST(len(list_filter(qv, x -> x = 0)) AS INT) AS n_zero
          |FROM q ORDER BY vec_id""".stripMargin,

      "q_embed_centroid" ->
        """WITH g AS (
          |  SELECT label,
          |    list(list_transform(embedding, x -> CAST(x AS DOUBLE)) ORDER BY vec_id) AS docs
          |  FROM embeddings GROUP BY label),
          |c AS (
          |  SELECT label,
          |    list_transform(generate_series(1, 64), d ->
          |      list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(docs, v -> v[d])),
          |        (x, y) -> x + y) / CAST(len(docs) AS DOUBLE)) AS centroid
          |  FROM g)
          |SELECT e.vec_id, e.label,
          |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
          |    list_transform(generate_series(1, 64),
          |      i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
          |         * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]))),
          |    (x, y) -> x + y)) AS dist
          |FROM embeddings e JOIN c ON e.label = c.label
          |ORDER BY e.vec_id""".stripMargin,

      "q_sim_pq" -> {
        // squared-distance table for vector column v against codebook
        // entry c of subspace m — same fold bounds as the Spark side
        val dmSql =
          s"""list_transform(generate_series(0, ${PqSub - 1}), m ->
             |      list_transform(generate_series(0, ${PqK - 1}), c ->
             |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |          list_transform(generate_series(1, $PqDim), i ->
             |            (v[m * $PqDim + i] - cb[c + 1][m * $PqDim + i])
             |              * (v[m * $PqDim + i] - cb[c + 1][m * $PqDim + i]))),
             |          (x, y) -> x + y)))""".stripMargin
        s"""WITH e AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings),
           |cbt AS (
           |  SELECT list(v ORDER BY vec_id) AS cb FROM e
           |  WHERE vec_id >= $PqBase AND vec_id < ${PqBase + PqK}),
           |coded AS (
           |  SELECT vec_id AS cand_id,
           |    list_transform($dmSql,
           |      ds -> CAST(list_position(ds, list_min(ds)) AS INT) - 1) AS codes
           |  FROM e CROSS JOIN cbt WHERE vec_id >= $NumQueries),
           |q AS (
           |  SELECT vec_id AS q_id, $dmSql AS qd
           |  FROM e CROSS JOIN cbt WHERE vec_id < $NumQueries),
           |scored AS (
           |  SELECT q.q_id, coded.cand_id,
           |    row_number() OVER (PARTITION BY q.q_id ORDER BY
           |      list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |        list_transform(generate_series(1, $PqSub), m -> qd[m][codes[m] + 1])),
           |        (x, y) -> x + y) ASC, coded.cand_id) AS rnk
           |  FROM q CROSS JOIN coded)
           |SELECT q_id, cand_id, rnk FROM scored WHERE rnk <= $TopK
           |ORDER BY q_id, rnk""".stripMargin
      },

      "q_knn_label" ->
        s"""WITH e AS (
           |  SELECT vec_id, label, embedding,
           |    sqrt(list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
           |  FROM embeddings
           |), en AS (
           |  SELECT * FROM e WHERE nrm > 0
           |), q AS (
           |  SELECT vec_id AS q_id, embedding AS qe, nrm AS qn FROM en WHERE vec_id < $NumQueries
           |), c AS (
           |  SELECT vec_id AS cand_id, label AS cl, embedding AS ce, nrm AS cn
           |  FROM en WHERE vec_id >= $NumQueries AND label IS NOT NULL
           |), nn AS (
           |  SELECT q.q_id, c.cl,
           |    row_number() OVER (PARTITION BY q.q_id ORDER BY $cosSql DESC, c.cand_id) AS rnk
           |  FROM q CROSS JOIN c
           |), votes AS (
           |  SELECT q_id, cl, count(*) AS n_votes FROM nn WHERE rnk <= $TopK GROUP BY q_id, cl
           |), best AS (
           |  SELECT q_id, cl, n_votes,
           |    row_number() OVER (PARTITION BY q_id ORDER BY n_votes DESC, cl) AS vr
           |  FROM votes)
           |SELECT q_id, cl AS pred_label, n_votes FROM best WHERE vr = 1
           |ORDER BY q_id""".stripMargin,

      "q_dedup_semantic" ->
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
           |  FROM embeddings
           |), en AS (
           |  SELECT * FROM e WHERE nrm > 0
           |), cents AS (
           |  SELECT vec_id - $NumQueries AS cid, embedding AS cemb, nrm AS cnrm
           |  FROM en WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + NCentroids}
           |), ranked AS (
           |  SELECT en.vec_id, en.embedding, en.nrm, cents.cid,
           |    row_number() OVER (PARTITION BY en.vec_id ORDER BY
           |      list_reduce(list_transform(generate_series(1, 64),
           |        i -> en.embedding[i]::DOUBLE * cents.cemb[i]::DOUBLE), (x, y) -> x + y)
           |        / (en.nrm * cents.cnrm) DESC, cents.cid) AS cr
           |  FROM en CROSS JOIN cents
           |), m AS (
           |  SELECT vec_id, embedding, nrm, cid AS cell FROM ranked WHERE cr = 1)
           |SELECT a.cell, a.vec_id AS a_id, b.vec_id AS b_id
           |FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id
           |WHERE list_reduce(list_transform(generate_series(1, 64),
           |    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), (x, y) -> x + y)
           |    / (a.nrm * b.nrm) >= 0.45
           |ORDER BY a.cell, a_id, b_id""".stripMargin,

      // Mirrors the round-16 fit-then-assign pipeline stage by stage.
      // The two-level assignment chain (IvfIndex.assignIndexed) appears
      // TWICE — once inside the unrolled spherical-Lloyd iteration
      // (IvfIndex.fit's per-iteration assignment IS the indexed pass)
      // and once for the final assignment under the fitted centroids —
      // so it is generated by `twoLevel` below, parametrized by the
      // centroid CTE and a prefix (the q_sim_kmeans unrolled-iteration
      // precedent). Group means fold members cid-ascending /
      // dims-ascending, divide once, quantize to FLOAT once (IEEE
      // round-to-nearest both engines); stage-1 routing = score DESC,
      // gid ASC rank ≤ nprobe; stage-2 argmax = score DESC, cid ASC
      // rank 1. The fit's member means fold in vec_id order as doubles
      // where the engine sums decimals — within ONE float ulp after
      // the quantization (not bit-identical; ~1% of coordinates round
      // to the adjacent float — see the query doc and IvfIndexSpec's
      // ulp-bound test for why the integer pair output is insulated
      // by assignment margins). Empty cells carry
      // the seed centroid (COALESCE), dead centroids drop (cnrm > 0),
      // pair search identical to q_dedup_semantic on the fitted cells.
      "q_dedup_semantic_indexed" -> {
        // two-level assignment over centroid CTE `cents` (cid, cemb,
        // cnrm): emits CTEs `<p>gmemb..<p>m`, with `<p>m` =
        // (vec_id, embedding, nrm, cell)
        def twoLevel(cents: String, p: String): String =
          s"""${p}gmemb AS (
             |  SELECT cid // $IdxGroup AS gid, list(cemb ORDER BY cid) AS membs
             |  FROM $cents GROUP BY cid // $IdxGroup
             |), ${p}gmd AS (
             |  SELECT gid, list_transform(generate_series(1, 64), d ->
             |    CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |      list_transform(membs, v -> v[d]::DOUBLE)), (x, y) -> x + y)
             |      / CAST(len(membs) AS DOUBLE) AS FLOAT)) AS gemb
             |  FROM ${p}gmemb
             |), ${p}gm AS (
             |  SELECT gid, gemb,
             |    sqrt(list_reduce(list_transform(generate_series(1, 64),
             |      i -> gemb[i]::DOUBLE * gemb[i]::DOUBLE), (x, y) -> x + y)) AS gnrm
             |  FROM ${p}gmd
             |), ${p}gmn AS (
             |  SELECT * FROM ${p}gm WHERE gnrm > 0
             |), ${p}granked AS (
             |  SELECT en.vec_id, en.embedding, en.nrm, g.gid,
             |    row_number() OVER (PARTITION BY en.vec_id ORDER BY
             |      list_reduce(list_transform(generate_series(1, 64),
             |        i -> en.embedding[i]::DOUBLE * g.gemb[i]::DOUBLE), (x, y) -> x + y)
             |        / (en.nrm * g.gnrm) DESC, g.gid) AS gr
             |  FROM en CROSS JOIN ${p}gmn g
             |), ${p}cranked AS (
             |  SELECT p.vec_id, p.embedding, p.nrm, c.cid,
             |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
             |      list_reduce(list_transform(generate_series(1, 64),
             |        i -> p.embedding[i]::DOUBLE * c.cemb[i]::DOUBLE), (x, y) -> x + y)
             |        / (p.nrm * c.cnrm) DESC, c.cid) AS cr
             |  FROM (SELECT vec_id, embedding, nrm, gid FROM ${p}granked WHERE gr <= $IdxProbe) p
             |  JOIN $cents c ON p.gid = c.cid // $IdxGroup
             |), ${p}m AS (
             |  SELECT vec_id, embedding, nrm, cid AS cell FROM ${p}cranked WHERE cr = 1)""".stripMargin
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
           |  FROM embeddings
           |), en AS (
           |  SELECT * FROM e WHERE nrm > 0
           |), c0 AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
           |    embedding AS cemb, nrm AS cnrm
           |  FROM (SELECT vec_id, embedding, nrm FROM en ORDER BY vec_id LIMIT $IdxK)
           |), ${twoLevel("c0", "f")},
           |fmean AS (
           |  SELECT cell AS cid,
           |    list_transform(generate_series(1, 64), d ->
           |      CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |        list_transform(docs, v -> v[d]::DOUBLE)), (x, y) -> x + y)
           |        / CAST(len(docs) AS DOUBLE) AS FLOAT)) AS cemb
           |  FROM (SELECT cell, list(embedding ORDER BY vec_id) AS docs
           |        FROM fm GROUP BY cell)
           |), cup AS (
           |  SELECT c0.cid, COALESCE(fmean.cemb, c0.cemb) AS cemb
           |  FROM c0 LEFT JOIN fmean ON c0.cid = fmean.cid
           |), cfit AS (
           |  SELECT cid, cemb, cnrm FROM (
           |    SELECT cid, cemb,
           |      sqrt(list_reduce(list_transform(generate_series(1, 64),
           |        i -> cemb[i]::DOUBLE * cemb[i]::DOUBLE), (x, y) -> x + y)) AS cnrm
           |    FROM cup)
           |  WHERE cnrm > 0
           |), ${twoLevel("cfit", "s")}
           |SELECT a.cell, a.vec_id AS a_id, b.vec_id AS b_id
           |FROM sm a JOIN sm b ON a.cell = b.cell AND a.vec_id < b.vec_id
           |WHERE list_reduce(list_transform(generate_series(1, 64),
           |    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), (x, y) -> x + y)
           |    / (a.nrm * b.nrm) >= 0.45
           |ORDER BY a.cell, a_id, b_id""".stripMargin
      },

      "q_embed_project" -> {
        def projSql(p: Int): String =
          s"""list_reduce(list_transform(generate_series(1, 64),
             |    i -> embedding[i]::DOUBLE * ((${planeList(ProjBase + p)})[i]::DOUBLE / 1000003.0 - 0.5)),
             |    (x, y) -> x + y)""".stripMargin
        val pn2 = (0 until ProjDims).map(p => s"p$p * p$p").mkString(" + ")
        s"""WITH pr AS (
           |  SELECT vec_id,
           |    list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y) AS on2,
           |    ${(0 until ProjDims).map(p => projSql(p) + s" AS p$p").mkString(",\n    ")}
           |  FROM embeddings
           |), s AS (
           |  SELECT vec_id, on2, $pn2 AS pn2 FROM pr WHERE on2 > 0)
           |SELECT vec_id, on2, pn2, pn2 / on2 AS ratio
           |FROM s ORDER BY vec_id""".stripMargin
      },

      "q_sim_recall" ->
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm,
           |    $bucketSql AS bkt
           |  FROM embeddings
           |), en AS (
           |  SELECT * FROM e WHERE nrm > 0
           |), qx AS (
           |  SELECT vec_id AS q_id, embedding AS qe, nrm AS qn FROM en WHERE vec_id < $NumQueries
           |), cc AS (
           |  SELECT vec_id AS cand_id, embedding AS ce, nrm AS cn, bkt AS cb FROM en
           |), ex_scored AS (
           |  SELECT q.q_id, c.cand_id,
           |    row_number() OVER (PARTITION BY q.q_id ORDER BY $cosSql DESC, c.cand_id) AS rnk
           |  FROM qx q JOIN cc c ON q.q_id <> c.cand_id
           |), exact AS (SELECT q_id, cand_id FROM ex_scored WHERE rnk <= $TopK
           |), qp AS (
           |  SELECT vec_id AS q_id, embedding AS qe, nrm AS qn, xor(bkt, m.mask) AS qb
           |  FROM en CROSS JOIN (VALUES $probeMasks) m(mask)
           |  WHERE vec_id < $NumQueries
           |), ann_scored AS (
           |  SELECT q.q_id, c.cand_id,
           |    row_number() OVER (PARTITION BY q.q_id ORDER BY $cosSql DESC, c.cand_id) AS rnk
           |  FROM qp q JOIN cc c ON q.qb = c.cb AND q.q_id <> c.cand_id
           |), ann AS (SELECT q_id, cand_id FROM ann_scored WHERE rnk <= $TopK)
           |SELECT x.q_id, count(*) AS n_exact, count(a.cand_id) AS n_hit,
           |  CAST(count(a.cand_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
           |FROM exact x LEFT JOIN ann a ON x.q_id = a.q_id AND x.cand_id = a.cand_id
           |GROUP BY x.q_id ORDER BY x.q_id""".stripMargin,

      "q_sim_kmeans" -> {
        // one Lloyd iteration as a CTE pair: assignment (argmin squared
        // distance, ties to lowest cid) + ordered-fold centroid update
        def iter(cents: String, a: String, c: String): String =
          s"""$a AS (
             |  SELECT vec_id, emb, cid FROM (
             |    SELECT e.vec_id, e.emb, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
             |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |          list_transform(generate_series(1, 64),
             |            i -> (e.emb[i] - c.cemb[i]) * (e.emb[i] - c.cemb[i]))),
             |          (x, y) -> x + y), c.cid) AS r
             |    FROM e CROSS JOIN $cents c)
             |  WHERE r = 1),
             |$c AS (
             |  SELECT cid, len(docs) AS n_members,
             |    list_transform(generate_series(1, 64), d ->
             |      list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |        list_transform(docs, v -> v[d])), (x, y) -> x + y)
             |        / CAST(len(docs) AS DOUBLE)) AS cemb
             |  FROM (SELECT cid, list(emb ORDER BY vec_id) AS docs FROM $a GROUP BY cid))""".stripMargin
        s"""WITH e AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           |  FROM embeddings),
           |c0 AS (
           |  SELECT vec_id - $NumQueries AS cid, emb AS cemb FROM e
           |  WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + NCentroids}),
           |${iter("c0", "a1", "c1")},
           |${iter("c1", "a2", "c2")}
           |SELECT cid AS cell, n_members,
           |  list_reduce(list_prepend(CAST(0 AS DOUBLE), cemb), (x, y) -> x + y) AS c_sum
           |FROM c2 ORDER BY cell""".stripMargin
      },

      "q_sim_ivfpq" -> {
        // same dm table as q_sim_pq's oracle, over the cell-assigned
        // vector CTE `ev` (columns v, cb in scope)
        val dmSql =
          s"""list_transform(generate_series(0, ${PqSub - 1}), m ->
             |      list_transform(generate_series(0, ${PqK - 1}), c ->
             |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |          list_transform(generate_series(1, $PqDim), i ->
             |            (v[m * $PqDim + i] - cb[c + 1][m * $PqDim + i])
             |              * (v[m * $PqDim + i] - cb[c + 1][m * $PqDim + i]))),
             |          (x, y) -> x + y)))""".stripMargin
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
           |  FROM embeddings
           |), en AS (
           |  SELECT * FROM e WHERE nrm > 0
           |), cents AS (
           |  SELECT vec_id - $NumQueries AS cid, embedding AS cemb, nrm AS cnrm
           |  FROM en WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + NCentroids}
           |), ranked AS (
           |  SELECT en.vec_id, en.embedding, en.nrm, cents.cid,
           |    row_number() OVER (PARTITION BY en.vec_id ORDER BY
           |      list_reduce(list_transform(generate_series(1, 64),
           |        i -> en.embedding[i]::DOUBLE * cents.cemb[i]::DOUBLE), (x, y) -> x + y)
           |        / (en.nrm * cents.cnrm) DESC, cents.cid) AS cr
           |  FROM en CROSS JOIN cents
           |), ev AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, cid AS cell
           |  FROM ranked WHERE cr = 1
           |), cbt AS (
           |  SELECT list(v ORDER BY vec_id) AS cb FROM ev
           |  WHERE vec_id >= $PqBase AND vec_id < ${PqBase + PqK}
           |), coded AS (
           |  SELECT vec_id AS cand_id, cell,
           |    list_transform($dmSql,
           |      ds -> CAST(list_position(ds, list_min(ds)) AS INT) - 1) AS codes
           |  FROM ev CROSS JOIN cbt WHERE vec_id >= $NumQueries
           |), q AS (
           |  SELECT ev.vec_id AS q_id, r.cid AS pcell, $dmSql AS qd
           |  FROM ranked r JOIN ev ON ev.vec_id = r.vec_id CROSS JOIN cbt
           |  WHERE r.vec_id < $NumQueries AND r.cr <= $NProbe
           |), scored AS (
           |  SELECT q.q_id, coded.cand_id,
           |    row_number() OVER (PARTITION BY q.q_id ORDER BY
           |      list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |        list_transform(generate_series(1, $PqSub), m -> qd[m][codes[m] + 1])),
           |        (x, y) -> x + y) ASC, coded.cand_id) AS rnk
           |  FROM q JOIN coded ON q.pcell = coded.cell AND q.q_id <> coded.cand_id)
           |SELECT q_id, cand_id, rnk FROM scored WHERE rnk <= $TopK
           |ORDER BY q_id, rnk""".stripMargin
      },

      "q_mine_hardneg" ->
        s"""WITH e AS (
           |  SELECT vec_id, label, embedding,
           |    sqrt(list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
           |  FROM embeddings
           |), en AS (
           |  SELECT * FROM e WHERE nrm > 0 AND label IS NOT NULL
           |), q AS (
           |  SELECT vec_id AS q_id, label AS ql, embedding AS qe, nrm AS qn
           |  FROM en WHERE vec_id < $NumQueries
           |), c AS (
           |  SELECT vec_id AS cand_id, label AS cl, embedding AS ce, nrm AS cn
           |  FROM en WHERE vec_id >= $NumQueries
           |), j AS (
           |  SELECT q.q_id, c.cand_id, (c.cl = q.ql) AS same, $cosSql AS cos
           |  FROM q CROSS JOIN c
           |), r AS (
           |  SELECT q_id, cand_id, same,
           |    row_number() OVER (PARTITION BY q_id, same ORDER BY cos DESC, cand_id) AS rn_hi,
           |    row_number() OVER (PARTITION BY q_id, same ORDER BY cos ASC, cand_id) AS rn_lo
           |  FROM j)
           |SELECT q_id,
           |  max(CASE WHEN NOT same AND rn_hi = 1 THEN cand_id END) AS hn_id,
           |  max(CASE WHEN same AND rn_lo = 1 THEN cand_id END) AS hp_id,
           |  CAST(sum(CASE WHEN same THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           |  CAST(sum(CASE WHEN NOT same THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
           |FROM r GROUP BY q_id ORDER BY q_id""".stripMargin,

      // ranks via row_number over the bounded top-K CTEs — equivalent
      // to the Spark side's better-than join count by construction;
      // RRF terms mirrored as 1e12 // (60 + rank) integer division
      "q_rank_fusion" ->
        """WITH lex AS (
          |  SELECT doc_id,
          |    CAST(len(list_filter(string_split(text, ' '), t -> t = 'table'))
          |      + len(list_filter(string_split(text, ' '), t -> t = 'spark'))
          |      + len(list_filter(string_split(text, ' '), t -> t = 'query')) AS BIGINT) AS ls
          |  FROM documents ORDER BY ls DESC, doc_id LIMIT 100
          |), e AS (
          |  SELECT vec_id, embedding,
          |    sqrt(list_reduce(list_transform(generate_series(1, 64),
          |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
          |  FROM embeddings
          |), en AS (SELECT * FROM e WHERE nrm > 0
          |), q0 AS (SELECT embedding AS qe, nrm AS qn FROM en WHERE vec_id = 0
          |), sem AS (
          |  SELECT vec_id AS doc_id,
          |    list_reduce(list_transform(generate_series(1, 64),
          |      i -> q0.qe[i]::DOUBLE * en.embedding[i]::DOUBLE), (x, y) -> x + y)
          |      / (q0.qn * en.nrm) AS cs
          |  FROM en CROSS JOIN q0 ORDER BY cs DESC, doc_id LIMIT 100
          |), lr AS (
          |  SELECT doc_id, row_number() OVER (ORDER BY ls DESC, doc_id) AS r_lex FROM lex
          |), sr AS (
          |  SELECT doc_id, row_number() OVER (ORDER BY cs DESC, doc_id) AS r_sem FROM sem)
          |SELECT COALESCE(lr.doc_id, sr.doc_id) AS doc_id, r_lex, r_sem,
          |  COALESCE(1000000000000 // (60 + r_lex), 0) + COALESCE(1000000000000 // (60 + r_sem), 0) AS rrf_fp
          |FROM lr FULL JOIN sr ON lr.doc_id = sr.doc_id
          |ORDER BY rrf_fp DESC, doc_id LIMIT 20""".stripMargin,

      // same fold-exact cosine + (score DESC, cid ASC) total order as
      // the q_sim_ivf oracle; s quantized to ppm before aggregation
      "q_sim_silhouette" ->
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
           |  FROM embeddings
           |), en AS (
           |  SELECT * FROM e WHERE nrm > 0
           |), cents AS (
           |  SELECT vec_id - $NumQueries AS cid, embedding AS cemb, nrm AS cnrm
           |  FROM en WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + NCentroids}
           |), cand AS (
           |  SELECT en.vec_id, cents.cid,
           |    list_reduce(list_transform(generate_series(1, 64),
           |      i -> en.embedding[i]::DOUBLE * cents.cemb[i]::DOUBLE), (x, y) -> x + y)
           |      / (en.nrm * cents.cnrm) AS cs,
           |    row_number() OVER (PARTITION BY en.vec_id ORDER BY
           |      list_reduce(list_transform(generate_series(1, 64),
           |        i -> en.embedding[i]::DOUBLE * cents.cemb[i]::DOUBLE), (x, y) -> x + y)
           |        / (en.nrm * cents.cnrm) DESC, cents.cid) AS cr
           |  FROM en CROSS JOIN cents
           |), ab AS (
           |  SELECT vec_id,
           |    max(CASE WHEN cr = 1 THEN cid END) AS cell,
           |    1.0 - max(CASE WHEN cr = 1 THEN cs END) AS a,
           |    1.0 - max(CASE WHEN cr = 2 THEN cs END) AS b
           |  FROM cand GROUP BY vec_id
           |), sp AS (
           |  SELECT cell,
           |    CASE WHEN b > 0 THEN CAST(floor(((b - a) / b) * 1000000.0) AS BIGINT)
           |         ELSE 0 END AS sppm
           |  FROM ab)
           |SELECT cell, count(*) AS n,
           |  CAST(CAST(sum(sppm) AS VARCHAR) AS DOUBLE) AS sum_sppm,
           |  CAST(CAST(sum(sppm) AS VARCHAR) AS DOUBLE) / count(*) / 1000000.0 AS mean_sil,
           |  CAST(sum(CASE WHEN sppm < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary
           |FROM sp GROUP BY cell ORDER BY cell""".stripMargin,

      // centroid construction = the q_embed_centroid oracle (ordered
      // fold, bit-identical doubles); argmin via (dist ASC, label ASC)
      // row_number — the same total order as the Spark array_min
      "q_eval_confusion" ->
        """WITH e AS (SELECT * FROM embeddings WHERE label IS NOT NULL),
          |g AS (
          |  SELECT label,
          |    list(list_transform(embedding, x -> CAST(x AS DOUBLE)) ORDER BY vec_id) AS docs
          |  FROM e GROUP BY label),
          |c AS (
          |  SELECT label AS cl,
          |    list_transform(generate_series(1, 64), d ->
          |      list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(docs, v -> v[d])),
          |        (x, y) -> x + y) / CAST(len(docs) AS DOUBLE)) AS centroid
          |  FROM g),
          |ranked AS (
          |  SELECT e.vec_id, e.label AS gold, c.cl,
          |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
          |      list_reduce(list_prepend(CAST(0 AS DOUBLE),
          |        list_transform(generate_series(1, 64),
          |          i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
          |             * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]))),
          |        (x, y) -> x + y) ASC, c.cl) AS r
          |  FROM e CROSS JOIN c),
          |p AS (SELECT gold, cl AS pred FROM ranked WHERE r = 1),
          |cm AS (SELECT gold, pred, count(*) AS n FROM p GROUP BY 1, 2),
          |gc AS (SELECT gold, CAST(sum(n) AS BIGINT) AS n_gold FROM cm GROUP BY 1),
          |pc AS (SELECT pred, CAST(sum(n) AS BIGINT) AS n_pred FROM cm GROUP BY 1),
          |tp AS (SELECT gold AS tg, n AS tp0 FROM cm WHERE gold = pred)
          |SELECT gc.gold AS label,
          |  COALESCE(tp0, 0) AS tp,
          |  COALESCE(n_pred, 0) AS n_pred,
          |  n_gold,
          |  CASE WHEN COALESCE(n_pred, 0) > 0
          |       THEN CAST(COALESCE(tp0, 0) AS DOUBLE) / COALESCE(n_pred, 0)
          |       ELSE 0.0 END AS prec,
          |  CAST(COALESCE(tp0, 0) AS DOUBLE) / n_gold AS recall,
          |  CASE WHEN COALESCE(n_pred, 0) + n_gold > 0
          |       THEN CAST(2 * COALESCE(tp0, 0) AS DOUBLE) / (COALESCE(n_pred, 0) + n_gold)
          |       ELSE 0.0 END AS f1
          |FROM gc LEFT JOIN tp ON gc.gold = tp.tg
          |LEFT JOIN pc ON gc.gold = pc.pred
          |ORDER BY label""".stripMargin,

      // full-probe route score = exact best-centroid cosine (the same
      // ascending-fold dot/norm as every sim oracle); batch stats =
      // driftStats' exact est_f arithmetic with the same double
      // literals the Spark plan folds
      "q_drift_route" ->
        s"""WITH e AS (
           |  SELECT vec_id, embedding,
           |    sqrt(list_reduce(list_transform(generate_series(1, 64),
           |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)) AS nrm
           |  FROM embeddings
           |), en AS (
           |  SELECT * FROM e WHERE nrm > 0
           |), c AS (
           |  SELECT vec_id - $NumQueries AS cid, embedding AS cemb, nrm AS cnrm
           |  FROM en WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + NCentroids}
           |), s0 AS (
           |  SELECT q.vec_id AS q_id,
           |    max(list_reduce(list_transform(generate_series(1, 64),
           |      i -> q.embedding[i]::DOUBLE * c.cemb[i]::DOUBLE), (x, y) -> x + y)
           |      / (q.nrm * c.cnrm)) AS route_score
           |  FROM en q CROSS JOIN c GROUP BY q.vec_id
           |), st AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_queries,
           |    CAST(sum(CASE WHEN route_score < $DriftFloor THEN 1 ELSE 0 END) AS DOUBLE)
           |      / count(*) AS below_frac
           |  FROM s0
           |), stf AS (
           |  SELECT n_queries, below_frac,
           |    greatest(0.0, (below_frac - $DriftCalibQ) / (1.0 - $DriftCalibQ)) AS est_f
           |  FROM st)
           |SELECT s0.q_id, s0.route_score,
           |  CASE WHEN s0.route_score < $DriftFloor THEN 1::BIGINT ELSE 0::BIGINT END AS below_floor,
           |  stf.n_queries, stf.below_frac, stf.est_f
           |FROM s0 CROSS JOIN stf ORDER BY q_id""".stripMargin,
    )
  }
}
