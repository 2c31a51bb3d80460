package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Two-level IVF-over-centroids cell assignment — the large-k scale path
  * for every argmax-cosine centroid consumer (SemDeDup cells, IVF coarse
  * routing, spherical k-means iterations).
  *
  * The flat assignment is an n×k cosine fan-out; SemDeDup at production
  * scale raises k with n (tens of thousands of cells), so the fan-out
  * itself becomes the bottleneck (round-14 `graft.SemKBench` measured
  * 15.96 s flat vs 4.34 s indexed at 100×/k=800, and the indexed slope
  * sub-linear at ~3×/decade). The remedy measured there and shipped
  * here: bucket the k centroids into g = k/groupSize groups, summarize
  * each group by its MEAN vector, and assign in two stages —
  *
  *   stage 1 (row-local): score the g group means (n×g cosines) against
  *     a BROADCAST single-row array of group structs; keep the top
  *     `nprobe` groups per vector (array_sort + slice in place — no
  *     shuffle, no window);
  *   stage 2 (one keyed shuffle): explode the nprobe probes, broadcast-
  *     join the probed groups' centroids (n·nprobe·groupSize cosines),
  *     and take the per-vector argmax with a map-side-combined
  *     max(struct) aggregate — no window here either.
  *
  * Total work: n×(g + nprobe·groupSize) cosines instead of n×k — for
  * k=800/g=100/nprobe=2 that is 116 vs 800 per vector, and g grows as
  * k/8 so the advantage compounds as k ∝ n. Approximation is exactly
  * production IVF's: a vector whose true best centroid lies outside its
  * probed groups lands in a neighbor cell (SemKBench measures the
  * disagreement rate and the recall cost: 0.747 → 0.625 recall@≥0.9 on
  * the clustered replica at 100×).
  *
  * Determinism contract (the oracle-gate rules): group means fold
  * member centroids in cid-ascending order and dimensions ascending,
  * one double division by the member count, then one float32
  * quantization (the codegen dot is ARRAY<FLOAT>; float rounding is
  * IEEE round-to-nearest in both engines); all cosines are the
  * DotProductExpr/VecNormExpr ascending folds; stage-1 ties break to
  * the lower gid, stage-2 ties to the lower cid. Every step has an
  * exact DuckDB mirror (see q_dedup_semantic_indexed's oracle).
  *
  * Scale posture: the group-mean array is g structs of dim floats —
  * ~29 KB at k=800/dim=64, broadcast; the centroid side of stage 2 is
  * k rows — broadcast to ~10⁵ cids, a cell-keyed shuffle join beyond
  * that (same plan, bigger right side). Nothing here ever shuffles the
  * corpus more than once.
  */
object IvfIndex {

  private def dotD(x: Column, y: Column): Column =
    ColumnBridge.column(graft.gen.DotProductExpr(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))

  private def normD(x: Column): Column =
    ColumnBridge.column(graft.gen.VecNormExpr(ColumnBridge.expression(x)))

  /** Per-group mean summaries as a broadcast SINGLE-ROW sorted array of
    * struct(gid, gemb: array<float>, gnrm) — the stage-1 routing table.
    *
    * Input `cents`: (cid: long, cemb: array<float>, cnrm: double).
    * Means are exact double folds in cid-then-dimension ascending order,
    * quantized to float once (see object doc); groups whose mean
    * degenerates to the zero vector are dropped symmetrically with the
    * oracle (their members are then only reachable if another probed
    * group shares them — i.e. not at all; a degenerate group mean means
    * the group's centroids cancel and routing to it is meaningless).
    */
  def groupMeansArr(cents: DataFrame, groupSize: Int, dim: Int = 64): DataFrame = {
    val gm = cents
      .groupBy(expr(s"cid div $groupSize").as("gid"))
      .agg(array_sort(collect_list(struct(col("cid"), col("cemb")))).as("membs"))
      .select(col("gid"), expr(
        s"""transform(sequence(0, ${dim - 1}), d ->
           |  aggregate(membs, 0D, (a, x) -> a + CAST(x.cemb[d] AS DOUBLE))
           |    / CAST(size(membs) AS DOUBLE))""".stripMargin).as("gmd"))
      .select(col("gid"), col("gmd").cast("array<float>").as("gemb"))
      .select(col("gid"), col("gemb"), normD(col("gemb")).as("gnrm"))
      .filter(col("gnrm") > 0)
    broadcast(gm.agg(array_sort(collect_list(
      struct(col("gid"), col("gemb"), col("gnrm")))).as("gma")))
  }

  /** Two-level cell assignment. Input `e`: (vec_id, embedding, nrm > 0)
    * plus any passenger columns are NOT carried (output is the standard
    * (vec_id, embedding, nrm, cell) the pair-search consumers expect).
    * `cents`: (cid, cemb, cnrm) with cid densely grouped by
    * `cid div groupSize`.
    */
  def assignIndexed(e: DataFrame, cents: DataFrame,
                    groupSize: Int = 8, nprobe: Int = 2,
                    dim: Int = 64): DataFrame = {
    val gma = groupMeansArr(cents, groupSize, dim)
    // stage 1: row-local top-nprobe groups — ascending sort on
    // struct(-score, gid) == (score DESC, gid ASC), sliced in place
    val probed = e.crossJoin(gma)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(slice(array_sort(transform(col("gma"), g => struct(
          (-(dotD(col("embedding"), g.getField("gemb"))
            / (col("nrm") * g.getField("gnrm")))).as("nscore"),
          g.getField("gid").as("gid")))), 1, nprobe)).as("p"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("p").getField("gid").as("gid"))
    // stage 2: argmax over the probed groups' centroids only — highest
    // cosine wins, ties to the LOWEST cid via max(struct(score, -cid))
    probed
      .join(broadcast(cents.withColumn("gid", expr(s"cid div $groupSize"))), Seq("gid"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        struct((dotD(col("embedding"), col("cemb")) / (col("nrm") * col("cnrm"))).as("cscore"),
          (-col("cid")).as("ncid")).as("cand"))
      .groupBy("vec_id")
      .agg(first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"),
        max(col("cand")).as("best"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (-col("best").getField("ncid")).as("cell"))
  }

  /** Spherical k-means fit for LARGE k — the centroid trainer whose
    * per-iteration assignment is the two-level pass above, so k is never
    * a k-wide literal expression tree (graft.functions.KMeans's
    * `nearest` materializes k struct branches per row: exact and ideal
    * for k ≤ ~32, hopeless at k=800 where codegen falls back
    * interpreted). Objective is the cosine the IVF consumers use:
    * assignment = argmax dot(v,c)/(|v||c|), update = per-cell member
    * mean (the classic spherical-Lloyd step; dividing by the centroid
    * norm at assignment time is equivalent to assigning against the
    * normalized mean).
    *
    * Determinism: init = the k smallest-id vectors (no RNG); per-cell
    * per-dimension means are DECIMAL-exact partial aggregates (the
    * KMeans.fit rule — order-independent fold, one double conversion),
    * so the fit is bit-stable across partitionings. Driver state is the
    * k×dim matrix only (~400 KB at k=800).
    *
    * Returns (centroid table, per-iteration objective): the table is
    * (cid, cemb: array<float>, cnrm) ready for assignIndexed —
    * float-quantized once at the END of the fit, matching the
    * groupMeansArr convention — and the objective is the MEAN
    * assignment cosine under the centroids each iteration STARTED from
    * (the spherical-k-means analogue of KMeans.fit's WCSS; Dhillon &
    * Modha 2001 — non-decreasing up to the per-iteration float32
    * centroid quantization and empty-cell carryover, both ≪ 1e-6
    * here). The objective rides the same single corpus pass as the
    * mean update (the KMeans d2-on-dim0 trick), summed in decimal so
    * it is bit-stable too.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
          groupSize: Int = 8, nprobe: Int = 2, dim: Int = 64): (DataFrame, Array[Double]) = {
    require(k > 0 && iters >= 0, s"need k > 0 and iters >= 0, got k=$k iters=$iters")
    val spark = df.sparkSession
    import spark.implicits._
    var cents: Array[(Long, Seq[Double])] = df
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .zipWithIndex
      .map { case (r, i) =>
        (i.toLong, r.getSeq[Any](0).map {
          case f: Float  => f.toDouble
          case d: Double => d
        })
      }
    require(cents.length == k, s"need at least $k input vectors, found ${cents.length}")
    val e = df.select(col(idCol).as("vec_id"), col(vecCol).cast("array<float>").as("embedding"))
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)
    val objective = new Array[Double](iters)
    for (it <- 0 until iters) {
      val centDf = cents.toSeq.toDF("cid", "cd")
        .select(col("cid"), col("cd").cast("array<float>").as("cemb"))
        .select(col("cid"), col("cemb"), normD(col("cemb")).as("cnrm"))
        .filter(col("cnrm") > 0)
      val stats = assignIndexed(e, centDf, groupSize, nprobe, dim)
        .join(broadcast(centDf.select(col("cid").as("cell"),
          col("cemb").as("acemb"), col("cnrm").as("acnrm"))), Seq("cell"))
        .select(col("cell"),
          (dotD(col("embedding"), col("acemb")) / (col("nrm") * col("acnrm"))).as("cos"),
          posexplode(col("embedding")).as(Seq("dimIdx", "x")))
        .groupBy("cell", "dimIdx")
        .agg((sum(col("x").cast("decimal(28,15)")) / count(lit(1)))
          .cast("double").as("m"),
          sum(when(col("dimIdx") === 0, col("cos")).cast("decimal(28,15)"))
            .cast("double").as("cossum"),
          sum(when(col("dimIdx") === 0, 1L).otherwise(0L)).as("cn"))
        .collect()
      val next = cents.map { case (cid, v) => (cid, v.toArray) }
      val byCid = next.map { case (cid, arr) => cid -> arr }.toMap
      var cosSum = 0.0; var n = 0L
      stats.sortBy(r => (r.getLong(0), r.getInt(1))).foreach { r =>
        byCid.get(r.getLong(0)).foreach(_(r.getInt(1)) = r.getDouble(2))
        if (r.getInt(1) == 0 && !r.isNullAt(3)) { cosSum += r.getDouble(3); n += r.getLong(4) }
      }
      objective(it) = if (n > 0) cosSum / n else 0.0
      cents = next.map { case (cid, arr) => (cid, arr.toSeq) }
    }
    val table = cents.toSeq.toDF("cid", "cd")
      .select(col("cid"), col("cd").cast("array<float>").as("cemb"))
      .select(col("cid"), col("cemb"), normD(col("cemb")).as("cnrm"))
      .filter(col("cnrm") > 0)
    (table, objective)
  }
}
