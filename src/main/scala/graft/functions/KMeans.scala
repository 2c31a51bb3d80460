package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over a vector column — the offline
  * training step that produces the coarse centroids an IVF index
  * (SimilarityQueries.q_sim_ivf) probes at query time.
  *
  * Scale shape per iteration: the k×dim centroid matrix rides into the
  * assignment expression as literals (no second table, no join); the
  * mean recomputation shuffles (cluster, dim) partial aggregates, never
  * vectors; the corpus is never collected. Driver state is the k×dim
  * matrix only.
  *
  * Determinism: init is the k vectors with the smallest id (no RNG);
  * assignment ties break toward the lower cluster index. Centroid
  * means and the WCSS are DECIMAL-exact aggregates (the SCALE.md
  * cross-engine float policy): sums fold order-independently in
  * decimal(38,15), one double conversion at the end, and the driver
  * fold walks (cid, dim) in sorted order — so the fit is bit-stable
  * across partition counts, task retries, and shuffle fetch order,
  * not just for a fixed partitioning (KMeansSpec pins 4 vs 13
  * shuffle/input partitions bit-equal). The decimal cast rounds each
  * float to 15 fractional digits before summing — a deterministic
  * quantization far below the data's float32 noise floor.
  * Algorithm: Lloyd (1957/1982), "Least squares quantization in PCM".
  */
object KMeans {

  /** Squared L2 distance between a vector column and a centroid literal. */
  private def dist2(vec: Column, cent: Seq[Double]): Column =
    aggregate(
      zip_with(vec, typedLit(cent), (x, c) => {
        val d = x.cast("double") - c
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** struct(d2, cid) of the nearest centroid (ties → lower index, via
    * lexicographic struct ordering).
    */
  private def nearest(vec: Column, cents: Seq[Seq[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(dist2(vec, c).as("d2"), lit(i).as("cid"))
    }: _*))

  /** Index of the nearest centroid — the IVF cell-assignment expression. */
  def assignment(vec: Column, cents: Seq[Seq[Double]]): Column =
    nearest(vec, cents).getField("cid")

  /** Run `iters` Lloyd iterations; returns (centroids, per-iteration
    * WCSS measured under the centroids that iteration started from).
    *
    * @param df     input with a unique id column and an array<float|double> column
    * @param idCol  unique id (initialization takes the k smallest)
    * @param vecCol vector column name
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int)
    : (Array[Array[Double]], Array[Double]) = {
    require(k > 0 && iters >= 0, s"need k > 0 and iters >= 0, got k=$k iters=$iters")
    var cents: Array[Array[Double]] = df
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float  => f.toDouble
        case d: Double => d
      }.toArray)
    require(cents.length == k, s"need at least $k input vectors")
    val wcss = new Array[Double](iters)
    for (it <- 0 until iters) {
      val centSeq: Seq[Seq[Double]] = cents.map(_.toSeq).toSeq
      // materialize the k-way distance scan ONCE per row: two separate
      // nearest(...) trees would rely on codegen CSE to dedupe, and the
      // oversized HOF expression can fall back to interpreted projection
      // where no CSE happens — doubling the dominant per-iteration cost
      val assigned = df
        .select(nearest(col(vecCol), centSeq).as("nr"), col(vecCol).as("v"))
        .select(col("nr.cid").as("cid"), col("nr.d2").as("d2"), col("v"))
      // (cluster, dim) partial means in one shuffle; WCSS rides along on
      // dim 0 so the iteration is a single pass over the corpus
      val stats = assigned
        .select(col("cid"), col("d2"), posexplode(col("v")).as(Seq("dimIdx", "x")))
        .groupBy("cid", "dimIdx")
        .agg((sum(col("x").cast("decimal(28,15)")) / count(lit(1)))
            .cast("double").as("m"),
          sum(when(col("dimIdx") === 0, col("d2")).cast("decimal(28,15)"))
            .cast("double").as("d2sum"))
        .collect()
      val next = Array.tabulate(k)(i => cents(i).clone()) // empty cluster keeps its centroid
      var sse = 0.0
      stats.sortBy(r => (r.getInt(0), r.getInt(1))).foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
        if (!r.isNullAt(3)) sse += r.getDouble(3)
      }
      wcss(it) = sse
      cents = next
    }
    (cents, wcss)
  }
}
