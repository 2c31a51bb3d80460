package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Derive-once graph pass — the shared-edge deployment form of the five
  * gated graph queries, promoted from measurement recipe to product
  * surface (round 16; VERDICT r15 #3).
  *
  * Each gated graph query (`q_graph_triangles/pagerank/jaccard/degdist/
  * kcore`) derives and checkpoints its OWN co-purchase edge table,
  * because the driver contract runs every query standalone. At 100× the
  * derivation is ~90% of each query's wall (checkpoint write ≈ free,
  * ~30 MB blocks), so a deployment that runs several graph analyses
  * over the same corpus pays the dominant cost five times.
  * `graft.GraphCkptBench` measured the derive-once alternative at
  * 118.1 → 40.7 s for the five-query pass at 100× (2.9×); this class IS
  * that alternative: materialize the canonical edge list once (eager
  * graft.Checkpoint — local blocks in dev, reliable checkpoint dir
  * under a real cluster) and bind the five post-edge bodies — the EXACT
  * code the gated entries compose (`RelationalQueries.graphCounts/
  * pagerankOf/jaccardOf/degdistOf/kcoreOf`) — to the one table.
  * GraphPassSpec pins result-identity with the five standalone gated
  * queries.
  *
  * Scale posture: the edge table is checkpointed ONCE and every
  * analysis reads the materialized blocks (no parquet rescan, no
  * re-derivation); each body keeps its own documented shuffle shape
  * (pagerank one vertex-keyed shuffle per iteration over checkpointed
  * degree/adjacency, triangles the degree-oriented O(E^1.5) closure,
  * kcore checkpointed peeling rounds). When the pass is done, call
  * [[GraphPass.release]] to drop the materialized blocks immediately —
  * GC-driven cleanup (letting the pass go out of scope) also works but
  * is unbounded-latency in long sessions.
  */
final class GraphPass private (val edges: DataFrame) {
  import graft.operators.RelationalQueries

  /** Vertex/edge/wedge/triangle counts (the q_graph_triangles body). */
  def triangles: DataFrame = RelationalQueries.graphCounts(edges)

  /** Top-20 pagerank, 5 integer-scaled power iterations
    * (the q_graph_pagerank body).
    */
  def pagerank: DataFrame = RelationalQueries.pagerankOf(edges)

  /** Per-edge neighborhood Jaccard via the degree-oriented wedge join
    * (the q_graph_jaccard body).
    */
  def jaccard: DataFrame = RelationalQueries.jaccardOf(edges)

  /** Log-bucketed degree distribution (the q_graph_degdist body). */
  def degdist: DataFrame = RelationalQueries.degdistOf(edges)

  /** 3 rounds of 2-core peeling (the q_graph_kcore body). */
  def kcore: DataFrame = RelationalQueries.kcoreOf(edges)

  /** All five analyses, keyed by their gated-query names. */
  def all: Seq[(String, DataFrame)] = Seq(
    "q_graph_triangles" -> triangles,
    "q_graph_pagerank" -> pagerank,
    "q_graph_jaccard" -> jaccard,
    "q_graph_degdist" -> degdist,
    "q_graph_kcore" -> kcore)

  /** Drop the pass's materialized edge blocks. This ENDS the pass:
    * under the local-checkpoint regime the blocks are the only copy of
    * the (lineage-truncated) edge table, so any analysis started after
    * release fails — release only once every consumer has run. Under a
    * reliable checkpoint dir the unpersist alone would be a no-op (the
    * data lives in checkpoint FILES, which Spark never deletes unless
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, and that
    * cleanup is GC-driven — unbounded latency in a long session), so
    * release also deletes the pass's own checkpoint files directly
    * (round-16 VERDICT #6): the pass knows its RDDs, each reliable
    * checkpoint has its own `rdd-<id>` directory, and nothing else can
    * reference it once the pass is over. GraphPassSpec pins both
    * regimes (blocks gone; files gone).
    */
  def release(blocking: Boolean = false): Unit =
    edges.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking)
        lr.rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val fs = p.getFileSystem(
            edges.sparkSession.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
        }
      case _ => ()
    }
}

object GraphPass {

  /** Materialize a canonical (a < b) edge list once and return the pass
    * bound to it. The checkpoint is EAGER — construction runs the
    * derivation job so every subsequent analysis reads blocks.
    */
  def apply(edges: DataFrame): GraphPass =
    new GraphPass(graft.Checkpoint(edges))

  /** The co-purchase pass the gated queries run: canonical support ≥ 2
    * co-purchase edges from `dir`'s lineitem table, derived ONCE.
    */
  def coPurchase(spark: SparkSession, dir: String): GraphPass =
    apply(graft.operators.RelationalQueries.coPurchaseEdges(spark, dir))
}
