package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The derive-once graph pass (graft.functions.GraphPass) — the round-16
  * promotion of GraphCkptBench's measured shared-edge recipe into product
  * surface: every analysis must be RESULT-IDENTICAL to its standalone
  * gated query (which derives its own edge table), and the pass must
  * derive the edge table exactly once.
  */
class GraphPassSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("every pass analysis is result-identical to its standalone gated query") {
    val pass = functions.GraphPass.coPurchase(spark, sf)
    pass.all.foreach { case (name, df) =>
      val shared = df.collect().map(_.toSeq).sortBy(_.mkString("|"))
      val own = SparkEntry.queries(name)(spark, sf).collect()
        .map(_.toSeq).sortBy(_.mkString("|"))
      assert(shared.length == own.length,
        s"$name: ${shared.length} rows shared vs ${own.length} standalone")
      assert(shared.toSeq == own.toSeq, s"$name diverged from the gated query")
    }
  }

  test("the pass materializes the edge table eagerly, exactly once") {
    // construction must leave checkpointed blocks behind (the eager
    // Checkpoint), and running two analyses must not grow the EDGE
    // table's storage again (they read the same materialized RDD —
    // graphCounts/kcoreOf add their OWN internal checkpoints, so pin
    // the edge RDD's identity, not the global block count)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val pass = functions.GraphPass.coPurchase(spark, sf)
    val afterBuild = spark.sparkContext.getPersistentRDDs.keys.toSet
    assert(afterBuild.nonEmpty, "eager checkpoint must materialize at construction")
    pass.degdist.count()
    pass.pagerank.count()
    // the originally-materialized edge blocks are still the ones in use
    val afterRuns = spark.sparkContext.getPersistentRDDs.keys.toSet
    assert(afterBuild.subsetOf(afterRuns),
      "analyses must reuse the pass's materialized edge table, not rebuild it")
  }
}
