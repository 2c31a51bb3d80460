package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-benchmarks for physical-strategy alternatives the engine
  * chose between — prints one line per case so the numbers backing
  * SCALE.md claims are reproducible:
  *
  *   runMain graft.MicroBench [sfDir]
  *
  * Cases:
  *  - topk_window vs topk_operator: row_number window filter vs the
  *    native TopKPerGroup bounded-heap operator (same result set).
  *  - embed_broadcast vs embed_blocked: whole-table broadcast all-pairs
  *    vs block-pair replicated all-pairs (same result set).
  */
object MicroBench {

  private def time(label: String, reps: Int)(thunk: => Long): Unit = {
    thunk // warm-up
    val times = (0 until reps).map { _ =>
      val t0 = System.nanoTime()
      thunk
      (System.nanoTime() - t0) / 1e9
    }
    println(f"$label%-18s min=${times.min}%.3fs  median=${times.sorted.apply(reps / 2)}%.3fs")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKPerGroupStrategy.register(spark)

    val base = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    def viaWindow: DataFrame = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    def viaOp: DataFrame = graft.plans.TopKPerGroup(base,
      Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)

    // the window case measures Spark's REAL window plan — pin the
    // rewrite off in case it's ever registered on this session
    spark.conf.set(graft.plans.TopKRewriteRule.EnabledKey, "false")
    val nW = viaWindow.count()
    val nO = viaOp.count()
    require(nW == nO, s"result mismatch: window=$nW op=$nO")
    time("topk_window", 5) { viaWindow.count() }
    time("topk_operator", 5) { viaOp.count() }
    spark.conf.set(graft.plans.TopKRewriteRule.EnabledKey, "true")

    val qs = SparkEntry.queries
    time("embed_broadcast", 3) { qs("q_dedup_embedding")(spark, sfDir).count() }
    time("embed_blocked", 3) { qs("q_dedup_embedding_blocked")(spark, sfDir).count() }

    spark.stop()
  }
}
