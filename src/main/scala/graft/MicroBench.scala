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
    // embed_semantic: the SemDeDup cell-blocked form — NOT the same
    // result set (pairs straddling cell boundaries are missed by
    // design), so no require(); the number shows the n²/k pair-work cut
    time("embed_semantic", 3) { qs("q_dedup_semantic")(spark, sfDir).count() }

    // tri_explode vs tri_generator: the trigram-stream extraction under
    // q_text_ngram_lm / q_text_perplexity — codegen'd array+explode
    // (materializes an N-element array per doc inside whole-stage
    // codegen) vs the streaming ShingleGenExpr Generator
    // (CodegenFallback, breaks the codegen stage but never builds the
    // array). Same downstream aggregation; whichever wins carries the
    // LM queries.
    locally {
      graft.GraftExtensions.register(spark)
      val docs = Tables.documents(spark, sfDir).filter(length(col("text")) >= 3)
      def viaExplode: DataFrame = docs
        .select(col("lang"), explode(expr(
          "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")).as("tri"))
        .groupBy("lang", "tri").agg(count(lit(1)).as("cnt"))
      def viaGen: DataFrame = docs
        .select(col("lang"), expr("graft_shingles(text, 3)").as(Seq("pos", "tri")))
        .groupBy("lang", "tri").agg(count(lit(1)).as("cnt"))
      // full multiset equivalence (both directions): group-count
      // equality alone would pass even if the Generator got a
      // multiplicity wrong within an existing (lang, tri) group
      require(viaExplode.exceptAll(viaGen).count() == 0
          && viaGen.exceptAll(viaExplode).count() == 0,
        "trigram multisets differ between explode and generator routes")
      time("tri_explode", 3) { viaExplode.count() }
      time("tri_generator", 3) { viaGen.count() }
    }

    // fuzzy_symdel vs fuzzy_bnlj: symmetric-deletion-blocked candidate
    // generation vs the naive nested-loop levenshtein predicate (same
    // result set). The BNLJ cost is quadratic in table size; the
    // symdel form's join input is (len+1)·N keys with near-unique-key
    // fan-out. (A 3-gram-blocked variant measured 23× WORSE than the
    // BNLJ here — low-entropy names share near-universal grams, which
    // makes gram buckets quadratic; that's why the operator uses
    // deletion keys.)
    locally {
      import org.apache.spark.sql.graft.ColumnBridge
      val sup = Tables.supplier(spark, sfDir).select(col("s_suppkey"), col("s_name"))
      val h = ColumnBridge.column(graft.gen.Md5Hash60Expr(
        ColumnBridge.expression(col("s_name"))))
      val dirty = sup
        .withColumn("p", (h % length(col("s_name")).cast("long")).cast("int"))
        .select(col("s_suppkey").as("d_key"),
          concat(expr("substring(s_name, 1, p)"),
            expr("substring(s_name, p + 2)")).as("d_name"))
      def viaGram: DataFrame = qs("q_join_fuzzy")(spark, sfDir)
      def viaBnlj: DataFrame = dirty.crossJoin(sup)
        .filter(levenshtein(col("d_name"), col("s_name")) <= 1)
        .select(col("d_key"), col("d_name"), col("s_suppkey"), col("s_name"),
          levenshtein(col("d_name"), col("s_name")).as("dist"))
      val nG = viaGram.count()
      val nB = viaBnlj.count()
      require(nG == nB, s"result mismatch: symdel=$nG bnlj=$nB")
      time("fuzzy_symdel", 3) { viaGram.count() }
      time("fuzzy_bnlj", 3) { viaBnlj.count() }
    }

    // ndv_bitmap vs ndv_exact: two-level bitmap rollup vs
    // count(DISTINCT) Expand — same exact result; the bitmap form's
    // shuffle is bounded by bucket count and is re-aggregatable.
    locally {
      val li = Tables.lineitem(spark, sfDir)
      def viaBitmap: DataFrame = qs("q_agg_bitmap")(spark, sfDir)
      def viaDistinct: DataFrame = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_parts"))
      time("ndv_bitmap", 3) { viaBitmap.count() }
      time("ndv_distinct", 3) { viaDistinct.count() }
    }

    // edges_selfjoin vs edges_basket: the co-purchase edge derivation
    // under all five graph queries + assoc_rules. Self-join form:
    // distinct (o, p) then x.o = y.o equi-join then (a, b) support
    // count — three keyed shuffles (distinct, join, count), pair rows
    // cross the wire. Basket form: ONE groupBy(o) builds the sorted
    // distinct basket (map-side-combined collect_set), C(k,2) pairs
    // explode ROW-LOCALLY, then the (a, b) count — two shuffles, and
    // the shuffled basket rows are smaller than the pair stream.
    // Same result set by construction (require pins it).
    locally {
      val items = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      def viaSelfJoin: DataFrame = {
        val it = items.distinct()
        it.as("x").join(it.as("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .groupBy(col("x.p").as("a"), col("y.p").as("b"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select("a", "b")
      }
      def viaBasket: DataFrame = items
        .groupBy("o").agg(sort_array(collect_set(col("p"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps) - i - 1), y ->
            |    struct(x AS a, y AS b))))""".stripMargin)).as("e"))
        .groupBy(col("e.a").as("a"), col("e.b").as("b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select("a", "b")
      val nS = viaSelfJoin.count(); val nB = viaBasket.count()
      require(nS == nB, s"edge mismatch: selfjoin=$nS basket=$nB")
      time("edges_selfjoin", 3) { viaSelfJoin.count() }
      time("edges_basket", 3) { viaBasket.count() }
    }

    spark.stop()
  }
}
