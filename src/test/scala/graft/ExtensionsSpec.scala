package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** SQL-surface checks for the native expressions registered by
  * GraftExtensions: callable from spark.sql, results consistent with
  * the Scala-API paths.
  */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("graft_rand_string via SQL matches the generator column") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      """SELECT graft_rand_string(id, 42002174, 10,
        |  '0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz', -1) AS s
        |FROM range(100)""".stripMargin)
    assert(viaSql.count() == 100)
    assert(viaSql.filter("s NOT RLIKE '^[0-9A-Za-z]{10}$'").count() == 0)
    // seedMix = seed*1000003 + colIdx*2048 = 42*1000003 + 2048 = 42002174
    // (column index 1 of seed 42) → must equal the varchar(10) column of
    // the Scala-API generator
    val viaApi = gen.SqloadGen.table(spark, "key,varchar(10)", 100, seed = 42)
      .select("c1")
    assert(viaSql.exceptAll(viaApi.toDF("s")).count() == 0)
  }

  test("graft_minhash_sigs and graft_ngram_hashes run over documents") {
    GraftExtensions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_ext")
    val r = spark.sql(
      """SELECT doc_id, size(graft_minhash_sigs(text, 5, 16)) AS n_sigs,
        |       size(graft_ngram_hashes(text, 3)) AS n_grams
        |FROM docs_ext""".stripMargin)
    assert(r.filter("n_sigs != 16").count() == 0)
    assert(r.filter("n_grams <= 0").count() == 0)
  }

  test("config-path injection registers functions, strategy, and optimizer rule") {
    // the spark.sql.extensions path can't be exercised on the shared
    // test session (builder configs after the first getOrCreate are
    // ignored), so drive the extension object directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    import org.apache.spark.sql.graft.ExtensionsBridge
    assert(ExtensionsBridge.plannerStrategies(ext, spark)
      .contains(graft.plans.TopKPerGroupStrategy))
    assert(ExtensionsBridge.optimizerRules(ext, spark)
      .contains(graft.plans.TopKRewriteRule))
  }

  test("graft_md5_60 equals the conv(substr(md5)) formulation") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = (Seq("", "a", "hello|42", "héllo", "x" * 300) ++
      (1 to 200).map(i => s"k$i")).toDF("s")
    df.createOrReplaceTempView("md5_parity")
    val bad = spark.sql(
      """SELECT s, graft_md5_60(s) AS fast,
        |  CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS ref
        |FROM md5_parity WHERE graft_md5_60(s) != CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
        |""".stripMargin).collect()
    assert(bad.isEmpty, bad.take(3).mkString(", "))
  }

  test("codegen dot/norm are bit-identical to the HOF formulation on random vectors") {
    import spark.implicits._
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ColumnBridge
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    def hofDot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val dot = ColumnBridge.column(graft.gen.DotProductExpr(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
    val nrm = ColumnBridge.column(graft.gen.VecNormExpr(ColumnBridge.expression(col("a"))))
    val bad = df.select(
      dot.as("fast"), hofDot(col("a"), col("b")).as("ref"),
      nrm.as("nfast"), sqrt(hofDot(col("a"), col("a"))).as("nref"))
      // bitwise identity, not epsilon: the claim is same association order
      .filter(col("fast") =!= col("ref") || col("nfast") =!= col("nref"))
      .count()
    assert(bad == 0L)
  }

  test("vector expressions reject non-float-array inputs at analysis time") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    val dbl = Seq((1L, Array(1.0, 2.0))).toDF("id", "v") // array<double>
    val flt = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(ColumnBridge.column(
        graft.gen.VecNormExpr(ColumnBridge.expression(df.col("v")))))
    // float side analyzes and evaluates; double side must fail analysis
    // (not reinterpret double bits as floats at runtime)
    assert(math.abs(norm(flt).head().getDouble(0) - math.sqrt(5.0)) < 1e-12)
    val e = intercept[Exception] { norm(dbl).head() }
    assert(e.getMessage.toLowerCase.contains("array<float>")
      || e.getMessage.contains("ARRAY<FLOAT>"), e.getMessage)
  }

  test("graft_shingles edge cases: empty text, short text, non-ASCII codepoints") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, ""), (2L, "ab"), (3L, "héllo wörld"))
      .toDF("id", "t").createOrReplaceTempView("shingle_edge")
    val rows = spark.sql(
      "SELECT id, s.pos, s.shingle FROM shingle_edge LATERAL VIEW graft_shingles(t, 5) s AS pos, shingle ORDER BY id, pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // empty text and shorter-than-shingle text emit ONE row (the whole
    // text) — matching DuckDB's greatest(length-4, 1) loop bound;
    // non-ASCII shingles advance by codepoint, not byte
    assert(rows.toSeq == Seq(
      (1L, 1, ""), (2L, 1, "ab"),
      (3L, 1, "héllo"), (3L, 2, "éllo "), (3L, 3, "llo w"),
      (3L, 4, "lo wö"), (3L, 5, "o wör"), (3L, 6, " wörl"), (3L, 7, "wörld")))
  }

  test("graft_shingles byte-slice fast path ≡ UTF8String.substring on every boundary class") {
    // round-20 optimization: eval precomputes code-point boundaries in
    // one pass and emits byte-range slices instead of calling
    // UTF8String.substring per position (which re-scans from byte 0
    // every call — O(chars²) per document). This pins the slices
    // byte-identical to substring across 1-, 2-, 3-, and 4-byte
    // (supplementary-plane) code points, including the end-clip and
    // whole-text-when-short rules.
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq("", "a", "ab", "abc", "abcd",
      "héllo wörld", "日本語のテキスト", "a😀b😀c", "😀😀😀", "mixé😀日x")
    for (s <- texts; len <- Seq(2, 3, 5)) {
      val t = UTF8String.fromString(s)
      val viaExpr = gen.ShingleGenExpr(
          org.apache.spark.sql.catalyst.expressions.Literal(t,
            org.apache.spark.sql.types.StringType), len)
        .eval(null).iterator.toSeq
        .map(r => (r.getInt(0), r.getUTF8String(1).toString))
      val n = t.numChars()
      val viaSubstring = (0 until math.max(n - (len - 1), 1))
        .map(i => (i + 1, t.substring(i, math.min(i + len, n)).toString))
      assert(viaExpr == viaSubstring, s"text='$s' len=$len")
    }
  }

  test("graft_cms_estimate: one-sided error within eps*N; analysis rejects bad types") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, expr}
    val n = 1000
    val df = (1 to n).map(i => (i % 7).toLong).toDF("k")
    val skDf = df.agg(expr("count_min_sketch(k, 0.01d, 0.99d, 7)").as("sk"))
    val rows = df.groupBy("k").count()
      .crossJoin(broadcast(skDf))
      .selectExpr("k", "count AS exact", "graft_cms_estimate(sk, k) AS est")
      .collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      // CMS guarantee: never undercounts; overcount bounded by eps*N
      assert(est >= exact, s"k=${r.getLong(0)}: est $est < exact $exact")
      assert(est <= exact + math.ceil(0.01 * n).toLong,
        s"k=${r.getLong(0)}: est $est above eps*N bound")
    }
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("graft_cms_estimate(k, k)").collect()
    }
    assert(err.getMessage.contains("BINARY"), err.getMessage)
  }

  test("minhash shingles codepoints, not bytes — DuckDB substr parity on non-ASCII") {
    // Expected values computed with the exact oracle SQL fragment
    // (LshBanding.shinglesHashSql/sigsSql) in DuckDB over this string.
    val text = "héllo wörld ümlaut …∆ końcówka"
    val expected = Array(144169204L, 32448726L, 2663736L, 23280006L, 83597681L,
      52999208L, 32867097L, 32682212L, 15937328L, 6761940L, 27530122L, 3088801L,
      38734737L, 94100172L, 135365337L, 49319380L)
    val got = gen.MinHashImpl
      .sigs(org.apache.spark.unsafe.types.UTF8String.fromString(text), 5, 16)
      .toLongArray()
    assert(got.toSeq == expected.toSeq)
  }
}
