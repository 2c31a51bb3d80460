package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Inventory-wide contract checks at sf0.001: every query runs, every
  * query has an oracle, re-running a query is deterministic (same
  * fingerprint), and the flagship entry returns rows — the fast local
  * guard for the driver's full DuckDB gate.
  */
class InventorySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("host-state probes read sane values (calibration stamps cannot silently go -1)") {
    // the round-14 bench artifact fields are only useful if they carry
    // real readings on this platform; a parse regression would quietly
    // stamp -1 and the window-vs-regression rule would stop working
    assert(Bench.readLoadavg() >= 0.0, "loadavg unreadable on Linux")
    val (r1, w1) = Bench.readDiskSectors()
    assert(r1 > 0 && w1 > 0, s"diskstats sectors unreadable: ($r1, $w1)")
    val (r2, w2) = Bench.readDiskSectors()
    assert(r2 >= r1 && w2 >= w1, "sector counters must be monotonic")
    val probe = Bench.probeOnce(spark, 4)
    assert(probe > 0 && probe < 60, s"calibration probe wall $probe out of range")
    // round 15: the IO probe must also read sane (and actually write —
    // a silently-empty write would price the page cache, not the disk)
    val io = Bench.probeIoOnce(spark)
    assert(io > 0 && io < 120, s"IO probe wall $io out of range")
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"), "graft_probe_io")
    def du(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
    val bytes = du(dir)
    assert(bytes > 150e6, s"IO probe parquet only $bytes bytes — " +
      "high-entropy payload no longer defeats compression")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("README and SURVEY inventory counts equal SparkEntry.queries.size (no doc drift)") {
    // the documented count drifted 128→137→150 across rounds as queries
    // were added after the docs were synced; this pins both documents to
    // the registry so the drift cannot recur (round-6 VERDICT item 6)
    val n = SparkEntry.queries.size
    def read(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    val readme = read("README.md")
    assert(readme.contains(s"$n oracle-gated queries"),
      s"README.md surface header must say '$n oracle-gated queries'")
    assert(readme.contains(s"$n/$n hash-match"),
      s"README.md correctness section must say '$n/$n hash-match'")
    assert(read("SURVEY.md").contains(s"$n queries in `SparkEntry.queries`"),
      s"SURVEY.md §2.3 must say '$n queries in `SparkEntry.queries`'")
  }

  test("documents fixtures are pure ASCII at every SF (phash byte/char oracle coupling)") {
    // q_multimodal_phash hashes the first 64 UTF-8 BYTES of the payload
    // on the Spark side but substr(text, 1, 64) CHARACTERS in the
    // DuckDB oracle — identical only while the corpus is ASCII. This
    // guard makes that coupling fail loudly if the testdata ever ships
    // non-ASCII text (the adversarial non-ASCII corpus is exercised
    // separately by tools/edge_probe.py, which uses a byte-safe check).
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
         if new java.io.File(s"$dir/documents.parquet").exists()) {
      val nonAscii = Tables.documents(spark, dir)
        .filter(length(col("text")) =!= octet_length(col("text")))
        .count()
      assert(nonAscii == 0, s"$dir has $nonAscii non-ASCII documents — " +
        "the phash oracle's substr(text,1,64) no longer equals the 64-byte header")
    }
  }

  test("q_join_fuzzy recall is 1: every corrupted name links back to its source") {
    // the oracle gate proves cross-engine agreement; this proves the
    // SEMANTIC ground truth — symdel blocking never drops a true match
    import org.apache.spark.sql.functions.col
    val res = SparkEntry.queries("q_join_fuzzy")(spark, sf)
    val suppliers = Tables.supplier(spark, sf).count()
    val selfPairs = res.filter(col("d_key") === col("s_suppkey")).count()
    assert(selfPairs == suppliers,
      s"expected all $suppliers corrupted names to match their source, got $selfPairs")
  }

  test("q_dedup_url partitions the corpus: canonical groups cover every row exactly once") {
    import org.apache.spark.sql.functions.sum
    val res = SparkEntry.queries("q_dedup_url")(spark, sf)
    val docs = Tables.documents(spark, sf).count()
    val covered = res.agg(sum("n_rows")).head.getLong(0)
    assert(covered == docs, s"canonical groups cover $covered of $docs rows")
  }

  test("no query output has array/map/struct columns after Verify.sanitize") {
    // The driver's pandas comparator crashes on array cells (unhashable
    // numpy.ndarray) and renders decimals differently from DuckDB floats.
    // Verify.sanitize casts decimals; nested types must be stringified
    // at the query level (array_join / array_to_string on both engines).
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType, DecimalType}
    val offenders = for {
      (name, fn) <- SparkEntry.queries.toSeq
      f <- Verify.sanitize(fn(spark, sf)).schema.fields
      bad = f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | _: DecimalType => true
        case _ => false
      }
      if bad
    } yield s"$name.${f.name}: ${f.dataType.simpleString}"
    assert(offenders.isEmpty, s"comparator-unsafe output columns: ${offenders.mkString(", ")}")
  }

  test("bench JSON line fits the driver's 2000-char tail window") {
    // The driver keeps only the last 2000 chars of combined output and sbt
    // appends ~80 chars after our line; worst-case per-query value under
    // %.2g is 7 chars ("9.8e-04" / "-1.0"). Budget 1870 leaves slack for
    // sbt epilogue drift. If this fails, shrink renderLine — do NOT let the
    // driver's parse go back to null (BENCH_r01/r02 both lost their runs).
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst realistic case: every value renders at max width (7 chars) —
    // renderLine must degrade to the slowest-N subset, never overflow
    for (vals <- Seq(names.map(_ -> 0.28), names.map(_ -> 0.00098),
                     names.map(_ -> -1.0))) {
      // "sub-floor" is the widest window label the line can carry
      val line = Bench.renderLine(vals, 123.4567, "0.1", 10000000L, 0.323, 30925774L,
        1684511L, 32, Seq(0.0998, 0.1234, 0.0987), Nil, "sub-floor")
      assert(line.length <= 1870, s"bench line ${line.length} chars > 1870 budget")
      assert(line.count(_ == '{') == line.count(_ == '}'))
      assert(line.contains("\"metric\":\"total\"") && line.contains("\"gen_rows_per_sec\""))
      assert(line.contains("\"window\":\"sub-floor\""))
    }
  }

  test("bench window self-label reproduces the round-19 adjudications from the stamps alone") {
    // the three recorded round-19 windows, classified exactly as the
    // r19 VERDICT adjudicated them by hand (VERDICT r19 #4); bands =
    // SCALE.md §"Calibration probe" (CPU 0.29–0.47, IO 1.27–1.85)
    assert(Bench.windowOf(Seq(0.42, 0.43, 0.62), Seq(1.6, 1.9, 2.5)) == "elevated",
      "the r19 driver artifact's stamps must read elevated")
    assert(Bench.windowOf(Seq(0.30, 0.41, 0.36), Seq(1.16, 1.59, 1.28)) == "in-band",
      "one sub-floor IO stamp is wobble, not an undercut window (the 90.05 s run)")
    assert(Bench.windowOf(Seq(0.30, 0.23, 0.25), Seq(1.3, 1.2, 1.2)) == "sub-floor",
      "a sub-floor stamp majority must read sub-floor (the 78.59 s run)")
    // edge handling: elevated wins over sub-floor; failed stamps ignored
    assert(Bench.windowOf(Seq(0.20, 0.20, 0.60), Seq(1.5, 1.5, 1.5)) == "elevated")
    assert(Bench.windowOf(Seq(-1.0, -1.0, -1.0), Nil) == "unknown")
    assert(Bench.windowOf(Seq(0.35, -1.0, 0.40), Seq(1.5, 1.6, 1.7)) == "in-band")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is re-run deterministic") {
      import org.apache.spark.sql.functions._
      def fingerprint(): (Long, Long) = {
        val df = fn(spark, sf)
        val n = df.count()
        val cols = df.columns.map(c => col(c).cast("string")).toSeq
        val h = df.select(xxhash64(cols: _*).as("h"))
          .agg(expr("bit_xor(h)")).head()
        (n, if (h.isNullAt(0)) 0L else h.getLong(0))
      }
      val a = fingerprint()
      val b = fingerprint()
      // release per query: 158 x 2 executions otherwise accumulate
      // localCheckpoint blocks in this JVM (same hygiene as
      // Bench.releaseState and the PlanAuditSpec window audit)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      assert(a == b, s"$name not deterministic across re-runs")
    }
  }
}
