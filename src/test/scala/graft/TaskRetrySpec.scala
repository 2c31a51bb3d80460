package graft

import scala.collection.mutable

import org.apache.spark.shuffle.graft.FaultyShuffleManager
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Empirical task-retry safety — the measured counterpart to
  * DeterminismAuditSpec's static audit. Two injected-failure axes, both
  * over completely unmodified query plans:
  *
  *  1. **Task-attempt retry.** Every task's first attempt to open an
  *     input file throws (FaultyFileSystem under the `faulty://`
  *     scheme); the scheduler retries it (`local[4,4]` ⇒
  *     spark.task.maxFailures=4). The result must be bit-identical to
  *     the clean run's, per query.
  *  2. **Map-output loss / stage resubmission.** One FetchFailed is
  *     injected per shuffle id (FaultyShuffleManager): the scheduler
  *     unregisters the produced map output, RESUBMITS the map stage,
  *     and reruns only the failed reduce partition — so the final
  *     result mixes reduce outputs computed from the original map
  *     execution with ones from the recompute. This is the scenario
  *     the static audit is a proxy for (the SPARK-23207 silent-
  *     corruption class: a nondeterministic recompute feeding some
  *     consumers but not others).
  *
  * Why it matters at 100 TB: on a 1000-executor cluster first-attempt
  * task failure and executor loss are routine (spot preemption, disk
  * faults, OOM kills); no fixed-partitioning gate can see what a
  * retried or recomputed attempt changes — only actually failing the
  * tasks can. Axis 1 also exercises the sink commit protocol: the
  * q_sink_* queries write real files through FileOutputCommitter with
  * their write tasks' first attempts dying, so a leaked partial
  * attempt-0 output would double rows and flip the fingerprint.
  *
  * The suite needs its own SparkContext (maxFailures is baked into the
  * `local[N,F]` master at construction; every other suite runs
  * `local[4]` = fail-fast), so it stops any shared context up front and
  * stops its own in afterAll — suites run sequentially in the forked
  * test JVM, so the next suite's getOrCreate simply builds the usual
  * `local[4]` session fresh.
  */
class TaskRetrySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[4,4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.faulty.impl", classOf[FaultyFileSystem].getName)
      .config("spark.shuffle.manager", classOf[FaultyShuffleManager].getName)
      .getOrCreate()
  }

  override def afterAll(): Unit =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())

  private val cleanSf  = "/root/testdata/sf0.001"
  private val faultySf = "faulty:///root/testdata/sf0.001"

  private def fingerprint(name: String, sf: String): (Long, Long) = {
    val df = SparkEntry.queries(name)(spark, sf)
    val n = df.count()
    val cols = df.columns.map(c => col(c).cast("string")).toSeq
    val h = df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).head()
    (n, if (h.isNullAt(0)) 0L else h.getLong(0))
  }

  // Queries whose inputs never touch the faulty dir (pure generators,
  // or generate→/tmp-scratch→read round-trips) see no open() injection
  // by construction; they still run under the faulty dir to pin that
  // the harness is a no-op for them.
  private val fileFree = Set(
    "q_gen_keys", "q_gen_domains", "q_gen_determinism",
    "q_gen_csv_text", "q_gen_parquet")

  // Queries with zero shuffles (e.g. scan + TakeOrderedAndProject) see
  // no fetch-failure injection; tracked and bounded by the final test
  // rather than asserted per query.
  private val zeroShuffle = mutable.Set[String]()

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name survives first-attempt failure and map-output loss bit-identically") {
      val clean = fingerprint(name, cleanSf)
      val before = FaultyFileSystem.injected.get()
      val faulty = fingerprint(name, faultySf)
      val openHits = FaultyFileSystem.injected.get() - before
      val beforeFetch = FaultyShuffleManager.injected.get()
      val refetched = FaultyShuffleManager.armedDuring(fingerprint(name, cleanSf))
      val fetchHits = FaultyShuffleManager.injected.get() - beforeFetch
      if (fetchHits == 0) zeroShuffle += name
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      assert(clean == faulty,
        s"$name result changed under injected task retries: clean=$clean faulty=$faulty")
      assert(clean == refetched,
        s"$name result changed under injected map-output loss: clean=$clean refetched=$refetched")
      if (!fileFree(name))
        assert(openHits > 0,
          s"$name: no task failure was injected — the faulty:// scheme never engaged")
    }
  }

  test("injection volume is structural, not incidental") {
    val opens = FaultyFileSystem.injected.get()
    val fetches = FaultyShuffleManager.injected.get()
    assert(opens > 500,
      s"only $opens injected first-attempt open failures across the inventory")
    assert(fetches > 150,
      s"only $fetches injected fetch failures across the inventory")
    assert(zeroShuffle.size < 40,
      s"${zeroShuffle.size} queries saw no fetch injection: ${zeroShuffle.toSeq.sorted.mkString(", ")}")
  }
}
