package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Honesty pins for the scale-replica builder (graft.ScaleBench) — the
  * properties the 10×/100× slope measurements in SCALE.md rely on.
  * Round-13 ADVICE found the original single-group rotation was NOT
  * injective past 9 copies (copies 0, 9, 18, ... were byte-identical
  * originals, flattening the 100× docs slopes and inflating LSH
  * clusters); these tests pin the repaired two-group substitution and
  * the per-copy orthogonal vector transform so the bug class cannot
  * silently return, plus the `_built`-marker compatibility rules the
  * cached-replica reuse path depends on.
  */
class ReplicaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(name: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(d)
    }
    d
  }

  test("text substitution alphabets are injective across 100 copies") {
    val subs = (0 until 100).map(ScaleBench.substTo)
    assert(subs.distinct.size == 100,
      "two copies share a substitution alphabet — cross-copy texts collide")
    assert(ScaleBench.substTo(0) == ScaleBench.substFrom,
      "copy 0 must be the identity substitution")
    subs.foreach { s =>
      assert(s.sorted == ScaleBench.substFrom.sorted,
        s"'$s' is not a permutation of the source alphabet")
    }
    // the bug class ADVICE found: a copy index past the rotation period
    // mapping back to the identity
    assert((1 until 100).forall(i => ScaleBench.substTo(i) != ScaleBench.substFrom))
  }

  test("document replica texts are pairwise distinct across all 100 copies") {
    val out = tmpDir("graft_replica_docs")
    ScaleBench.buildTables(spark, sf, out.getAbsolutePath, 100, Set("documents"))
    val docs = spark.read.parquet(s"${out.getAbsolutePath}/documents.parquet")
    val base = docs.filter(col("doc_id") % ScaleBench.Stride === 0)
      .select("text").collect().map(_.getString(0))
    assert(base.length == 100, s"expected one row per copy, got ${base.length}")
    assert(base.distinct.length == 100,
      "two copies carry byte-identical text — the round-12 i%9 rotation bug")
    // substitution preserves length (trigram volume) exactly
    assert(base.map(_.length).distinct.length == 1)
  }

  test("embedding replica: copies are distinct, within-copy geometry preserved") {
    val out = tmpDir("graft_replica_emb")
    // 130 copies crosses the shift period (64), so the flip id must
    // distinguish copies 0/64/128 — the vector analog of the text bug
    ScaleBench.buildTables(spark, sf, out.getAbsolutePath, 130, Set("embeddings"))
    val emb = spark.read.parquet(s"${out.getAbsolutePath}/embeddings.parquet")
    assert(emb.count() == 130L * 500L)
    assert(emb.select("vec_id").distinct().count() == 130L * 500L)

    val copies = emb.filter(col("vec_id") % ScaleBench.Stride === 0)
      .withColumn("copy", (col("vec_id") / ScaleBench.Stride).cast("int"))
      .select("copy", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toVector).toMap
    assert(copies.size == 130)
    // pairwise distinct vectors for the same base row — in particular
    // across the shift-period boundary (0 vs 64, 1 vs 65, 2 vs 128)
    assert(copies.values.toSeq.distinct.size == 130,
      "two copies carry identical vectors — cosine-1 cross-copy near-dups")
    // orthogonal transform: norms preserved up to float re-accumulation
    val n0 = math.sqrt(copies(0).map(x => x.toDouble * x.toDouble).sum)
    (1 until 130).foreach { c =>
      val n = math.sqrt(copies(c).map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(n - n0) < 1e-6, s"copy $c norm $n != copy-0 norm $n0")
    }
    // copy 0 is untransformed: the 10 query vectors and 8 centroids
    // the sim queries read are exactly the source rows
    val src = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0).toVector
    assert(copies(0) == src)
  }

  test("replicaCompatible validates marker parameters, not mere existence") {
    val out = tmpDir("graft_replica_marker")
    val dir = out.getAbsolutePath
    def writeMarker(s: String): Unit =
      java.nio.file.Files.write(new java.io.File(out, "_built").toPath,
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // no marker: never compatible
    assert(!ScaleBench.replicaCompatible(dir, sf, 10, Set("documents")))

    val good = s"subst=${ScaleBench.SubstVersion} copies=10 " +
      "tables=documents,embeddings,events,lineitem,orders sf=" + sf
    writeMarker(good)
    assert(ScaleBench.replicaCompatible(dir, sf, 10, Set("documents")))
    assert(ScaleBench.replicaCompatible(dir, sf, 10,
      Set("orders", "lineitem")), "subset of built tables must be reusable")
    assert(!ScaleBench.replicaCompatible(dir, sf, 10, Set("part")),
      "a table the replica lacks must block reuse")
    assert(!ScaleBench.replicaCompatible(dir, "/root/testdata/sf0.01", 10,
      Set("documents")), "a different source dir must block reuse (ADVICE)")
    assert(!ScaleBench.replicaCompatible(dir, sf, 100, Set("documents")),
      "a different copy count must block reuse")

    // a pre-round-13 marker (no subst version) must block reuse — those
    // replicas were built with the non-injective rotation
    writeMarker("copies=10 tables=documents sf=" + sf)
    assert(!ScaleBench.replicaCompatible(dir, sf, 10, Set("documents")))
    writeMarker("")
    assert(!ScaleBench.replicaCompatible(dir, sf, 10, Set("documents")))
  }
}
