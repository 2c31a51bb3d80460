package graft

import org.apache.spark.sql.SparkSession

/** Reliable-vs-local checkpoint cost measurement (round-10 directive):
  * the Pregel-posture queries truncate lineage every superstep through
  * graft.Checkpoint, which is `localCheckpoint(true)` in dev and
  * reliable `checkpoint()` (durable to `spark.checkpoint.dir`) on a
  * cluster. RuntimeOptSpec proves the two paths are bit-identical;
  * this main measures what the durability costs, which is the number a
  * cluster operator needs before flipping the switch.
  *
  *   runMain graft.CheckpointBench [sfDir]
  *
  * Times the two heaviest iterative queries (pagerank: 5 supersteps,
  * ~7 checkpoints; dedup_cluster: ~4-6 label rounds) min-of-2 under
  * the LOCAL path, then sets a checkpoint dir on the same session and
  * re-times under the RELIABLE path (order matters: a SparkContext's
  * checkpoint dir cannot be unset). Prints one line per query with the
  * reliable/local ratio. The reliable path's extra cost is the
  * serialize-to-disk + read-back of each checkpointed DataFrame, so it
  * scales linearly with checkpointed bytes per round.
  */
object CheckpointBench {

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
    graft.plans.TopKRewriteRule.register(spark)

    val names = Seq("q_graph_pagerank", "q_dedup_cluster")

    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    def minOf2(name: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        release()
        dt
      }
      math.min(once(), once())
    }

    // warm-up at the smallest SF so JIT/codegen cost stays out of both arms
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    names.foreach { n => SparkEntry.queries(n)(spark, warmDir).count(); release() }

    val local = names.map(n => n -> minOf2(n)).toMap

    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt_bench")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    val reliable = names.map(n => n -> minOf2(n)).toMap

    names.foreach { n =>
      println(f"[ckpt] $n%-18s local=${local(n)}%.2fs reliable=${reliable(n)}%.2fs ratio=${reliable(n) / local(n)}%.2f")
    }

    // checkpoint data volume written by the reliable arm (both runs)
    def du(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
    println(f"[ckpt] reliable-path bytes written: ${du(ckptDir.toFile) / 1e6}%.1f MB")

    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(ckptDir.toFile)
    spark.stop()
  }
}
