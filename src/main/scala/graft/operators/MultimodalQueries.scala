package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Oracle-checkable view of the multimodal pipeline: because the stub
  * decoder is md5-based, DuckDB can recompute the exact features from
  * the source text — so even the mapPartitions path sits under the
  * correctness gate.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q_multimodal_features" -> ((s, d) => {
      val feats = Multimodal.extractFeatures(s, d).toDF()
      val cols = (0 until Multimodal.FeatureDim)
        .map(i => element_at(col("features"), i + 1).as(s"f$i"))
      feats.select(Seq(col("doc_id"), col("media_type"), col("n_bytes")) ++ cols: _*)
        .orderBy("doc_id")
    }),

    "q_multimodal_resize" -> ((s, d) =>
      Multimodal.resizeImages(s, d).toDF()
        .select(col("doc_id"), col("in_bytes"), col("out_w"), col("out_h"),
          length(col("resized")).as("out_bytes"))
        .orderBy("doc_id")),

    "q_multimodal_frames" -> ((s, d) => {
      val frames = Multimodal.sampleFrames(s, d).toDF()
      val cols = (0 until Multimodal.FrameDim)
        .map(j => element_at(col("ffeatures"), j + 1).as(s"ff$j"))
      frames.select(Seq(col("doc_id"), col("frame_idx"), col("frame_ms")) ++ cols: _*)
        .orderBy("doc_id", "frame_idx")
    }),

    // Perceptual-hash near-duplicate detection over media payloads —
    // the image/audio dedup pass (re-encoded copies, thumbnails,
    // watermarked variants) that text dedup cannot see. Signature:
    // Multimodal.phashSignatures — a 56-bit hash of the payload's
    // HEADER region (the downsampling analogue that makes a real pHash
    // locality-sensitive: variants sharing their header collide,
    // unrelated payloads land ~28/56 bits apart; both engines derive
    // the features from the same md5-mod arithmetic and the same IEEE
    // multiply, so quantization is bit-identical). Candidate
    // generation is BANDED, the SSDeep/FAISS-binary standard: the
    // signature splits into 4 sub-keys of 14 bits, and by pigeonhole
    // any pair with hamming ≤ 3 agrees EXACTLY on at least one band —
    // so one self-equi-join on (media_type, band_idx, band_value)
    // finds every radius-3 pair with 4 probe rows per doc, where
    // single-bit multi-probe would need 1 + C(56,1) + C(56,2) +
    // C(56,3) ≈ 29k probes. A pair sharing several bands surfaces
    // once per shared band; DISTINCT collapses them before counting.
    // Scale: one mapPartitions decode pass, 4·n band rows into ONE
    // keyed equi-join (never a hamming theta-join), pair set filtered
    // to hdist ≤ 3 row-locally; output bounded by |types| × 4 rows.
    "q_multimodal_phash" -> ((s, d) => {
      val feats = Multimodal.phashSignatures(s, d).toDF()
        .transform(graft.Checkpoint.apply)
      val bands = feats.select(col("doc_id"), col("media_type"), col("sig"),
          explode(expr("sequence(0, 3)")).as("b"))
        .select(col("doc_id"), col("media_type"), col("sig"), col("b"),
          expr("(sig >> (14 * b)) & 16383").as("bv"))
      bands.as("l").join(bands.as("r"),
          col("l.media_type") === col("r.media_type")
            && col("l.b") === col("r.b") && col("l.bv") === col("r.bv")
            && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.media_type").as("media_type"),
          col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
          bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).cast("long").as("hdist"))
        .filter(col("hdist") <= 3)
        .distinct()
        .groupBy("media_type", "hdist").agg(count(lit(1)).as("n_pairs"))
        .orderBy("media_type", "hdist")
    }),
  )

  def oracles: Map[String, String] = {
    val featSql = (0 until Multimodal.FeatureDim).map { i =>
      s"(('0x' || substr(md5(text || '$i'), 1, 15))::BIGINT % 1000) / 1000.0 AS f$i"
    }.mkString(",\n  ")
    val frameSql = (0 until Multimodal.FrameDim).map { j =>
      s"(('0x' || substr(md5(text || '#' || g.i || ':' || $j), 1, 15))::BIGINT % 1000) / 1000.0 AS ff$j"
    }.mkString(",\n  ")
    Map(
      "q_multimodal_features" ->
        s"""SELECT doc_id,
           |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           |  CAST(strlen(text) AS INT) AS n_bytes,
           |  $featSql
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q_multimodal_resize" ->
        s"""SELECT doc_id, CAST(strlen(text) AS INT) AS in_bytes,
           |  CAST(16 + (h60 % 241) AS INT) AS out_w,
           |  CAST(16 + ((h60 // 241) % 241) AS INT) AS out_h,
           |  CAST((16 + (h60 % 241)) * 3 AS INT) AS out_bytes
           |FROM (SELECT doc_id, text,
           |        ('0x' || substr(md5(text), 1, 15))::BIGINT AS h60
           |      FROM documents WHERE doc_id % 3 = 0)
           |ORDER BY doc_id""".stripMargin,

      "q_multimodal_frames" ->
        s"""SELECT doc_id, CAST(g.i AS INT) AS frame_idx,
           |  CAST((g.i * strlen(text)) // ${Multimodal.NFrames} AS BIGINT) AS frame_ms,
           |  $frameSql
           |FROM documents, generate_series(0, ${Multimodal.NFrames - 1}) g(i)
           |WHERE doc_id % 3 = 2
           |ORDER BY doc_id, frame_idx""".stripMargin,

      // same md5-of-header feature derivation as phashSignatures
      // (texts are ASCII, so the 64-byte header ≡ substr 64 chars),
      // 7-bit quantized into the 56-bit signature; the 4×14-bit
      // pigeonhole banding mirrored as the unnest([0..3]) self-join
      // + DISTINCT
      "q_multimodal_phash" -> {
        val hb = Multimodal.PhashHeaderBytes
        val sigTerms = (0 until Multimodal.FeatureDim).map { i =>
          s"(CAST(floor(((('0x' || substr(md5(substr(text, 1, $hb) || '$i'), 1, 15))::BIGINT % 1000) / 1000.0) * 128.0) AS BIGINT) << ${7 * i})"
        }.mkString(" + ")
        s"""WITH f AS (
           |  SELECT doc_id,
           |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           |    $sigTerms AS sig
           |  FROM documents),
           |b AS (
           |  SELECT doc_id, media_type, sig, CAST(u.j AS INT) AS j,
           |    (sig >> (14 * CAST(u.j AS INT))) & 16383 AS bv
           |  FROM f, unnest([0, 1, 2, 3]) AS u(j)),
           |pr AS (
           |  SELECT DISTINCT l.media_type, l.doc_id AS a_id, r.doc_id AS b_id,
           |    CAST(bit_count(xor(l.sig, r.sig)) AS BIGINT) AS hdist
           |  FROM b l JOIN b r ON l.media_type = r.media_type AND l.j = r.j
           |    AND l.bv = r.bv AND l.doc_id < r.doc_id
           |  WHERE bit_count(xor(l.sig, r.sig)) <= 3)
           |SELECT media_type, hdist, count(*) AS n_pairs
           |FROM pr GROUP BY 1, 2 ORDER BY media_type, hdist""".stripMargin
      },
    )
  }
}
