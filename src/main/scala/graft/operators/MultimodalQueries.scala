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
    // watermarked variants) that text dedup cannot see. Signature: the
    // decoder's 8 features quantize to 2 bits each (floor(f·4) — the
    // 0.25/0.5/0.75 boundaries are exactly-representable doubles, so
    // quantization is bit-deterministic) → a 16-bit pHash stand-in (a
    // real deployment swaps the stub features for DCT coefficients;
    // the signature/probe machinery is unchanged). Candidate
    // generation is MULTI-PROBE, not bucket-join: each doc emits its
    // signature XOR each of {0, 1<<b} (17 keys) and exact-matches
    // other docs' raw signatures within the same media_type — every
    // hamming ≤ 1 pair is found exactly once (the flipped-bit probe),
    // with NO dense-bucket blowup however the signature space skews
    // (the q_sim_ann probe pattern applied to dedup). Scale: one
    // mapPartitions feature pass, 17·n probe rows into ONE keyed
    // equi-join, aggregate output bounded by |types| × 2 rows.
    "q_multimodal_phash" -> ((s, d) => {
      val sig = expr(
        """aggregate(sequence(0, 7), 0L, (a, i) ->
          |  a + shiftleft(CAST(floor(element_at(features, i + 1) * 4.0D) AS BIGINT),
          |    CAST(2 * i AS INT)))""".stripMargin)
      val feats = Multimodal.extractFeatures(s, d).toDF()
        .select(col("doc_id"), col("media_type"), sig.as("sig"))
        .localCheckpoint(true)
      val masks = lit(0L) +: (0 until 16).map(b => lit(1L << b))
      val probes = feats.select(col("doc_id").as("p_id"),
          col("media_type").as("p_type"), col("sig").as("p_sig"),
          explode(array(masks: _*)).as("m"))
        .select(col("p_id"), col("p_type"), col("p_sig"),
          (col("p_sig").bitwiseXOR(col("m"))).as("probe"))
      probes.join(feats,
          col("probe") === col("sig") && col("p_type") === col("media_type")
            && col("p_id") < col("doc_id"))
        .select(col("media_type"),
          bit_count(col("p_sig").bitwiseXOR(col("sig"))).cast("long").as("hdist"))
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

      // same md5 feature derivation as q_multimodal_features, 2-bit
      // quantized (exact at the representable 0.25/0.5/0.75 bounds),
      // multi-probe pair generation mirrored as the 17-mask unnest
      "q_multimodal_phash" -> {
        val sigTerms = (0 until Multimodal.FeatureDim).map { i =>
          s"(CAST(floor(((('0x' || substr(md5(text || '$i'), 1, 15))::BIGINT % 1000) / 1000.0) * 4.0) AS BIGINT) << ${2 * i})"
        }.mkString(" + ")
        val maskList = (0L +: (0 until 16).map(b => 1L << b)).mkString("[", ", ", "]")
        s"""WITH f AS (
           |  SELECT doc_id,
           |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           |    $sigTerms AS sig
           |  FROM documents),
           |p AS (
           |  SELECT doc_id AS p_id, media_type AS p_type, sig AS p_sig,
           |    xor(sig, u.m) AS probe
           |  FROM f, unnest($maskList::BIGINT[]) AS u(m))
           |SELECT f.media_type,
           |  CAST(bit_count(xor(p.p_sig, f.sig)) AS BIGINT) AS hdist,
           |  count(*) AS n_pairs
           |FROM p JOIN f ON p.probe = f.sig AND p.p_type = f.media_type
           |  AND p.p_id < f.doc_id
           |GROUP BY 1, 2 ORDER BY media_type, hdist""".stripMargin
      },
    )
  }
}
