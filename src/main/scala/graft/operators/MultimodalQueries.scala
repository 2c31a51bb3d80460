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
    )
  }
}
