package graft.ops

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column queries (task-brief addition): binary payload
  * metadata and frame sampling, both pure built-ins over the
  * synthesized media table (see [[graft.multimodal.Multimodal]]; the
  * mapPartitions feature-extraction path is covered by
  * MultimodalSpec since DuckDB has no equivalent).
  */
object MmOps extends OpPack {

  def queries: Map[String, Q] = Map(
    // Typed metadata over opaque binary payloads: byte length (the
    // payload itself is never shuffled — only derived columns),
    // stub-decoded dimensions, first-glyph code.
    "mm_binary_meta" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
      media.select(col("media_id"), col("kind"),
          length(col("content")).as("n_bytes"),
          Multimodal.stubWidth(length(col("content"))).as("width"),
          Multimodal.stubHeight(length(col("content"))).as("height"),
          col("declared_frames"))
        .orderBy(col("media_id"))
    }),

    // Resize planning: fit each image's (stub-decoded) dimensions into
    // a 224x224 box preserving aspect ratio — all integer arithmetic
    // (scale in thousandths), so the plan is exactly oracle-checkable.
    // The actual pixel transform would ride the same mapPartitions
    // path as feature extraction (Multimodal.extractFeatures); this is
    // the metadata/planning half every resize pipeline needs.
    "mm_resize" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
      media.filter(col("kind") === "image")
        .withColumn("width", Multimodal.stubWidth(length(col("content"))))
        .withColumn("height", Multimodal.stubHeight(length(col("content"))))
        .withColumn("scale_x1000",
          least(expr("224000 div width"), expr("224000 div height"),
            lit(1000)).cast("int"))
        .select(col("media_id"), col("width"), col("height"),
          col("scale_x1000"),
          expr("CAST(width * scale_x1000 div 1000 AS INT)").as("out_w"),
          expr("CAST(height * scale_x1000 div 1000 AS INT)").as("out_h"))
        .orderBy(col("media_id"))
    }),

    // Frame sampling: every 3rd frame index of each "video" payload —
    // generator-shaped (explode of a bounded sequence), output size
    // is frames/3 per asset regardless of payload size.
    "mm_frame_sample" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
      media.filter(col("kind") === "video")
        .select(col("media_id"),
          explode(sequence(lit(0), col("declared_frames") - 1, lit(3)))
            .as("frame_idx"))
        .orderBy(col("media_id"), col("frame_idx"))
    })
  )

  def oracle: Map[String, String] = Map(
    // n_chars == octet_length(text) in this ASCII corpus (FIXTURES.md).
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
        |  CAST(n_chars AS INT) AS n_bytes,
        |  CAST(64 + n_chars % 577 AS INT) AS width,
        |  CAST(64 + n_chars % 389 AS INT) AS height,
        |  CAST(n_chars // 100 + 1 AS INT) AS declared_frames
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(64 + n_chars % 577 AS INT) AS width,
        |    CAST(64 + n_chars % 389 AS INT) AS height
        |  FROM documents WHERE doc_id % 3 = 0
        |), s AS (
        |  SELECT *, CAST(least(224000 // width, 224000 // height, 1000)
        |    AS INT) AS scale_x1000
        |  FROM m
        |)
        |SELECT media_id, width, height, scale_x1000,
        |  CAST(width * scale_x1000 // 1000 AS INT) AS out_w,
        |  CAST(height * scale_x1000 // 1000 AS INT) AS out_h
        |FROM s ORDER BY media_id""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx
        |FROM documents,
        |  unnest(range(0, CAST(n_chars // 100 + 1 AS INT), 3)) t(f)
        |WHERE doc_id % 3 = 2
        |ORDER BY media_id, frame_idx""".stripMargin
  )
}
