package graft.ops

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.expressions.Window
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

    // Inference batch packing: group media assets into GPU batches
    // under a 600-kilopixel budget, per (kind, shard) — the SAME
    // next-fit operator that packs token sequences (SequencePack),
    // re-costed in kilopixels. One operator, two training-pipeline
    // stages; parallelism unit is the (kind, shard) group.
    "mm_pack_batches" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
      val assets = media
        .withColumn("width", Multimodal.stubWidth(length(col("content"))))
        .withColumn("height", Multimodal.stubHeight(length(col("content"))))
        .withColumn("kpx", expr("CAST(width * height div 1000 AS INT)"))
        .withColumn("shard", pmod(col("media_id"), lit(2)))
      graft.operators.SequencePack(assets, idCol = "media_id",
          tokCol = "kpx", grpA = "kind", grpB = "shard", capacity = 600)
        .select(col("media_id"), col("kind"), col("shard"),
          col("pack_id"), col("tok").as("kpx"))
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
    }),

    // Signature dedup over media assets: group by the DECODED
    // signature (kind, dimensions, frame count), report collision
    // groups with the keeper (min id) — the multimodal analogue of
    // metadata near-dup (same asset re-encoded twice has one decoded
    // signature where the byte digest differs). In production the
    // signature is a perceptual hash from the same mapPartitions
    // decode path as feature extraction; here the stub decode stands
    // in (declared — the grouping/report plumbing is what's pinned,
    // per the multimodal brief). The payload itself never shuffles:
    // only the few-byte signature columns reach the exchange — the
    // property that makes this run over 100 TB of media at
    // metadata cost.
    "mm_dedup" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
      media
        .withColumn("width", Multimodal.stubWidth(length(col("content"))))
        .withColumn("height", Multimodal.stubHeight(length(col("content"))))
        .groupBy(col("kind"), col("width"), col("height"),
          col("declared_frames"))
        .agg(count(lit(1)).as("n_assets"), min(col("media_id")).as("keeper"))
        .filter(col("n_assets") >= 2)
        .orderBy(col("kind"), col("width"), col("height"),
          col("declared_frames"))
    }),

    // WebDataset-style shard manifest: pack each writer's asset stream
    // into ~4 KB tar shards (cut when the running byte total passes the
    // budget; an asset is assigned to the shard where it STARTS) and
    // publish the manifest — per-shard asset count, byte size, id
    // range. Sharding is per (kind, writer): each writer packs only
    // its own md5-partitioned stream, exactly how distributed tar
    // writers work — no global coordination, and no window partition
    // ever holds more than corpus/n_writers (the writer count is the
    // parallelism knob; a per-kind global cumsum would serialize 100 TB
    // through 3 tasks). The running sum is O(1) state per row; the
    // manifest agg rides the same (kind, writer) shuffle key.
    // Modality-mix budget (the table a multimodal training run reads
    // to set sampling weights: per (lang, kind), how many assets and
    // how many BYTES each modality contributes, and each modality's
    // byte share within its language): the media table joins its doc
    // metadata on the id equi-key — the canonical assets↔metadata
    // join; at 100 TB both sides co-partition on the id and the
    // payload column never shuffles (only its length survives the
    // projection). One ≤|langs|·|kinds|-group map-side-combined agg;
    // shares via a window on that bounded frame; byte sums ride
    // DECIMAL(38,0) before the ·1000 product.
    "mm_modality_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val media = Multimodal.mediaFromDocuments(docs)
        .select(col("media_id"), col("kind"),
          length(col("content")).cast("long").as("n_bytes"))
      media.join(docs.select(col("doc_id"), col("lang")),
          media("media_id") === col("doc_id"))
        .groupBy(col("lang"), col("kind"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("n_bytes")).as("total_bytes"))
        .withColumn("lang_bytes",
          sum(col("total_bytes")).over(Window.partitionBy(col("lang"))))
        .select(col("lang"), col("kind"), col("n_assets"),
          col("total_bytes"),
          expr("CAST((CAST(total_bytes AS DECIMAL(38,0)) * 1000) " +
            "div lang_bytes AS BIGINT)").as("share_pm"))
        .orderBy(col("lang"), col("kind"))
    }),

    "mm_shard_manifest" -> ((s, dir) => {
      val budget = 4000L
      val media = Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
      val w = Window.partitionBy(col("kind"), col("writer"))
        .orderBy(col("media_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      media
        .select(col("media_id"), col("kind"),
          pmod(col("media_id"), lit(4)).as("writer"),
          length(col("content")).cast("long").as("n_bytes"))
        .withColumn("cum_bytes", sum(col("n_bytes")).over(w))
        .withColumn("shard_id", expr(s"(cum_bytes - n_bytes) div $budget"))
        .groupBy(col("kind"), col("writer"), col("shard_id"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("n_bytes")).as("shard_bytes"),
          min(col("media_id")).as("first_id"),
          max(col("media_id")).as("last_id"))
        .orderBy(col("kind"), col("writer"), col("shard_id"))
    }),

    // Aspect-ratio bucketing (the batching-efficiency planner: mixed
    // aspect ratios in one square-padded batch burn FLOPs on pad
    // pixels): images bucket by integer ratio_pm = 1000·w div h
    // (portrait <800, squareish 800–1250, landscape >1250 — declared
    // cuts), with the square-pad waste each bucket would pay
    // ((max² − w·h)·1000 div max²). Stub-decoded dims; one projection
    // + one 3-cell hash agg, scan-proportional.
    "mm_aspect_buckets" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables(s, dir, "documents"))
      media.filter(col("kind") === "image")
        .withColumn("w", Multimodal.stubWidth(length(col("content")))
          .cast("long"))
        .withColumn("h", Multimodal.stubHeight(length(col("content")))
          .cast("long"))
        .withColumn("ratio_pm", expr("CAST(w * 1000 div h AS BIGINT)"))
        .withColumn("bucket",
          when(col("ratio_pm") < 800, "portrait")
            .when(col("ratio_pm") <= 1250, "squareish")
            .otherwise("landscape"))
        .withColumn("waste_pm", expr(
          "CAST((greatest(w, h) * greatest(w, h) - w * h) * 1000 div " +
            "(greatest(w, h) * greatest(w, h)) AS BIGINT)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_assets"),
          min(col("ratio_pm")).as("min_ratio_pm"),
          max(col("ratio_pm")).as("max_ratio_pm"),
          sum(col("waste_pm")).as("sw"))
        .select(col("bucket"), col("n_assets"), col("min_ratio_pm"),
          col("max_ratio_pm"),
          expr("CAST(sw div n_assets AS BIGINT)")
            .as("mean_pad_waste_pm"))
        .orderBy(col("bucket"))
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
        |ORDER BY media_id, frame_idx""".stripMargin,

    "mm_pack_batches" ->
      """WITH RECURSIVE base AS (
        |  SELECT ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
        |         doc_id % 2 AS shard, doc_id AS media_id,
        |         CAST(((64 + n_chars % 577) * (64 + n_chars % 389)) // 1000
        |           AS INT) AS kpx,
        |         row_number() OVER (PARTITION BY doc_id % 3, doc_id % 2
        |                            ORDER BY doc_id) AS rn
        |  FROM documents
        |), walk AS (
        |  SELECT kind, shard, media_id, kpx, rn,
        |         CAST(0 AS BIGINT) AS pack_id, CAST(kpx AS BIGINT) AS fill
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.kind, b.shard, b.media_id, b.kpx, b.rn,
        |         CASE WHEN w.fill + b.kpx > 600 THEN w.pack_id + 1
        |              ELSE w.pack_id END,
        |         CASE WHEN w.fill + b.kpx > 600 THEN CAST(b.kpx AS BIGINT)
        |              ELSE w.fill + b.kpx END
        |  FROM walk w JOIN base b
        |    ON b.kind = w.kind AND b.shard = w.shard AND b.rn = w.rn + 1
        |)
        |SELECT media_id, kind, shard, pack_id, kpx
        |FROM walk ORDER BY media_id""".stripMargin,

    "mm_dedup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
        |    CAST(64 + n_chars % 577 AS INT) AS width,
        |    CAST(64 + n_chars % 389 AS INT) AS height,
        |    CAST(n_chars // 100 + 1 AS INT) AS declared_frames
        |  FROM documents)
        |SELECT kind, width, height, declared_frames,
        |  count(*) AS n_assets, min(media_id) AS keeper
        |FROM m
        |GROUP BY kind, width, height, declared_frames
        |HAVING count(*) >= 2
        |ORDER BY kind, width, height, declared_frames""".stripMargin,

    "mm_modality_mix" ->
      """WITH m AS (
        |  SELECT lang,
        |    ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
        |    n_chars AS n_bytes
        |  FROM documents),
        |g AS (
        |  SELECT lang, kind, count(*) AS n_assets,
        |    CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        |  FROM m GROUP BY lang, kind),
        |w AS (
        |  SELECT *, CAST(sum(total_bytes) OVER (PARTITION BY lang)
        |    AS BIGINT) AS lang_bytes
        |  FROM g)
        |SELECT lang, kind, n_assets, total_bytes,
        |  CAST((CAST(total_bytes AS HUGEINT) * 1000) // lang_bytes
        |    AS BIGINT) AS share_pm
        |FROM w ORDER BY lang, kind""".stripMargin,

    "mm_shard_manifest" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
        |    doc_id % 4 AS writer,
        |    CAST(n_chars AS BIGINT) AS n_bytes
        |  FROM documents),
        |c AS (
        |  SELECT media_id, kind, writer, n_bytes,
        |    sum(n_bytes) OVER (PARTITION BY kind, writer
        |      ORDER BY media_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_bytes
        |  FROM m),
        |sh AS (
        |  SELECT kind, writer,
        |    (cum_bytes - n_bytes) // 4000 AS shard_id,
        |    media_id, n_bytes
        |  FROM c)
        |SELECT kind, CAST(writer AS BIGINT) AS writer,
        |  CAST(shard_id AS BIGINT) AS shard_id,
        |  CAST(count(*) AS BIGINT) AS n_assets,
        |  CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
        |  min(media_id) AS first_id, max(media_id) AS last_id
        |FROM sh GROUP BY kind, writer, shard_id
        |ORDER BY kind, writer, shard_id""".stripMargin,

    "mm_aspect_buckets" ->
      """WITH m AS (
        |  SELECT CAST(64 + n_chars % 577 AS BIGINT) AS w,
        |    CAST(64 + n_chars % 389 AS BIGINT) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |r AS (
        |  SELECT CAST(w * 1000 // h AS BIGINT) AS ratio_pm,
        |    CAST((greatest(w, h) * greatest(w, h) - w * h) * 1000 //
        |      (greatest(w, h) * greatest(w, h)) AS BIGINT) AS waste_pm
        |  FROM m),
        |b AS (
        |  SELECT CASE WHEN ratio_pm < 800 THEN 'portrait'
        |    WHEN ratio_pm <= 1250 THEN 'squareish'
        |    ELSE 'landscape' END AS bucket, ratio_pm, waste_pm
        |  FROM r)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_assets,
        |  min(ratio_pm) AS min_ratio_pm, max(ratio_pm) AS max_ratio_pm,
        |  CAST(sum(waste_pm) // count(*) AS BIGINT)
        |    AS mean_pad_waste_pm
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
