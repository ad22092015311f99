package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata (task-brief addition).
  *
  * The Spark-side plumbing — schema, partition-parallel batch
  * processing, typed record shape — is real and tested; the actual
  * codec call is stubbed behind [[decodeStub]] (image/audio libraries
  * are not available in this environment) with a deterministic fake,
  * exactly where a JNI/FFI decoder would slot in.
  *
  * Scale notes: binary payloads ride the columnar Parquet path
  * (page-compressed, column-pruned away unless selected); per-record
  * work happens in `mapPartitions` so one task processes a whole
  * partition of blobs with zero driver involvement; derived features
  * are small fixed-width columns that shuffle cheaply.
  */
object Multimodal {

  /** One media asset: opaque payload + typed envelope. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      declared_frames: Int)

  /** Decoded metadata + features (fixed-width, shuffle-cheap). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      byte_entropy_x1000: Long,
      histogram_mode: Int)

  /** Stub dimension formulas, shared by the JVM decode path and the
    * Column-level queries so they can never drift apart. */
  final val WidthMod = 577
  final val HeightMod = 389
  final val DimBase = 64

  /** STUB — stands in for the real image/audio decoder (e.g. a JNI
    * libjpeg/ffmpeg binding). Deterministic fake: derives plausible
    * dimensions from the payload alone so tests are stable. */
  def decodeStub(content: Array[Byte]): (Int, Int) = {
    val n = content.length
    (DimBase + n % WidthMod, DimBase + n % HeightMod)
  }

  /** Column forms of [[decodeStub]] for declarative queries. */
  def stubWidth(nBytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(DimBase) + pmod(nBytes, lit(WidthMod))
  def stubHeight(nBytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(DimBase) + pmod(nBytes, lit(HeightMod))

  /** Partition-parallel feature extraction over binary payloads: the
    * batch shape a real decoder needs (iterate a partition's records,
    * reuse buffers, emit fixed-width features). Pure deterministic
    * byte statistics; the decode step is [[decodeStub]]. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val hist = new Array[Long](256) // reused per record
      it.map { m =>
        java.util.Arrays.fill(hist, 0L)
        var i = 0
        while (i < m.content.length) {
          hist(m.content(i) & 0xff) += 1; i += 1
        }
        val n = math.max(m.content.length, 1)
        var entropy = 0.0
        var mode = 0
        var j = 0
        while (j < 256) {
          if (hist(j) > hist(mode)) mode = j
          if (hist(j) > 0) {
            val p = hist(j).toDouble / n
            entropy -= p * math.log(p) / math.log(2)
          }
          j += 1
        }
        val (w, h) = decodeStub(m.content)
        MediaFeatures(m.media_id, m.kind, m.content.length, w, h,
          math.round(entropy * 1000), mode)
      }
    }
  }

  /** Synthesize a media table from `documents` (UTF-8 payloads stand
    * in for real image/audio bytes; n_chars == byte length in this
    * ASCII corpus). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      expr("CAST(n_chars DIV 100 + 1 AS INT)").as("declared_frames"))

  /** Typed view for the mapPartitions path. */
  def mediaDataset(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaFromDocuments(docs).as[MediaRecord]
  }
}
