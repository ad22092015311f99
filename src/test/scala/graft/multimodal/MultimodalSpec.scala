package graft.multimodal

import graft.{LocalSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = LocalSpark.spark

  test("media table: schema, kinds, payload round-trip") {
    val media = Multimodal.mediaFromDocuments(Tables(spark, sf, "documents"))
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(media.select("kind").distinct().count() == 3)
    // payload is the UTF-8 text, byte length == n_chars (ASCII corpus)
    val bad = Multimodal.mediaFromDocuments(Tables(spark, sf, "documents"))
      .join(Tables(spark, sf, "documents"),
        col("media_id") === col("doc_id"))
      .filter(length(col("content")) =!= col("n_chars"))
    assert(bad.count() == 0)
  }

  test("binaryFile source: raw media files ingest as (path, length, " +
      "content) with length pushdown") {
    // The real ingest surface for a 100 TB media corpus: Spark's
    // built-in `binaryFile` source reads each file as one row of
    // opaque bytes + metadata — the step BEFORE mediaFromDocuments'
    // synthesized table. Pins: content round-trips byte-exact, length
    // matches, and pathGlobFilter selects files at the SOURCE (file
    // listing), not post-scan.
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
    val payloads = Map("a.bin" -> Array[Byte](1, 2, 3, 4, 5),
      "b.bin" -> "binary media payload".getBytes("UTF-8"))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(name), bytes)
    }
    val df = spark.read.format("binaryFile").load(dir.toString)
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val rows = df.select(col("path"), col("length"), col("content"))
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]](2)))
    assert(rows.length == 2)
    rows.foreach { case (name, len, content) =>
      assert(payloads(name).sameElements(content), name)
      assert(len == payloads(name).length.toLong, name)
    }
    // glob filtering happens in the file listing, before any read
    val capped = spark.read.format("binaryFile")
      .option("pathGlobFilter", "a.bin").load(dir.toString)
    assert(capped.count() == 1)
  }

  test("mapPartitions feature extraction is deterministic and exact") {
    val docs = Tables(spark, sf, "documents").limit(50)
    val media = Multimodal.mediaDataset(spark, docs)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 50)
    val byId = feats.map(f => f.media_id -> f).toMap
    val rows = docs.select("doc_id", "text").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getString(1).getBytes("UTF-8")
      val f = byId(id)
      assert(f.n_bytes == bytes.length)
      // histogram mode = most frequent byte, smallest value on ties
      val counts = bytes.groupBy(b => b & 0xff).view.mapValues(_.length)
      val expMode = counts.toSeq.maxBy { case (v, c) => (c.toLong, -v) }._1
      assert(f.histogram_mode == expMode)
      val (w, h) = Multimodal.decodeStub(bytes)
      assert(f.width == w && f.height == h)
      assert(f.byte_entropy_x1000 > 0) // text is never single-byte
    }
  }
}
