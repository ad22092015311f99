package graft.sources

import java.io.File
import java.nio.file.Files

import graft.LocalSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the graft-manifest sink's commit protocol — the properties a
  * manifest-gated table format exists to provide: atomic all-or-
  * nothing visibility, attempt isolation, overwrite truncation,
  * append merging, and loud corruption detection on read.
  */
class ManifestSinkSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def scratch(tag: String): String =
    Files.createTempDirectory(s"graft-manifest-$tag").toString

  test("roundtrip: every row and type survives write -> manifest -> read") {
    val dir = scratch("rt")
    val src = graft.Tables(spark, sf, "customer")
    src.write.mode("overwrite").format("graft-manifest").save(dir)
    val back = spark.read.format("graft-manifest").load(dir)
    assert(back.schema === src.schema)
    val a = src.orderBy("c_custkey").collect().toSeq
    val b = back.orderBy("c_custkey").collect().toSeq
    assert(a === b)
  }

  test("visibility is manifest-gated: orphan data files are invisible") {
    val dir = scratch("orphan")
    val src = graft.Tables(spark, sf, "region")
    src.write.mode("overwrite").format("graft-manifest").save(dir)
    val n = src.count()
    // a stray file from a crashed uncommitted job lands in the dir …
    val stray = new File(dir, s"part-99999-0-dead${ManifestSink.DataSuffix}")
    Files.write(stray.toPath, Array.fill[Byte](64)(7))
    // … and reads don't even open it: the manifest is the table
    assert(spark.read.format("graft-manifest").load(dir).count() === n)
  }

  test("overwrite truncates: the new manifest replaces the old file set") {
    val dir = scratch("trunc")
    graft.Tables(spark, sf, "nation").write.mode("overwrite")
      .format("graft-manifest").save(dir)
    val regions = graft.Tables(spark, sf, "region")
    regions.write.mode("overwrite").format("graft-manifest").save(dir)
    val back = spark.read.format("graft-manifest").load(dir)
    assert(back.schema === regions.schema)
    assert(back.count() === regions.count())
    // unreferenced data files from the first write are swept
    val manifest = ManifestSink.readManifest(dir)
    val onDisk = new File(dir).listFiles()
      .filter(_.getName.endsWith(ManifestSink.DataSuffix)).map(_.getName)
    assert(onDisk.toSet === manifest.files.map(_.name).toSet)
  }

  test("append merges manifests: both writes' rows are visible") {
    val dir = scratch("append")
    val r = graft.Tables(spark, sf, "region")
    r.write.mode("overwrite").format("graft-manifest").save(dir)
    r.write.mode("append").format("graft-manifest").save(dir)
    assert(spark.read.format("graft-manifest").load(dir).count()
      === 2 * r.count())
  }

  test("failed job publishes nothing: no manifest, aborted files deleted") {
    val dir = scratch("abort")
    val poisoned = graft.Tables(spark, sf, "region")
      .withColumn("boom", expr(
        "CASE WHEN r_regionkey = 3 THEN " +
          "raise_error('poisoned row') ELSE 'ok' END"))
    intercept[Exception] {
      poisoned.write.mode("overwrite").format("graft-manifest").save(dir)
    }
    assert(!new File(dir, ManifestSink.ManifestFile).exists(),
      "a failed job must not publish a manifest")
    // task aborts removed their partial files
    val leftovers = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(ManifestSink.DataSuffix))
    assert(leftovers.isEmpty,
      s"aborted attempts left data files: ${leftovers.mkString(", ")}")
    // and the table stays unreadable rather than half-visible
    intercept[Exception] {
      spark.read.format("graft-manifest").load(dir).count()
    }
  }

  test("corrupted data file fails the read loudly with a checksum error") {
    val dir = scratch("crc")
    graft.Tables(spark, sf, "region").write.mode("overwrite")
      .format("graft-manifest").save(dir)
    val dataFile = new File(dir).listFiles()
      .filter(_.getName.endsWith(ManifestSink.DataSuffix)).head
    val bytes = Files.readAllBytes(dataFile.toPath)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x7f).toByte
    Files.write(dataFile.toPath, bytes)
    val e = intercept[Exception] {
      spark.read.format("graft-manifest").load(dir).count()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("checksum")),
      s"expected a checksum failure, got: ${chain(e).mkString(" | ")}")
  }
}
