package graft.sources

import java.io.File
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.LocalSpark

class AvroSourceSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  private def scratch(name: String): String = {
    val d = new File(s"${sys.props("java.io.tmpdir")}/graft-avro-spec/$name")
    if (d.exists()) d.listFiles().foreach(_.delete())
    d.mkdirs()
    d.getAbsolutePath
  }

  test("all scalar types + nulls roundtrip bit-exactly") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("s", ShortType), StructField("b", ByteType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("str", StringType), StructField("bool", BooleanType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType)))
    val rows = Seq(
      Row(1L, 2, 3.toShort, 4.toByte, 1.5, 2.5f, "héllo", true,
        Array[Byte](1, 2, 3), Date.valueOf("2026-08-16"),
        Timestamp.valueOf("2026-08-16 12:34:56.789012")),
      Row(null, null, null, null, null, null, null, null, null, null,
        null),
      Row(Long.MinValue, Int.MaxValue, Short.MinValue, Byte.MaxValue,
        -0.0, Float.NaN, "", false, Array.empty[Byte],
        Date.valueOf("1969-12-31"), new Timestamp(-1L)))
    val dir = scratch("scalars")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.format("graft-avro").mode("overwrite").save(dir)
    // INFERENCE widens short/byte to int (Avro has no narrow ints);
    // a SUPPLIED schema restores the declared widths — both pinned
    val inferred = spark.read.format("graft-avro").load(dir)
    assert(inferred.schema("s").dataType === IntegerType)
    assert(inferred.schema("b").dataType === IntegerType)
    val back = spark.read.schema(schema).format("graft-avro").load(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy(col("l").asc_nulls_first).collect()
    assert(got.length === 3)
    // compare cell-wise (binary needs content equality; NaN needs eq)
    for ((g, w) <- got.zip(Seq(rows(1), rows(2), rows(0)))) {
      for (i <- schema.indices) {
        (g.get(i), w.get(i)) match {
          case (null, null) => ()
          case (a: Array[Byte], b: Array[Byte]) =>
            assert(a.toSeq === b.toSeq)
          case (a: Float, b: Float) if b.isNaN => assert(a.isNaN)
          case (a, b) => assert(a === b, s"col ${schema(i).name}")
        }
      }
    }
  }

  test("arrays (including float embeddings) roundtrip exactly") {
    import spark.implicits._
    val dir = scratch("arrays")
    val df = Seq(
      (1L, Seq(1.0f, 2.5f, -3.25f), Seq("a", "b")),
      (2L, Seq.empty[Float], Seq.empty[String]),
      (3L, Seq(Float.MinPositiveValue), Seq("z")))
      .toDF("id", "emb", "tags")
    df.write.format("graft-avro").mode("overwrite").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
      .orderBy("id").collect()
    assert(back.map(_.getSeq[Float](1)).toSeq ===
      Seq(Seq(1.0f, 2.5f, -3.25f), Seq.empty, Seq(Float.MinPositiveValue)))
    assert(back.map(_.getSeq[String](2)).toSeq ===
      Seq(Seq("a", "b"), Seq.empty, Seq("z")))
  }

  test("mode(overwrite) truncates; append-by-default keeps files") {
    import spark.implicits._
    val dir = scratch("modes")
    (1 to 5).toDF("n").write.format("graft-avro")
      .mode("overwrite").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() === 5)
    (6 to 7).toDF("n").write.format("graft-avro")
      .mode("overwrite").save(dir)
    val after = spark.read.format("graft-avro").load(dir)
    assert(after.count() === 2, "overwrite must truncate prior files")
    assert(after.as[Int].collect().sorted.toSeq === Seq(6, 7))
  }

  test("one container per task; reads parallelize per file") {
    import spark.implicits._
    val dir = scratch("parallel")
    spark.range(0, 1000).repartition(7).as[Long].toDF("v")
      .write.format("graft-avro").mode("overwrite").save(dir)
    val files = GraftAvro.listAvro(dir)
    assert(files.length === 7, s"expected 7 containers, got $files")
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.rdd.getNumPartitions === 7,
      "read parallelism must equal the file count")
    assert(back.agg(sum("v")).head.getLong(0) === (0L until 1000L).sum)
  }

  test("column pruning reaches the scan (pruned reader schema)") {
    import spark.implicits._
    val dir = scratch("prune")
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "x")
      .write.format("graft-avro").mode("overwrite").save(dir)
    val df = spark.read.format("graft-avro").load(dir).select("k")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftAvroScan") || plan.contains("graft-avro")
      || plan.contains("BatchScan"), s"expected a DSv2 scan:\n$plan")
    // the scan's output must be just the pruned column
    val scanLine = plan.linesIterator
      .find(_.contains("BatchScan")).getOrElse(plan)
    assert(!scanLine.contains("name") && !scanLine.contains("x"),
      s"scan must not carry unprojected columns: $scanLine")
    assert(df.as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("reading an empty directory fails loudly") {
    val dir = scratch("empty")
    val e = intercept[Exception] {
      spark.read.format("graft-avro").load(dir).collect()
    }
    assert(e.getMessage.contains("no .avro container files"))
  }

  test("unsupported write type is rejected on the driver") {
    import spark.implicits._
    val dir = scratch("badtype")
    val df = Seq((1L, Map("a" -> 1))).toDF("k", "m")
    val e = intercept[Exception] {
      df.write.format("graft-avro").mode("overwrite").save(dir)
    }
    assert(e.getMessage.contains("unsupported type"),
      s"expected the driver-side type veto, got: ${e.getMessage}")
  }
}
