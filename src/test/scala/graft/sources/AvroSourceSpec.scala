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

  test("commit gate: in-progress orphans are invisible in append mode") {
    import spark.implicits._
    val dir = scratch("orphan")
    Seq(1L, 2L, 3L).toDF("v").write.format("graft-avro")
      .mode("append").save(dir)
    val committed = GraftAvro.listAvro(dir).size
    // a crashed/zombie task's file: created, never renamed at commit
    val orphan = new File(dir, "part-99999-0-dead.avro.inprogress")
    java.nio.file.Files.write(orphan.toPath,
      Array[Byte](0x4f, 0x62, 0x6a, 0x01)) // avro magic, truncated
    assert(GraftAvro.listAvro(dir).size === committed,
      "the .inprogress orphan must not be listed as a container")
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L),
      "read-back must see only committed containers")
  }

  test("commit gate: a failing write leaves NO visible containers") {
    import spark.implicits._
    val dir = scratch("crash")
    val failing = spark.range(0, 100).repartition(2).as[Long]
      .map { v => if (v == 57L) throw new RuntimeException("boom"); v }
      .toDF("v")
    intercept[Exception] {
      failing.write.format("graft-avro").mode("append").save(dir)
    }
    assert(GraftAvro.listAvro(dir).isEmpty,
      "no committed-then-swept or phantom container may remain: " +
        GraftAvro.listAvro(dir).toString)
  }

  test("nested structs (incl. struct-in-struct, array in struct) roundtrip") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("name", StringType),
        StructField("scores", ArrayType(DoubleType, containsNull = false)),
        StructField("inner", StructType(Seq(
          StructField("flag", BooleanType),
          StructField("n", IntegerType)))))))))
    val rows = Seq(
      Row(1L, Row("a", Seq(1.5, 2.5), Row(true, 7))),
      Row(2L, null),
      Row(3L, Row(null, Seq.empty[Double], null)))
    val dir = scratch("structs")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema("meta").dataType.isInstanceOf[StructType])
    val got = back.orderBy("id").collect()
    assert(got(0).getStruct(1).getString(0) === "a")
    assert(got(0).getStruct(1).getSeq[Double](1) === Seq(1.5, 2.5))
    assert(got(0).getStruct(1).getStruct(2).getInt(1) === 7)
    assert(got(1).isNullAt(1))
    assert(got(2).getStruct(1).isNullAt(0))
    assert(got(2).getStruct(1).getSeq[Double](1) === Seq.empty)
    assert(got(2).getStruct(1).isNullAt(2))
    // pruning into a struct column still works (whole-column grain)
    assert(spark.read.format("graft-avro").load(dir)
      .select("meta").count() === 3)
  }

  test("arrays with NULL elements roundtrip (union(null, T) elements)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("xs", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(Row(1L, Seq(1.0, null, 3.0)), Row(2L, Seq(null)))
    val dir = scratch("nullelems")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
      .orderBy("id").collect()
    assert(back(0).getSeq[Any](1) === Seq(1.0, null, 3.0))
    assert(back(1).getSeq[Any](1) === Seq(null))
    // and the read-side schema reports nullable elements
    assert(spark.read.format("graft-avro").load(dir).schema("xs")
      .dataType.asInstanceOf[ArrayType].containsNull)
  }

  test("mixed-schema directory fails loudly at scan planning") {
    import spark.implicits._
    val dir = scratch("mixed")
    Seq((1L, 1.5)).toDF("k", "x").write.format("graft-avro")
      .mode("append").save(dir)
    Seq(2L).toDF("k").write.format("graft-avro")
      .mode("append").save(dir)
    val wide = StructType(Seq(
      StructField("k", LongType), StructField("x", DoubleType)))
    val e = intercept[Exception] {
      spark.read.schema(wide).format("graft-avro").load(dir)
        .select("k", "x").collect()
    }
    assert(e.getMessage.contains("mixed-schema directory"),
      s"expected the driver-side drift guard, got: ${e.getMessage}")
    // projecting only the SHARED column is fine — per-file resolution
    assert(spark.read.schema(wide).format("graft-avro").load(dir)
      .select("k").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("foreign-written container (different record name) reads + prunes") {
    import org.apache.avro.{Schema => AS, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter,
      GenericRecord}
    val dir = scratch("foreign")
    val s: AS = SchemaBuilder.record("TheirRow").namespace("com.example")
      .fields()
      .requiredLong("id").requiredString("name").requiredDouble("x")
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](s))
    w.create(s, new File(dir, "foreign-0.avro"))
    for (i <- 1 to 3) {
      val r = new GenericData.Record(s)
      r.put("id", i.toLong); r.put("name", s"n$i"); r.put("x", i * 1.5)
      w.append(r)
    }
    w.close()
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fieldNames.toSeq === Seq("id", "name", "x"))
    // pruned read: the reader schema is a projection of the WRITER's
    // record (name kept), so resolution succeeds on the foreign name
    val pruned = back.select("id", "x").orderBy("id").collect()
    assert(pruned.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((1L, 1.5), (2L, 3.0), (3L, 4.5)))
  }
}
