package graft.sources

import java.nio.file.Files

import graft.LocalSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the GraftCatalog SQL surface: the manifest format driven
  * end-to-end by plain `spark.sql` with no paths in queries —
  * DDL (CREATE/ALTER/RENAME/DROP), DML (INSERT INTO / OVERWRITE,
  * CTAS), snapshot time travel via VERSION AS OF, and declared
  * PARTITIONED BY transforms applied on every insert.
  */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = LocalSpark.spark
    s.conf.set("spark.sql.catalog.g", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.g.warehouse",
      Files.createTempDirectory("graft-catalog").toString)
    s
  }

  test("full SQL lifecycle: namespace, create, insert, select, overwrite, drop") {
    spark.sql("CREATE NAMESPACE g.db")
    spark.sql("CREATE TABLE g.db.t (k BIGINT, v STRING)")
    assert(spark.sql("SELECT * FROM g.db.t").count() === 0L)
    spark.sql("INSERT INTO g.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO g.db.t VALUES (3, 'c')")
    assert(spark.sql("SELECT sum(k) FROM g.db.t").head().getLong(0) === 6L)
    spark.sql("INSERT OVERWRITE g.db.t VALUES (9, 'z')")
    assert(spark.sql("SELECT * FROM g.db.t").count() === 1L)
    assert(spark.sql("SHOW TABLES IN g.db").collect()
      .map(_.getString(1)).toSeq === Seq("t"))
    spark.sql("DROP TABLE g.db.t")
    intercept[Exception] { spark.sql("SELECT * FROM g.db.t").collect() }
  }

  test("VERSION AS OF reads archived snapshots through SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.tt (k BIGINT)")            // v0
    spark.sql("INSERT INTO g.db.tt VALUES (1)")             // v1
    spark.sql("INSERT INTO g.db.tt VALUES (2), (3)")        // v2
    assert(spark.sql("SELECT count(*) FROM g.db.tt VERSION AS OF 1")
      .head().getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM g.db.tt VERSION AS OF 2")
      .head().getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM g.db.tt VERSION AS OF 0")
      .head().getLong(0) === 0L)
    spark.sql("DROP TABLE g.db.tt")
  }

  test("ALTER TABLE ADD COLUMN is metadata-only; old rows read NULL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.ev (k BIGINT)")
    spark.sql("INSERT INTO g.db.ev VALUES (1)")
    spark.sql("ALTER TABLE g.db.ev ADD COLUMN w BIGINT")
    spark.sql("INSERT INTO g.db.ev VALUES (2, 20)")
    val rows = spark.sql("SELECT k, w FROM g.db.ev ORDER BY k")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.toSeq === Seq((1L, -1L), (2L, 20L)))
    // pre-evolution snapshot keeps its own narrower shape
    assert(spark.sql("SELECT * FROM g.db.ev VERSION AS OF 1")
      .schema.fieldNames.toSeq === Seq("k"))
    spark.sql("DROP TABLE g.db.ev")
  }

  test("CTAS creates and loads in one statement; RENAME moves the directory") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.src AS SELECT id AS k FROM range(10)")
    assert(spark.sql("SELECT sum(k) FROM g.db.src").head().getLong(0) === 45L)
    spark.sql("ALTER TABLE g.db.src RENAME TO db.dst")
    assert(spark.sql("SELECT count(*) FROM g.db.dst").head().getLong(0) === 10L)
    intercept[Exception] { spark.sql("SELECT * FROM g.db.src").collect() }
    spark.sql("DROP TABLE g.db.dst")
  }

  test("declared PARTITIONED BY transform routes every INSERT and prunes scans") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.pt (k BIGINT, r BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO g.db.pt SELECT id, id * 10 FROM range(100)")
    // every committed file carries the declared transform
    val warehouse = spark.conf.get("spark.sql.catalog.g.warehouse")
    val m = ManifestSink.readManifest(s"$warehouse/db/pt")
    assert(m.files.nonEmpty)
    assert(m.files.forall(_.pspec.contains("bucket(4, k)")))
    assert(m.files.flatMap(_.part).distinct.size === 4)
    // equality predicate reads one bucket's files, result stays exact
    assert(spark.sql("SELECT r FROM g.db.pt WHERE k = 7")
      .head().getLong(0) === 70L)
    spark.sql("DROP TABLE g.db.pt")
  }

  test("SQL DELETE routes equality through O(metadata) eq-deletes, ranges through delete vectors") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.del (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.del SELECT id, CAST(id AS STRING) " +
      "FROM range(100)")
    val warehouse = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$warehouse/db/del"
    // equality predicate: pure manifest surgery, no delete files
    spark.sql("DELETE FROM g.db.del WHERE k = 7")
    assert(ManifestSink.readManifest(dir).eqDeletes.nonEmpty)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith(ManifestSink.DelSuffix)))
    assert(spark.sql("SELECT count(*) FROM g.db.del")
      .head().getLong(0) === 99L)
    // range predicate: positional delete vectors, still no rewrite
    spark.sql("DELETE FROM g.db.del WHERE k >= 90 AND v IS NOT NULL")
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith(ManifestSink.DelSuffix)))
    assert(spark.sql("SELECT count(*) FROM g.db.del")
      .head().getLong(0) === 89L)
    // IN-list back through the eq-delete path; re-insert stays visible
    spark.sql("DELETE FROM g.db.del WHERE k IN (1, 2)")
    spark.sql("INSERT INTO g.db.del VALUES (1, 'again')")
    assert(spark.sql("SELECT v FROM g.db.del WHERE k = 1")
      .collect().map(_.getString(0)).toSeq === Seq("again"))
    spark.sql("DROP TABLE g.db.del")
  }

  test("aggregate pushdown declines when a delete could have masked the extreme row") {
    import org.apache.spark.sql.Row
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.ap (k BIGINT, v INT)")
    spark.sql("INSERT INTO g.db.ap VALUES (1, 10), (5, 50), (9, 90)")
    // clean table: answered from the manifest
    assert(spark.sql("SELECT min(k), max(k) FROM g.db.ap").head()
      === Row(1L, 9L))
    // a positional delete vector masks the CURRENT min row — the
    // stats still say 1; pushdown must decline and scan
    spark.sql("DELETE FROM g.db.ap WHERE k <= 1 AND v IS NOT NULL")
    assert(spark.sql(
      "SELECT min(k), max(k), count(*) FROM g.db.ap").head()
      === Row(5L, 9L, 2L))
    // an equality delete also declines (count becomes an upper bound)
    spark.sql("DELETE FROM g.db.ap WHERE k = 9")
    assert(spark.sql(
      "SELECT min(k), max(k), count(*) FROM g.db.ap").head()
      === Row(5L, 5L, 1L))
    spark.sql("DROP TABLE g.db.ap")
  }

  test("SQL TRUNCATE publishes an empty snapshot; the prior state stays time-travelable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.tr (k BIGINT)")
    spark.sql("INSERT INTO g.db.tr SELECT id FROM range(10)") // v1
    spark.sql("TRUNCATE TABLE g.db.tr")                       // v2
    assert(spark.sql("SELECT count(*) FROM g.db.tr").head().getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM g.db.tr VERSION AS OF 1")
      .head().getLong(0) === 10L)
    spark.sql("INSERT INTO g.db.tr VALUES (42)")
    assert(spark.sql("SELECT count(*) FROM g.db.tr").head().getLong(0) === 1L)
    spark.sql("DROP TABLE g.db.tr")
  }

  test("SQL UPDATE is group-based copy-on-write: only affected files rewritten") {
    import org.apache.spark.sql.functions._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.up (k BIGINT, v BIGINT)")
    // two files: keys 0..49 and 50..99 (single-slice ranges)
    spark.sql("INSERT INTO g.db.up SELECT id, id FROM range(0, 50, 1, 1)")
    spark.sql("INSERT INTO g.db.up SELECT id, id FROM range(50, 100, 1, 1)")
    val warehouse = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$warehouse/db/up"
    val before = ManifestSink.readManifest(dir).files.map(_.name).toSet
    assert(before.size === 2)
    spark.sql("UPDATE g.db.up SET v = v + 1000 WHERE k = 60")
    val after = ManifestSink.readManifest(dir)
    // the k=60 file was swapped; the other carried forward untouched
    assert(after.files.map(_.name).toSet.intersect(before).size === 1)
    assert(after.files.size === 2)
    assert(spark.sql("SELECT v FROM g.db.up WHERE k = 60")
      .head().getLong(0) === 1060L)
    assert(spark.sql("SELECT count(*), sum(v) FROM g.db.up")
      .head().getLong(1) === (0L until 100L).sum + 1000L)
    // prior state stays time-travelable
    assert(spark.sql(s"SELECT v FROM g.db.up VERSION AS OF 2 WHERE k = 60")
      .head().getLong(0) === 60L)
    spark.sql("DROP TABLE g.db.up")
  }

  test("copy-on-write rewrite keeps the declared partition transform") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.pcow (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO g.db.pcow SELECT id, id FROM range(0, 40, 1, 1)")
    spark.sql("UPDATE g.db.pcow SET v = 0 WHERE k = 5")
    val warehouse = spark.conf.get("spark.sql.catalog.g.warehouse")
    val m = ManifestSink.readManifest(s"$warehouse/db/pcow")
    // every live file — carried AND rewritten — still carries the
    // transform, so bucket pruning survives the rewrite
    assert(m.files.nonEmpty)
    assert(m.files.forall(_.pspec.contains("bucket(4, k)")))
    assert(spark.sql("SELECT v FROM g.db.pcow WHERE k = 5")
      .head().getLong(0) === 0L)
    assert(spark.sql("SELECT sum(v) FROM g.db.pcow").head().getLong(0) ===
      (0L until 40L).sum - 5L)
    spark.sql("DROP TABLE g.db.pcow")
  }

  test("CALL procedures: compact, vacuum, sweep_deletes as SQL maintenance") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.maint (k BIGINT, v BIGINT)")
    (0 until 3).foreach { i =>
      spark.sql("INSERT INTO g.db.maint " +
        s"SELECT id, id * 2 FROM range(${i * 10}, ${i * 10 + 10}, 1, 1)")
    }                                           // v1..v3, one file each
    val sumBefore =
      spark.sql("SELECT sum(v) FROM g.db.maint").head().getLong(0)

    // SHOW / DESCRIBE surface
    val procs = spark.sql("SHOW PROCEDURES IN g.system").collect()
      .map(r => r.getString(r.length - 1)).toSeq
    assert(procs.contains("compact") && procs.contains("vacuum"))

    // compact: 3 files -> 1, data unchanged, result row surfaces counts
    val c = spark.sql(
      "CALL g.system.compact(`table` => 'db.maint', target_files => 1)")
      .head()
    assert(c.getLong(0) === 3L)                 // files_before
    assert(c.getLong(1) === 1L)                 // files_after
    assert(spark.sql("SELECT sum(v) FROM g.db.maint").head()
      .getLong(0) === sumBefore)
    // pre-compaction layout still time-travelable
    assert(spark.sql("SELECT count(*) FROM g.db.maint VERSION AS OF 3")
      .head().getLong(0) === 30L)

    // vacuum keep_versions=0: archives dropped, old data files swept
    val v = spark.sql("CALL g.system.vacuum('db.maint', 0)").head()
    assert(v.getLong(0) >= 3L)                  // archives_removed
    assert(v.getLong(1) === 3L)                 // data_files_removed
    assert(spark.sql("SELECT sum(v) FROM g.db.maint").head()
      .getLong(0) === sumBefore)
    intercept[Exception] {
      spark.sql("SELECT count(*) FROM g.db.maint VERSION AS OF 3").collect()
    }

    // sweep_deletes on a clean table is a no-op
    assert(spark.sql("CALL g.system.sweep_deletes('db.maint')")
      .head().getLong(0) === 0L)

    // unknown procedure / bad table ref fail loudly
    intercept[Exception] { spark.sql("CALL g.system.nope('db.maint')") }
    intercept[Exception] {
      spark.sql("CALL g.system.compact('db.ghost', 1)").collect()
    }
    spark.sql("DROP TABLE g.db.maint")
  }

  test("catalog functions: bucket/fnv64 expose the pinned on-disk hashes, dot the vector arithmetic") {
    // bucket == the write path's routing hash, byte for byte
    val keys = Seq(0L, 1L, 42L, -7L, Long.MaxValue, Long.MinValue)
    keys.foreach { k =>
      assert(spark.sql(s"SELECT g.system.bucket(8, ${k}L)").head().getInt(0)
        === ManifestSink.bucketOf(k, 8), s"key $k")
    }
    // null propagates, not crashes
    assert(spark.sql("SELECT g.system.bucket(8, CAST(NULL AS BIGINT))")
      .head().isNullAt(0))

    // fnv64 == the bloom/eq-delete string canonicalization
    assert(spark.sql("SELECT g.system.fnv64('hello')").head().getLong(0)
      === ManifestSink.fnv64("hello".getBytes("UTF-8")))

    // dot: plain arithmetic, length mismatch yields NULL
    assert(spark.sql("SELECT g.system.dot(" +
      "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .head().getDouble(0) === 11.0)
    assert(spark.sql("SELECT g.system.dot(" +
      "array(CAST(1.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .head().isNullAt(0))

    // discoverable + failing loudly on unknowns
    val fns = spark.sql("SHOW FUNCTIONS IN g.system").collect()
      .map(r => r.getString(r.length - 1)).toSeq
    assert(Seq("bucket", "dot", "fnv64")
      .forall(n => fns.exists(_.endsWith(n))), fns.toString)
    intercept[Exception] { spark.sql("SELECT g.system.nope(1)").collect() }
  }

  test("SQL MERGE INTO upserts through the copy-on-write path") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.m (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.m VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("CREATE OR REPLACE TEMP VIEW m_src AS " +
      "SELECT * FROM VALUES (2, 'B'), (4, 'D') AS s(k, v)")
    spark.sql("""
      MERGE INTO g.db.m t USING m_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val rows = spark.sql("SELECT k, v FROM g.db.m ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
    // MERGE with a DELETE clause
    spark.sql("CREATE OR REPLACE TEMP VIEW m_src2 AS " +
      "SELECT * FROM VALUES (1, 'x'), (4, 'y') AS s(k, v)")
    spark.sql("""
      MERGE INTO g.db.m t USING m_src2 s ON t.k = s.k
      WHEN MATCHED AND s.v = 'x' THEN DELETE
      WHEN MATCHED THEN UPDATE SET t.v = s.v""")
    val rows2 = spark.sql("SELECT k, v FROM g.db.m ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows2 === Seq((2L, "B"), (3L, "c"), (4L, "y")))
    spark.sql("DROP TABLE g.db.m")
  }

  test("metadata columns: _graft_file and _graft_pos selectable without withRowMeta") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.mc (k BIGINT)")
    spark.sql("INSERT INTO g.db.mc SELECT id FROM range(0, 5, 1, 1)")
    val rows = spark.sql(
      "SELECT k, _graft_file, _graft_pos FROM g.db.mc ORDER BY k").collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getString(1).endsWith(ManifestSink.DataSuffix)))
    assert(rows.map(_.getLong(2)).toSet === (0L until 5L).toSet)
    spark.sql("DROP TABLE g.db.mc")
  }

  test("CALL rollback restores an archived snapshot as a NEW version, O(metadata)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.rb (k BIGINT)")            // v0
    spark.sql("INSERT INTO g.db.rb VALUES (1), (5)")        // v1
    spark.sql("INSERT INTO g.db.rb VALUES (2), (10)")       // v2
    spark.sql("DELETE FROM g.db.rb WHERE k % 5 = 0")        // v3
    assert(spark.sql("SELECT count(*) FROM g.db.rb")
      .head().getLong(0) === 2L)
    val wh = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$wh/db/rb"
    val dataBefore = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(ManifestSink.DataSuffix))
      .map(f => f.getName -> f.lastModified()).toMap
    val r = spark.sql(
      "CALL g.system.rollback(`table` => 'db.rb', " +
        "version => CAST(2 AS BIGINT))").head()             // v4
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (3L, 2L, 4L))
    // the delete is undone...
    assert(spark.sql("SELECT sum(k) FROM g.db.rb")
      .head().getLong(0) === 18L)
    // ...the bad commit stays time-travelable...
    assert(spark.sql("SELECT count(*) FROM g.db.rb VERSION AS OF 3")
      .head().getLong(0) === 2L)
    assert(spark.sql("SELECT count(*) FROM g.db.rb VERSION AS OF 1")
      .head().getLong(0) === 2L)
    // ...and no data file was rewritten or touched (O(metadata)).
    val dataAfter = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(ManifestSink.DataSuffix))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(dataAfter === dataBefore)
    // rollback to the CURRENT version is a no-op: no new commit.
    val r2 = spark.sql(
      "CALL g.system.rollback(`table` => 'db.rb', " +
        "version => CAST(4 AS BIGINT))").head()
    assert((r2.getLong(0), r2.getLong(2)) === (4L, 4L))
    spark.sql("DROP TABLE g.db.rb")
  }

  test("WAP branches: create_branch isolates staged writes, fast_forward publishes") {
    import org.apache.spark.sql.functions.col
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.wap (k BIGINT)")           // v0
    spark.sql("INSERT INTO g.db.wap VALUES (1), (2)")       // v1
    val forked = spark.sql(
      "CALL g.system.create_branch('db.wap', 'stage')").head().getLong(0)
    assert(forked === 1L)
    val wh = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$wh/db/wap"
    // stage a batch against the branch — base chain untouched
    spark.range(3, 6).select(col("id").as("k"))
      .write.format("graft-manifest").option("branch", "stage")
      .mode("append").save(dir)
    assert(spark.sql("SELECT count(*) FROM g.db.wap")
      .head().getLong(0) === 2L)                            // isolated
    val audit = spark.read.format("graft-manifest")
      .option("branch", "stage").load(dir)
    assert(audit.count() === 5L)
    assert(audit.agg(Map("k" -> "sum")).head().getLong(0) === 15L)
    // guard rails: dangling branch writes and streaming writes refuse
    intercept[Exception] {
      spark.range(1).select(col("id").as("k"))
        .write.format("graft-manifest").option("branch", "nope")
        .mode("append").save(dir)
    }
    intercept[Exception] {
      spark.read.format("graft-manifest").option("branch", "stage")
        .option("asOfVersion", "1").load(dir).collect()
    }
    // publish: branch state becomes the new base version
    val v = spark.sql(
      "CALL g.system.fast_forward('db.wap', 'stage')").head().getLong(0)
    assert(v === 2L)
    assert(spark.sql("SELECT sum(k) FROM g.db.wap")
      .head().getLong(0) === 15L)
    // the pre-publish base stays time-travelable
    assert(spark.sql("SELECT count(*) FROM g.db.wap VERSION AS OF 1")
      .head().getLong(0) === 2L)
    // the branch chain is retired
    intercept[Exception] {
      spark.read.format("graft-manifest").option("branch", "stage")
        .load(dir).collect()
    }
    // abandoned branches drop cleanly and their files sweep later
    spark.sql("CALL g.system.create_branch('db.wap', 'tmp')")
    spark.range(9, 10).select(col("id").as("k"))
      .write.format("graft-manifest").option("branch", "tmp")
      .mode("append").save(dir)
    spark.sql("CALL g.system.drop_branch('db.wap', 'tmp')")
    assert(spark.sql("SELECT count(*) FROM g.db.wap")
      .head().getLong(0) === 5L)
    spark.sql("DROP TABLE g.db.wap")
  }

  test("streaming foreachBatch drives SQL MERGE INTO the catalog table; replay is idempotent") {
    // The CDC apply loop through the SQL DML route (CdcEndToEndSpec
    // pins the ManifestSink.merge route): a micro-batched upsert feed
    // applied by MERGE INTO per batch. Pure-upsert MERGE is naturally
    // idempotent, so a re-delivered batch (the at-least-once case a
    // foreachBatch sink must survive) leaves the table unchanged.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("DROP TABLE IF EXISTS g.db.tgt")
    spark.sql("CREATE TABLE g.db.tgt (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO g.db.tgt VALUES (1, 10), (2, 20)")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val mergeSql =
      """MERGE INTO g.db.tgt t USING merge_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin
    val q = in.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.createOrReplaceTempView("merge_src")
        batch.sparkSession.sql(mergeSql)
        ()
      }.start()
    try {
      in.addData((2L, 99L), (3L, 30L))
      q.processAllAvailable()
    } finally q.stop()
    def state() = spark.sql("SELECT k, v FROM g.db.tgt ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(state() === Seq((1L, 10L), (2L, 99L), (3L, 30L)))
    // epoch re-delivery: the SAME batch merged again changes nothing
    Seq((2L, 99L), (3L, 30L)).toDF("k", "v")
      .createOrReplaceTempView("merge_src")
    spark.sql(mergeSql)
    assert(state() === Seq((1L, 10L), (2L, 99L), (3L, 30L)))
    spark.sql("DROP TABLE g.db.tgt")
  }

  test("ALTER TABLE DROP COLUMN is metadata-only; time travel keeps the old shape") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.dc (k BIGINT, junk STRING, v BIGINT)")
    spark.sql("INSERT INTO g.db.dc VALUES (1, 'x', 10), (2, 'y', 20)")  // v1
    val wh = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dataBefore = Option(new java.io.File(s"$wh/db/dc").listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(ManifestSink.DataSuffix))
      .map(f => f.getName -> f.lastModified()).toMap
    spark.sql("ALTER TABLE g.db.dc DROP COLUMN junk")                   // v2
    // dropped from the current shape...
    assert(spark.sql("SELECT * FROM g.db.dc").schema.fieldNames.toSeq
      === Seq("k", "v"))
    assert(spark.sql("SELECT sum(v) FROM g.db.dc").head().getLong(0)
      === 30L)
    // ...no data file touched...
    val dataAfter = Option(new java.io.File(s"$wh/db/dc").listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(ManifestSink.DataSuffix))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(dataAfter === dataBefore)
    // ...time travel reads the pre-drop snapshot in its OWN shape...
    val old = spark.sql("SELECT * FROM g.db.dc VERSION AS OF 1")
    assert(old.schema.fieldNames.toSeq === Seq("k", "junk", "v"))
    assert(old.count() === 2L)
    // ...appends after the drop interleave with pre-drop files
    spark.sql("INSERT INTO g.db.dc VALUES (3, 30)")
    assert(spark.sql("SELECT sum(k), sum(v) FROM g.db.dc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((6L, 60L)))
    // guard rails: unknown column, rename onto a live name refuse
    intercept[Exception] {
      spark.sql("ALTER TABLE g.db.dc DROP COLUMN nope") }
    intercept[Exception] {
      spark.sql("ALTER TABLE g.db.dc RENAME COLUMN v TO k") }
    spark.sql("DROP TABLE g.db.dc")
  }

  test("SQL metadata tables: SELECT from t.files and t.history, zero data files opened") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.mt (k BIGINT)")              // v0
    spark.sql("INSERT INTO g.db.mt VALUES (1), (2)")          // v1
    spark.sql("INSERT INTO g.db.mt VALUES (3)")               // v2
    val hist = spark.sql(
      "SELECT version, n_rows FROM g.db.mt.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hist === Seq((0L, 0L), (1L, 2L), (2L, 3L)))
    val files = spark.sql("SELECT file_name, rows FROM g.db.mt.files")
      .collect()
    assert(files.map(_.getLong(1)).sum === 3L)
    // a history row survives SQL composition (join against the data)
    assert(spark.sql(
      """SELECT count(*) FROM g.db.mt t
        |JOIN g.db.mt.history h ON h.version = 2""".stripMargin)
      .head().getLong(0) === 3L)
    // refs lists every named reference: base + branches + tags
    spark.sql("CALL g.system.create_branch('db.mt', 'b1')")
    spark.sql("CALL g.system.create_tag('db.mt', 't1')")
    val refs = spark.sql(
      "SELECT ref_name, ref_type, n_live FROM g.db.mt.refs " +
        "ORDER BY ref_type, ref_name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs.toSeq === Seq(("main", "base", 3L), ("b1", "branch", 3L),
      ("t1", "tag", 3L)))
    // the partitions metadata table: one row per live partition value
    // (unpartitioned table → a single NULL-spec row with full tallies)
    val parts = spark.sql(
      "SELECT pspec, part, n_files, n_rows, n_live FROM g.db.mt.partitions")
      .collect()
    assert(parts.length === 1)
    assert(parts(0).isNullAt(0) && parts(0).isNullAt(1))
    assert(parts(0).getLong(3) === 3L && parts(0).getLong(4) === 3L)
    // unknown metadata suffix on a real table is still no-such-table
    intercept[Exception] { spark.sql("SELECT * FROM g.db.mt.nope").collect() }
    spark.sql("DROP TABLE g.db.mt")
    intercept[Exception] {
      spark.sql("SELECT * FROM g.db.mt.history").collect() }
  }

  test("an open WAP branch survives base-chain vacuum: staged files stay referenced") {
    import org.apache.spark.sql.functions.col
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.bv (k BIGINT)")             // v0
    spark.sql("INSERT INTO g.db.bv VALUES (1)")              // v1
    spark.sql("INSERT INTO g.db.bv VALUES (2)")              // v2
    spark.sql("CALL g.system.create_branch('db.bv', 'open')")
    val wh = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$wh/db/bv"
    spark.range(10, 13).select(col("id").as("k"))
      .write.format("graft-manifest").option("branch", "open")
      .mode("append").save(dir)
    // zero-retention vacuum prunes every base archive + its orphans…
    spark.sql("CALL g.system.vacuum('db.bv', 0)")
    intercept[Exception] {
      spark.sql("SELECT * FROM g.db.bv VERSION AS OF 1").collect() }
    // …but the branch (and everything it stages OR carried from the
    // fork point) is still fully readable and publishable
    assert(spark.read.format("graft-manifest").option("branch", "open")
      .load(dir).agg(Map("k" -> "sum")).head().getLong(0)
      === 1L + 2L + 10L + 11L + 12L)
    spark.sql("CALL g.system.fast_forward('db.bv', 'open')")
    assert(spark.sql("SELECT count(*) FROM g.db.bv").head().getLong(0)
      === 5L)
    spark.sql("DROP TABLE g.db.bv")
  }

  test("CALL expire_snapshots drops by commit time, never the base or branch state") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.ex (k BIGINT)")          // v0
    spark.sql("INSERT INTO g.db.ex VALUES (1)")           // v1
    spark.sql("INSERT OVERWRITE g.db.ex VALUES (2)")      // v2 — v1's file
                                                          // now archive-only
    spark.sql("INSERT INTO g.db.ex VALUES (3)")           // v3
    val warehouse = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$warehouse/db/ex"
    // age the v0/v1 archives a day back; v2 stays fresh
    Seq(0L, 1L).foreach { v =>
      assert(new java.io.File(dir, s"_graft_manifest.v$v.json")
        .setLastModified(System.currentTimeMillis() - 86400000L))
    }
    spark.sql("CALL g.system.create_branch('db.ex', 'hold')")
    val cut = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now().minusSeconds(3600))
    val res = spark.sql(
      s"CALL g.system.expire_snapshots('db.ex', TIMESTAMP '$cut')")
      .head()
    assert(res.getLong(0) === 2L, "exactly the two aged archives expire")
    assert(res.getLong(1) >= 1L, "v1's orphaned data file is swept")
    // expired versions are gone; fresh ones and the base survive
    intercept[Exception] {
      spark.sql("SELECT * FROM g.db.ex VERSION AS OF 1").collect() }
    assert(spark.sql("SELECT k FROM g.db.ex VERSION AS OF 2")
      .head().getLong(0) === 2L)
    assert(spark.sql("SELECT sum(k) FROM g.db.ex").head().getLong(0) === 5L)
    // the open branch still reads everything it referenced
    assert(spark.read.format("graft-manifest").option("branch", "hold")
      .load(dir).agg(Map("k" -> "sum")).head().getLong(0) === 5L)
    spark.sql("CALL g.system.drop_branch('db.ex', 'hold')")
    spark.sql("DROP TABLE g.db.ex")
  }

  test("TIMESTAMP AS OF resolves through the monotonic commit clock") {
    import graft.sources.ManifestSink
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.tt (k BIGINT)")          // v0
    spark.sql("INSERT INTO g.db.tt VALUES (1)")           // v1
    spark.sql("INSERT INTO g.db.tt VALUES (2)")           // v2
    spark.sql("INSERT INTO g.db.tt VALUES (3)")           // v3
    val wh = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$wh/db/tt"
    // monotonic clock: stamps strictly increase even for
    // same-millisecond commits
    val stamps = (0L to 3L).map(ManifestSink.commitTimeOf(dir, _))
    assert(stamps == stamps.sorted && stamps.distinct == stamps,
      s"commit stamps must strictly increase: $stamps")
    val t2 = stamps(2)
    def sqlTs(ms: Long) = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(ms))
    // SQL TIMESTAMP AS OF at v2's instant sees exactly v1+v2
    assert(spark.sql(
      s"SELECT sum(k) FROM g.db.tt TIMESTAMP AS OF '${sqlTs(t2)}'")
      .head().getLong(0) === 3L)
    // one millisecond earlier sees only v1
    assert(spark.sql(
      s"SELECT sum(k) FROM g.db.tt TIMESTAMP AS OF '${sqlTs(t2 - 1)}'")
      .head().getLong(0) === 1L)
    // the option form takes raw millis too
    assert(spark.read.format("graft-manifest")
      .option("asOfTimestamp", t2.toString).load(dir)
      .agg(Map("k" -> "sum")).head().getLong(0) === 3L)
    // before history starts: refused loudly
    val early = intercept[Exception] {
      spark.read.format("graft-manifest")
        .option("asOfTimestamp", (stamps(0) - 10).toString).load(dir)
        .collect()
    }
    assert(early.getMessage.contains("history starts later"))
    // asOfVersion + asOfTimestamp is a contradiction
    val both = intercept[Exception] {
      spark.read.format("graft-manifest")
        .option("asOfVersion", "1")
        .option("asOfTimestamp", t2.toString).load(dir).collect()
    }
    assert(both.getMessage.contains("mutually exclusive"))
    spark.sql("DROP TABLE g.db.tt")
  }

  test("versionAt: pre-clock (stamp-free) snapshots are not timestamp-reachable") {
    import graft.sources.ManifestSink
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.pc (k BIGINT)")          // v0
    spark.sql("INSERT INTO g.db.pc VALUES (1)")           // v1
    spark.sql("INSERT INTO g.db.pc VALUES (2)")           // v2
    val wh = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$wh/db/pc"
    // simulate legacy archives written before the commit clock:
    // strip v0's and v1's committedAt fields in place
    def strip(name: String): Unit = {
      val f = new java.io.File(dir, name)
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath))
      java.nio.file.Files.write(f.toPath,
        txt.replaceAll("\"committedAt\"\\s*:\\s*\\d+,", "")
          .getBytes): Unit
    }
    strip("_graft_manifest.v0.json")
    strip("_graft_manifest.v1.json")
    val t2 = ManifestSink.commitTimeOf(dir, 2L)
    // at/after the stamped base: resolves to it
    assert(ManifestSink.versionAt(dir, t2) === 2L)
    // before the stamped base: the unstamped v1 archive must NOT be
    // resolved via its (archival-time) mtime — refused instead
    val e = intercept[IllegalArgumentException] {
      ManifestSink.versionAt(dir, t2 - 1)
    }
    assert(e.getMessage.contains("history starts later"))
    // a fully stamp-free chain is refused with the pre-clock message
    strip("_graft_manifest.json")
    val pre = intercept[IllegalArgumentException] {
      ManifestSink.versionAt(dir, System.currentTimeMillis())
    }
    assert(pre.getMessage.contains("predates the commit clock"))
    spark.sql("DROP TABLE g.db.pc")
  }

  test("CALL remove_orphans deletes only aged unreferenced files; dry_run reports without deleting") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.orf (k BIGINT)")
    spark.sql("INSERT INTO g.db.orf VALUES (1), (2)")
    val wh = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$wh/db/orf"
    val committed = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(graft.sources.ManifestSink.DataSuffix))
    // plant strays: one aged (failed commit), one fresh (in-flight)
    import java.nio.file.{Files, Paths}
    Files.copy(committed.head.toPath,
      Paths.get(dir, "stray-old.graftrows")): Unit
    assert(new java.io.File(dir, "stray-old.graftrows")
      .setLastModified(System.currentTimeMillis() - 86400000L))
    Files.copy(committed.head.toPath,
      Paths.get(dir, "stray-new.graftrows")): Unit
    val cut = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now().minusSeconds(3600))
    val dry = spark.sql("CALL g.system.remove_orphans('db.orf', " +
      s"TIMESTAMP '$cut', true)").head()
    assert(dry.getLong(0) === 1L, "dry run finds exactly the aged stray")
    assert(dry.getLong(1) === 0L, "dry run deletes nothing")
    assert(new java.io.File(dir, "stray-old.graftrows").exists())
    val real = spark.sql("CALL g.system.remove_orphans('db.orf', " +
      s"TIMESTAMP '$cut', false)").head()
    assert(real.getLong(0) === 1L && real.getLong(1) === 1L)
    assert(!new java.io.File(dir, "stray-old.graftrows").exists(),
      "aged orphan deleted")
    assert(new java.io.File(dir, "stray-new.graftrows").exists(),
      "fresh (in-flight) file survives the mtime guard")
    // referenced files were never candidates; the table reads intact
    assert(committed.forall(_.exists()))
    assert(spark.sql("SELECT sum(k) FROM g.db.orf").head().getLong(0) === 3L)
    spark.sql("DROP TABLE g.db.orf")
  }

  test("removeOrphans reports only what was actually deleted; a failed delete is found-but-not-removed") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.orf2 (k BIGINT)")
    spark.sql("INSERT INTO g.db.orf2 VALUES (1)")
    val wh = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$wh/db/orf2"
    val committed = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(ManifestSink.DataSuffix)).head
    val aged = System.currentTimeMillis() - 86400000L
    // a deletable stray, and an UNDELETABLE one: a non-empty DIRECTORY
    // whose name matches the data suffix — File.delete() fails on it
    java.nio.file.Files.copy(committed.toPath,
      java.nio.file.Paths.get(dir,
        "stray" + ManifestSink.DataSuffix)): Unit
    assert(new java.io.File(dir, "stray" + ManifestSink.DataSuffix)
      .setLastModified(aged))
    val undeletable = new java.io.File(dir,
      "stuck" + ManifestSink.DataSuffix)
    assert(undeletable.mkdir())
    assert(new java.io.File(undeletable, "child").createNewFile())
    assert(undeletable.setLastModified(aged))
    val cutoff = System.currentTimeMillis() - 3600000L
    val found = ManifestSink.removeOrphans(dir, cutoff, dryRun = true)
    assert(found.size === 2, s"dry run finds both strays: $found")
    assert(found.forall(!_._2), "dry run deletes nothing")
    val removed = ManifestSink.removeOrphans(dir, cutoff, dryRun = false)
    assert(removed.filter(_._2).map(_._1) ===
      Seq("stray" + ManifestSink.DataSuffix),
      "only the successful delete is reported removed")
    assert(removed.map(_._1).contains("stuck" + ManifestSink.DataSuffix),
      "the failed delete is still FOUND in the same single pass")
    assert(undeletable.exists(), "the failed delete is still on disk")
    // the procedure's counters derive from the same actuals
    val cut = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(cutoff))
    val res = spark.sql("CALL g.system.remove_orphans('db.orf2', " +
      s"TIMESTAMP '$cut', false)").head()
    assert(res.getLong(0) === 1L && res.getLong(1) === 0L,
      "the stuck orphan is found but reported NOT removed")
    assert(new java.io.File(undeletable, "child").delete())
    assert(undeletable.delete())
    spark.sql("DROP TABLE g.db.orf2")
  }

  test("commitTimeOf on a vacuumed/never-committed version fails with the standard message") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.cto (k BIGINT)")        // v0
    spark.sql("INSERT INTO g.db.cto VALUES (1)")         // v1
    val wh = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$wh/db/cto"
    graft.sources.ManifestSink.vacuum(dir, 0)            // drops v0 archive
    val e = intercept[IllegalArgumentException] {
      ManifestSink.commitTimeOf(dir, 0L)
    }
    assert(e.getMessage.contains("vacuumed or never committed"),
      s"friendly error expected, got: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      ManifestSink.commitTimeOf(dir, 99L)
    }
    assert(e2.getMessage.contains("vacuumed or never committed"))
    spark.sql("DROP TABLE g.db.cto")
  }

  test("parseAsOfTimestamp: session time zone, date-only form, graft-prefixed parse errors") {
    // millis pass through
    assert(ManifestSink.parseAsOfTimestamp("1700000000123") ===
      1700000000123L)
    // wall-clock strings resolve in the SESSION zone (same as the SQL
    // TIMESTAMP AS OF literal) — pin by flipping the session zone and
    // observing the resolved instant shift by the offset
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val utc = ManifestSink.parseAsOfTimestamp("2026-08-16 12:00:00")
      assert(utc === java.time.Instant.parse("2026-08-16T12:00:00Z")
        .toEpochMilli)
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ny = ManifestSink.parseAsOfTimestamp("2026-08-16 12:00:00")
      assert(ny - utc === 4L * 3600 * 1000,
        "EDT noon is 4h after UTC noon")
      // date-only means midnight of that day in the session zone
      assert(ManifestSink.parseAsOfTimestamp("2026-08-16") ===
        java.time.LocalDate.parse("2026-08-16")
          .atStartOfDay(java.time.ZoneId.of("America/New_York"))
          .toInstant.toEpochMilli)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
    val bad = intercept[IllegalArgumentException] {
      ManifestSink.parseAsOfTimestamp("not-a-time")
    }
    assert(bad.getMessage.startsWith("graft-manifest:"),
      s"wrapped error expected, got: ${bad.getMessage}")
  }

  test("concurrent commits to one table mint strictly distinct committedAt stamps") {
    val wh = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$wh/db/cc-race"
    assert(new java.io.File(dir).mkdirs())
    val stamps = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Boolean]())
    val version = new java.util.concurrent.atomic.AtomicLong(0L)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        (1 to 25).foreach { _ =>
          val s = ManifestSink.writeManifest(dir, ManifestSink.Manifest(
            "k BIGINT", Nil, version.incrementAndGet()))
          assert(stamps.add(s), s"duplicate committedAt $s minted")
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(stamps.size === 200,
      "8 writers x 25 commits => 200 unique stamps")
  }

  test("tags: create_tag pins a named snapshot against retention; reads resolve by name") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.tg (k BIGINT)")          // v0
    spark.sql("INSERT INTO g.db.tg VALUES (1), (2)")      // v1
    val tagged = spark.sql("CALL g.system.create_tag('db.tg', 'rel1')")
      .head().getLong(0)
    assert(tagged === 1L)
    spark.sql("INSERT OVERWRITE g.db.tg VALUES (9)")      // v2 — v1's
                                                          // file archive-only
    val warehouse = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$warehouse/db/tg"
    // zero-retention vacuum drops every archive — the tag must still
    // read the exact v1 state (tag docs pin their files)
    graft.sources.ManifestSink.vacuum(dir, 0)
    intercept[Exception] {
      spark.sql("SELECT * FROM g.db.tg VERSION AS OF 1").collect() }
    assert(spark.read.format("graft-manifest").option("tag", "rel1")
      .load(dir).agg(Map("k" -> "sum")).head().getLong(0) === 3L)
    // duplicate tag name is refused; unknown tag fails loudly
    intercept[Exception] {
      spark.sql("CALL g.system.create_tag('db.tg', 'rel1')").collect() }
    intercept[Exception] {
      spark.read.format("graft-manifest").option("tag", "nope")
        .load(dir).collect() }
    // tags are read-only: writes and streaming refuse the option
    intercept[Exception] {
      spark.range(1).selectExpr("id AS k")
        .write.format("graft-manifest").option("tag", "rel1")
        .mode("append").save(dir) }
    val q = spark.readStream.format("graft-manifest").option("tag", "rel1")
      .load(dir).writeStream.format("memory")
      .queryName("tag_stream_refused").start()
    // the refusal fires on the stream thread at first plan
    intercept[Exception] { q.processAllAvailable() }
    q.stop()
    // tag + asOfVersion / tag + branch are contradictions
    intercept[Exception] {
      spark.read.format("graft-manifest").option("tag", "rel1")
        .option("asOfVersion", 1).load(dir).collect() }
    // COUNT(*) pushdown answers from the tagged manifest
    assert(spark.read.format("graft-manifest").option("tag", "rel1")
      .load(dir).count() === 2L)
    // drop_tag: the name stops resolving; next vacuum sweeps the
    // now-unreferenced v1 file
    spark.sql("CALL g.system.drop_tag('db.tg', 'rel1')")
    intercept[Exception] {
      spark.read.format("graft-manifest").option("tag", "rel1")
        .load(dir).collect() }
    graft.sources.ManifestSink.vacuum(dir, 0)
    assert(spark.sql("SELECT sum(k) FROM g.db.tg").head().getLong(0) === 9L)
    spark.sql("DROP TABLE g.db.tg")
  }

  test("partition-spec evolution: SET TBLPROPERTIES swaps the default transform, old files keep theirs") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.pe (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO g.db.pe VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("ALTER TABLE g.db.pe SET TBLPROPERTIES " +
      "('partitionedBy' = 'identity(k)')")
    spark.sql("INSERT INTO g.db.pe VALUES (10, 'x'), (11, 'y')")
    // old files keep bucket(4,k), new files route identity(k) —
    // both visible in the files metadata table
    val specs = spark.sql("SELECT pspec FROM g.db.pe.files")
      .collect().map(_.getString(0)).toSet
    assert(specs.exists(_.startsWith("bucket")))
    assert(specs.exists(_.startsWith("identity")))
    // mixed layouts stay exact under pruned reads
    assert(spark.sql("SELECT count(*) FROM g.db.pe WHERE k = 10")
      .head().getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM g.db.pe").head().getLong(0) === 5L)
    // an unknown column is refused at ALTER time
    intercept[Exception] {
      spark.sql("ALTER TABLE g.db.pe SET TBLPROPERTIES " +
        "('partitionedBy' = 'identity(nope)')") }
    // UNSET clears the default: the next insert lands unpartitioned
    spark.sql("ALTER TABLE g.db.pe UNSET TBLPROPERTIES ('partitionedBy')")
    spark.sql("INSERT INTO g.db.pe VALUES (99, 'z')")
    val after = spark.sql("SELECT pspec FROM g.db.pe.files")
      .collect().map(_.getString(0))
    assert(after.exists(s => s == null || s.isEmpty),
      s"expected an unpartitioned entry, got ${after.mkString(",")}")
    assert(spark.sql("SELECT sum(k) FROM g.db.pe").head().getLong(0) === 126L)
    spark.sql("DROP TABLE g.db.pe")
  }

  test("RENAME COLUMN is metadata-only: values follow the field id, snapshots keep their names") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.rc (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO g.db.rc SELECT id, concat('s', id) FROM range(10)") // v1
    val warehouse = spark.conf.get("spark.sql.catalog.g.warehouse")
    val dir = s"$warehouse/db/rc"
    def dataFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(ManifestSink.DataSuffix))
    val mtimes = dataFiles.map(f => f.getName -> f.lastModified()).toMap
    spark.sql("ALTER TABLE g.db.rc RENAME COLUMN v TO label")          // v2
    // read-back resolves the old files' values under the new name
    assert(spark.sql("SELECT label FROM g.db.rc WHERE k = 3")
      .head().getString(0) === "s3")
    intercept[Exception] { spark.sql("SELECT v FROM g.db.rc").collect() }
    // old snapshots time-travel under their OWN name
    assert(spark.sql("SELECT v FROM g.db.rc VERSION AS OF 1 WHERE k = 3")
      .head().getString(0) === "s3")
    // post-rename appends mix with pre-rename files
    spark.sql("INSERT INTO g.db.rc VALUES (100, 'new')")
    assert(spark.sql(
      "SELECT count(*) FROM g.db.rc WHERE label IS NOT NULL")
      .head().getLong(0) === 11L)
    // rename CHAINS keep resolving (id is the identity, not the name)
    spark.sql("ALTER TABLE g.db.rc RENAME COLUMN label TO tag")
    assert(spark.sql("SELECT tag FROM g.db.rc WHERE k = 0")
      .head().getString(0) === "s0")
    assert(spark.sql("SELECT tag FROM g.db.rc WHERE k = 100")
      .head().getString(0) === "new")
    // …and not one data file was rewritten
    mtimes.foreach { case (n, t) =>
      val f = dataFiles.find(_.getName == n)
      assert(f.isDefined && f.get.lastModified() === t,
        s"rename must not touch data file $n")
    }
    spark.sql("DROP TABLE g.db.rc")
  }

  test("RENAME onto a previously-dropped name never resurrects the dropped values") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.rd (a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO g.db.rd SELECT id, id * 10 FROM range(5)")
    spark.sql("ALTER TABLE g.db.rd DROP COLUMN b")
    spark.sql("ALTER TABLE g.db.rd RENAME COLUMN a TO b")
    // 'b' must now be the surviving field's values (0..4) — resolving
    // by NAME against the old files would read the dropped id*10 blob
    assert(spark.sql("SELECT sum(b) FROM g.db.rd").head().getLong(0)
      === 10L)
    spark.sql("DROP TABLE g.db.rd")
  }

  test("equality deletes and zone pruning keep working across a rename") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.re (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO g.db.re SELECT id, CAST(id AS STRING) FROM range(10)")
    spark.sql("ALTER TABLE g.db.re RENAME COLUMN k TO id")
    // single-equality delete = eq-delete path, col recorded as 'id';
    // pre-rename files record 'k' — masking must resolve by field id
    spark.sql("DELETE FROM g.db.re WHERE id = 3")
    assert(spark.sql("SELECT count(*) FROM g.db.re").head().getLong(0)
      === 9L)
    assert(spark.sql("SELECT * FROM g.db.re WHERE id = 3").count() === 0L)
    // a live eq-delete created BEFORE a rename keeps masking after it
    spark.sql("ALTER TABLE g.db.re RENAME COLUMN id TO key")
    assert(spark.sql("SELECT count(*) FROM g.db.re").head().getLong(0)
      === 9L)
    spark.sql("DROP TABLE g.db.re")
  }

  test("DELETE string predicates with backslashes mask exactly the matching rows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.bs (k BIGINT, v STRING)")
    import spark.implicits._
    // row 1 holds the 4-char a,\,n,b; row 2 holds a,<newline>,b — the
    // pair an unescaped literal would conflate (parser turns \n into a
    // newline), silently deleting the WRONG row.
    Seq((1L, "a\\nb"), (2L, "a\nb"), (3L, "plain"))
      .toDF("k", "v").writeTo("g.db.bs").append()
    // compound predicate => positional-delete path (filtersToCondition)
    spark.sql("DELETE FROM g.db.bs WHERE v = 'a\\\\nb' AND k > 0")
    val left = spark.sql("SELECT k FROM g.db.bs ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(left === Seq(2L, 3L), "only the backslash row may vanish")
    spark.sql("DROP TABLE g.db.bs")
  }

  test("DELETE on a boolean column executes via delete vectors instead of failing") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.bdel (k BIGINT, b BOOLEAN)")
    spark.sql("INSERT INTO g.db.bdel SELECT id, id % 2 = 0 FROM range(10)")
    // BOOLEAN is outside deleteEq's canonicalizable set: the planner
    // must decline the eq-delete route and take the positional path,
    // not accept-then-throw.
    spark.sql("DELETE FROM g.db.bdel WHERE b = true")
    val rows = spark.sql("SELECT k, b FROM g.db.bdel").collect()
    assert(rows.length === 5)
    assert(rows.forall(!_.getBoolean(1)))
    spark.sql("DROP TABLE g.db.bdel")
  }

  test("namespace hygiene: duplicate create fails, non-empty drop needs cascade") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db2")
    intercept[Exception] { spark.sql("CREATE NAMESPACE g.db2") }
    spark.sql("CREATE TABLE g.db2.x (k BIGINT)")
    intercept[Exception] { spark.sql("DROP NAMESPACE g.db2") }
    spark.sql("DROP NAMESPACE g.db2 CASCADE")
    intercept[Exception] { spark.sql("SHOW TABLES IN g.db2").collect() }
  }
}
