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

  test("namespace hygiene: duplicate create fails, non-empty drop needs cascade") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db2")
    intercept[Exception] { spark.sql("CREATE NAMESPACE g.db2") }
    spark.sql("CREATE TABLE g.db2.x (k BIGINT)")
    intercept[Exception] { spark.sql("DROP NAMESPACE g.db2") }
    spark.sql("DROP NAMESPACE g.db2 CASCADE")
    intercept[Exception] { spark.sql("SHOW TABLES IN g.db2").collect() }
  }
}
