package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the session's graph / time-series additions:
  * - k-core peel (DedupOps.kcorePeel): pendant structure peels away,
  *   dense structure survives — on a corpus where the answer is
  *   provable by hand.
  * - ts_holt (TsOps.holtSql): the smoothing chain is exact on a
  *   constant series (s1 = s2 = v ⇒ level = v, trend = 0,
  *   forecast = v) — the fixed point that catches any weight or
  *   renormalization slip in the generated SQL.
  */
class GraphTsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  test("kcorePeel: pendant chain peels away, triangle survives") {
    // triangle 1-2-3 plus a pendant chain 3-4-5-6 hanging off it.
    val undirected =
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val sym = (undirected ++ undirected.map(_.swap))
      .toDF("u", "v")
    val surviving = graft.ops.DedupOps
      .kcorePeel(sym, k = 2, rounds = 3)
      .select(col("u")).distinct().as[Long].collect().toSet
    // chain tip 6 has degree 1 → peels round 1; then 5, then 4.
    // The triangle nodes keep degree 2 among themselves forever.
    assert(surviving == Set(1L, 2L, 3L))
  }

  test("kcorePeel: a 4-clique is untouched at k = 2") {
    val nodes = (1L to 4L)
    val undirected = for {
      a <- nodes; b <- nodes if a < b
    } yield (a, b)
    val sym = (undirected ++ undirected.map(_.swap)).toDF("u", "v")
    val out = graft.ops.DedupOps.kcorePeel(sym, k = 2, rounds = 3)
    assert(out.count() == undirected.size * 2L)
  }

  test("ts_acf: alternating series hits the exact closed form") {
    // x = +a, −a, +a, … ⇒ integer mean 0, deviations alternate ±a:
    // Σd·d1 = −(n−1)a², Σd² = n·a² ⇒ acf1_pm = (−(n−1)·1000) div n;
    // lag 2 is +(n−2)/n, lag 3 −(n−3)/n. n = 20 ⇒ −950, +900, −850.
    val rows = (1L to 20L).map(i =>
      (11L, i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        "view", if (i % 2 == 1) 7.0 else -7.0, "{}"))
    val df = rows.toDF("user_id", "event_id", "ts", "event_type",
      "value", "props")
    df.write.mode("overwrite")
      .parquet("/tmp/graphts_acf/events.parquet")
    val out = graft.SparkEntry.queries("ts_acf")(spark, "/tmp/graphts_acf")
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("acf1_pm") == -950L)
    assert(r.getAs[Long]("acf2_pm") == 900L)
    assert(r.getAs[Long]("acf3_pm") == -850L)
  }

  test("ts_spearman: monotone series score exactly ±1000") {
    // strictly increasing ⇒ ranks equal ⇒ Σd² = 0 ⇒ ρ = 1000;
    // strictly decreasing ⇒ Σd² = n(n²−1)/3 ⇒ ρ = −1000 exactly.
    val rows =
      (1L to 15L).map(i =>
        (1L, i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          "view", i * 1.25, "{}")) ++
      (1L to 15L).map(i =>
        (2L, i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          "view", (16 - i) * 1.25, "{}"))
    rows.toDF("user_id", "event_id", "ts", "event_type", "value",
        "props")
      .write.mode("overwrite")
      .parquet("/tmp/graphts_spear/events.parquet")
    val out = graft.SparkEntry
      .queries("ts_spearman")(spark, "/tmp/graphts_spear")
      .collect().map(r =>
        r.getAs[Long]("user_id") -> r.getAs[Long]("rho_milli")).toMap
    assert(out(1L) == 1000L)
    assert(out(2L) == -1000L)
  }

  test("ts_holt generated SQL: constant series is a fixed point") {
    // 20 events, single user, constant value 3.14 → v_fp = 31400.
    val rows = (1L to 20L).map(i =>
      (7L, i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        "view", 3.14, "{}"))
    rows.toDF("user_id", "event_id", "ts", "event_type", "value",
        "props")
      .createOrReplaceTempView("events_holt_spec")
    val out = spark.sql(graft.ops.TsOps.holtSql("div", "events_holt_spec"))
      .select(col("s1"), col("s2"), col("level_fp"), col("trend_fp"),
        col("forecast_fp"))
      .collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getLong(0) == 31400L, "s1")
      assert(r.getLong(1) == 31400L, "s2")
      assert(r.getLong(2) == 31400L, "level")
      assert(r.getLong(3) == 0L, "trend")
      assert(r.getLong(4) == 31400L, "forecast")
    }
  }
}
