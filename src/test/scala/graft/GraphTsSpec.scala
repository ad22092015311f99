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

  test("ts_holt generated SQL: constant series is a fixed point") {
    // 20 events, single user, constant value 3.14 → v_fp = 31400.
    val rows = (1L to 20L).map(i =>
      (7L, i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        "view", 3.14, "{}"))
    rows.toDF("user_id", "event_id", "ts", "event_type", "value",
        "props")
      .createOrReplaceTempView("events")
    val out = spark.sql(graft.ops.TsOps.holtSql("div"))
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
