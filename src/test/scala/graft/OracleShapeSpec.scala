package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Structural guard for the driver's DuckDB-oracle compare: its pandas
  * canonicalizer hashes every result cell, and an `array<...>` /
  * `map<...>` / nested-struct cell is unhashable — the whole query
  * ERRORs out of the correctness report (round 5 shipped four such
  * queries believing them green). Any oracle-registered query must
  * therefore emit only flat scalar columns; list-valued results are
  * serialized with array_join / string_agg on BOTH engine and oracle
  * sides (the agg_collect / fn_array_set convention). This spec makes
  * that class of regression impossible to reintroduce: it analyzes
  * (never executes) every oracle-registered query and fails naming
  * the offending column.
  */
class OracleShapeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = LocalSpark.spark

  test("no oracle-registered query emits array/map/struct output columns") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sf).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"complex-typed output columns break the driver's oracle hash — " +
        s"serialize with array_join: ${offenders.mkString(", ")}")
  }

  test("sma crossover signals strictly alternate golden/death per user") {
    // A crossover is a SIGN CHANGE by definition — two consecutive
    // signals of the same direction for one user mean the detector
    // re-fired without the fast mean ever crossing back.
    val rows = SparkEntry.queries("win_sma_crossover")(spark, sf)
      .select("user_id", "event_id", "signal").collect()
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val sigs = rs.sortBy(_.getLong(1)).map(_.getString(2)).toSeq
      sigs.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a != b, s"user $u fired $a twice in a row")
        case _ => ()
      }
    }
  }

  test("adaptive sessionization partitions each user's events exactly") {
    val out = SparkEntry.queries("ts_sessionize")(spark, sf)
      .select("user_id", "session_no", "n_events", "duration_us")
      .collect()
    // totality: session sizes sum to the event count, nothing dropped
    val total = out.map(_.getLong(2)).sum
    assert(total === graft.Tables(spark, sf, "events").count())
    out.foreach(r => assert(r.getLong(3) >= 0L))
    // numbering is dense from 1 within each user (the running
    // break-sum can neither skip nor repeat a session id)
    out.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val ids = rs.map(_.getLong(1)).sorted.toSeq
      assert(ids === (1L to ids.length).toSeq,
        s"user $u sessions not dense: $ids")
    }
  }

  test("every oracle entry has a registered query and vice-versa coverage " +
    "is declared") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle SQL without a query: $missing")
  }
}
