package graft.streaming

import graft.{LocalSpark, SparkEntry, Tables}
import graft.streaming.ScdHistoryStream.{history, Change}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the streaming SCD2 maintenance operator (ScdHistoryStream)
  * against the batch `cdc_scd2` query on the SAME replayed log: the
  * last emission per (key, version) must equal the batch history row
  * for row, whatever the micro-batch boundaries — and a stale replay
  * of an already-applied prefix must change nothing. This is the
  * incremental-view-maintenance contract: stream the log once and the
  * warehouse history is ALWAYS the batch recompute's answer.
  */
class ScdHistoryStreamSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = LocalSpark.spark

  private type Row7 = (Long, Long, String, Double, Int, Option[Long], Boolean)

  private lazy val changes: Seq[Change] =
    Tables(spark, sf, "events")
      .select(col("user_id").cast("int"), col("event_id"),
        col("event_type"), col("value"))
      .orderBy(col("event_id"))
      .collect()
      .map(r => Change(r.getInt(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
      .toSeq

  /** Batch truth: the cdc_scd2 query over the same table. */
  private lazy val batchHistory: Set[Row7] =
    SparkEntry.queries("cdc_scd2")(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getInt(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getBoolean(6))
    }.toSet

  /** Run the stream over the given micro-batch split and resolve the
    * final history: per (key, version) the closed emission wins over
    * the open one (order-free — no reliance on sink row order). */
  private def runStream(batches: Seq[Seq[Change]], name: String): Set[Row7] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Change]
    val q = history(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect()
      .map { r =>
        ((r.getInt(0).toLong, r.getInt(4)),
          (r.getInt(0).toLong, r.getLong(1), r.getString(2),
            r.getDouble(3), r.getInt(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5)),
            r.getBoolean(6)))
      }
      .groupBy(_._1)
      .map { case (_, rows) =>
        rows.map(_._2).find(_._6.isDefined).getOrElse(rows.head._2)
      }
      .toSet
  }

  test("streaming SCD2 equals batch cdc_scd2 over an unevenly split replay") {
    val (a, rest) = changes.splitAt(changes.size / 5)
    val (b, c) = rest.splitAt(rest.size / 2)
    val streamed = runStream(Seq(a, b, c), "scd2_stream_3b")
    assert(streamed == batchHistory,
      s"stream/batch diverge: ${(streamed -- batchHistory).take(3)} vs " +
        s"${(batchHistory -- streamed).take(3)}")
  }

  test("micro-batch boundaries cannot change the history (1 batch == 3)") {
    val oneShot = runStream(Seq(changes), "scd2_stream_1b")
    assert(oneShot == batchHistory)
  }

  test("stale replay of an already-applied prefix changes nothing") {
    val (a, rest) = changes.splitAt(changes.size / 3)
    val streamed = runStream(Seq(a, rest, a), "scd2_stream_replay")
    assert(streamed == batchHistory)
  }
}
