package graft.streaming

import graft.LocalSpark
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._
import org.scalatest.funsuite.AnyFunSuite

/** One emission per key per micro-batch: running totals + the bounded
  * top-3 list. NOT private — janino's generated projection can't
  * access private encoders' classes (repo gotcha). */
case class TwsUpdate(user: Long, nEvents: Long, sumCents: Long,
  top3: Seq[Long])

/** Per-user running aggregate on the Spark 4 arbitrary-state API:
  * two ValueStates (count, sum) plus a ListState bounded to the top-3
  * values (order-insensitive, so within-batch row order can't flake
  * the pin). The custom-state successor to mapGroupsWithState — this
  * is the shape a CDC enrichment cache or an online feature store
  * materializer takes at scale: state partitioned by key across
  * executors, RocksDB-backed, changelog-checkpointed.
  */
class RunningUserAgg extends StatefulProcessor[Long, (Long, Long), TwsUpdate] {
  @transient private var count: ValueState[Long] = _
  @transient private var cents: ValueState[Long] = _
  @transient private var top: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
      TTLConfig.NONE)
    cents = getHandle.getValueState[Long]("cents", Encoders.scalaLong,
      TTLConfig.NONE)
    top = getHandle.getListState[Long]("top", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timers: TimerValues): Iterator[TwsUpdate] = {
    var n = if (count.exists()) count.get() else 0L
    var s = if (cents.exists()) cents.get() else 0L
    rows.foreach { case (_, v) =>
      n += 1; s += v
      top.appendValue(v)
    }
    val keep = top.get().toSeq.sorted.takeRight(3)
    top.put(keep.toArray)
    count.update(n)
    cents.update(s)
    Iterator.single(TwsUpdate(key, n, s, keep))
  }
}

/** Pins the Spark 4 `transformWithState` arbitrary-state operator
  * end-to-end on the RocksDB state store (the only provider the API
  * supports): value + list state carried across micro-batches, one
  * update emitted per touched key per batch.
  */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  test("transformWithState carries value+list state across micro-batches " +
      "on the RocksDB store") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Long)]
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new RunningUserAgg, TimeMode.None(),
          OutputMode.Update())
      val q = out.writeStream.format("memory").queryName("tws")
        .outputMode("update").start()
      input.addData((1L, 10L), (1L, 5L), (2L, 7L))
      q.processAllAvailable()
      input.addData((1L, 1L), (3L, 2L), (1L, 4L))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws").as[TwsUpdate].collect().toSeq
      val last = rows.groupBy(_.user).map { case (u, rs) =>
        u -> rs.maxBy(_.nEvents) }
      // user 1: batch 1 state (2, 15) carried into batch 2 → (4, 20)
      assert(rows.filter(_.user == 1L).map(_.nEvents).sorted == Seq(2L, 4L))
      assert(last(1L).sumCents == 20L)
      // list state bounded to top-3 across batches: {10,5,1,4} → [4,5,10]
      assert(last(1L).top3 == Seq(4L, 5L, 10L))
      // untouched-in-batch-2 key keeps its batch-1 emission only
      assert(last(2L).nEvents == 1L && last(2L).sumCents == 7L)
      assert(last(3L).nEvents == 1L && last(3L).sumCents == 2L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
