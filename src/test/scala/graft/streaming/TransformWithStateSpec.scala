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

/** Session-close record emitted by the timer path only. */
case class SessionClose(user: Long, nEvents: Long, closedAtMs: Long)

/** Event-time SESSION tracking on timers: each key keeps an event
  * count and re-arms one event-time timer at (max event ts + gap) as
  * events arrive (old timer deleted — at most one armed per key);
  * when the WATERMARK passes the armed expiry, `handleExpiredTimer`
  * emits the close record and clears all state. This is the timer
  * third of the arbitrary-state API (state, timers, TTL) — the shape
  * of a CDC session cache or an online-feature staleness evictor:
  * state is dropped by watermark progress, not by traffic on the key.
  */
class SessionOnTimers(gapMs: Long)
    extends StatefulProcessor[Long, (Long, java.sql.Timestamp), SessionClose] {
  @transient private var n: ValueState[Long] = _
  @transient private var armed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, java.sql.Timestamp)],
      timers: TimerValues): Iterator[SessionClose] = {
    var cnt = if (n.exists()) n.get() else 0L
    var maxTs = Long.MinValue
    rows.foreach { case (_, ts) =>
      cnt += 1; maxTs = math.max(maxTs, ts.getTime) }
    n.update(cnt)
    val expiry = maxTs + gapMs
    if (armed.exists()) {
      val prev = armed.get()
      if (expiry > prev) { getHandle.deleteTimer(prev) }
      else { return Iterator.empty } // keep the later of the two
    }
    getHandle.registerTimer(expiry)
    armed.update(expiry)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[SessionClose] = {
    val out = SessionClose(key, if (n.exists()) n.get() else 0L,
      expired.getExpiryTimeInMs)
    n.clear(); armed.clear()
    Iterator.single(out)
  }
}

/** Per-key map snapshot after each batch; counts rendered as sorted
  * "etype:n" strings so assertion order is stable. */
case class TypeCounts(user: Long, counts: Seq[String])

/** MapState + INITIAL STATE: per-user per-event-type counters
  * warm-started from a batch snapshot Dataset — the CDC bootstrap
  * shape (batch `cdc_snapshot_latest` result seeds the stream state,
  * then the live stream continues from it, no reprocessing of
  * history). `handleInitialState` is invoked once per initial-state
  * row BEFORE any input; "-etype" inputs exercise `removeKey`.
  */
class CountsFromSnapshot extends StatefulProcessorWithInitialState[
    Long, (Long, String), TypeCounts, (Long, String, Long)] {
  @transient private var m: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    m = getHandle.getMapState[String, Long]("m", Encoders.STRING,
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInitialState(key: Long, initial: (Long, String, Long),
      timers: TimerValues): Unit =
    m.updateValue(initial._2, initial._3)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      timers: TimerValues): Iterator[TypeCounts] = {
    rows.foreach { case (_, et) =>
      if (et.startsWith("-")) m.removeKey(et.drop(1))
      else m.updateValue(et,
        (if (m.containsKey(et)) m.getValue(et) else 0L) + 1L)
    }
    Iterator.single(TypeCounts(key,
      m.iterator().map { case (k, v) => s"$k:$v" }.toSeq.sorted))
  }
}

/** As-of join emission: the trade plus the latest quote px at-or-
  * before its timestamp (px = -1 when no quote precedes it). */
case class AsofOut(user: Long, tradeTs: Long, qty: Long, px: Long)

/** Stream-stream AS-OF join via arbitrary state — the operator
  * Structured Streaming lacks natively (its interval join needs a
  * two-sided bound; as-of wants "LATEST quote ≤ trade ts"): quotes
  * and trades arrive as ONE tagged union keyed by user; each key
  * keeps its quote book in a ListState (entries packed ts·10⁶+px),
  * trades probe the book for the max quote ts ≤ trade ts. Join
  * knowledge is as-of ARRIVAL (a quote arriving later than a trade
  * was emitted does not retro-update that trade, but IS visible to
  * every later trade — the standard streaming as-of contract, same
  * as the batch `join_asof` run incrementally). At scale the book
  * per key is bounded by quote retention, state lives partitioned on
  * the RocksDB store.
  */
class StreamAsofJoin
    extends StatefulProcessor[Long, (Long, String, Long, Long), AsofOut] {
  @transient private var book: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    book = getHandle.getListState[Long]("book", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, String, Long, Long)],
      timers: TimerValues): Iterator[AsofOut] = {
    // within a batch, process in event order (quotes before trades at
    // equal ts) so same-batch quotes are visible to same-batch trades
    val batch = rows.toSeq.sortBy(r => (r._3, if (r._2 == "q") 0 else 1))
    var entries = book.get().toSeq
    val out = Seq.newBuilder[AsofOut]
    batch.foreach {
      case (_, "q", ts, px) => entries = entries :+ (ts * 1000000L + px)
      case (_, _, ts, qty) =>
        val best = entries.filter(_ / 1000000L <= ts)
        out += AsofOut(key, ts, qty,
          if (best.isEmpty) -1L else best.max % 1000000L)
    }
    book.put(entries.toArray)
    out.result().iterator
  }
}

/** Pins the Spark 4 `transformWithState` arbitrary-state operator
  * end-to-end on the RocksDB state store (the only provider the API
  * supports): value + list state carried across micro-batches, one
  * update emitted per touched key per batch.
  */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  test("stream-stream AS-OF join via transformWithState: each trade joins " +
      "the latest quote at-or-before it, across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, String, Long, Long)]
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new StreamAsofJoin, TimeMode.None(),
          OutputMode.Append())
      val q = out.writeStream.format("memory").queryName("tws_asof")
        .outputMode("append").start()
      // batch 1: quotes at ts 10 (px 100) and 20 (px 110); a trade at
      // 15 sees only the ts-10 quote; a trade at 5 precedes every
      // quote
      input.addData((1L, "q", 10L, 100L), (1L, "q", 20L, 110L),
        (1L, "t", 15L, 5L), (1L, "t", 5L, 9L))
      q.processAllAvailable()
      // batch 2: a LATE quote at ts 12 joins the persisted book and is
      // visible to the later trades; trade at 25 takes the ts-20 quote,
      // trade at 13 takes the late ts-12 quote
      input.addData((1L, "q", 12L, 105L), (1L, "t", 25L, 7L),
        (1L, "t", 13L, 2L))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_asof").as[AsofOut].collect()
        .map(r => (r.tradeTs, r.qty, r.px)).toSet
      assert(rows === Set((15L, 5L, 100L), (5L, 9L, -1L),
        (25L, 7L, 110L), (13L, 2L, 105L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

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

  test("MapState warm-starts from a batch snapshot via initial state, " +
      "then the stream continues from it") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      // the batch snapshot a CDC materialization would have produced
      val snapshot = Seq((1L, "click", 5L), (1L, "buy", 2L),
          (3L, "view", 9L))
        .toDS().groupByKey(_._1)
      val input = MemoryStream[(Long, String)]
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new CountsFromSnapshot, TimeMode.None(),
          OutputMode.Update(), snapshot)
      val q = out.writeStream.format("memory").queryName("tws_init")
        .outputMode("update").start()
      input.addData((1L, "click"), (2L, "buy"))
      q.processAllAvailable()
      input.addData((1L, "-buy"), (3L, "view"))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_init").as[TypeCounts].collect()
      val last = rows.groupBy(_.user).map { case (u, rs) =>
        u -> rs.last.counts }
      // warm-started 5 + 1 live click; removeKey dropped buy in b2
      // (set-compare: memory-sink row order across batches is not
      // contractual)
      assert(rows.filter(_.user == 1L).map(_.counts).toSet ==
        Set(Seq("buy:2", "click:6"), Seq("click:6")))
      // no initial state for key 2: counts start at zero
      assert(last(2L) == Seq("buy:1"))
      // initial state on a key first touched in batch 2 still applies
      assert(last(3L) == Seq("view:10"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("event-time timers close sessions when the watermark passes the " +
      "armed expiry, and expiry clears state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      val input = MemoryStream[(Long, java.sql.Timestamp)]
      val out = input.toDS()
        .withWatermark("_2", "10 seconds")
        .groupByKey(_._1)
        .transformWithState(new SessionOnTimers(gapMs = 30000L),
          TimeMode.EventTime(), OutputMode.Update())
      val q = out.writeStream.format("memory").queryName("tws_timers")
        .outputMode("update").start()
      // sessions: key 1 events at 10 s, 20 s (expiry 50 s);
      // key 2 at 12 s (expiry 42 s)
      input.addData((1L, ts(10)), (1L, ts(20)), (2L, ts(12)))
      q.processAllAvailable()
      // (9,100 s) advances the watermark to 90 s; the engine's
      // trailing no-data batch then fires the armed timers for keys 1
      // (expiry 50 s) and 2 (42 s). Key 9's own timer (130 s) survives.
      input.addData((9L, ts(100)))
      q.processAllAvailable()
      val mid = spark.table("tws_timers").as[SessionClose].collect()
      assert(mid.map(c => c.user -> ((c.nEvents, c.closedAtMs))).toMap ==
        Map(1L -> ((2L, 50000L)), 2L -> ((1L, 42000L))))
      // a second event for 9 at 200 s RE-ARMS its timer 130 s → 230 s
      // (wm during the batch is 90 s, so 130 hasn't fired); wm then
      // reaches 190 s < 230 s — still pending
      input.addData((9L, ts(200)))
      q.processAllAvailable()
      assert(spark.table("tws_timers").count() == 2)
      // wm passes 230 s → key 9 closes ONCE with the merged count
      input.addData((8L, ts(300)))
      q.processAllAvailable()
      q.stop()
      val all = spark.table("tws_timers").as[SessionClose].collect()
      val nine = all.filter(_.user == 9L)
      assert(nine.length == 1 && nine.head.nEvents == 2L &&
        nine.head.closedAtMs == 230000L)
      // a fired timer cleared its state: no second close for 1 or 2
      assert(all.count(_.user == 1L) == 1 && all.count(_.user == 2L) == 1)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
