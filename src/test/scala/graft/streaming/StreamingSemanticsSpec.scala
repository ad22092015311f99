package graft.streaming

import graft.LocalSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Structured Streaming semantics that have no batch oracle
  * (SURVEY.md §2.2 `stream_watermark`, `stream_foreach_sink`; §5.2-3):
  * watermark late-data drop, stateful dedup, and foreachBatch
  * delivery — the `<-chan Event` consumer analogue.
  */
class StreamingSemanticsSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermark drops late events from windowed aggregation") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_agg")
      .outputMode("append").start()
    // batch 1: events at 10:00-10:09 and 10:12; watermark advances to 10:02
    input.addData((ts(0), 1L), (ts(5), 2L), (ts(9), 3L), (ts(12), 4L))
    q.processAllAvailable()
    // batch 2: push watermark far ahead so the 10:00 window finalizes
    input.addData((ts(40), 5L))
    q.processAllAvailable()
    // batch 3: a LATE event for the already-finalized 10:00 window
    input.addData((ts(1), 99L))
    q.processAllAvailable()
    // batch 4: advance watermark past everything to flush remaining state
    input.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 6L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_agg")
      .select(col("window.start").cast("string").as("w"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the 10:00 window counted exactly the 3 on-time events — the
    // late id=99 event was dropped, not double-counted
    assert(out("2024-01-01 10:00:00") == 3L)
    assert(out("2024-01-01 10:10:00") == 1L)
  }

  test("stream-static join: each micro-batch enriches against the batch dim, " +
      "unmatched keys pass a left join with nulls") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The streaming fact → broadcast dimension enrichment every
    // CDC-fed pipeline runs at ingest: the static side is planned per
    // micro-batch (broadcast hash join), no stream state at all.
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "tier")
    val input = MemoryStream[(Timestamp, Long, Long)]
    val joined = input.toDF().toDF("ts", "cust_id", "amount")
      .join(broadcast(dim), Seq("cust_id"), "left_outer")
    val q = joined.writeStream.format("memory").queryName("ss_enrich")
      .outputMode("append").start()
    input.addData((ts(0), 1L, 10L), (ts(1), 3L, 30L))
    q.processAllAvailable()
    input.addData((ts(2), 2L, 20L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ss_enrich")
      .select(col("cust_id"), col("amount"), col("tier"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    // both batches enriched; the unknown key 3 survived with a null
    // tier (left join) instead of being dropped
    assert(out == Set((1L, 10L, Some("gold")), (3L, 30L, None),
      (2L, 20L, Some("silver"))))
    // batch equivalence: same join as a plain batch frame
    val batch = Seq((ts(0), 1L, 10L), (ts(1), 3L, 30L), (ts(2), 2L, 20L))
      .toDF("ts", "cust_id", "amount")
      .join(broadcast(dim), Seq("cust_id"), "left_outer")
      .select(col("cust_id"), col("amount"), col("tier"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    assert(out == batch)
  }

  test("stream-stream join: time-bounded inner join emits matched pairs, watermark bounds state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // clicks joined to purchases of the same user within [0, 10 min]
    // after the click — both sides watermarked so Spark can bound the
    // join state instead of buffering each side forever.
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user", "click_id")
      .withWatermark("c_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_ts", "p_user", "purchase_id")
      .withWatermark("p_ts", "10 minutes")
    val joined = c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("purchase_id"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    clicks.addData((ts(0), 1L, 100L), (ts(2), 2L, 101L))
    purchases.addData((ts(5), 1L, 200L))       // matches click 100
    q.processAllAvailable()
    purchases.addData((ts(20), 2L, 201L))      // outside click 101's window
    purchases.addData((ts(3), 3L, 202L))       // no click for user 3
    clicks.addData((ts(30), 4L, 102L))
    purchases.addData((ts(35), 4L, 203L))      // matches click 102
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 200L), (102L, 203L)),
      s"only in-window same-user pairs join, got $got")
  }

  test("stream-stream LEFT OUTER join: matches emit eagerly, unmatched " +
      "left rows null-emit only after the watermark closes their window") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // Outer semantics on an unbounded stream need the watermark to
    // PROVE a row can no longer match before emitting it with nulls —
    // too early would be wrong (a match may still arrive), never would
    // leak state. Pin both halves: the matched pair emits in its own
    // batch; the unmatched click is withheld until min(watermarks)
    // passes click_ts + join window, then emits exactly once, nulls on
    // the right.
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user", "click_id")
      .withWatermark("c_ts", "5 minutes")
    val p = purchases.toDF().toDF("p_ts", "p_user", "purchase_id")
      .withWatermark("p_ts", "5 minutes")
    val joined = c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 5 MINUTES"),
      "leftOuter")
      .select(col("click_id"), col("purchase_id"))
    val q = joined.writeStream.format("memory").queryName("ss_left_join")
      .outputMode("append").start()
    clicks.addData((ts(0), 1L, 100L), (ts(1), 2L, 101L)) // 101 never matches
    purchases.addData((ts(3), 1L, 200L))                 // matches click 100
    q.processAllAvailable()
    def collected(): Set[(Long, Option[Long])] =
      spark.table("ss_left_join").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    val early = collected()
    assert(early == Set((100L, Some(200L))),
      s"only the matched pair may emit while 101's window is open: $early")
    // Advance BOTH watermarks far past click 101's window close
    // (1 + 5 join window + 5 delay < 30 - 5), then run one more batch
    // so the state eviction that null-emits 101 executes.
    clicks.addData((ts(30), 9L, 900L))
    purchases.addData((ts(30), 8L, 901L))
    q.processAllAvailable()
    clicks.addData((ts(31), 9L, 902L))
    purchases.addData((ts(31), 8L, 903L))
    q.processAllAvailable()
    q.stop()
    val got = collected()
    assert(got.contains((101L, None)),
      s"unmatched click must null-emit after the watermark: $got")
    assert(got.count(_._1 == 101L) == 1, s"exactly once: $got")
    assert(!got.contains((100L, None)),
      s"a matched row must never also null-emit: $got")
  }

  test("stateful dropDuplicates emits each key once across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("event_id", "payload")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    input.addData((1L, "a"), (2L, "b"), (1L, "a-dup-in-batch"))
    q.processAllAvailable()
    input.addData((2L, "b-dup-across-batch"), (3L, "c"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("session windows merge within the gap and split across it, per key") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Int)]
    val agg = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("session_stream")
      .outputMode("append").start()
    // user 1: events at 10:00, 10:03, 10:06 chain into ONE session
    // (each within 5 min of the previous); 10:20 starts a second.
    // user 2: single event, its own session.
    // user 3: events at EXACTLY the 5-min gap (10:00, 10:05) — Spark
    // merges at the inclusive boundary (session end is last+gap and
    // touching sessions combine); the stream_session oracle's
    // strictly-greater break condition mirrors this.
    input.addData((ts(0), 1), (ts(3), 1), (ts(6), 1), (ts(20), 1),
      (ts(0), 2), (ts(0), 3), (ts(5), 3))
    q.processAllAvailable()
    // advance the watermark far enough to finalize and emit everything
    input.addData((Timestamp.valueOf("2024-01-01 11:30:00"), 9))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("session_stream")
      .select(col("user_id"), col("session_window.start").cast("string"),
        col("n"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out.contains((1, "2024-01-01 10:00:00", 3L))) // merged chain
    assert(out.contains((1, "2024-01-01 10:20:00", 1L))) // split after gap
    assert(out.contains((2, "2024-01-01 10:00:00", 1L))) // per-key state
    assert(out.contains((3, "2024-01-01 10:00:00", 2L)),
      s"exact-gap events must merge into one session: $out")
  }

  test("dropDuplicatesWithinWatermark: dedups inside the horizon, evicts state past it") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The 100 TB-scale form of streaming dedup: plain dropDuplicates
    // keeps every key forever (state grows with the stream);
    // WithinWatermark bounds state to the watermark horizon — a key
    // seen again after its state was evicted is emitted AGAIN, which
    // is the accepted trade for bounded memory on an infinite CDC log.
    val input = MemoryStream[(Timestamp, Long)]
    val q = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    // in-horizon duplicate: suppressed
    input.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L))
    q.processAllAvailable()
    // jump the watermark to ~10:25 — id=1/2 dedup state is evicted
    input.addData((ts(30), 3L))
    q.processAllAvailable()
    // id=1 reappears after eviction: emitted a second time
    input.addData((ts(31), 1L))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_wm").select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.count(_ == 1L) == 2, s"expected id=1 twice, got $ids")
    assert(ids.count(_ == 2L) == 1 && ids.count(_ == 3L) == 1, s"got $ids")
  }

  test("complete output mode: running totals are re-emitted whole each batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // Complete mode = the dashboard-materialization contract: every
    // micro-batch replaces the whole (small) result table, so the sink
    // always holds totals over EVERYTHING seen so far.
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("kind", "v")
      .groupBy(col("kind")).agg(count(lit(1)).as("n"), sum("v").as("s"))
      .writeStream.format("memory").queryName("complete_agg")
      .outputMode("complete").start()
    input.addData(("a", 1L), ("b", 2L), ("a", 3L))
    q.processAllAvailable()
    input.addData(("a", 10L), ("c", 5L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("complete_agg").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("a" -> (3L, 14L), "b" -> (1L, 2L), "c" -> (1L, 5L)))
  }

  test("hash-coin sampling makes identical decisions in streaming and batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The corpus samplers (sample_hash/stratified/split/shard) are
    // pure functions of the row key — no state, no rand() — so the
    // SAME operator runs unchanged over an unbounded stream and keeps
    // exactly the batch sample: micro-batch boundaries cannot change
    // any keep decision.
    val coin = substring(md5(col("id").cast("string")), 1, 4) < "2000"
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("id").filter(coin)
      .writeStream.format("memory").queryName("coin_stream")
      .outputMode("append").start()
    input.addData(0L until 100L: _*)
    q.processAllAvailable()
    input.addData(100L until 200L: _*) // second micro-batch
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("coin_stream")
      .collect().map(_.getLong(0)).toSet
    val batch = (0L until 200L).toDF("id").filter(coin)
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stateful CDC snapshot: upsert, out-of-order ignore, delete tombstone") {
    import graft.streaming.CdcSnapshotStream.{Change, snapshots}
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Change]
    val q = snapshots(input.toDS())
      .writeStream.format("memory").queryName("cdc_snap_stream")
      .outputMode("update").start()
    // batch 1: two inserts + an update for key 1
    input.addData(
      Change(1, 10L, 100L, "insert", 1.0),
      Change(2, 11L, 101L, "insert", 2.0),
      Change(1, 12L, 102L, "update_after", 5.0))
    q.processAllAvailable()
    // batch 2: a STALE update for key 1 (older ts) — must be ignored;
    // a delete for key 2; an update_before (no-op) for key 1
    input.addData(
      Change(1, 9L, 50L, "update_after", 99.0),
      Change(1, 13L, 103L, "update_before", 5.0),
      Change(2, 14L, 104L, "delete", 2.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("cdc_snap_stream")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3),
        r.getBoolean(4))).toSeq
    // batch 1 emitted the post-update state of key 1 and insert of key 2
    assert(out.contains((1, 12L, 5.0, false)))
    assert(out.contains((2, 11L, 2.0, false)))
    // batch 2 emitted ONLY the delete tombstone for key 2 — the stale
    // update and the pre-image changed nothing for key 1
    assert(out.contains((2, 14L, 2.0, true)))
    assert(!out.exists { case (u, e, _, _) => u == 1 && (e == 9L || e == 13L) })
  }

  test("stateful CDC snapshot: delete is not resurrected by stale events; newer insert revives") {
    import graft.streaming.CdcSnapshotStream.{Change, snapshots}
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Change]
    val q = snapshots(input.toDS())
      .writeStream.format("memory").queryName("cdc_snap_revive")
      .outputMode("update").start()
    input.addData(Change(7, 20L, 200L, "insert", 1.0),
      Change(7, 21L, 201L, "delete", 1.0))
    q.processAllAvailable()
    // stale insert (older than the tombstone) must NOT revive the key
    input.addData(Change(7, 19L, 150L, "insert", 9.0))
    q.processAllAvailable()
    // genuinely newer insert revives it
    input.addData(Change(7, 22L, 202L, "insert", 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("cdc_snap_revive")
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getBoolean(4)))
      .toSeq
    assert(out.contains((21L, 1.0, true)))   // tombstone emitted
    assert(!out.exists(_._1 == 19L))         // stale insert ignored
    assert(out.contains((22L, 3.0, false)))  // revival emitted
  }

  test("stateful CDC snapshot: tombstone TTL evicts deleted keys from the store") {
    import graft.streaming.CdcSnapshotStream.{Change, snapshots}
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Change]
    val q = snapshots(input.toDS(), tombstoneTtl = Some("1 millisecond"))
      .writeStream.format("memory").queryName("cdc_snap_ttl")
      .outputMode("update").start()
    // NOTE: processAllAvailable() can block forever on a query with
    // pending processing-time timeouts (the engine keeps scheduling
    // timeout batches), so this test polls the sink with a deadline —
    // the micro-batch thread processes input on its own.
    def awaitRow(want: (Int, Long, Boolean)): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      var found = false
      while (!found && System.currentTimeMillis() < deadline) {
        found = spark.table("cdc_snap_ttl")
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getBoolean(4)))
          .contains(want)
        if (!found) Thread.sleep(100)
      }
      assert(found, s"row $want never reached the sink")
    }
    try {
      input.addData(Change(5, 30L, 300L, "insert", 1.0),
        Change(5, 31L, 301L, "delete", 1.0))
      awaitRow((5, 31L, true)) // tombstone emitted
      Thread.sleep(150) // let the 1 ms tombstone TTL expire in proc time
      // unrelated batch advances processing time and fires the timeout
      input.addData(Change(6, 40L, 400L, "insert", 2.0))
      awaitRow((6, 40L, false))
      // a STALE insert (older than the delete) now SUCCEEDS — the
      // tombstone is gone, which is exactly the observable eviction
      input.addData(Change(5, 29L, 250L, "insert", 7.0))
      awaitRow((5, 29L, false)) // post-eviction stale revive
    } finally q.stop()
  }

  test("foreachBatch delivers every micro-batch exactly once to the sink") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Long]
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = input.toDF().toDF("v")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        delivered.add(batchId -> df.count()); ()
      }
      .start()
    input.addData(1L, 2L, 3L)
    q.processAllAvailable()
    input.addData(4L, 5L)
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val batches = delivered.asScala.toSeq.filter(_._2 > 0).sortBy(_._1)
    assert(batches.map(_._2) == Seq(3L, 2L))
  }

  test("foreachBatch drift monitor: per-batch total-variation vs a static " +
      "baseline, integer-exact") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The operational shape of diag_dist_drift as a STREAM: each
    // micro-batch's category distribution is scored against a static
    // baseline inside foreachBatch (the hook that hands the monitor a
    // REUSABLE DataFrame + batchId), total-variation distance in ppm
    // with pure integer arithmetic — the alerting sidecar a CDC-fed
    // warehouse runs next to ingestion. Scores are asserted exactly:
    // the same math on the same batches must reproduce them.
    val baseline = Map("a" -> 500000L, "b" -> 500000L)
    val input = MemoryStream[String]
    val scores = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = input.toDF().toDF("cat")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val n = df.count()
        if (n > 0) {
          val got = df.groupBy("cat").count().collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val cats = baseline.keySet ++ got.keySet
          val l1 = cats.toSeq.map { c =>
            math.abs(got.getOrElse(c, 0L) * 1000000L / n -
              baseline.getOrElse(c, 0L))
          }.sum
          scores.add(batchId -> l1 / 2)
        }
        ()
      }
      .start()
    input.addData("a", "a", "a", "b") // 750k/250k vs 500k/500k → TV 250k
    q.processAllAvailable()
    input.addData("b", "b")           // 0/1000k vs 500k/500k → TV 500k
    q.processAllAvailable()
    input.addData("a", "b", "c", "d") // 250k,250k,250k,250k → TV 500k
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val got = scores.asScala.toSeq.sortBy(_._1).map(_._2)
    assert(got == Seq(250000L, 500000L, 500000L),
      s"drift series must be integer-exact per batch, got $got")
  }

  test("streaming session windows merge across micro-batches and close " +
      "at the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The streaming form of stream_session/win_islands: session_window
    // state MERGES when a later micro-batch arrives within the gap
    // (stateful interval union — the capability batch sessionization
    // doesn't need), and a session only emits in append mode once the
    // watermark passes its close.
    val input = MemoryStream[(Timestamp, Long)]
    val sessions = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "5 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sess_win")
      .outputMode("append").start()
    // batch 1: user 1 at 10:00 and 10:08 — one open session
    input.addData((ts(0), 1L), (ts(8), 1L))
    q.processAllAvailable()
    // batch 2: 10:15 is within 10 min of 10:08 → MERGES into the same
    // session (state union across batches), extending it to 10:25
    input.addData((ts(15), 1L))
    q.processAllAvailable()
    // batch 3: advance the watermark far past 10:25 → session closes
    input.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 9L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_win")
      .select(col("user_id"),
        col("session_window.start").cast("string").as("s"),
        col("session_window.end").cast("string").as("e"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // ONE merged session for user 1 covering all three events
    assert(out.count(_._1 == 1L) === 1)
    val s1 = out.find(_._1 == 1L).get
    assert(s1._2 == "2024-01-01 10:00:00")
    assert(s1._3 == "2024-01-01 10:25:00") // last event + 10-min gap
    assert(s1._4 === 3L)
  }

  test("streaming quality gate: per-micro-batch gopher gate equals the " +
      "batch gate") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The gate-at-ingest form of llm_quality_gopher: the gate is a
    // stateless narrow map, so applying it per micro-batch must give
    // exactly the batch answer over the union of batches — no state,
    // no watermark, order-independent. Docs cover every gate branch:
    // keep=true, word-count fail, mean-word-length + stopword fail,
    // and the empty doc (NULL mean, keep=false via wc_ok).
    val good = "the and " + Seq.fill(18)("words").mkString(" ")
    val short = "the and tiny"
    val onechar = Seq.fill(25)("a").mkString(" ")
    val empty = ""
    val docs = Seq((1L, good), (2L, short), (3L, onechar), (4L, empty))
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= graft.ops.TextOps.gopherGate(df).collect() }
        ()
      }
      .start()
    input.addData(docs.take(2): _*)
    q.processAllAvailable()
    input.addData(docs.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val batch = graft.ops.TextOps.gopherGate(docs.toDF("doc_id", "text"))
      .collect()
    assert(got.toSet === batch.toSet)
    val byId = batch.map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(byId === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // the empty doc exercised the NULL-mean branch
    val emptyRow = batch.find(_.getLong(0) == 4L).get
    assert(emptyRow.isNullAt(emptyRow.fieldIndex("mean_wlen_x100")))
  }

  test("streaming language partition: per-micro-batch count partials " +
      "merge to the batch totals") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The streaming form of llm_lang_partition's salted two-stage agg:
    // per-batch (lang, n, tokens) partials merged by addition in the
    // sink state — count/sum partials are commutative, associative
    // mergeable, so micro-batch boundaries cannot change the totals
    // (the same partial-merge contract cdc_incremental_agg pins in
    // batch form). A doc recurring across batches is counted per
    // arrival — append semantics, declared.
    val input = MemoryStream[(String, String)]
    val state = scala.collection.concurrent.TrieMap[String, (Long, Long)]()
    val q = input.toDF().toDF("lang", "text")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(size(split(col("text"), " ")).cast("long")).as("t"))
          .collect()
          .foreach { r =>
            val (n0, t0) = state.getOrElse(r.getAs[String]("lang"), (0L, 0L))
            state(r.getAs[String]("lang")) =
              (n0 + r.getAs[Long]("n"), t0 + r.getAs[Long]("t"))
          }
        ()
      }
      .start()
    input.addData(("en", "a b c"), ("fr", "x y"), ("en", "d e"))
    q.processAllAvailable()
    input.addData(("en", "f"), ("zh", "g h i j"))
    q.processAllAvailable()
    q.stop()
    assert(state === Map("en" -> (3L, 6L), "fr" -> (1L, 2L),
      "zh" -> (1L, 4L)))
  }

  test("streaming survival-curve maintenance: merged per-user lifespan " +
      "partials equal the batch curve") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The streaming form of composite_survival: the curve needs each
    // user's (first, last) event day — min/max partials are mergeable
    // across micro-batches (min of mins, max of maxs — the
    // cdc_incremental_agg contract), so the sink keeps ONE row per
    // user and the curve recomputed from merged state equals the
    // batch operator over the union, however arrivals were batched.
    val input = MemoryStream[(Long, Long)] // (user_id, day)
    val state = scala.collection.concurrent.TrieMap[Long, (Long, Long)]()
    val q = input.toDF().toDF("user_id", "day")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.groupBy(col("user_id"))
          .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
          .collect()
          .foreach { r =>
            val u = r.getAs[Long]("user_id")
            val (mn0, mx0) = state.getOrElse(u,
              (Long.MaxValue, Long.MinValue))
            state(u) = (math.min(mn0, r.getAs[Long]("mn")),
              math.max(mx0, r.getAs[Long]("mx")))
          }
        ()
      }
      .start()
    // user 1 spans 30 days ACROSS batches (0 then 30); user 2 spans 10
    // within one batch; user 3 is a single-day user
    input.addData((1L, 0L), (2L, 5L), (3L, 8L))
    q.processAllAvailable()
    input.addData((1L, 30L), (2L, 15L))
    q.processAllAvailable()
    q.stop()
    // curve from merged state
    val life = state.toSeq.map { case (u, (mn, mx)) => (u, mx - mn) }
    val curve = Seq(0L, 7L, 14L, 21L, 28L).map(d =>
      d -> life.count(_._2 >= d).toLong).toMap
    // batch reference over the union of all arrivals
    val all = Seq((1L, 0L), (2L, 5L), (3L, 8L), (1L, 30L), (2L, 15L))
      .toDF("user_id", "day")
    val ref = all.groupBy(col("user_id"))
      .agg((max(col("day")) - min(col("day"))).as("life"))
      .select(explode(expr("array(0, 7, 14, 21, 28)")).as("d"),
        col("life"))
      .filter(col("life") >= col("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Int]("d").toLong ->
        r.getAs[Long]("n")).toMap
    assert(curve.filter(_._2 > 0) === ref)
    // the numbers themselves: users 1,2,3 alive at 0; 1,2 at 7; 1 at
    // 14/21/28
    assert(curve === Map(0L -> 3L, 7L -> 2L, 14L -> 1L, 21L -> 1L,
      28L -> 1L))
  }

  test("streaming theta-sketch maintenance: merged micro-batch partials " +
      "equal the batch answer") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The streaming form of the agg_sketch_theta/hll pre-aggregation
    // pattern: per-segment sketch state updated from each micro-batch
    // via foreachBatch. Theta union is commutative, associative AND
    // idempotent, so users recurring across micro-batches are not
    // double-counted, and merge order across batches cannot change
    // the result — the property that makes KB-sized sketch state the
    // right streaming distinct-count representation at 100 TB.
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[(String, Long)]
    val state = scala.collection.concurrent.TrieMap[String, Union]()
    val q = input.toDF().toDF("event_type", "user_id")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.groupBy(col("event_type"))
          .agg(graft.functions.ThetaSketch.agg(col("user_id")).as("sk"))
          .collect()
          .foreach { r =>
            val u = state.getOrElseUpdate(r.getAs[String]("event_type"),
              SetOperation.builder().buildUnion())
            u.union(Sketches.heapifyCompactSketch(
              Memory.wrap(r.getAs[Array[Byte]]("sk"))))
          }
        ()
      }
      .start()
    // three micro-batches with users recurring across batches
    input.addData(("click", 1L), ("click", 2L), ("view", 1L))
    q.processAllAvailable()
    input.addData(("click", 2L), ("click", 3L), ("view", 9L))
    q.processAllAvailable()
    input.addData(("click", 1L), ("view", 1L), ("view", 2L), ("buy", 7L))
    q.processAllAvailable()
    q.stop()
    def est(u: Union): Long =
      math.rint(u.getResult().getEstimate).toLong
    // click {1,2,3}, view {1,9,2}, buy {7} — exact below capacity
    assert(est(state("click")) === 3L)
    assert(est(state("view")) === 3L)
    assert(est(state("buy")) === 1L)
  }

  test("streaming bitmap maintenance: OR-merged micro-batch bitmaps " +
      "give the EXACT streaming distinct count") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The streaming form of agg_bitmap_distinct/overlap: per
    // (segment, bucket) bitmap partials from each micro-batch,
    // OR-merged into driver state. Bitwise OR is commutative,
    // associative and IDEMPOTENT — users recurring across
    // micro-batches set the same bit again — so unlike a count the
    // merged popcount is exact under at-least-once delivery and any
    // batch boundary placement. KB-sized state, exact answer: what
    // agg_sketch_theta gives approximately past capacity, the bitmap
    // gives exactly while ids stay dense.
    val input = MemoryStream[(String, Long)]
    val state = scala.collection.concurrent.TrieMap[(String, Long),
      Array[Byte]]()
    def orMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](math.max(a.length, b.length))
      for (i <- out.indices) {
        val x = if (i < a.length) a(i) else 0: Byte
        val y = if (i < b.length) b(i) else 0: Byte
        out(i) = (x | y).toByte
      }
      out
    }
    val q = input.toDF().toDF("event_type", "user_id")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.groupBy(col("event_type"),
            expr("bitmap_bucket_number(user_id)").as("bucket"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
            .as("bm"))
          .collect()
          .foreach { r =>
            val k = (r.getAs[String]("event_type"), r.getAs[Long]("bucket"))
            val bm = r.getAs[Array[Byte]]("bm")
            state(k) = state.get(k).map(orMerge(_, bm)).getOrElse(bm)
          }
        ()
      }
      .start()
    // recurring users across batches must not double-count
    input.addData(("click", 1L), ("click", 2L), ("view", 1L))
    q.processAllAvailable()
    input.addData(("click", 2L), ("click", 3L), ("view", 9L))
    q.processAllAvailable()
    input.addData(("click", 1L), ("view", 1L), ("view", 2L), ("buy", 7L))
    q.processAllAvailable()
    q.stop()
    def popcount(seg: String): Long = state.collect {
      case ((s, _), bm) if s == seg =>
        bm.map(b => java.lang.Integer.bitCount(b & 0xff).toLong).sum
    }.sum
    assert(popcount("click") === 3L) // {1,2,3}
    assert(popcount("view") === 3L)  // {1,9,2}
    assert(popcount("buy") === 1L)   // {7}
  }

  test("streaming histogram maintenance: additive partials merge to " +
      "the batch histogram; batchId-keyed state makes replay a no-op") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The streaming form of agg_hist / diag_dist_drift: bucket counts
    // are ADDITIVE partials, so per-batch histograms sum to the batch
    // histogram under any boundary placement — but unlike the max/OR/
    // union/top-k pins, addition is NOT idempotent, so at-least-once
    // redelivery WOULD double-count. The contract is therefore
    // (batchId, bucket)-keyed UPSERT state: a replayed batch
    // overwrites its own partial instead of adding a second one —
    // foreachBatch's batchId is exactly the dedup key Spark
    // guarantees stable across restarts.
    val input = MemoryStream[Long] // cents
    val perBatch = scala.collection.concurrent.TrieMap[(Long, Long),
      Long]()
    val q = input.toDF().toDF("cents")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
        df.groupBy(expr("cents div 1000").as("b"))
          .agg(count(lit(1)).as("n")).collect()
          .foreach { r =>
            perBatch((bid, r.getAs[Long]("b"))) = r.getAs[Long]("n")
          }
        ()
      }
      .start()
    val batches = Seq(
      Seq(100L, 1500L, 1700L, 2500L),
      Seq(900L, 1100L, 2600L),
      Seq(150L, 2900L, 2950L, 999L))
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    def merged: Map[Long, Long] = perBatch.toSeq
      .groupBy { case ((_, bucket), _) => bucket }
      .map { case (b, xs) => b -> xs.map(_._2).sum }
    val batchHist = batches.flatten.groupBy(_ / 1000)
      .map { case (b, xs) => b -> xs.size.toLong }
    assert(merged === batchHist)
    // redelivery: re-upserting batch 0's recorded partials under the
    // same batchId must not change the merged histogram
    val replay = perBatch.toSeq.filter { case ((bid, _), _) => bid == 0L }
    replay.foreach { case (k, v) => perBatch(k) = v }
    assert(merged === batchHist)
  }

  test("streaming HLL register maintenance: max-merged micro-batch " +
      "registers equal the batch registers exactly") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The streaming form of agg_sketch_hll_det: a register is a MAX
    // over per-key ranks, and max is commutative/associative/
    // IDEMPOTENT — recurring keys across micro-batches set the same
    // rank again — so the merged register table (and therefore the
    // exact-rational estimate derived from it) is independent of
    // batch boundaries and at-least-once redelivery. 64 longs of
    // state per group, batch-identical answers.
    val B = 18014398509481984L // 2^54
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h",
        expr("CAST(conv(substring(md5(concat('hll', " +
          "CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("bucket", expr(s"h div $B"))
      .withColumn("rho",
        expr(s"least(55 - length(bin(h % $B)), CAST(54 AS INT))"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("r"))
    val input = MemoryStream[Long]
    val state = scala.collection.concurrent.TrieMap[Long, Int]()
    val q = input.toDF().toDF("user_id")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        regs(df).collect().foreach { row =>
          val b = row.getAs[Long]("bucket")
          val r = row.getAs[Int]("r")
          state(b) = math.max(state.getOrElse(b, 0), r)
        }
        ()
      }
      .start()
    // recurring ids across batches must not move any register
    input.addData(1L to 40L: _*); q.processAllAvailable()
    input.addData(30L to 80L: _*); q.processAllAvailable()
    input.addData(1L to 25L: _*); q.processAllAvailable()
    q.stop()
    val batch = regs((1L to 80L).toDF("user_id")).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Int]("r")).toMap
    assert(state.toMap === batch)
  }

  test("streaming top-k maintenance: per-micro-batch local top-k " +
      "merged into driver state equals the batch top-k") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The streaming form of topk_limit: top-k is a MERGEABLE summary
    // (top-k of a union = top-k of the concatenated per-part top-ks),
    // so each micro-batch contributes only its local k rows and the
    // driver keeps k rows of state — the same per-partition-heap
    // argument that makes TakeOrderedAndProject scale, applied across
    // time. Any batch-boundary placement yields the same final list;
    // ties break on the id column (strict total order) exactly like
    // the batch query.
    val K = 3
    val input = MemoryStream[(Long, Long)] // (order_id, price_cents)
    var state = Vector.empty[(Long, Long)] // merged top-K
    def mergeTop(rows: Seq[(Long, Long)]): Unit = synchronized {
      state = (state ++ rows)
        .sortBy { case (id, cents) => (-cents, id) }.take(K)
    }
    val q = input.toDF().toDF("order_id", "cents")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val local = df.orderBy(desc("cents"), asc("order_id")).limit(K)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        mergeTop(local)
        ()
      }
      .start()
    val all = Seq(
      Seq(1L -> 500L, 2L -> 900L, 3L -> 100L, 4L -> 900L),
      Seq(5L -> 950L, 6L -> 50L),
      Seq(7L -> 900L, 8L -> 20L, 9L -> 990L))
    all.foreach { batch => input.addData(batch: _*); q.processAllAvailable() }
    q.stop()
    val batchTop = all.flatten
      .sortBy { case (id, cents) => (-cents, id) }.take(K)
    assert(state === batchTop.toVector)
    assert(state === Vector(9L -> 990L, 5L -> 950L, 2L -> 900L))
  }

  test("streaming MinHash band-index maintenance: per-micro-batch " +
      "signatures union to the batch index, candidate pairs identical") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The streaming form of llm_dedup_minhash's index build: a doc's
    // band signatures depend ONLY on that doc's tokens, so index
    // maintenance is append-only per micro-batch — new documents add
    // rows, nothing is revised — and any batch-boundary placement
    // yields the same index (the property that lets a 100 TB corpus
    // index grow incrementally instead of rebuilding).
    val docs = Seq(
      1L -> "a b c d e", 2L -> "a b c d f", 3L -> "x y z w q",
      4L -> "x y z w e", 5L -> "m n o p q", 6L -> "a b c d e")
    def toks(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
    val input = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Long)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        acc ++= graft.operators.MinHashLsh
          .bandSignatures(toks(df), "doc_id", "w",
            numHashes = 64, bands = 16)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        ()
      }
      .start()
    input.addData(docs.take(2): _*); q.processAllAvailable()
    input.addData(docs.slice(2, 4): _*); q.processAllAvailable()
    input.addData(docs.drop(4): _*); q.processAllAvailable()
    q.stop()

    val batchIdxDf = graft.operators.MinHashLsh.bandSignatures(
      toks(docs.toDF("doc_id", "text")), "doc_id", "w",
      numHashes = 64, bands = 16)
    val batchIdx = batchIdxDf.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(acc.size == 6 * 16 && acc.toSet == batchIdx,
      "incremental index must equal the batch-built index")

    // candidate pairs served from the incrementally-built index match
    // the batch pairs (doc 6 duplicates doc 1 across a batch boundary)
    val incDf = acc.toSeq.toDF("doc_id", "band", "band_key")
    val incPairs = graft.operators.MinHashLsh
      .pairsFromBands(incDf, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchPairs = graft.operators.MinHashLsh
      .pairsFromBands(batchIdxDf, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incPairs == batchPairs)
    assert(incPairs.contains((1L, 6L)),
      "identical docs split across batches must still collide")
  }
}
