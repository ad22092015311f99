package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Event-time windowing operators (SURVEY.md §2.2 "Streaming"), in
  * their batch-equivalent, oracle-checkable forms. The same
  * `window`/`session_window` expressions run unchanged under
  * Structured Streaming (see `graft.streaming` tests for the
  * watermark/stateful variants that have no batch oracle).
  *
  * All window starts are emitted as epoch seconds (BIGINT): the
  * testdata `events.ts` is nanosecond-precision, which Spark reads
  * truncated to µs while DuckDB keeps ns — epoch-second buckets are
  * identical in both (SURVEY.md §7 known-hard list).
  */
object StreamOps extends OpPack {

  def queries: Map[String, Q] = Map(
    "stream_tumbling" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("win_start"),
          col("event_type"), col("n"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    "stream_sliding" -> ((s, dir) => {
      // 1 h windows sliding 30 min: every event lands in exactly 2
      // windows; Spark's window() generator does the expansion.
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("win_start"), col("n"))
        .orderBy(col("win_start"))
    }),

    // Watermark-tuning late-data profile (the table you read BEFORE
    // picking `withWatermark`'s delay: for candidate delays, how many
    // events would arrive LATER than the stream's high-water mark
    // minus that delay and be dropped): lateness = per-key running
    // max event time in ARRIVAL order (event_id — the log order)
    // minus the event's own time; one conditional pass rolls all
    // three candidate delays up at once, unpivoted by stack. ONE
    // user_id window exchange + a 1-row census — the profile costs
    // one scan at any log size, and the delay column is the knob's
    // menu.
    "stream_late_profile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("es", unix_timestamp(col("ts")))
        .withColumn("late_s",
          max(col("es")).over(w) - col("es"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("late_s") > 60, 1L).otherwise(0L)).as("l60"),
          sum(when(col("late_s") > 300, 1L).otherwise(0L)).as("l300"),
          sum(when(col("late_s") > 900, 1L).otherwise(0L)).as("l900"))
        .selectExpr("stack(3, 60, l60, 300, l300, 900, l900) AS " +
          "(delay_s, n_late)", "n_events")
        .selectExpr("CAST(delay_s AS INT) AS delay_s",
          "CAST(n_late AS BIGINT) AS n_late",
          "CAST(n_events AS BIGINT) AS n_events",
          "CAST((n_late * 1000) div n_events AS BIGINT) AS late_pm")
        .orderBy(col("delay_s"))
    }),

    // Sliding-window DISTINCT-user count (the "active users per
    // rolling hour, refreshed every 30 min" dashboard tile — the
    // sliding sibling of stream_tumbling's plain counts; distinct is
    // the aggregate that actually needs streaming state, which is
    // why every stream processor special-cases it): each event lands
    // in exactly 2 windows via the window() generator, then ONE
    // two-phase distinct per (window, user). In streaming form the
    // same plan runs with a watermark bounding state; at 100 TB the
    // exchange is key-proportional ((window × user) partials combine
    // map-side), never a global set.
    "stream_sliding_distinct" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .select(unix_timestamp(col("w.start")).as("win_start"),
          col("n_users"), col("n_events"))
        .orderBy(col("win_start"))
    }),

    "stream_session" -> ((s, dir) => {
      // Session windows, 30 min gap, per user. Timestamps are floored
      // to whole seconds first so the gap comparison is integer-exact
      // in both engines (ns vs µs precision cannot flip a boundary).
      // Spark session semantics: an event at EXACTLY last+gap still
      // MERGES into the session (sessions combine while
      // next.start <= prev.end, ends inclusive — verified empirically
      // on the one exactly-1800 s gap in the sf0.1 data, which Spark
      // merges) — the oracle's gaps-and-islands break condition is
      // therefore strictly `> 1800`.
      Tables(s, dir, "events")
        .withColumn("tsec", timestamp_seconds(unix_timestamp(col("ts"))))
        .groupBy(col("user_id"), session_window(col("tsec"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"))
        .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
          col("n_events"), col("first_event"), col("last_event"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Time-bounded self-join — the batch-equivalent form of the
    // stream-stream interval join StreamingSemanticsSpec pins
    // ("time-bounded inner join emits matched pairs, watermark bounds
    // state"): every (click, purchase) pair by the same user with the
    // purchase inside the hour after the click. The equi-key is
    // user_id (ONE shuffle spine at any scale — the range predicate
    // rides the join as a post-condition, it never degrades to a
    // cross product); under streaming the same predicate is what lets
    // the watermark evict join state. Timestamps floor to whole
    // seconds so the bound is integer-exact in both engines.
    "stream_join_interval" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("tsec"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("tsec").as("c_sec"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("tsec").as("p_sec"))
      clicks.join(purchases, Seq("user_id"))
        .filter(col("p_sec") >= col("c_sec") &&
          col("p_sec") < col("c_sec") + 3600)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("click_id")).as("n_clicks_matched"),
          min(col("purchase_id")).as("first_purchase"),
          max(col("purchase_id")).as("last_purchase"))
        .orderBy(col("user_id"))
    }),

    // DYNAMIC-gap session windows (Spark's per-event gap expression —
    // a purchase keeps its session alive for an hour, anything else
    // 30 minutes; the adaptive-timeout sessionization real funnels
    // use): a session's end is the running MAX of (event ts + that
    // event's own gap), and the oracle reproduces exactly that with a
    // cumulative-max window + strict-inequality break (the
    // stream_session boundary doctrine: an event AT the end still
    // merges). Second-floored timestamps keep the comparison
    // integer-exact in both engines.
    "stream_session_dynamic" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("tsec", timestamp_seconds(unix_timestamp(col("ts"))))
        .groupBy(col("user_id"), session_window(col("tsec"),
          when(col("event_type") === "purchase", "60 minutes")
            .otherwise("30 minutes")).as("w"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"))
        .select(col("user_id"),
          unix_timestamp(col("w.start")).as("session_start"),
          col("n_events"), col("first_event"), col("last_event"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Per-window leaderboard — the batch-equivalent form of the
    // pinned streaming top-k maintenance (StreamingSemanticsSpec
    // "streaming top-k maintenance: per-micro-batch local top-k"):
    // hourly windows, top-3 event types by count, deterministic
    // (count DESC, type ASC) tie-break. The window agg is map-side
    // combined; the rank window partitions per hour so the top-k
    // never needs a global sort.
    "stream_window_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("win_start"))
        .orderBy(desc("n"), asc("event_type"))
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("win_start"),
          col("event_type"), col("n"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .orderBy(col("win_start"), col("rk"))
    }),

    "stream_dedup" -> ((s, dir) => {
      // Exactly-once projection of an at-least-once feed: re-deliver
      // every 10th event, then dropDuplicates on the event key (the
      // same operator is stateful under streaming).
      val e = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val redelivered = e.filter(col("event_id") % 10 === 0)
      e.unionAll(redelivered)
        .dropDuplicates("event_id")
        .orderBy(col("event_id"))
    })
  )

  def oracle: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
        |  event_type, count(*) AS n
        |FROM events
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,

    "stream_sliding" ->
      """WITH e AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
        |), x AS (
        |  SELECT es, es - (es % 1800) AS b FROM e
        |), u AS (
        |  SELECT unnest([b, b - 1800]) AS win_start FROM x
        |)
        |SELECT win_start, count(*) AS n
        |FROM u GROUP BY win_start ORDER BY win_start""".stripMargin,

    "stream_late_profile" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS es
        |  FROM events),
        |m AS (
        |  SELECT es, max(es) OVER (PARTITION BY user_id
        |    ORDER BY event_id ROWS UNBOUNDED PRECEDING) - es
        |      AS late_s
        |  FROM e),
        |g AS (
        |  SELECT count(*) AS n_events,
        |    CAST(sum(CASE WHEN late_s > 60 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS l60,
        |    CAST(sum(CASE WHEN late_s > 300 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS l300,
        |    CAST(sum(CASE WHEN late_s > 900 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS l900
        |  FROM m),
        |u AS (
        |  SELECT 60 AS delay_s, l60 AS n_late, n_events FROM g
        |  UNION ALL SELECT 300, l300, n_events FROM g
        |  UNION ALL SELECT 900, l900, n_events FROM g)
        |SELECT CAST(delay_s AS INT) AS delay_s, n_late,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST((n_late * 1000) // n_events AS BIGINT) AS late_pm
        |FROM u ORDER BY delay_s""".stripMargin,

    "stream_sliding_distinct" ->
      """WITH e AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, user_id
        |  FROM events
        |), x AS (
        |  SELECT es, user_id, es - (es % 1800) AS b FROM e
        |), u AS (
        |  SELECT unnest([b, b - 1800]) AS win_start, user_id FROM x
        |)
        |SELECT win_start,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  count(*) AS n_events
        |FROM u GROUP BY win_start ORDER BY win_start""".stripMargin,

    "stream_session" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
        |  FROM events
        |), g AS (
        |  SELECT *, CASE WHEN es - lag(es) OVER (
        |      PARTITION BY user_id ORDER BY es, event_id) > 1800
        |    THEN 1 ELSE 0 END AS brk
        |  FROM e
        |), s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY es, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g
        |)
        |SELECT user_id, min(es) AS session_start, count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "stream_join_interval" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec
        |  FROM events),
        |c AS (SELECT user_id, event_id AS click_id, tsec AS c_sec
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, tsec AS p_sec
        |      FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, count(*) AS n_pairs,
        |  count(DISTINCT click_id) AS n_clicks_matched,
        |  min(purchase_id) AS first_purchase,
        |  max(purchase_id) AS last_purchase
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.p_sec >= c.c_sec AND p.p_sec < c.c_sec + 3600
        |GROUP BY c.user_id
        |ORDER BY c.user_id""".stripMargin,

    "stream_session_dynamic" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec,
        |    CASE WHEN event_type = 'purchase' THEN 3600
        |      ELSE 1800 END AS gap
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, tsec, gap,
        |    max(tsec + gap) OVER (PARTITION BY user_id
        |      ORDER BY tsec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS cummax
        |  FROM e),
        |b AS (
        |  SELECT *, CASE WHEN cummax IS NULL OR tsec > cummax
        |    THEN 1 ELSE 0 END AS brk
        |  FROM m),
        |sid AS (
        |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY tsec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS sid
        |  FROM b)
        |SELECT user_id, min(tsec) AS session_start,
        |  count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM sid GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "stream_window_topk" ->
      """SELECT win_start, event_type, n, rk FROM (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
        |      AS win_start,
        |    event_type, count(*) AS n,
        |    CAST(row_number() OVER (
        |      PARTITION BY date_trunc('hour', ts)
        |      ORDER BY count(*) DESC, event_type) AS BIGINT) AS rk
        |  FROM events
        |  GROUP BY date_trunc('hour', ts), event_type) t
        |WHERE rk <= 3
        |ORDER BY win_start, rk""".stripMargin,

    "stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, event_type FROM (
        |  SELECT event_id, user_id, event_type FROM events
        |  UNION ALL
        |  SELECT event_id, user_id, event_type FROM events
        |  WHERE event_id % 10 = 0)
        |ORDER BY event_id""".stripMargin
  )
}
