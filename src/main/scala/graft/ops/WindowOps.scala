package graft.ops

import graft.Tables
import graft.Tables.money
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window functions (SURVEY.md §2.2 "Window functions").
  *
  * Every window here is partitioned (by segment / priority / user /
  * customer) — an unpartitioned window funnels the whole table through
  * one task and is the classic 100 TB anti-pattern. Running/moving sums
  * go through decimal casts for oracle bit-parity (see [[graft.Tables]]).
  */
object WindowOps extends OpPack {

  def queries: Map[String, Q] = Map(
    "win_rank" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(desc("o_totalprice"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rnk") <= 10)
        .select(col("c_mktsegment"), col("o_orderkey"), col("rnk"), col("drnk"))
        .orderBy(col("c_mktsegment"), col("rnk"), col("o_orderkey"))
    }),

    "win_row_number" -> ((s, dir) => {
      // Top-N per group: window + filter plans as a per-partition top-K
      // (WindowGroupLimit pushdown in Spark 4) — no global sort.
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rn"))
    }),

    "win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_event_id", lead(col("event_id"), 1).over(w))
        .select(col("event_id"), col("user_id"),
          money(col("value") - col("prev_value")).as("delta_value"),
          col("next_event_id"))
        .orderBy(col("event_id"))
    }),

    "win_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .withColumn("running_spend",
          round(sum(col("o_totalprice").cast(DecimalType(28, 2))).over(w)
            .cast("double"), 2))
        .select(col("o_orderkey"), col("o_custkey"), col("running_spend"))
        .orderBy(col("o_orderkey"))
    }),

    "win_range_frame" -> ((s, dir) => {
      // RANGE frame over a numeric sort key (event_id): all rows whose
      // key is within 100 of the current row's key.
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rangeBetween(-100, 0)
      Tables(s, dir, "events")
        .withColumn("n_in_range", count(lit(1)).over(w))
        .withColumn("sum_in_range",
          round(sum(col("value").cast(DecimalType(28, 2))).over(w)
            .cast("double"), 2))
        .select(col("event_id"), col("user_id"), col("n_in_range"),
          col("sum_in_range"))
        .orderBy(col("event_id"))
    }),

    // Time-based RANGE frame: per-user rolling event count over the
    // trailing 10 minutes of EVENT TIME (epoch seconds as the range
    // key — a sliding window anchored at every row, the per-row form
    // of stream_sliding's fixed grid). Same single keyed shuffle as
    // any window; the frame is evaluated by cursor over the sorted
    // partition, O(1) amortized per row.
    "win_time_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
        .rangeBetween(-600, 0)
      Tables(s, dir, "events")
        .withColumn("es", floor(unix_timestamp(col("ts"))).cast("long"))
        .withColumn("n_10min", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("n_10min"))
        .orderBy(col("event_id"))
    }),

    // Gaps-and-islands sessionization in BATCH form (the window-only
    // sibling of stream_session): a new session starts where the gap
    // to the previous event exceeds 30 min — lag marks boundaries, a
    // running sum over the SAME (partition, order) numbers the
    // islands, so both window passes and the per-session rollup ride
    // ONE user_id hash shuffle (HashPartitioning(user_id) already
    // satisfies the (user_id, session_id) grouping — no second
    // exchange; PlanShapeSpec pins the single-shuffle shape).
    "win_islands" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("es"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("es", floor(unix_timestamp(col("ts"))).cast("long"))
        .withColumn("prev_es", lag(col("es"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_es").isNull ||
            col("es") - col("prev_es") > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(byUser))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("es")).as("start_es"),
          max(col("es")).as("end_es"))
        .withColumn("duration_s", col("end_es") - col("start_es"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Time-series gap-fill with LOCF (last observation carried
    // forward): the (user × day) grid is generated NARROWLY — day
    // spine exploded per user from collected bounds (two scalar
    // dates), no cross join — then one left join against the daily
    // sums and one per-user window carries values across gaps. Days
    // before a user's first observation stay NULL (was_gap marks
    // them). At 100 TB: grid ∝ keys × spine (not events), the join
    // and window share the user_id shuffle key.
    "win_gapfill" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val daily = e.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(Tables.moneySum(col("value")).as("day_value"))
      val b = e.agg(min(to_date(col("ts"))).as("lo"),
        max(to_date(col("ts"))).as("hi")).collect()(0)
      // empty events: bounds are NULL and sequence() would fail
      // ANALYSIS; any literal works — the user grid is empty anyway
      val lo = Option(b.getAs[java.sql.Date]("lo"))
        .getOrElse(java.sql.Date.valueOf("1970-01-01"))
      val hi = Option(b.getAs[java.sql.Date]("hi")).getOrElse(lo)
      val grid = e.select(col("user_id")).distinct()
        .withColumn("day", explode(sequence(
          lit(lo), lit(hi), expr("interval 1 day"))))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left_outer")
        .withColumn("was_gap", col("day_value").isNull)
        .withColumn("value_filled",
          last(col("day_value"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("day"), col("value_filled"),
          col("was_gap"))
        .orderBy(col("user_id"), col("day"))
    }),

    // Longest-streak summary — the engagement metric built on the
    // gaps-and-islands machinery (win_islands), at day grain: per
    // user, active-day count, number of consecutive-day streaks, and
    // the longest streak. Distinct (user, day) first (bounds the
    // window input at keys × spine), then ONE user_id exchange shared
    // by the lag, the running streak-id sum, and both rollups.
    "win_streak" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      e.withColumn("prev", lag(col("day"), 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull ||
            datediff(col("day"), col("prev")) > 1, 1).otherwise(0))
        .withColumn("streak_id", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("streak_id"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(sum(col("len")).as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max(col("len")).as("longest_streak"))
        .orderBy(col("user_id"))
    }),

    // Cumulative DISTINCT count — the per-user "breadth so far" series
    // (distinct event types seen up to each event). Neither engine
    // windows count(DISTINCT), so this is the standard composition:
    // first-occurrence flag (row_number=1 over (user, type)) + running
    // sum of the flag over (user). Two keyed exchanges — (user, type)
    // then (user) — both bounded-cardinality hash keys; no state
    // beyond the window sort at any scale, and the flag trick is
    // exactly how a streaming version would keep O(types) state.
    "win_cum_distinct" -> ((s, dir) => {
      val first = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("is_first",
          when(row_number().over(first) === 1, 1L).otherwise(0L))
        .withColumn("n_types_seen", sum(col("is_first")).over(run))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Bounded ROWS-frame rolling statistics — the moving-average /
    // band-monitor window (5-event trailing frame per key, integer
    // cents so the mean is exactly oracle-checkable via integer
    // division). Complements win_running_sum (unbounded frame) and
    // win_range_frame (value-range frame): a ROWS k-PRECEDING frame
    // keeps O(k) state per key in the window operator regardless of
    // partition size — the 100 TB shape for telemetry smoothing is
    // one key shuffle with constant per-row work.
    "win_rolling" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("roll_n", count(lit(1)).over(w))
        .withColumn("roll_sum_cents", sum(col("cents")).over(w))
        .withColumn("roll_min_cents", min(col("cents")).over(w))
        .withColumn("roll_max_cents", max(col("cents")).over(w))
        .select(col("user_id"), col("event_id"), col("cents"),
          col("roll_n"), col("roll_sum_cents"),
          expr("roll_sum_cents div roll_n").as("roll_avg_cents"),
          col("roll_min_cents"), col("roll_max_cents"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Linearly-WEIGHTED moving average (the WMA between win_rolling's
    // flat SMA and ts_ewma's geometric decay — newest row weighs k,
    // oldest 1): a position-dependent weight is NOT a plain window
    // aggregate, but it decomposes into three plain rolling sums via
    // w(s) = k − (t − s):  num = (k−t)·Σx + Σ(s·x),
    // den = (k−t)·n + Σs, with t,s = per-user row numbers — so the
    // whole indicator is ONE window pass (single user_id exchange,
    // O(1) state per frame step), never a per-row k-element re-scan.
    // Partial head windows keep the newest-row-weighs-k anchoring
    // (declared). Integer-exact; wma_milli = num·1000 div den.
    "win_weighted_ma" -> ((s, dir) => {
      val k = 5
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val w = wOrd.rowsBetween(-(k - 1), Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("sx", sum(col("cents")).over(w))
        .withColumn("sp", sum(col("rn") * col("cents")).over(w))
        .withColumn("sr", sum(col("rn").cast("long")).over(w))
        .withColumn("n", count(lit(1)).over(w))
        .select(col("user_id"), col("event_id"), col("cents"),
          expr(s"CAST((CAST(($k - rn) * sx + sp AS DECIMAL(38,0)) " +
            s"* 1000) div (($k - rn) * n + sr) AS BIGINT)")
            .as("wma_milli"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "win_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables(s, dir, "customer")
        .withColumn("quartile", ntile(4).over(w))
        .select(col("c_custkey"), col("c_mktsegment"), col("quartile"))
        .orderBy(col("c_custkey"))
    }),

    // Distribution functions: both engines compute the same integer
    // ratios ((rank-1)/(n-1), rank/n) in double; rounded for rule ②.
    "win_distribution" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables(s, dir, "customer")
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .select(col("c_custkey"), col("c_mktsegment"), col("pct_rank"),
          col("cume"))
        .orderBy(col("c_custkey"))
    }),

    "win_first_last" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "orders")
        .withColumn("first_order", first_value(col("o_orderkey")).over(w))
        .withColumn("last_order", last_value(col("o_orderkey")).over(w))
        .select(col("o_orderkey"), col("o_custkey"), col("first_order"),
          col("last_order"))
        .orderBy(col("o_orderkey"))
    }),

    // nth_value over the full partition frame (deterministic: the
    // window order ends in the unique c_custkey tie-breaker).
    "win_nth_value" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          nth_value(col("c_name"), 2).over(w).as("second_name"))
        .orderBy(col("c_custkey"))
    }),

    // Moving-average crossover detection (the golden-cross/death-cross
    // monitor): per user, fast SMA (trailing 5) vs slow SMA (trailing
    // 20) in exact cents; a signal fires on rows where the fast mean
    // CROSSES the slow one. The mean comparison is cross-multiplied
    // (s5·n20 > s20·n5 — counts of non-null cents, so null payloads
    // drop from numerator AND denominator identically), never divided;
    // rows before the slow frame fills (n20 < 20) are warm-up and
    // excluded by the declared rule. SCALE: both frame sums, both
    // counts, and the lag share ONE user_id exchange (chained
    // WindowExecs, O(frame) state), then a narrow filter — the
    // detector is scan-proportional with a single shuffle.
    "win_sma_crossover" -> ((s, dir) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val w5 = wOrd.rowsBetween(-4, Window.currentRow)
      val w20 = wOrd.rowsBetween(-19, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("s5", sum(col("cents")).over(w5))
        .withColumn("n5", count(col("cents")).over(w5))
        .withColumn("s20", sum(col("cents")).over(w20))
        .withColumn("n20", count(col("cents")).over(w20))
        .withColumn("above", when(col("n20") === 20,
          col("s5") * col("n20") > col("s20") * col("n5")))
        .withColumn("prev_above", lag(col("above"), 1).over(wOrd))
        .filter(col("above").isNotNull && col("prev_above").isNotNull &&
          col("above") =!= col("prev_above"))
        .select(col("user_id"), col("event_id"),
          when(col("above"), "golden").otherwise("death").as("signal"),
          col("s5"), col("s20"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Day-over-day percent change of each user's daily spend — the
    // period-delta normalized to permille ((v − prev)·1000 div prev;
    // daily cent sums are positive so the denominator never zeroes,
    // and the NEGATIVE numerator rides DECIMAL(38,0)/HUGEINT where
    // both engines truncate toward zero). ONE hash agg to (user, day)
    // + ONE lag window sharing the user_id exchange.
    "win_pct_change" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      Tables(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        .withColumn("prev_c", lag(col("cents"), 1).over(w))
        .filter(col("prev_c").isNotNull)
        .select(col("user_id"), col("day"), col("cents"),
          expr("CAST(CAST(cents - prev_c AS DECIMAL(38,0)) * 1000 " +
            "div prev_c AS BIGINT)").as("change_pm"))
        .orderBy(col("user_id"), col("day"))
    })
  )

  def oracle: Map[String, String] = Map(
    "win_sma_crossover" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id,
        |    sum(cents) OVER w5 AS s5, count(cents) OVER w5 AS n5,
        |    sum(cents) OVER w20 AS s20, count(cents) OVER w20 AS n20
        |  FROM c
        |  WINDOW w5 AS (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
        |    w20 AS (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |a AS (
        |  SELECT user_id, event_id, s5, s20,
        |    CASE WHEN n20 = 20 THEN s5 * n20 > s20 * n5 END AS above
        |  FROM r),
        |b AS (
        |  SELECT *, lag(above, 1) OVER
        |    (PARTITION BY user_id ORDER BY event_id) AS prev_above
        |  FROM a)
        |SELECT user_id, event_id,
        |  CASE WHEN above THEN 'golden' ELSE 'death' END AS signal,
        |  CAST(s5 AS BIGINT) AS s5, CAST(s20 AS BIGINT) AS s20
        |FROM b
        |WHERE above IS NOT NULL AND prev_above IS NOT NULL
        |  AND above <> prev_above
        |ORDER BY user_id, event_id""".stripMargin,

    "win_streak" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |l AS (
        |  SELECT user_id, day,
        |    lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
        |  FROM d),
        |s AS (
        |  SELECT user_id, day,
        |    sum(CASE WHEN prev IS NULL
        |             OR datediff('day', prev, day) > 1
        |             THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS streak_id
        |  FROM l),
        |g AS (SELECT user_id, streak_id, count(*) AS len FROM s
        |      GROUP BY user_id, streak_id)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  CAST(count(*) AS BIGINT) AS n_streaks,
        |  CAST(max(len) AS BIGINT) AS longest_streak
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "win_cum_distinct" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CASE WHEN row_number() OVER (
        |        PARTITION BY user_id, event_type ORDER BY event_id) = 1
        |      THEN 1 ELSE 0 END AS is_first
        |  FROM events)
        |SELECT user_id, event_id, event_type,
        |  CAST(is_first AS BIGINT) AS is_first,
        |  CAST(sum(is_first) OVER (
        |    PARTITION BY user_id ORDER BY event_id) AS BIGINT)
        |    AS n_types_seen
        |FROM e ORDER BY user_id, event_id""".stripMargin,

    "win_weighted_ma" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY event_id) AS BIGINT) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, cents, rn,
        |    sum(cents) OVER w AS sx,
        |    sum(rn * cents) OVER w AS sp,
        |    sum(rn) OVER w AS sr,
        |    count(*) OVER w AS n
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, cents,
        |  CAST((CAST((5 - rn) * sx + sp AS HUGEINT) * 1000)
        |    // ((5 - rn) * n + sr) AS BIGINT) AS wma_milli
        |FROM r ORDER BY user_id, event_id""".stripMargin,

    "win_rolling" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, cents,
        |    count(*) OVER w AS roll_n,
        |    sum(cents) OVER w AS roll_sum_cents,
        |    min(cents) OVER w AS roll_min_cents,
        |    max(cents) OVER w AS roll_max_cents
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, cents,
        |  CAST(roll_n AS BIGINT) AS roll_n,
        |  CAST(roll_sum_cents AS BIGINT) AS roll_sum_cents,
        |  CAST(roll_sum_cents // roll_n AS BIGINT) AS roll_avg_cents,
        |  CAST(roll_min_cents AS BIGINT) AS roll_min_cents,
        |  CAST(roll_max_cents AS BIGINT) AS roll_max_cents
        |FROM r ORDER BY user_id, event_id""".stripMargin,

    "win_rank" ->
      """SELECT c_mktsegment, o_orderkey, rnk, drnk FROM (
        |  SELECT c_mktsegment, o_orderkey,
        |         rank() OVER (PARTITION BY c_mktsegment
        |                      ORDER BY o_totalprice DESC) AS rnk,
        |         dense_rank() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY o_totalprice DESC) AS drnk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rnk <= 10
        |ORDER BY c_mktsegment, rnk, o_orderkey""".stripMargin,

    "win_row_number" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "win_lag_lead" ->
      s"""SELECT event_id, user_id,
         |  ${Tables.sql.money("value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id)")} AS delta_value,
         |  lead(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_event_id
         |FROM events
         |ORDER BY event_id""".stripMargin,

    "win_running_sum" ->
      """SELECT o_orderkey, o_custkey,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
        |    AS running_spend
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "win_range_frame" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_in_range,
        |  round(CAST(sum(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE), 2)
        |    AS sum_in_range
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "win_time_range" ->
      """SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id
        |    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_10min
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "win_gapfill" ->
      s"""WITH daily AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day,
         |    ${Tables.sql.moneySum("value")} AS day_value
         |  FROM events GROUP BY 1, 2
         |), b AS (
         |  SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
         |  FROM events
         |), u AS (SELECT DISTINCT user_id FROM events),
         |spine AS (
         |  SELECT CAST(unnest(generate_series(lo, hi,
         |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
         |grid AS (SELECT user_id, day FROM u CROSS JOIN spine),
         |j AS (
         |  SELECT g.user_id, g.day, daily.day_value
         |  FROM grid g LEFT JOIN daily
         |    ON g.user_id = daily.user_id AND g.day = daily.day)
         |SELECT user_id, day,
         |  last_value(day_value IGNORE NULLS) OVER (
         |    PARTITION BY user_id ORDER BY day
         |    ROWS UNBOUNDED PRECEDING) AS value_filled,
         |  day_value IS NULL AS was_gap
         |FROM j ORDER BY user_id, day""".stripMargin,

    "win_islands" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS es
        |  FROM events
        |), b AS (
        |  SELECT user_id, event_id, es,
        |    CASE WHEN lag(es) OVER w IS NULL
        |           OR es - lag(es) OVER w > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
        |), sess AS (
        |  SELECT user_id, es,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY es, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS session_id
        |  FROM b)
        |SELECT user_id, session_id,
        |  count(*) AS n_events,
        |  min(es) AS start_es, max(es) AS end_es,
        |  max(es) - min(es) AS duration_s
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "win_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        |  ntile(4) OVER (PARTITION BY c_mktsegment
        |                 ORDER BY c_acctbal, c_custkey) AS quartile
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "win_distribution" ->
      """SELECT c_custkey, c_mktsegment,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "win_first_last" ->
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "win_nth_value" ->
      """SELECT c_custkey, c_mktsegment,
        |  nth_value(c_name, 2) OVER (
        |    PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC NULLS LAST, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_name
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "win_pct_change" ->
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |p AS (
        |  SELECT user_id, day, cents,
        |    lag(cents, 1) OVER (PARTITION BY user_id ORDER BY day)
        |      AS prev_c
        |  FROM d)
        |SELECT user_id, day, cents,
        |  CAST(CAST(cents - prev_c AS HUGEINT) * 1000 // prev_c
        |    AS BIGINT) AS change_pm
        |FROM p WHERE prev_c IS NOT NULL
        |ORDER BY user_id, day""".stripMargin
  )
}
