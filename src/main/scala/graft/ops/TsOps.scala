package graft.ops

import graft.Tables
import graft.Tables.{money, moneySum}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series resampling operators over the `events` stream table —
  * the downsampling/telemetry surface a CDC-fed warehouse serves
  * (the batch analogues of the reference's ordered event stream,
  * `client.go:144-162`).
  *
  * Scale notes: both queries are single hash aggregations keyed on
  * (user_id[, bucket]) — map-side partial aggregation means the
  * shuffle carries one partial row per (map partition, key), never the
  * raw events; at 100 TB the exchange is proportional to the key
  * cardinality. No windows over the full log: open/close ride
  * `min_by`/`max_by` partials (each a single (ord, value) pair of
  * state), and the interarrival deltas use one per-key window whose
  * state is O(1) per row (lag(1)).
  */
object TsOps extends OpPack {

  def queries: Map[String, Q] = Map(
    // Forecast-baseline error audit (the MASE denominator question
    // asked BEFORE fitting any model: does last-week beat yesterday
    // as a predictor — i.e. is there weekly structure worth
    // modeling?): daily revenue totals, naive error |x_t − x_{t−1}|
    // vs seasonal-naive |x_t − x_{t−7}|, mean absolute error of each
    // in exact cents and their ratio in permille (ratio < 1000 ⇒
    // weekly seasonality is real — ts_forecast_seasonal is the model
    // this audit justifies). Facts pay ONE map-side daily agg; both
    // lags and the roll-up run on the calendar-bounded daily frame
    // (declared partition-less-window contract).
    "ts_mase_base" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables(s, dir, "events")
        .groupBy(expr("unix_date(CAST(ts AS DATE))").as("dayn"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      val w = Window.orderBy(col("dayn"))
      daily
        .withColumn("e1", abs(col("cents") - lag(col("cents"), 1).over(w)))
        .withColumn("e7", abs(col("cents") - lag(col("cents"), 7).over(w)))
        .agg(count(lit(1)).as("n_days"),
          count(col("e1")).as("n1"), sum(col("e1")).as("s1"),
          count(col("e7")).as("n7"), sum(col("e7")).as("s7"))
        .select(col("n_days"),
          expr("s1 div n1").as("mae_naive_cents"),
          expr("s7 div n7").as("mae_snaive_cents"),
          expr("CAST((CAST(s7 AS DECIMAL(38,0)) * n1 * 1000) div " +
            "(CAST(s1 AS DECIMAL(38,0)) * n7) AS BIGINT)")
            .as("snaive_vs_naive_pm"))
    }),

    // OHLC bar resampling (the classic tick→bar downsample): per
    // (user, day), first/last value by the unique event_id order
    // (ts is monotone in event_id per TESTDATA, so "first by
    // event_id" == "first in time" and the argmin is deterministic),
    // high/low over the 2-decimal money values, exact decimal volume.
    // One hash agg — min_by/max_by carry a single pair of state each,
    // so the bar table streams out of a map-side-combined shuffle.
    "ts_ohlc" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .groupBy(col("user_id"), col("day"))
        .agg(
          min_by(money(col("value")), col("event_id")).as("open"),
          max(money(col("value"))).as("high"),
          min(money(col("value"))).as("low"),
          max_by(money(col("value")), col("event_id")).as("close"),
          moneySum(col("value")).as("volume"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("day"))
    }),

    // Windowed anomaly detection: flag events more than 2σ from their
    // own trailing 10-event window — agg_outliers' all-integer moment
    // algebra ((n·x−S)² > 4(n·Q−S²), exact under decimal(38,0)/
    // HUGEINT, no float σ anywhere) moved into a bounded ROWS frame,
    // so the monitor adapts per key as the series drifts. Frames
    // shorter than 5 events report false (declared warm-up rule — a
    // 2-point σ flags everything). One key shuffle, O(frame) state
    // per row; the telemetry alarm at 100 TB is a windowed scan.
    "ts_anomaly" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-9, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sm", sum(col("cents").cast(dec)).over(w))
        .withColumn("q",
          sum((col("cents").cast(dec) * col("cents"))).over(w))
        .withColumn("dev", col("n").cast(dec) * col("cents") - col("sm"))
        .withColumn("is_anomaly", col("n") >= 5 &&
          col("dev") * col("dev") >
            (col("n").cast(dec) * col("q") - col("sm") * col("sm")) * 4)
        .select(col("user_id"), col("event_id"), col("cents"),
          col("n").as("win_n"), col("is_anomaly"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Inter-arrival time profile per key: consecutive-event gaps in
    // integer microseconds (event_id order), min/max/integer-mean per
    // user — the cadence statistic that sizes polling intervals and
    // rate limits (and the complement of cdc_ooo_audit's lateness
    // audit). One per-key lag window (single user_id shuffle, O(1)
    // state) + one hash agg; all-integer so exactly oracle-checkable.
    "ts_interarrival" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_us")).as("min_gap_us"),
          max(col("gap_us")).as("max_gap_us"),
          expr("sum(gap_us) div count(*)").as("mean_gap_us"))
        .orderBy(col("user_id"))
    }),

    // Bounded-frame EWMA, integer-exact: the classic recursive
    // y_t = α·x_t + (1−α)·y_{t−1} is order-dependent float arithmetic
    // (not mergeable, not engine-portable); with α = 1/2 the trailing
    // 16 terms carry weights 2^15 … 2^0 — exact BIGINT fixed-point
    // (4-dp value units × 2^15 × 16 terms ≈ 2.6e12 ≪ 2^63), and terms
    // beyond 16 lags contribute < 2^-16 ≈ the fixed-point ulp, so the
    // truncation IS the declared semantics, not an approximation. The
    // numerator/denominator SQL is generated once (ewmaTerms) and runs
    // verbatim in BOTH engines — only the integer-div operator
    // differs. One user_id exchange; 30 lag functions share one
    // window frame (O(16) state/row); scan-proportional at 100 TB.
    // Period-over-period delta report (WoW revenue): weekly order
    // revenue in exact cents, each week's change vs the previous week
    // in integer permille (negative deltas truncate toward zero
    // identically in both engines). The lag window is GLOBAL but runs
    // on the already-aggregated week frame — bounded by the calendar
    // (~350 rows here, never corpus-proportional), which is the
    // declared contract for partition-less windows in this engine.
    // CUSUM change-point statistic, integer-exact and fully
    // window-expressible: the textbook recursion
    // s_t = max(0, s_{t-1} + x_t − k) looks sequential, but has the
    // closed form s_t = S_t − min(0, min_{j≤t} S_j) over the prefix
    // sums S of (x−k) — so the whole detector is ONE user_id exchange
    // carrying a running sum and a running min (O(1) state/row, no
    // recursion, no UDF). Drift k = global mean in milli-cents
    // (integer div; the one collected scalar — same pattern as the
    // win_gapfill bounds); alarm at 10·k of accumulated surplus — a
    // scale-free threshold, non-empty at every test sf (41 / 821 /
    // 8431 alarms). At 100 TB this is a scan + one bounded window:
    // the streaming-telemetry drift monitor as a batch plan.
    "ts_cusum" -> ((s, dir) => {
      val base = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val kmRow = base.agg(expr("(1000 * sum(cents)) div count(1)"))
        .collect()(0)
      // empty events: the mean is NULL; 0 keeps the op total (the
      // windowed frame below is empty anyway)
      val km = if (kmRow.isNullAt(0)) 0L else kmRow.getLong(0)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base
        .withColumn("inc", col("cents") * 1000 - lit(km))
        .withColumn("run", sum(col("inc")).over(w))
        .withColumn("runmin", min(col("run")).over(w))
        .withColumn("cusum_fp", col("run") - least(lit(0L), col("runmin")))
        .withColumn("alarm", col("cusum_fp") > lit(10L * km))
        .select(col("user_id"), col("event_id"), col("cusum_fp"),
          col("alarm"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Linear-interpolation resampling onto the regular daily grid
    // (win_gapfill's LOCF sibling — telemetry wants the trend line,
    // not a step function). Daily per-user cent totals; the grid is
    // clipped to each user's own [first, last] observed day (interior
    // interpolation only — no extrapolation, declared), and gap days
    // get p + (n−p)·Δt div span in exact integer cents (div truncates
    // toward zero identically in both engines, including negative
    // slopes). Bracketing observations come from two ignoreNulls
    // window passes over the SAME user_id exchange — O(1) state per
    // row, spine bounded by keys × calendar, never event-proportional.
    "ts_resample_linear" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val daily = e.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
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
      val wb = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(daily, Seq("user_id", "day"), "left_outer")
        .withColumn("obs_day", when(col("cents").isNotNull, col("day")))
        .withColumn("p_day", last(col("obs_day"), ignoreNulls = true).over(wb))
        .withColumn("p_val", last(col("cents"), ignoreNulls = true).over(wb))
        .withColumn("n_day", first(col("obs_day"), ignoreNulls = true).over(wf))
        .withColumn("n_val", first(col("cents"), ignoreNulls = true).over(wf))
        .filter(col("p_day").isNotNull && col("n_day").isNotNull)
        .withColumn("value_interp", when(col("cents").isNotNull, col("cents"))
          .otherwise(expr("p_val + ((n_val - p_val) * " +
            "datediff(day, p_day)) div datediff(n_day, p_day)")))
        .withColumn("was_observed", col("cents").isNotNull)
        .select(col("user_id"), col("day"), col("value_interp"),
          col("was_observed"))
        .orderBy(col("user_id"), col("day"))
    }),

    "ts_period_delta" -> ((s, dir) => {
      val w = Window.orderBy(col("wk"))
      Tables(s, dir, "orders")
        .withColumn("wk", date_trunc("week", col("o_orderdate")).cast("date"))
        .groupBy(col("wk"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("rev_c"), count(lit(1)).as("n_orders"))
        .withColumn("prev_c", lag(col("rev_c"), 1).over(w))
        .withColumn("delta_permille",
          expr("((rev_c - prev_c) * 1000) div prev_c"))
        .select(col("wk"), col("rev_c"), col("n_orders"),
          col("prev_c"), col("delta_permille"))
        .orderBy(col("wk"))
    }),

    // Brown double smoothing (see [[holtSql]]): the generated SQL is
    // shared verbatim with the DuckDB oracle, Spark spelling of
    // integer division only.
    "ts_holt" -> ((s, dir) => {
      // Suffixed view name (events_holt, matching the events_ewma
      // convention): registering the raw table name 'events' would
      // shadow it for every later SQL-text op in the session and make
      // results depend on op execution order.
      Tables(s, dir, "events").createOrReplaceTempView("events_holt")
      s.sql(holtSql("div", "events_holt"))
    }),

    // Autocorrelation profile per key, integer-exact: center each
    // user's cent series on its own integer mean (sum div n — the
    // whole-partition window rides the SAME user_id exchange as the
    // lag window, no extra shuffle), then ACF_k in permille =
    // 1000·Σ d_t·d_{t−k} div Σ d_t² for lags 1..3. Products go
    // through decimal(38,0)/HUGEINT (cent deviations square past 2⁶³
    // at telemetry magnitudes); sum skips null lagged terms in both
    // engines, and negative numerators truncate toward zero
    // identically (the agg_regression rule). One exchange + one hash
    // agg: the seasonality probe that decides resample grain at
    // 100 TB is a windowed scan.
    "ts_acf" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val d = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("mu", expr(
          "sum(cents) OVER (PARTITION BY user_id) div " +
            "count(*) OVER (PARTITION BY user_id)"))
        .withColumn("d", (col("cents") - col("mu")).cast(dec))
        .withColumn("d1", lag(col("d"), 1).over(w))
        .withColumn("d2", lag(col("d"), 2).over(w))
        .withColumn("d3", lag(col("d"), 3).over(w))
      d.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("d") * col("d")).as("s0"),
          sum(col("d") * col("d1")).as("s1"),
          sum(col("d") * col("d2")).as("s2"),
          sum(col("d") * col("d3")).as("s3"))
        .select(col("user_id"), col("n"),
          acfPm("s1").as("acf1_pm"), acfPm("s2").as("acf2_pm"),
          acfPm("s3").as("acf3_pm"))
        .orderBy(col("user_id"))
    }),

    // Spearman rank correlation of value vs time per key — the
    // ROBUST monotone-trend test (outlier-immune where the Pearson
    // slope of agg_regression is not): ranks from two row_number
    // windows over the SAME user_id exchange (time rank by event_id;
    // value rank by (cents, event_id) — the declared deterministic
    // tie-break), then ρ×1000 = 1000 − (6000·Σd²) div (n³−n) with
    // Σd² in decimal(38,0) (d ≤ n ⇒ Σd² ≤ n³). Series shorter than
    // 3 points are dropped (ρ undefined at n ≤ 2 up to sign). One
    // exchange + one hash agg at any scale.
    "ts_spearman" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val wT = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val wX = Window.partitionBy(col("user_id"))
        .orderBy(col("cents"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("rt", row_number().over(wT))
        .withColumn("rx", row_number().over(wX))
        .withColumn("d", (col("rx") - col("rt")).cast(dec))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("d") * col("d")).as("sd2"))
        .filter(col("n") >= 3)
        .select(col("user_id"), col("n"),
          expr("CAST(sd2 AS BIGINT)").as("sum_d2"),
          expr("CAST(1000 - (6000 * sd2) div " +
            "(CAST(n AS DECIMAL(38,0)) * n * n - n) AS BIGINT)")
            .as("rho_milli"))
        .orderBy(col("user_id"))
    }),

    // Lead/lag CROSS-correlation between two daily business series —
    // "does revenue booked today predict shipment volume k days
    // later?" — as Spearman rho at lags 0..7 (rank-based ⇒ the whole
    // readout is integer-exact cross-engine, the ts_spearman
    // doctrine; Pearson's float sums are exactly what rule ② bans).
    // Each fact table pays ONE hash agg to its daily series (orders
    // by o_orderdate, lineitem by l_shipdate); everything after is
    // calendar-bounded: the 8-lag explode multiplies ~2.4k day rows,
    // the (day+lag)=day equi-join aligns the two series per lag, and
    // rank windows partition by lag. At 100 TB the fact cost is two
    // aggregations — the correlation frame never grows with data.
    "ts_xcorr" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val x = Tables(s, dir, "orders")
        .groupBy(col("o_orderdate").as("day"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("xv"))
      val y = Tables(s, dir, "lineitem")
        .groupBy(col("l_shipdate").as("yday"))
        .agg(sum(expr("CAST(round(l_quantity * 100) AS BIGINT)"))
          .as("yv"))
      val wX = Window.partitionBy(col("lag")).orderBy(col("xv"), col("day"))
      val wY = Window.partitionBy(col("lag")).orderBy(col("yv"), col("day"))
      x.withColumn("lag", explode(expr("sequence(0, 7)")))
        .withColumn("ykey", expr("date_add(day, lag)"))
        .join(y, col("ykey") === col("yday"))
        .withColumn("rx", row_number().over(wX))
        .withColumn("ry", row_number().over(wY))
        .withColumn("d", (col("rx") - col("ry")).cast(dec))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_days"), sum(col("d") * col("d")).as("sd2"))
        .filter(col("n_days") >= 3)
        .select(col("lag").cast("bigint").as("lag"), col("n_days"),
          expr("CAST(sd2 AS BIGINT)").as("sum_d2"),
          expr("CAST(1000 - (6000 * sd2) div " +
            "(CAST(n_days AS DECIMAL(38,0)) * n_days * n_days - n_days) " +
            "AS BIGINT)").as("rho_milli"))
        .orderBy(col("lag"))
    }),

    // Day-of-week seasonal decomposition of daily order revenue:
    // exact-cent daily totals (one two-phase hash agg over orders),
    // dow from an epoch-anchored modulus (1990-01-07 was a Sunday;
    // dayofweek() numbering differs across engines, datediff mod 7
    // does not), per-dow integer-mean seasonal component via a
    // window over the CALENDAR-BOUNDED aggregate (~2.5k rows here,
    // never fact-proportional — the declared contract for
    // partition-light windows), residual = observed − seasonal. The
    // classic pre-forecast decomposition at 100 TB stays one fact
    // shuffle; everything after the daily agg is bounded by days.
    "ts_seasonal" -> ((s, dir) => {
      val wd = Window.partitionBy(col("dow"))
      Tables(s, dir, "orders")
        .groupBy(col("o_orderdate").as("day"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("rev_c"))
        .withColumn("dow",
          pmod(datediff(col("day"), to_date(lit("1990-01-07"))), lit(7)))
        .withColumn("seasonal_c", expr(
          "sum(rev_c) OVER (PARTITION BY dow) div " +
            "count(*) OVER (PARTITION BY dow)"))
        .withColumn("residual_c", col("rev_c") - col("seasonal_c"))
        .select(col("day"), col("dow"), col("rev_c"),
          col("seasonal_c"), col("residual_c"))
        .orderBy(col("day"))
    }),

    // Seasonal index by calendar month (the retail-planning readout;
    // ts_seasonal holds the day-of-week sibling over events): each
    // month's revenue ×12 vs the all-months total in ppm — 10⁶ = an
    // average month, the multiplier inventory/staffing plans scale
    // by. ONE map-side-combined hash agg to 12 rows; the total
    // window rides that bounded frame; products in DECIMAL(38,0)/
    // HUGEINT.
    "ts_month_index" -> ((s, dir) => {
      val m = Tables(s, dir, "orders")
        .groupBy(month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .as("cents"))
      m.withColumn("total", sum(col("cents")).over(Window.partitionBy()))
        .select(col("m"), col("n_orders"), col("cents"),
          expr("CAST((CAST(cents AS DECIMAL(38,0)) * 12000000) " +
            "div total AS BIGINT)").as("index_ppm"))
        .orderBy(col("m"))
    }),

    // Telemetry downsampling by max-deviation-per-bucket (the
    // deterministic LTTB-lite every plotting pipeline ships): each
    // user's series splits into 10 equal-count buckets by event
    // order, and each bucket keeps its single most extreme point
    // (max |cents − bucket mean|, tie to the earliest event) — peaks
    // and troughs survive where naive every-Nth sampling flattens
    // them. All windows (count, rank, bucket mean, keep-rank)
    // partition on user_id / (user_id, bucket) — per-series state,
    // never a global pass; the bucket mean is an integer floor both
    // engines share.
    "ts_downsample" -> ((s, dir) => {
      val byU = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("rn", row_number().over(byU).cast("long"))
        .withColumn("nu",
          count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .withColumn("b", expr("((rn - 1) * 10) div nu"))
      val byB = Window.partitionBy(col("user_id"), col("b"))
      e.withColumn("bmean", expr("sum(cents) OVER " +
          "(PARTITION BY user_id, b) div count(1) OVER " +
          "(PARTITION BY user_id, b)"))
        .withColumn("dev", abs(col("cents") - col("bmean")))
        .withColumn("rk", row_number().over(
          byB.orderBy(desc("dev"), asc("event_id"))))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("b"), col("event_id"),
          col("cents"), col("dev"))
        .orderBy(col("user_id"), col("b"))
    }),

    // Strict local-maximum peak detection per user series (the alert
    // candidates a threshold-free monitor surfaces): a row is a peak
    // iff both neighbors exist and are strictly lower. lag+lead share
    // ONE user_id exchange (same partitioning+ordering ⇒ chained
    // WindowExecs, no re-shuffle), then one hash agg rolls up count /
    // tallest peak / first peak position. O(1) window state per row.
    "ts_peak_detect" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("pv", lag(col("cents"), 1).over(w))
        .withColumn("nx", lead(col("cents"), 1).over(w))
        .withColumn("is_peak",
          (col("pv").isNotNull && col("nx").isNotNull &&
            col("cents") > col("pv") && col("cents") > col("nx"))
            .cast("long"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("is_peak")).as("n_peaks"),
          max(when(col("is_peak") === 1, col("cents")))
            .as("max_peak_cents"),
          min(when(col("is_peak") === 1, col("event_id")))
            .as("first_peak_event"))
        .orderBy(col("user_id"))
    }),

    // One-step-ahead forecast backtest of the Brown/Holt smoother
    // (the "should we trust this forecast" readout): at each point,
    // the forecast the model had BEFORE seeing it (lag of ts_holt's
    // 3s1−2s2) vs the actual, rolled up per user as MAE and max error
    // in fixed-point. ONE generated SQL text (the holtSql/ewmaTerms
    // convention) runs verbatim in both engines; the two smoothing
    // passes + the lag share one user_id exchange, then a hash agg.
    "composite_forecast_backtest" -> ((s, dir) => {
      Tables(s, dir, "events")
        .createOrReplaceTempView("events_backtest")
      s.sql(backtestSql("div", "events_backtest"))
    }),

    // Interval-overlap concurrency profile (sweep-line): each event
    // holds a resource for round(value·60) seconds; per (event_type,
    // start-date), the peak number of simultaneously-open intervals.
    // Classic ±1 boundary sweep — start = +1, end = −1, running sum
    // in boundary order = live concurrency; half-open [start, end)
    // declared by sorting ends BEFORE starts at equal stamps (delta
    // asc), event_id closes the total order. SCALE PATH: the sweep
    // window partitions on (type, date) — calendar-bounded partitions
    // (never one partition per type across the whole log); intervals
    // are minutes-scale so date-bucketing the sweep is the declared
    // grain. 2× boundary explode, one windowed pass, one hash agg.
    "ts_concurrency" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          to_date(col("ts")).as("d"),
          floor(unix_timestamp(col("ts"))).cast("long").as("es"),
          expr("greatest(CAST(1 AS BIGINT), " +
            "CAST(round(value * 60) AS BIGINT))").as("dur"))
      val bounds = e.select(col("event_type"), col("d"), col("event_id"),
          col("es").as("t"), lit(1L).as("delta"))
        .union(e.select(col("event_type"), col("d"), col("event_id"),
          (col("es") + col("dur")).as("t"), lit(-1L).as("delta")))
      val w = Window.partitionBy(col("event_type"), col("d"))
        .orderBy(col("t"), col("delta"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bounds.withColumn("live", sum(col("delta")).over(w))
        .groupBy(col("event_type"), col("d"))
        .agg(expr("count(1) div 2").as("n_events"),
          max(col("live")).as("max_concurrent"))
        .orderBy(col("event_type"), col("d"))
    }),

    // Seasonality STRENGTH (variance explained by the day-of-week
    // profile, the scalar summary next to ts_month_index's per-bucket
    // index): 1000·(1 − SS_dow/SS_total) over daily order revenue,
    // with both sums of squares anchored at INTEGER means (sum div n
    // — the agg_skew_kurt anchor doctrine: a declared, cross-engine-
    // exact variant of the textbook statistic). Day-of-week is
    // days-since-epoch mod 7 (engine DOW builtins disagree on the
    // week origin; epoch arithmetic is origin-free). Daily agg
    // map-side combined; every window runs on the calendar-bounded
    // daily frame.
    "ts_seasonal_strength" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_sstr")
      s.sql(seasonStrengthSql("DECIMAL(38,0)", "div",
        d => s"unix_date($d)", "orders_sstr"))
    }),

    "ts_forecast_seasonal" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_sfc")
      s.sql(seasonalForecastSql("div", d => s"unix_date($d)",
        "events_sfc"))
    }),

    // Classical additive decomposition (STL-lite): daily revenue =
    // trend (centered 7-day MA, full windows only) + day-of-week
    // seasonal index + residual — the first chart a demand analyst
    // draws, exact in integer cents (see seasonalDecompSql).
    "ts_seasonal_decompose" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_sdec")
      s.sql(seasonalDecompSql("DECIMAL(38,0)", "div",
        d => s"unix_date($d)", "orders_sdec"))
    }),

    // Single change-point detection (binary segmentation's first
    // split, AMOC): the day k maximizing the CUSUM deviation
    // |n·S_k − k·S_n| of the daily-revenue prefix sums — the point
    // where the series' mean level shifts most. The statistic is the
    // classic max-CUSUM form with the 1/n scaling cleared by
    // cross-multiplication, so every comparison is integer-exact
    // (products ride DECIMAL(38,0)/HUGEINT); ties break to the
    // earliest day via the filter-to-max + min(day) construction —
    // the SAME generated SQL text runs in both engines (only the
    // wide-integer type token differs, the holtSql convention).
    // SCALE: the daily agg is map-side combined; every window runs on
    // the calendar-bounded (type, day) frame, never the raw log.
    "ts_changepoint" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_changepoint")
      s.sql(changepointSql("DECIMAL(38,0)", "events_changepoint"))
    }),

    "ts_ewma" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_ewma")
      val (num, den) = ewmaTerms()
      s.sql(s"""
        WITH base AS (
          SELECT user_id, event_id,
            CAST(round(value * 10000) AS BIGINT) AS v_fp
          FROM events_ewma)
        SELECT user_id, event_id, v_fp,
          CAST(($num) div ($den) AS BIGINT) AS ewma_fp
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        ORDER BY user_id, event_id""")
    }),

    // Calendar load profile (the day-of-week × hour-of-day heatmap
    // every ops/capacity dashboard opens with): event counts per
    // (dow, hour) cell with the cell's share of total traffic in ppm.
    // DOW is epoch-days mod 7 (engine DOW builtins disagree on week
    // origin — the ts_seasonal_strength doctrine); hour() under the
    // UTC session is identical in both engines. ONE map-side-combined
    // hash agg onto the ≤168-cell calendar frame; the share window
    // rides that bounded frame (declared partition-less-window
    // contract) — profiling 100 TB of telemetry costs one scan.
    "ts_calendar_profile" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(expr("unix_date(CAST(ts AS DATE)) % 7").as("dow"),
          hour(col("ts")).as("hr"))
        .groupBy(col("dow"), col("hr"))
        .agg(count(lit(1)).as("n"))
        .withColumn("total",
          sum(col("n")).over(Window.partitionBy(lit(1))))
        .select(col("dow"), col("hr"), col("n"),
          expr("CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div total " +
            "AS BIGINT)").as("share_ppm"))
        .orderBy(col("dow"), col("hr"))
    }),

    // MACD momentum indicator (fast EMA − slow EMA, plus its own
    // smoothed signal line and the histogram traders actually chart):
    // fast = the bounded-16-term α=1/2 EWMA (ts_ewma's exact form),
    // slow = the same truncated form at α=1/4 (weights 3^k·4^(15−k) —
    // still exact integers, ≤2^30 each), signal = α=1/2 EWMA of the
    // macd series. ONE generated SQL text runs verbatim in both
    // engines (the holtSql convention — only the wide-type/div tokens
    // differ); all three smoothing passes share a single `PARTITION BY
    // user_id` window, so the whole indicator is ONE exchange with
    // O(16) state per row — scan-proportional at 100 TB. Divisions of
    // the (possibly NEGATIVE) macd numerator ride DECIMAL(38,0)/
    // HUGEINT, where both engines truncate toward zero (SKILL-pinned).
    "ts_macd" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_macd")
      s.sql(macdSql("DECIMAL(38,0)", "div", "events_macd"))
    }),

    // Volume-weighted average (VWAP — TWAP's sibling where the weight
    // is a per-observation QUANTITY instead of a holding interval):
    // per day, Σ cents·qty div Σ qty with the products ridden in
    // DECIMAL(38,0)/HUGEINT and integer div — the exact-cents answer
    // a float mean cannot give. ONE map-side-combined hash agg on
    // day: scan-proportional, single shuffle, no window at all.
    "ts_vwap" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      Tables(s, dir, "events")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("qty",
          get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("cents").isNotNull && col("qty").isNotNull)
        .withColumn("day", to_date(col("ts")))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"),
          sum(col("cents").cast(dec) * col("qty")).as("wsum"))
        .select(col("day"), col("n"), col("sum_qty"),
          expr("CAST(CASE WHEN sum_qty = 0 THEN NULL ELSE " +
            "wsum div sum_qty END AS BIGINT)").as("vwap_cents"))
        .orderBy(col("day"))
    }),

    // Bollinger-band breaches, integer-exact: a 5-observation trailing
    // window's mean ± 2σ tested WITHOUT ever dividing — |x−μ| > 2σ ⇔
    // (x·n−S)² > 4(n·Σx²−S²), every term an exact integer (bounds:
    // cents ≤ ~6e4, n = 5 ⇒ lhs ≤ ~1e11, rhs ≤ ~1e12 — deep inside
    // BIGINT; DuckDB rides HUGEINT window sums). Only full windows
    // count (declared warm-up rule, the win_sma_crossover doctrine).
    // The THREE window sums and the per-user rollup share ONE user_id
    // exchange. Identical generated SQL runs in both engines.
    "ts_bollinger" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_boll")
      s.sql(bollingerSql("events_boll"))
    }),

    // Relative Strength Index (Wilder's RSI collapsed to the whole
    // series — the bounded-momentum ratio): per user over event_id
    // order, gains = Σ max(Δcents, 0), losses = Σ max(−Δcents, 0),
    // rsi_permille = 1000·gains div (gains+losses); flat series
    // (denominator 0) declared NULL. ONE lag window + ONE map-side-
    // combined hash agg on the SAME user_id exchange — the ts_twap
    // shuffle shape exactly.
    "ts_rsi" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("delta", col("cents") - lag(col("cents"), 1).over(w))
        .filter(col("delta").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_deltas"),
          sum(greatest(col("delta"), lit(0L))).as("gains"),
          sum(greatest(-col("delta"), lit(0L))).as("losses"))
        .select(col("user_id"), col("n_deltas"),
          expr("CAST(CASE WHEN gains + losses = 0 THEN NULL ELSE " +
            "(1000 * gains) div (gains + losses) END AS BIGINT)")
            .as("rsi_permille"))
        .orderBy(col("user_id"))
    }),

    // Time-weighted average (TWAP — the telemetry/finance mean that
    // irregular sampling demands: an arithmetic mean over-weights
    // bursts; weighting each observation by how long it HELD, i.e.
    // until the next one, does not). Per user: Σ cents·hold_µs div
    // Σ hold_µs, products in DECIMAL(38,0)/HUGEINT, integer div — the
    // final observation has no holding interval and is excluded by
    // the declared last-point rule. One lead window + one map-side-
    // combined hash agg on the SAME user_id exchange; the whole
    // operator is scan-proportional with a single shuffle.
    "ts_twap" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val dec = DecimalType(38, 0)
      Tables(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("hold_us", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("hold_us").isNotNull && col("cents").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("hold_us")).as("span_us"),
          sum(col("cents").cast(dec) * col("hold_us")).as("wsum"))
        .select(col("user_id"), col("n_intervals"), col("span_us"),
          expr("CAST(CASE WHEN span_us = 0 THEN NULL ELSE " +
            "wsum div span_us END AS BIGINT)").as("twap_cents"))
        .orderBy(col("user_id"))
    }),

    // Adaptive batch sessionization: split each user's event stream at
    // gaps LARGER THAN THAT USER'S OWN mean inter-event gap — the
    // scale-free sibling of stream_session's fixed 30-min gap (a fixed
    // threshold degenerates as event density changes 100× across SFs;
    // the per-user mean adapts). The threshold comparison is
    // cross-multiplied (gap·n_gaps > Σgaps) so no division happens —
    // integer-exact in both engines. Per-session readout: event count,
    // start, duration, exact-cent value volume. SCALE: the gap lag,
    // the per-user gap moments, and the running break-sum all share
    // ONE user_id exchange (three WindowExecs, O(1) state each), then
    // one map-side-combined hash agg on (user, session) — the whole
    // sessionizer is scan-proportional with a single shuffle.
    "ts_sessionize" -> ((s, dir) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val wAll = Window.partitionBy(col("user_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(wOrd))
        .withColumn("n_gaps", count(col("gap")).over(wAll))
        .withColumn("sum_gaps", sum(col("gap")).over(wAll))
        .withColumn("brk", when(col("gap").isNull ||
          col("gap") * col("n_gaps") > col("sum_gaps"), 1L).otherwise(0L))
        .withColumn("session_no", sum(col("brk")).over(wOrd))
        .groupBy(col("user_id"), col("session_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"),
          (max(col("us")) - min(col("us"))).as("duration_us"),
          sum(round(col("value") * 100).cast("long")).as("value_c"))
        .orderBy(col("user_id"), col("session_no"))
    }),

    // On-balance volume (the classic accumulation/distribution
    // indicator): daily bars from the tick stream, then obv_t =
    // obv_{t-1} + sign(close_t − close_{t-1})·vol_t as ONE running
    // sum. SCALE: the tick→bar collapse is one map-side-combined hash
    // agg (min_by/max_by carry a single pair of state); every window
    // after it runs on the calendar-bounded daily frame (|days| rows,
    // the seasonalDecompSql doctrine). Shared SQL text both engines.
    "ts_obv" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_obv")
      s.sql(obvSql("events_obv"))
    }),

    // Donchian channel (rolling 7-day high/low band) + close position
    // inside the band in permille — integer cents, div truncation,
    // full-window rule (first 6 days drop, declared). Windows on the
    // bounded daily frame; numerator (close−lower)·1000 is
    // non-negative by construction so div is engine-identical.
    "ts_donchian" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_don")
      s.sql(donchianSql("div", "events_don"))
    }),

    // Average True Range (Wilder's volatility bar gauge): TR =
    // greatest(H−L, |H−prev C|, |L−prev C|) per day, ATR = trailing
    // 7-day integer mean (sum div 7 — TR is non-negative so
    // truncation is floor in both engines). First day has no prev
    // close and drops; only full 7-TR windows report (declared).
    "ts_atr" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_atr")
      s.sql(atrSql("DECIMAL(38,0)", "div", "events_atr"))
    }),

    // Stochastic oscillator: %K = (close − low14)·1000 div
    // (high14 − low14) over full 14-day windows (flat channel ⇒ NULL,
    // declared); %D = 3-day mean of %K, reported only when all three
    // %K values exist. Same bounded-frame window chain as ts_atr.
    "ts_stochastic" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_sto")
      s.sql(stochasticSql("DECIMAL(38,0)", "div", "events_sto"))
    }),

    // Classic floor-trader pivot points from the PREVIOUS day's bar:
    // P = (H+L+C) div 3, R1 = 2P−L, S1 = 2P−H, R2 = P+(H−L),
    // S2 = P−(H−L), plus an R1-breakout flag on today's close. All
    // positive integer cents — div 3 truncates identically. One lag
    // on the bounded daily frame.
    "ts_pivot_points" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_piv")
      s.sql(pivotSql("div", "events_piv"))
    }),

    // Burstiness classification per user — the squared coefficient of
    // variation of inter-event gaps, DIVISION-FREE: CV² vs the
    // Poisson benchmark 1 via n·Q vs 2·S² and the regular cut
    // CV² < 1/2 via 2·n·Q vs 3·S² (Cauchy–Schwarz gives n·Q ≥ S², so
    // cv2_pm = 1000·(n·Q − S²) div S² is non-negative). Gap squares
    // ride DECIMAL(38,0)/HUGEINT (µs gaps square past 2^63). ONE lag
    // window + ONE map-side-combined hash agg on the same user_id
    // exchange — the ts_rsi shuffle shape. Users with < 2 gaps are
    // unclassifiable (declared NULL class).
    "ts_burstiness" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val dec = DecimalType(38, 0)
      Tables(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap").cast(dec)).as("s"),
          sum(col("gap").cast(dec) * col("gap")).as("q"))
        .select(col("user_id"), col("n_gaps"),
          expr("CAST(CASE WHEN s > 0 THEN " +
            "((n_gaps * q - s * s) * 1000) div (s * s) END AS BIGINT)")
            .as("cv2_pm"),
          expr("CASE WHEN n_gaps < 2 OR s = 0 THEN NULL " +
            "WHEN n_gaps * q > 2 * s * s THEN 'bursty' " +
            "WHEN 2 * n_gaps * q < 3 * s * s THEN 'regular' " +
            "ELSE 'poisson' END").as("class"))
        .orderBy(col("user_id"))
    }),

    // Aroon oscillator (25-day): how recently did the trailing window
    // set its high/low? aroon_up = (25 − days_since_high)·1000 div 25
    // over FULL windows only. The argmax index is recovered exactly —
    // max(i) among window rows equal to the window max — via a
    // 25-wide band self-join on the BOUNDED daily frame (≤ |days|·25
    // rows regardless of SF; the tick→bar collapse already reduced
    // the log), so double-valued ties break to the most recent day,
    // the standard Aroon convention, with no double arithmetic.
    "ts_aroon" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_aroon")
      s.sql(aroonSql("div", "events_aroon"))
    }))

  /** Daily-bar CTE shared by the indicator family (tick→bar collapse:
    * ONE map-side-combined hash agg; open/close ride min_by/max_by on
    * the unique event_id order — ts monotone in event_id per
    * TESTDATA). Returns stripped text for interpolation. */
  private def dailyBars(table: String): String =
    s"""daily AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    min_by(CAST(round(value * 100) AS BIGINT), event_id)
       |      AS open_c,
       |    max(CAST(round(value * 100) AS BIGINT)) AS high_c,
       |    min(CAST(round(value * 100) AS BIGINT)) AS low_c,
       |    max_by(CAST(round(value * 100) AS BIGINT), event_id)
       |      AS close_c,
       |    CAST(count(*) AS BIGINT) AS vol
       |  FROM $table WHERE value IS NOT NULL
       |  GROUP BY CAST(ts AS DATE))""".stripMargin

  /** Aroon up/down (only the integer-div token differs per engine):
    * day index by row_number over the daily frame, window extrema by
    * plain windows, then the most-recent argmax/argmin index via a
    * 25-wide band self-join — exact under value ties, no float math. */
  private[ops] def aroonSql(divOp: String, table: String): String =
    s"""WITH ${dailyBars(table)},
       |ix AS (
       |  SELECT day, high_c, low_c,
       |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
       |  FROM daily),
       |w AS (
       |  SELECT i, day,
       |    max(high_c) OVER w25 AS hmax,
       |    min(low_c) OVER w25 AS lmin,
       |    count(*) OVER w25 AS n25
       |  FROM ix
       |  WINDOW w25 AS (ORDER BY i
       |                 ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)),
       |a AS (
       |  SELECT w.i AS i, w.day AS day,
       |    max(CASE WHEN b.high_c = w.hmax THEN b.i END) AS hi_i,
       |    max(CASE WHEN b.low_c = w.lmin THEN b.i END) AS lo_i
       |  FROM w JOIN ix b ON b.i BETWEEN w.i - 24 AND w.i
       |  WHERE w.n25 = 25
       |  GROUP BY w.i, w.day)
       |SELECT day,
       |  CAST(i - hi_i AS BIGINT) AS days_since_high,
       |  CAST(i - lo_i AS BIGINT) AS days_since_low,
       |  CAST(((25 - (i - hi_i)) * 1000) $divOp 25 AS BIGINT)
       |    AS aroon_up_pm,
       |  CAST(((25 - (i - lo_i)) * 1000) $divOp 25 AS BIGINT)
       |    AS aroon_down_pm
       |FROM a ORDER BY day""".stripMargin

  /** On-balance volume as shared SQL (identical text both engines —
    * no division anywhere). */
  private[ops] def obvSql(table: String): String =
    s"""WITH ${dailyBars(table)},
       |d AS (
       |  SELECT day, close_c, vol,
       |    lag(close_c, 1) OVER (ORDER BY day) AS prev_c
       |  FROM daily)
       |SELECT day, close_c,
       |  CAST(sum(CASE WHEN prev_c IS NULL THEN 0
       |      WHEN close_c > prev_c THEN vol
       |      WHEN close_c < prev_c THEN -vol ELSE 0 END)
       |    OVER (ORDER BY day) AS BIGINT) AS obv
       |FROM d ORDER BY day""".stripMargin

  /** Donchian channel + permille band position (only the integer-div
    * token differs per engine). */
  private[ops] def donchianSql(divOp: String, table: String): String =
    s"""WITH ${dailyBars(table)},
       |w AS (
       |  SELECT day, close_c,
       |    max(high_c) OVER w7 AS upper_c,
       |    min(low_c) OVER w7 AS lower_c,
       |    count(*) OVER w7 AS n7
       |  FROM daily
       |  WINDOW w7 AS (ORDER BY day
       |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
       |SELECT day, close_c, upper_c, lower_c,
       |  CAST(CASE WHEN upper_c > lower_c THEN
       |    ((close_c - lower_c) * 1000) $divOp (upper_c - lower_c)
       |  END AS BIGINT) AS pos_permille
       |FROM w WHERE n7 = 7 ORDER BY day""".stripMargin

  /** ATR(7) (wide-type + integer-div tokens per engine). */
  private[ops] def atrSql(wide: String, divOp: String,
      table: String): String =
    s"""WITH ${dailyBars(table)},
       |d AS (
       |  SELECT day, high_c, low_c,
       |    lag(close_c, 1) OVER (ORDER BY day) AS pc
       |  FROM daily),
       |t AS (
       |  SELECT day,
       |    greatest(high_c - low_c, abs(high_c - pc), abs(low_c - pc))
       |      AS tr_c
       |  FROM d WHERE pc IS NOT NULL),
       |a AS (
       |  SELECT day, tr_c,
       |    CAST(sum(tr_c) OVER w7 AS $wide) AS s7,
       |    count(*) OVER w7 AS n7
       |  FROM t
       |  WINDOW w7 AS (ORDER BY day
       |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
       |SELECT day, tr_c, CAST(s7 $divOp 7 AS BIGINT) AS atr_c
       |FROM a WHERE n7 = 7 ORDER BY day""".stripMargin

  /** Stochastic oscillator %K(14)/%D(3). */
  private[ops] def stochasticSql(wide: String, divOp: String,
      table: String): String =
    s"""WITH ${dailyBars(table)},
       |k0 AS (
       |  SELECT day, close_c,
       |    max(high_c) OVER w14 AS h14,
       |    min(low_c) OVER w14 AS l14,
       |    count(*) OVER w14 AS n14
       |  FROM daily
       |  WINDOW w14 AS (ORDER BY day
       |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
       |k AS (
       |  SELECT day,
       |    CAST(CASE WHEN h14 > l14 THEN
       |      ((close_c - l14) * 1000) $divOp (h14 - l14)
       |    END AS BIGINT) AS k_permille
       |  FROM k0 WHERE n14 = 14),
       |d AS (
       |  SELECT day, k_permille,
       |    CAST(sum(k_permille) OVER w3 AS $wide) AS sk,
       |    count(k_permille) OVER w3 AS nk,
       |    count(*) OVER w3 AS n3
       |  FROM k
       |  WINDOW w3 AS (ORDER BY day
       |                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
       |SELECT day, k_permille,
       |  CAST(CASE WHEN n3 = 3 AND nk = 3 THEN sk $divOp 3
       |    END AS BIGINT) AS d_permille
       |FROM d ORDER BY day""".stripMargin

  /** Floor-trader pivot points from the previous bar. */
  private[ops] def pivotSql(divOp: String, table: String): String =
    s"""WITH ${dailyBars(table)},
       |p AS (
       |  SELECT day, close_c,
       |    lag(high_c, 1) OVER (ORDER BY day) AS ph,
       |    lag(low_c, 1) OVER (ORDER BY day) AS pl,
       |    lag(close_c, 1) OVER (ORDER BY day) AS pc
       |  FROM daily),
       |v AS (
       |  SELECT day, close_c, ph, pl,
       |    CAST((ph + pl + pc) $divOp 3 AS BIGINT) AS pivot_c
       |  FROM p WHERE pc IS NOT NULL)
       |SELECT day, close_c, pivot_c,
       |  2 * pivot_c - pl AS r1_c, 2 * pivot_c - ph AS s1_c,
       |  pivot_c + (ph - pl) AS r2_c, pivot_c - (ph - pl) AS s2_c,
       |  CAST(CASE WHEN close_c > 2 * pivot_c - pl THEN 1 ELSE 0 END
       |    AS BIGINT) AS breakout_r1
       |FROM v ORDER BY day""".stripMargin

  /** Bollinger-breach SQL shared VERBATIM by both engines (only the
    * scanned table name differs): trailing 5-row window sums, the
    * division-free breach test, and the per-user rollup. */
  private[ops] def bollingerSql(table: String): String =
    s"""WITH base AS (
       |  SELECT user_id, event_id,
       |    CAST(round(value * 100) AS BIGINT) AS c
       |  FROM $table WHERE value IS NOT NULL),
       |w5 AS (
       |  SELECT user_id, c,
       |    sum(c) OVER w AS s1,
       |    sum(c * c) OVER w AS s2,
       |    count(*) OVER w AS n
       |  FROM base
       |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
       |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
       |b AS (
       |  SELECT user_id,
       |    CASE WHEN c * 5 - s1 > 0 AND
       |      (c * 5 - s1) * (c * 5 - s1) > 4 * (5 * s2 - s1 * s1)
       |      THEN 1 ELSE 0 END AS hi,
       |    CASE WHEN c * 5 - s1 < 0 AND
       |      (c * 5 - s1) * (c * 5 - s1) > 4 * (5 * s2 - s1 * s1)
       |      THEN 1 ELSE 0 END AS lo
       |  FROM w5 WHERE n = 5)
       |SELECT user_id, count(*) AS n_windows,
       |  CAST(sum(hi) AS BIGINT) AS n_breach_hi,
       |  CAST(sum(lo) AS BIGINT) AS n_breach_lo
       |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Shared numerator/denominator SQL for ts_ewma / ts_holt: weight
    * 2^(15−k) on lag k of column `c` (k = 0 is the current row), null
    * lags (series head) drop out of BOTH sums so the head of each
    * series is a proper re-normalized partial EWMA. Identical text
    * runs in Spark and DuckDB (`WINDOW w` clause is common SQL). */
  private def ewmaTerms(c: String = "v_fp"): (String, String) = {
    val num = (0 to 15).map { k =>
      val w = 1L << (15 - k)
      if (k == 0) s"$c * $w"
      else s"coalesce(lag($c, $k) OVER w * $w, 0)"
    }.mkString(" + ")
    val den = (0 to 15).map { k =>
      val w = 1L << (15 - k)
      if (k == 0) s"$w"
      else s"CASE WHEN lag($c, $k) OVER w IS NOT NULL THEN $w ELSE 0 END"
    }.mkString(" + ")
    (num, den)
  }

  /** ewmaTerms' α=1/4 sibling for ts_macd's slow line: weight
    * 3^k·4^(15−k) on lag k (∝ (3/4)^k scaled by 4^15 — exact integers,
    * each ≤ 2^30), null lags dropping out of BOTH sums exactly like
    * the α=1/2 form. */
  private def emaSlowTerms(c: String): (String, String) = {
    def w(k: Int): Long =
      (BigInt(3).pow(k) * BigInt(4).pow(15 - k)).toLong
    val num = (0 to 15).map { k =>
      if (k == 0) s"$c * ${w(k)}"
      else s"coalesce(lag($c, $k) OVER w * ${w(k)}, 0)"
    }.mkString(" + ")
    val den = (0 to 15).map { k =>
      // the weight SUM passes 2^32: anchor the chain in BIGINT so the
      // left-assoc additions promote (INT literal addition overflows
      // under ANSI in Spark, and the first term alone sets the type)
      if (k == 0) s"CAST(${w(k)} AS BIGINT)"
      else s"CASE WHEN lag($c, $k) OVER w IS NOT NULL THEN ${w(k)} ELSE 0 END"
    }.mkString(" + ")
    (num, den)
  }

  /** MACD as ONE generated SQL text (holtSql convention: identical in
    * both engines except the wide-integer type and integer-div
    * tokens). Three truncated-EWMA passes — fast α=1/2, slow α=1/4,
    * signal α=1/2 over the macd difference — all on the same
    * `PARTITION BY user_id ORDER BY event_id` window. Every division
    * is wrapped in the wide type so the negative-numerator case
    * truncates toward zero identically in both engines. */
  private[graft] def macdSql(wide: String, divOp: String,
      table: String): String = {
    val (nf, df) = ewmaTerms("v_fp")
    val (ns, ds) = emaSlowTerms("v_fp")
    val (ng, dg) = ewmaTerms("macd_fp")
    s"""WITH base AS (
       |  SELECT user_id, event_id,
       |    CAST(round(value * 10000) AS BIGINT) AS v_fp
       |  FROM $table),
       |e AS (
       |  SELECT user_id, event_id,
       |    CAST(CAST($nf AS $wide) $divOp ($df) AS BIGINT) AS ema_fast,
       |    CAST(CAST($ns AS $wide) $divOp ($ds) AS BIGINT) AS ema_slow
       |  FROM base
       |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
       |m AS (
       |  SELECT user_id, event_id,
       |    ema_fast - ema_slow AS macd_fp FROM e),
       |sg AS (
       |  SELECT user_id, event_id, macd_fp,
       |    CAST(CAST($ng AS $wide) $divOp ($dg) AS BIGINT) AS signal_fp
       |  FROM m
       |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
       |SELECT user_id, event_id, macd_fp, signal_fp,
       |  macd_fp - signal_fp AS hist_fp
       |FROM sg ORDER BY user_id, event_id""".stripMargin
  }

  /** Brown's double exponential smoothing as ONE generated SQL text
    * (only the integer-div token differs per engine): s1 = EWMA(x),
    * s2 = EWMA(s1), both the bounded-16-term integer-exact form of
    * ts_ewma chained through two CTEs over the SAME `PARTITION BY
    * user_id` window — one exchange, two WindowExec passes, O(16)
    * state per row. With α = 1/2 the smoothing identities collapse to
    * integers: level = 2·s1 − s2, trend = (α/(1−α))·(s1−s2) = s1 − s2,
    * one-step forecast = level + trend = 3·s1 − 2·s2. Each stage
    * truncates via integer div IDENTICALLY in both engines, so the
    * chain is bit-exact end-to-end — the trend-aware forecaster a
    * telemetry pipeline runs next to the plain EWMA, at the same
    * scan-proportional cost. */
  private[graft] def holtSql(divOp: String, table: String): String = {
    val (n1, d1) = ewmaTerms("v_fp")
    val (n2, d2) = ewmaTerms("s1")
    s"""WITH base AS (
       |  SELECT user_id, event_id,
       |    CAST(round(value * 10000) AS BIGINT) AS v_fp
       |  FROM $table),
       |s1t AS (
       |  SELECT user_id, event_id, v_fp,
       |    CAST(($n1) $divOp ($d1) AS BIGINT) AS s1
       |  FROM base
       |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
       |s2t AS (
       |  SELECT user_id, event_id, v_fp, s1,
       |    CAST(($n2) $divOp ($d2) AS BIGINT) AS s2
       |  FROM s1t
       |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
       |SELECT user_id, event_id, v_fp, s1, s2,
       |  2 * s1 - s2 AS level_fp,
       |  s1 - s2 AS trend_fp,
       |  3 * s1 - 2 * s2 AS forecast_fp
       |FROM s2t
       |ORDER BY user_id, event_id""".stripMargin
  }

  /** One-step-ahead Holt backtest as ONE generated SQL text (same
    * dual-engine convention as [[holtSql]]): forecast_fp lagged by one
    * row is what the model predicted before seeing the point; per-user
    * MAE/max of |actual − prediction|. Single-event users (nothing to
    * score) NULL through the CASE in both engines. */
  private[graft] def backtestSql(divOp: String, table: String): String = {
    val (n1, d1) = ewmaTerms("v_fp")
    val (n2, d2) = ewmaTerms("s1")
    s"""WITH base AS (
       |  SELECT user_id, event_id,
       |    CAST(round(value * 10000) AS BIGINT) AS v_fp
       |  FROM $table),
       |s1t AS (
       |  SELECT user_id, event_id, v_fp,
       |    CAST(($n1) $divOp ($d1) AS BIGINT) AS s1
       |  FROM base
       |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
       |s2t AS (
       |  SELECT user_id, event_id, v_fp, s1,
       |    CAST(($n2) $divOp ($d2) AS BIGINT) AS s2
       |  FROM s1t
       |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
       |f AS (
       |  SELECT user_id, v_fp,
       |    lag(3 * s1 - 2 * s2, 1) OVER (PARTITION BY user_id
       |      ORDER BY event_id) AS fc_prev
       |  FROM s2t)
       |SELECT user_id, CAST(count(fc_prev) AS BIGINT) AS n_scored,
       |  CAST(CASE WHEN count(fc_prev) > 0 THEN
       |    sum(abs(v_fp - fc_prev)) $divOp count(fc_prev)
       |  END AS BIGINT) AS mae_fp,
       |  CAST(max(abs(v_fp - fc_prev)) AS BIGINT) AS max_err_fp
       |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** Classical additive seasonal decomposition (STL-lite) as ONE
    * generated SQL text (holtSql convention — only the wide-type,
    * integer-div, and epoch-days tokens differ per engine): daily
    * revenue splits into trend (centered 7-day moving average,
    * FULL windows only — the declared edge rule), a day-of-week
    * additive seasonal index (floor mean of the detrended series per
    * dow), and the residual. All divisions ride the wide type so
    * negative detrended values truncate toward zero identically.
    * Every window runs on the calendar-bounded daily frame. */
  private[graft] def seasonalDecompSql(wide: String, divOp: String,
      daysFn: String => String, table: String): String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
       |      AS BIGINT) AS cents
       |  FROM $table GROUP BY CAST(o_orderdate AS DATE)),
       |t AS (
       |  SELECT day, ${daysFn("day")} % 7 AS dow, cents,
       |    CASE WHEN count(*) OVER w7 = 7 THEN
       |      CAST(CAST(sum(cents) OVER w7 AS $wide) $divOp 7 AS BIGINT)
       |    ELSE NULL END AS trend
       |  FROM daily
       |  WINDOW w7 AS (ORDER BY day
       |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |sidx AS (
       |  SELECT dow,
       |    CAST(CAST(sum(cents - trend) AS $wide) $divOp count(*)
       |      AS BIGINT) AS seasonal
       |  FROM t WHERE trend IS NOT NULL GROUP BY dow)
       |SELECT t.day, t.cents, t.trend, sidx.seasonal,
       |  t.cents - t.trend - sidx.seasonal AS resid
       |FROM t JOIN sidx ON t.dow = sidx.dow
       |WHERE t.trend IS NOT NULL
       |ORDER BY t.day""".stripMargin

  /** Seasonality-strength as ONE generated SQL text: daily cent
    * totals → global and per-DOW integer-anchored sums of squares →
    * strength_permille = 1000 − SS_dow·1000 div SS_total (NULL on a
    * constant series). Tokens: wide-integer type, integer-div
    * operator, and a days-since-epoch function (Spark `unix_date`,
    * DuckDB `datediff`). */
  private[graft] def seasonStrengthSql(wide: String, divOp: String,
      daysFn: String => String, table: String): String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
       |  FROM $table GROUP BY CAST(o_orderdate AS DATE)),
       |d2 AS (
       |  SELECT day, c, ${daysFn("day")} % 7 AS dow FROM daily),
       |anch AS (SELECT sum(c) $divOp count(*) AS a FROM d2),
       |danch AS (
       |  SELECT dow, sum(c) $divOp count(*) AS aw FROM d2 GROUP BY dow),
       |ss AS (
       |  SELECT count(*) AS n_days,
       |    sum(CAST(c - a AS $wide) * (c - a)) AS ss_total,
       |    sum(CAST(c - aw AS $wide) * (c - aw)) AS ss_dow
       |  FROM d2 CROSS JOIN anch
       |  JOIN danch ON d2.dow = danch.dow)
       |SELECT CAST(n_days AS BIGINT) AS n_days,
       |  CAST(CASE WHEN ss_total > 0 THEN
       |    1000 - ss_dow * 1000 $divOp ss_total END AS BIGINT)
       |    AS strength_permille
       |FROM ss""".stripMargin

  /** Seasonal decomposition forecast as ONE generated SQL text (the
    * holtSql convention): per event_type, daily cents DESEASONALIZE
    * by the integer day-of-week profile (dow = epoch-days mod 7 —
    * engine DOW builtins disagree on week origin; adj = dow-mean −
    * grand-mean, the additive seasonal index), Brown's double
    * smoothing runs on the deseasonalized series, and the one-step
    * forecast re-adds the NEXT day's seasonal index (LEFT JOIN: a
    * dow never observed forecasts NULL in both engines). Every stage
    * truncates via integer div identically — bit-exact end-to-end.
    * Windows ride the calendar-bounded daily frame per type. */
  private[graft] def seasonalForecastSql(divOp: String,
      daysFn: String => String, table: String): String = {
    val (n1, d1) = ewmaTerms("d_fp")
    val (n2, d2) = ewmaTerms("s1")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    sum(CAST(round(value * 100) AS BIGINT)) AS c
       |  FROM $table GROUP BY event_type, CAST(ts AS DATE)),
       |dd AS (
       |  SELECT event_type, day, c, ${daysFn("day")} % 7 AS dow
       |  FROM daily),
       |danch AS (
       |  SELECT event_type, dow, sum(c) $divOp count(*) AS aw
       |  FROM dd GROUP BY event_type, dow),
       |ganch AS (
       |  SELECT event_type, sum(c) $divOp count(*) AS g
       |  FROM dd GROUP BY event_type),
       |des AS (
       |  SELECT dd.event_type, day, c, dd.dow,
       |    CAST(aw - g AS BIGINT) AS adj,
       |    CAST(c - (aw - g) AS BIGINT) AS d_fp
       |  FROM dd
       |  JOIN danch ON dd.event_type = danch.event_type
       |    AND dd.dow = danch.dow
       |  JOIN ganch ON dd.event_type = ganch.event_type),
       |s1t AS (
       |  SELECT event_type, day, c, dow, adj, d_fp,
       |    CAST(($n1) $divOp ($d1) AS BIGINT) AS s1
       |  FROM des
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |s2t AS (
       |  SELECT event_type, day, c, dow, adj, d_fp, s1,
       |    CAST(($n2) $divOp ($d2) AS BIGINT) AS s2
       |  FROM s1t
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |nxt AS (
       |  SELECT event_type, day, c, adj, dow,
       |    3 * s1 - 2 * s2 AS base_fp,
       |    (dow + 1) % 7 AS ndow
       |  FROM s2t)
       |SELECT nxt.event_type, day, CAST(c AS BIGINT) AS cents,
       |  adj AS season_adj,
       |  CAST(CASE WHEN na.aw IS NOT NULL
       |    THEN base_fp + (na.aw - ng.g) END AS BIGINT)
       |    AS forecast_cents
       |FROM nxt
       |LEFT JOIN danch na ON nxt.event_type = na.event_type
       |  AND nxt.ndow = na.dow
       |JOIN ganch ng ON nxt.event_type = ng.event_type
       |ORDER BY nxt.event_type, day""".stripMargin
  }

  /** AMOC change-point as ONE generated SQL text (dual-engine, the
    * holtSql convention — here even the div token is unnecessary, only
    * the wide-integer type differs): daily cent totals → prefix sums →
    * dev_k = |n·S_k − k·S_n| for every interior split → argmax with
    * earliest-day tie-break via filter-to-max + min(day). */
  private[graft] def changepointSql(wide: String, table: String): String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    sum(CAST(round(value * 100) AS BIGINT)) AS c
       |  FROM $table GROUP BY event_type, CAST(ts AS DATE)),
       |cum AS (
       |  SELECT event_type, day, c,
       |    row_number() OVER w AS i,
       |    sum(c) OVER w AS s,
       |    count(*) OVER (PARTITION BY event_type) AS n,
       |    sum(c) OVER (PARTITION BY event_type) AS sn
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |scored AS (
       |  SELECT event_type, day, i, n,
       |    abs(CAST(n AS $wide) * s - CAST(i AS $wide) * sn) AS dev
       |  FROM cum WHERE i < n),
       |m AS (SELECT event_type, max(dev) AS mx
       |      FROM scored GROUP BY event_type)
       |SELECT scored.event_type,
       |  CAST(max(scored.n) AS BIGINT) AS n_days,
       |  min(scored.day) AS cp_day,
       |  CAST(max(scored.dev) AS BIGINT) AS dev_scaled
       |FROM scored JOIN m ON scored.event_type = m.event_type
       |  AND scored.dev = m.mx
       |GROUP BY scored.event_type
       |ORDER BY scored.event_type""".stripMargin

  /** ACF ratio in permille over the decimal moment sums: NULL when the
    * series has zero variance (constant series have no defined ACF) —
    * both engines yield NULL through the same CASE. */
  private def acfPm(c: String) =
    expr(s"CAST(CASE WHEN s0 > 0 THEN ($c * 1000) div s0 END AS BIGINT)")

  def oracle: Map[String, String] = Map(
    "ts_mase_base" ->
      """WITH daily AS (
        |  SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS dayn,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |l AS (
        |  SELECT cents,
        |    abs(cents - lag(cents, 1) OVER (ORDER BY dayn)) AS e1,
        |    abs(cents - lag(cents, 7) OVER (ORDER BY dayn)) AS e7
        |  FROM daily),
        |g AS (
        |  SELECT count(*) AS n_days,
        |    count(e1) AS n1, CAST(sum(e1) AS BIGINT) AS s1,
        |    count(e7) AS n7, CAST(sum(e7) AS BIGINT) AS s7
        |  FROM l)
        |SELECT CAST(n_days AS BIGINT) AS n_days,
        |  CAST(s1 // n1 AS BIGINT) AS mae_naive_cents,
        |  CAST(s7 // n7 AS BIGINT) AS mae_snaive_cents,
        |  CAST((CAST(s7 AS HUGEINT) * n1 * 1000)
        |    // (CAST(s1 AS HUGEINT) * n7) AS BIGINT)
        |    AS snaive_vs_naive_pm
        |FROM g""".stripMargin,

    "ts_vwap" ->
      """WITH b AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS qty
        |  FROM events
        |  WHERE value IS NOT NULL
        |    AND json_extract_string(props, '$.k') IS NOT NULL)
        |SELECT day, count(*) AS n, CAST(sum(qty) AS BIGINT) AS sum_qty,
        |  CAST(CASE WHEN sum(qty) = 0 THEN NULL ELSE
        |    sum(CAST(cents AS HUGEINT) * qty) // sum(qty)
        |    END AS BIGINT) AS vwap_cents
        |FROM b GROUP BY day ORDER BY day""".stripMargin,

    "ts_bollinger" -> bollingerSql("events"),

    "ts_rsi" ->
      """WITH d AS (
        |  SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) -
        |      lag(CAST(round(value * 100) AS BIGINT), 1) OVER
        |        (PARTITION BY user_id ORDER BY event_id) AS delta
        |  FROM events)
        |SELECT user_id, count(*) AS n_deltas,
        |  CAST(CASE WHEN sum(greatest(delta, 0)) +
        |      sum(greatest(-delta, 0)) = 0 THEN NULL ELSE
        |    (1000 * sum(greatest(delta, 0))) //
        |      (sum(greatest(delta, 0)) + sum(greatest(-delta, 0)))
        |    END AS BIGINT) AS rsi_permille
        |FROM d WHERE delta IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_twap" ->
      """WITH b AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    lead(epoch_us(ts), 1) OVER
        |      (PARTITION BY user_id ORDER BY event_id) - epoch_us(ts)
        |      AS hold_us
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(hold_us) AS BIGINT) AS span_us,
        |  CAST(CASE WHEN sum(hold_us) = 0 THEN NULL ELSE
        |    sum(CAST(cents AS HUGEINT) * hold_us) // sum(hold_us)
        |    END AS BIGINT) AS twap_cents
        |FROM b WHERE hold_us IS NOT NULL AND cents IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_sessionize" ->
      """WITH b AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS v_c,
        |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER
        |      (PARTITION BY user_id ORDER BY event_id) AS gap
        |  FROM events),
        |m AS (
        |  SELECT *, count(gap) OVER (PARTITION BY user_id) AS n_gaps,
        |    sum(gap) OVER (PARTITION BY user_id) AS sum_gaps
        |  FROM b),
        |k AS (
        |  SELECT user_id, event_id, us, v_c,
        |    CASE WHEN gap IS NULL OR gap * n_gaps > sum_gaps
        |      THEN 1 ELSE 0 END AS brk
        |  FROM m),
        |s AS (
        |  SELECT user_id, us, v_c,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS session_no
        |  FROM k)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(us) AS BIGINT) AS start_us,
        |  CAST(max(us) - min(us) AS BIGINT) AS duration_us,
        |  CAST(sum(v_c) AS BIGINT) AS value_c
        |FROM s GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin,

    "ts_changepoint" -> changepointSql("HUGEINT", "events"),
    "ts_forecast_seasonal" -> seasonalForecastSql("//",
      d => s"datediff('day', DATE '1970-01-01', $d)", "events"),
    "ts_seasonal_strength" -> seasonStrengthSql("HUGEINT", "//",
      d => s"datediff('day', DATE '1970-01-01', $d)", "orders"),
    "ts_seasonal_decompose" -> seasonalDecompSql("HUGEINT", "//",
      d => s"datediff('day', DATE '1970-01-01', $d)", "orders"),
    "ts_holt" -> holtSql("//", "events"),

    "composite_forecast_backtest" -> backtestSql("//", "events"),

    "ts_month_index" ->
      """WITH m AS (
        |  SELECT CAST(month(o_orderdate) AS INT) AS m,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |t AS (SELECT *, sum(cents) OVER () AS total FROM m)
        |SELECT m, n_orders, cents,
        |  CAST((CAST(cents AS HUGEINT) * 12000000) // total AS BIGINT)
        |    AS index_ppm
        |FROM t ORDER BY m""".stripMargin,

    "ts_downsample" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, cents,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS nu
        |  FROM c),
        |b AS (
        |  SELECT user_id, event_id, cents,
        |    ((rn - 1) * 10) // nu AS b
        |  FROM r),
        |m AS (
        |  SELECT user_id, event_id, cents, b,
        |    sum(cents) OVER (PARTITION BY user_id, b)
        |      // count(*) OVER (PARTITION BY user_id, b) AS bmean
        |  FROM b),
        |k AS (
        |  SELECT user_id, event_id, cents, b,
        |    abs(cents - bmean) AS dev,
        |    row_number() OVER (PARTITION BY user_id, b
        |      ORDER BY abs(cents - bmean) DESC, event_id) AS rk
        |  FROM m)
        |SELECT user_id, CAST(b AS BIGINT) AS b, event_id, cents,
        |  CAST(dev AS BIGINT) AS dev
        |FROM k WHERE rk = 1
        |ORDER BY user_id, b""".stripMargin,

    "ts_peak_detect" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (
        |  SELECT user_id, event_id, cents,
        |    lag(cents, 1) OVER w AS pv,
        |    lead(cents, 1) OVER w AS nx
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |q AS (
        |  SELECT user_id, event_id, cents,
        |    CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
        |      AND cents > pv AND cents > nx THEN 1 ELSE 0 END AS is_peak
        |  FROM p)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(is_peak) AS BIGINT) AS n_peaks,
        |  max(CASE WHEN is_peak = 1 THEN cents END) AS max_peak_cents,
        |  min(CASE WHEN is_peak = 1 THEN event_id END)
        |    AS first_peak_event
        |FROM q GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_spearman" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS rt,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY cents, event_id) AS rx
        |  FROM c),
        |g AS (
        |  SELECT user_id, count(*) AS n,
        |    sum(CAST(rx - rt AS HUGEINT) * (rx - rt)) AS sd2
        |  FROM r GROUP BY user_id)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  CAST(sd2 AS BIGINT) AS sum_d2,
        |  CAST(1000 - (6000 * sd2) //
        |    (CAST(n AS HUGEINT) * n * n - n) AS BIGINT) AS rho_milli
        |FROM g WHERE n >= 3 ORDER BY user_id""".stripMargin,

    "ts_xcorr" ->
      """WITH x AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS xv
        |  FROM orders GROUP BY 1),
        |y AS (
        |  SELECT CAST(l_shipdate AS DATE) AS yday,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
        |      AS BIGINT) AS yv
        |  FROM lineitem GROUP BY 1),
        |p AS (
        |  SELECT l.lag, x.day, x.xv, y.yv
        |  FROM x CROSS JOIN (SELECT unnest(range(0, 8)) AS lag) l
        |  JOIN y ON y.yday = x.day + CAST(l.lag AS INTEGER)),
        |r AS (
        |  SELECT lag,
        |    row_number() OVER (PARTITION BY lag ORDER BY xv, day) AS rx,
        |    row_number() OVER (PARTITION BY lag ORDER BY yv, day) AS ry
        |  FROM p),
        |g AS (
        |  SELECT lag, count(*) AS n_days,
        |    sum(CAST(rx - ry AS HUGEINT) * (rx - ry)) AS sd2
        |  FROM r GROUP BY lag)
        |SELECT CAST(lag AS BIGINT) AS lag, CAST(n_days AS BIGINT) AS n_days,
        |  CAST(sd2 AS BIGINT) AS sum_d2,
        |  CAST(1000 - (6000 * sd2) //
        |    (CAST(n_days AS HUGEINT) * n_days * n_days - n_days)
        |    AS BIGINT) AS rho_milli
        |FROM g WHERE n_days >= 3 ORDER BY lag""".stripMargin,

    "ts_acf" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, cents,
        |    sum(cents) OVER wp // count(*) OVER wp AS mu
        |  FROM c WINDOW wp AS (PARTITION BY user_id)),
        |d AS (
        |  SELECT user_id,
        |    CAST(cents - mu AS HUGEINT) AS d,
        |    lag(CAST(cents - mu AS HUGEINT), 1) OVER w AS d1,
        |    lag(CAST(cents - mu AS HUGEINT), 2) OVER w AS d2,
        |    lag(CAST(cents - mu AS HUGEINT), 3) OVER w AS d3
        |  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |g AS (
        |  SELECT user_id, count(*) AS n,
        |    sum(d * d) AS s0, sum(d * d1) AS s1,
        |    sum(d * d2) AS s2, sum(d * d3) AS s3
        |  FROM d GROUP BY user_id)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN s0 > 0 THEN (s1 * 1000) // s0 END AS BIGINT)
        |    AS acf1_pm,
        |  CAST(CASE WHEN s0 > 0 THEN (s2 * 1000) // s0 END AS BIGINT)
        |    AS acf2_pm,
        |  CAST(CASE WHEN s0 > 0 THEN (s3 * 1000) // s0 END AS BIGINT)
        |    AS acf3_pm
        |FROM g ORDER BY user_id""".stripMargin,

    "ts_seasonal" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day, rev_c,
        |    CAST(datediff('day', DATE '1990-01-07', day) % 7 AS INT)
        |      AS dow
        |  FROM daily),
        |x AS (
        |  SELECT day, dow, rev_c,
        |    CAST(sum(rev_c) OVER wd // count(*) OVER wd AS BIGINT)
        |      AS seasonal_c
        |  FROM w WINDOW wd AS (PARTITION BY dow))
        |SELECT day, dow, rev_c, seasonal_c,
        |  rev_c - seasonal_c AS residual_c
        |FROM x ORDER BY day""".stripMargin,

    "ts_cusum" ->
      """WITH base AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |k AS (SELECT (1000 * sum(cents)) // count(*) AS k_milli FROM base),
        |d AS (SELECT user_id, event_id,
        |        cents * 1000 - (SELECT k_milli FROM k) AS inc FROM base),
        |s AS (SELECT user_id, event_id, sum(inc) OVER w AS run
        |      FROM d
        |      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT user_id, event_id, run, min(run) OVER w2 AS runmin
        |      FROM s
        |      WINDOW w2 AS (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        |  CAST(run - least(0, runmin) AS BIGINT) AS cusum_fp,
        |  run - least(0, runmin) > 10 * (SELECT k_milli FROM k) AS alarm
        |FROM m
        |ORDER BY user_id, event_id""".stripMargin,

    "ts_resample_linear" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2
        |), b AS (
        |  SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
        |  FROM events
        |), u AS (SELECT DISTINCT user_id FROM events),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi,
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |grid AS (SELECT user_id, day FROM u CROSS JOIN spine),
        |g AS (
        |  SELECT grid.user_id, grid.day, daily.cents,
        |    CASE WHEN daily.cents IS NOT NULL THEN grid.day END AS obs_day
        |  FROM grid LEFT JOIN daily
        |    ON grid.user_id = daily.user_id AND grid.day = daily.day),
        |f AS (
        |  SELECT user_id, day, cents,
        |    last_value(obs_day IGNORE NULLS) OVER wb AS p_day,
        |    last_value(cents IGNORE NULLS) OVER wb AS p_val,
        |    first_value(obs_day IGNORE NULLS) OVER wf AS n_day,
        |    first_value(cents IGNORE NULLS) OVER wf AS n_val
        |  FROM g
        |  WINDOW
        |    wb AS (PARTITION BY user_id ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY day
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day,
        |  CAST(CASE WHEN cents IS NOT NULL THEN cents
        |    ELSE p_val + ((n_val - p_val) *
        |      datediff('day', p_day, day)) // datediff('day', p_day, n_day)
        |  END AS BIGINT) AS value_interp,
        |  cents IS NOT NULL AS was_observed
        |FROM f
        |WHERE p_day IS NOT NULL AND n_day IS NOT NULL
        |ORDER BY user_id, day""".stripMargin,

    "ts_concurrency" ->
      """WITH e AS (
        |  SELECT event_type, event_id, CAST(ts AS DATE) AS d,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    greatest(CAST(1 AS BIGINT),
        |      CAST(round(value * 60) AS BIGINT)) AS dur
        |  FROM events),
        |b AS (
        |  SELECT event_type, d, event_id, es AS t,
        |    CAST(1 AS BIGINT) AS delta FROM e
        |  UNION ALL
        |  SELECT event_type, d, event_id, es + dur AS t,
        |    CAST(-1 AS BIGINT) AS delta FROM e),
        |sw AS (
        |  SELECT event_type, d,
        |    sum(delta) OVER (PARTITION BY event_type, d
        |      ORDER BY t, delta, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
        |  FROM b)
        |SELECT event_type, d, CAST(count(*) // 2 AS BIGINT) AS n_events,
        |  CAST(max(live) AS BIGINT) AS max_concurrent
        |FROM sw GROUP BY event_type, d
        |ORDER BY event_type, d""".stripMargin,

    "ts_ohlc" ->
      s"""SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         |  arg_min(${Tables.sql.money("value")}, event_id) AS open,
         |  max(${Tables.sql.money("value")}) AS high,
         |  min(${Tables.sql.money("value")}) AS low,
         |  arg_max(${Tables.sql.money("value")}, event_id) AS close,
         |  ${Tables.sql.moneySum("value")} AS volume,
         |  CAST(count(*) AS BIGINT) AS n_events
         |FROM events GROUP BY user_id, day
         |ORDER BY user_id, day""".stripMargin,

    "ts_anomaly" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, cents,
        |    count(*) OVER w AS n,
        |    sum(CAST(cents AS HUGEINT)) OVER w AS sm,
        |    sum(CAST(cents AS HUGEINT) * cents) OVER w AS q
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, cents,
        |  CAST(n AS BIGINT) AS win_n,
        |  n >= 5 AND
        |    (CAST(n AS HUGEINT) * cents - sm)
        |      * (CAST(n AS HUGEINT) * cents - sm)
        |    > (CAST(n AS HUGEINT) * q - sm * sm) * 4 AS is_anomaly
        |FROM r ORDER BY user_id, event_id""".stripMargin,

    "ts_interarrival" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER
        |      (PARTITION BY user_id ORDER BY event_id)) AS gap_us
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(min(gap_us) AS BIGINT) AS min_gap_us,
        |  CAST(max(gap_us) AS BIGINT) AS max_gap_us,
        |  CAST(sum(gap_us) // count(*) AS BIGINT) AS mean_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_period_delta" ->
      """WITH wkrev AS (
        |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS rev_c,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT wk, rev_c, n_orders,
        |  lag(rev_c, 1) OVER (ORDER BY wk) AS prev_c,
        |  CAST(((rev_c - lag(rev_c, 1) OVER (ORDER BY wk)) * 1000)
        |    // lag(rev_c, 1) OVER (ORDER BY wk) AS BIGINT)
        |    AS delta_permille
        |FROM wkrev ORDER BY wk""".stripMargin,

    "ts_ewma" -> {
      val (num, den) = ewmaTerms()
      s"""WITH base AS (
         |  SELECT user_id, event_id,
         |    CAST(round(value * 10000) AS BIGINT) AS v_fp
         |  FROM events)
         |SELECT user_id, event_id, v_fp,
         |  CAST(($num) // ($den) AS BIGINT) AS ewma_fp
         |FROM base
         |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
         |ORDER BY user_id, event_id""".stripMargin
    },

    "ts_macd" -> macdSql("HUGEINT", "//", "events"),

    "ts_calendar_profile" ->
      """WITH c AS (
        |  SELECT
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
        |      AS dow,
        |    hour(ts) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT dow, hr, CAST(n AS BIGINT) AS n,
        |  CAST((CAST(n AS HUGEINT) * 1000000) //
        |    CAST(sum(n) OVER () AS HUGEINT) AS BIGINT) AS share_ppm
        |FROM c ORDER BY dow, hr""".stripMargin,

    "ts_obv" -> obvSql("events"),
    "ts_donchian" -> donchianSql("//", "events"),
    "ts_atr" -> atrSql("HUGEINT", "//", "events"),
    "ts_stochastic" -> stochasticSql("HUGEINT", "//", "events"),
    "ts_pivot_points" -> pivotSql("//", "events"),
    "ts_aroon" -> aroonSql("//", "events"),

    "ts_burstiness" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER
        |      (PARTITION BY user_id ORDER BY event_id) AS gap
        |  FROM events),
        |m AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(CAST(gap AS HUGEINT)) AS HUGEINT) AS s,
        |    CAST(sum(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS q
        |  FROM g WHERE gap IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n_gaps,
        |  CAST(CASE WHEN s > 0 THEN
        |    ((n_gaps * q - s * s) * 1000) // (s * s) END AS BIGINT)
        |    AS cv2_pm,
        |  CASE WHEN n_gaps < 2 OR s = 0 THEN NULL
        |    WHEN n_gaps * q > 2 * s * s THEN 'bursty'
        |    WHEN 2 * n_gaps * q < 3 * s * s THEN 'regular'
        |    ELSE 'poisson' END AS class
        |FROM m ORDER BY user_id""".stripMargin)
}
