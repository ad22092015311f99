package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Report-grade analytics beyond the base OLAP inventory: running-peak
  * drawdown, ratio-to-report shares, trailing-window burst detection,
  * repeat-purchase rates, range-partitioner boundary planning, and
  * head-coverage curves. (The reference exposes raw row streams,
  * client.go:383-414 — these are the report queries its consumers run
  * downstream, declared in SURVEY.md §2.2.)
  *
  * Shared scale contracts: every per-entity window rides ONE
  * partition-keyed exchange; partition-less windows appear only over
  * frames already bounded by an aggregation (25 nations, ~types×days
  * calendar cells, top-1000 heads); any integer product that could
  * pass 2^63 at 100 TB is routed through DECIMAL(38,0) (HUGEINT in
  * the DuckDB oracle).
  */
object ReportOps extends OpPack {

  def queries: Map[String, Q] = Map(
    // Maximum drawdown of each user's cumulative event value (the
    // running-peak-to-trough risk statistic): cum = running sum of
    // cents, peak = running max of cum, drawdown = peak − cum; report
    // the per-user maximum. Both window passes share ONE user_id
    // exchange (same partitioning+ordering ⇒ Spark plans two chained
    // WindowExecs, no re-shuffle), then one hash agg. Integer cents
    // end to end; (ts, event_id) is a strict total order.
    "win_drawdown" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("cum", sum(col("cents")).over(w))
        .withColumn("peak", max(col("cum")).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(col("peak") - col("cum")).as("max_drawdown_cents"),
          max(col("peak")).as("peak_cents"),
          sum(col("cents")).as("final_cents"))
        .orderBy(col("user_id"))
    }),

    // Underwater-spell duration (win_drawdown's TIME axis: not "how
    // deep below the running peak" but "how LONG the longest stretch
    // below it" — the recovery-time risk statistic reported beside
    // drawdown magnitude): under = cum < peak (strict), spells via
    // gaps-and-islands (island id = global rn − per-state rn, both
    // windows on the SAME user_id exchange), then per-user longest
    // and total underwater counts. One exchange, two chained
    // WindowExecs, two bounded hash aggs — integer cents end to end.
    "ts_underwater" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val w = ord.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val marked = e.withColumn("cum", sum(col("cents")).over(w))
        .withColumn("peak", max(col("cum")).over(w))
        .withColumn("under", col("cum") < col("peak"))
        .withColumn("rn", row_number().over(ord))
        .withColumn("grp", col("rn") - row_number().over(
          Window.partitionBy(col("user_id"), col("under"))
            .orderBy(col("ts"), col("event_id"))))
      val spells = marked.filter(col("under"))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
      val base = marked.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("under"), 1L).otherwise(0L)).as("n_under"))
      base.join(spells.groupBy(col("user_id"))
          .agg(max(col("len")).as("max_spell")), Seq("user_id"), "left")
        .select(col("user_id"), col("n_events"), col("n_under"),
          coalesce(col("max_spell"), lit(0L)).as("max_spell"))
        .orderBy(col("user_id"))
    }),

    // Ratio-to-report: each nation's share of total order revenue in
    // ppm. Revenue aggregates to a 25-row frame (customer⋈orders on
    // the custkey shuffle, nation broadcast), so the partition-less
    // total window is bounded by the nation count, never by the fact
    // table. Sums and the share product in DECIMAL(38,0).
    "agg_ratio_report" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(expr("CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0))")
          .as("rev"))
        .withColumn("total",
          sum(col("rev")).over(Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("n_name"),
          col("rev").cast("long").as("rev_cents"),
          expr("CAST((rev * 1000000) div total AS BIGINT)")
            .as("share_ppm"))
        .orderBy(col("n_name"))
    }),

    // Burst detection over the per-type daily event counts: a day is a
    // burst when its count exceeds 3× the mean of the trailing 7
    // OBSERVED days (integer inequality cnt·n_prev > 3·Σ_prev — no
    // float mean), requiring ≥ 4 prior days so early noise can't fire.
    // The calendar frame is types×days-bounded; the trailing window
    // rides the per-type exchange of that aggregated frame.
    "ts_burst" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), expr("CAST(ts AS DATE)").as("d"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy(col("d"))
        .rowsBetween(-7, -1)
      daily
        .withColumn("nprev", count(col("cnt")).over(w))
        .withColumn("sumprev", sum(col("cnt")).over(w))
        .withColumn("is_burst",
          when(col("nprev") >= 4 &&
            col("cnt") * col("nprev") > lit(3) * col("sumprev"), 1L)
            .otherwise(0L))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("is_burst")).as("n_burst_days"),
          max(when(col("is_burst") === 1, col("cnt"))).as("max_burst_cnt"))
        .orderBy(col("event_type"))
    }),

    // Repeat-purchase rate per calendar quarter: of the customers
    // active in a quarter, the ppm share that ordered at least twice.
    // Two-level hash agg — (quarter, customer) partial counts first
    // (map-side combined on the orders scan), then the bounded
    // quarter-level rollup; no window, no join.
    "composite_repeat_rate" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_custkey"),
          expr("year(o_orderdate) * 10 + quarter(o_orderdate)").as("yq"))
        .groupBy(col("yq"), col("o_custkey"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("yq"))
        .agg(count(lit(1)).as("active"),
          sum(when(col("n") >= 2, 1L).otherwise(0L)).as("repeaters"),
          sum(col("n")).as("n_orders"))
        .withColumn("repeat_ppm",
          expr("CAST((CAST(repeaters AS DECIMAL(38,0)) * 1000000) " +
            "div active AS BIGINT)"))
        .orderBy(col("yq"))
    }),

    // Weekly stickiness (DAU/WAU) — the engagement ratio every
    // telemetry dashboard leads with. One distinct (day, user) pass
    // (map-side combined), then two bounded rollups: DAU per day,
    // WAU per week-of-month bucket ((dom-1) div 7 — engine week
    // numberings disagree at year bounds, day-of-month math does
    // not), stickiness = Σdau·1000 div (n_days·wau) in integer
    // permille. At 100 TB the only fact-proportional work is the
    // distinct; everything after is |days|-bounded.
    "composite_stickiness" -> ((s, dir) => {
      val d = Tables(s, dir, "events")
        .select(expr("CAST(ts AS DATE)").as("day"), col("user_id"))
        .distinct()
        .withColumn("week",
          expr("CAST(year(day) * 10000 + month(day) * 100 + " +
            "(day(day) - 1) div 7 AS INT)"))
      val byWeek = d.groupBy(col("week"), col("day"))
        .agg(count(lit(1)).as("dau"))
        .groupBy(col("week"))
        .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      val wau = d.groupBy(col("week"))
        .agg(countDistinct(col("user_id")).as("wau"))
      byWeek.join(wau, Seq("week"))
        .select(col("week"), col("n_days"), col("sum_dau"), col("wau"),
          expr("sum_dau * 1000 div (n_days * wau)")
            .as("stickiness_permille"))
        .orderBy(col("week"))
    }),

    // Sequence-pattern detection over per-user event streams (the
    // MATCH_RECOGNIZE shape, reduced to its scalable core): each
    // user's ordered event types collapse to a compact symbol string
    // (one groupBy — collect_list(struct(event_id, ch)) sorted
    // in-array, so ordering costs an array_sort per user, never a
    // global sort), then conversion paths (signup → browse* →
    // purchase) and error bursts are counted by non-overlapping
    // greedy regex — identical find-all semantics in Java regex and
    // RE2. State per user is its event count: safe unless one key is
    // pathological, the same bound as any sessionization.
    "composite_seq_pattern" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ch"))
        .groupBy(col("user_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("event_id"), col("ch")))),
          x => x.getField("ch")), "").as("seq"))
        .select(col("user_id"),
          length(col("seq")).cast("int").as("n_events"),
          size(expr("regexp_extract_all(seq, 's[cv]*p', 0)"))
            .cast("bigint").as("n_conversions"),
          size(expr("regexp_extract_all(seq, 'ee+', 0)"))
            .cast("bigint").as("n_error_bursts"))
        .orderBy(col("user_id"))
    }),

    // Range-partitioner boundary planning: the 31 interior split
    // points that divide orders by total price into 32 equal-count
    // ranges — what a sorted/bucketed writer (sink_partitioned's
    // sibling) feeds a RangePartitioning without sampling skew.
    // percentile_disc keeps every boundary an OBSERVED value (exact in
    // both engines, SKILL-pinned quantile_disc equivalence); i/32
    // fractions are exact binary, so the literals round-trip. One
    // scan + one 31-expression global agg + a constant 31-row stack.
    "layout_range_bounds" -> ((s, dir) => {
      // 31 exact equal-count boundaries via ONE counts+cumsum pass
      // over the DISTINCT values (the agg_hist_eqdepth idiom:
      // smallest value whose cumulative count·32 ≥ i·total ==
      // percentile_disc(i/32), value-equal in both engines) — 31
      // separate percentile_disc aggregates each buffer the whole
      // column (measured ~10 s at sf0.1; this shape is sub-second).
      // The cumsum window sorts distinct cents, not rows.
      val c = Tables(s, dir, "orders")
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)")
          .as("cents"))
      val cum = c.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(
          Window.orderBy(col("cents"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total",
          sum(col("cnt")).over(Window.partitionBy(lit(1))))
      val cutAggs = (1 to 31).map(i =>
        min(when(col("cum") * 32 >= col("total") * i, col("cents")))
          .as(s"b$i"))
      cum.agg(cutAggs.head, cutAggs.tail: _*)
        .select(expr("stack(31, " +
          (1 to 31).map(i => s"$i, b$i").mkString(", ") +
          ") AS (bucket, upper_cents)"))
        .orderBy(col("bucket"))
    }),

    // Head-coverage curve of the bigram distribution: what share of
    // all bigram occurrences the top-10/100/1000 bigrams cover (the
    // "how Zipfian is this corpus" dial a dedup/tokenizer budget is
    // planned against). The global top-1000 is TakeOrderedAndProject
    // (never a full sort); the cumulative window runs on that bounded
    // 1000-row frame; the corpus total crosses as a broadcast 1-row
    // scalar gate (BNL-allowlisted). Ties broken (count desc, gram
    // asc) in both engines.
    "llm_ngram_coverage" -> ((s, dir) => {
      val bg = Tables(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr("transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("bg"))
        .filter(col("bg.w1") =!= "" && col("bg.w2") =!= "")
        .select(concat_ws(" ", col("bg.w1"), col("bg.w2")).as("g"))
      val cnt = bg.groupBy(col("g")).agg(count(lit(1)).as("n"))
      val tot = cnt.agg(
        expr("CAST(sum(CAST(n AS DECIMAL(38,0))) AS DECIMAL(38,0))")
          .as("total"))
      val rankW = Window.orderBy(desc("n"), asc("g"))
      cnt.orderBy(desc("n"), asc("g")).limit(1000)
        .withColumn("rank", row_number().over(rankW))
        .withColumn("cum", sum(col("n")).over(
          rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("rank").isin(10, 100, 1000))
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("cum").as("cum_cnt"),
          expr("CAST((CAST(cum AS DECIMAL(38,0)) * 1000000) div total " +
            "AS BIGINT)").as("coverage_ppm"))
        .orderBy(col("rank"))
    }),

    // Survival curve of user engagement lifetime (the Kaplan-Meier
    // readout with no censoring: every user's observation window is
    // the log itself): lifetime = days between first and last event;
    // survivors at d ∈ {0,7,14,21,28} as count + ppm of the cohort.
    // One user_id hash agg compresses the fact table; the 5-way
    // threshold explode and the denominator window run on the
    // per-user frame and a 5-row aggregate respectively (d=0 row IS
    // the cohort size — no second global count pass).
    // Period-over-period rank movers (the "trending" report): each
    // event type's revenue rank in the calendar FIRST half of the
    // data vs the second (split at the midpoint day computed from the
    // broadcast min/max bounds — no percentile pass), with the rank
    // delta as the mover score. Absent-in-a-period types rank AFTER
    // every present one (revenue 0 — declared). One scan + a
    // type-bounded rank frame; the 1-row bounds broadcast
    // (allowlisted scalar-gate shape).
    "composite_trending" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("unix_date(CAST(ts AS DATE))").as("dayn"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val bounds = e.agg(min(col("dayn")).as("d0"), max(col("dayn")).as("d1"))
      val tagged = e.crossJoin(broadcast(bounds))
        .withColumn("half",
          when(col("dayn") <= expr("(d0 + d1) div 2"), 0L).otherwise(1L))
      val byHalf = tagged.groupBy(col("event_type"), col("half"))
        .agg(sum(col("cents")).as("rev"))
      val w = Window.partitionBy(col("half"))
        .orderBy(desc("rev"), asc("event_type"))
      val ranked = byHalf
        .withColumn("rk", row_number().over(w).cast("long"))
      val a = ranked.filter(col("half") === 0)
        .select(col("event_type"), col("rev").as("rev_h1"),
          col("rk").as("rk_h1"))
      val b = ranked.filter(col("half") === 1)
        .select(col("event_type"), col("rev").as("rev_h2"),
          col("rk").as("rk_h2"))
      a.join(b, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          coalesce(col("rev_h1"), lit(0L)).as("rev_h1"),
          coalesce(col("rev_h2"), lit(0L)).as("rev_h2"),
          col("rk_h1"), col("rk_h2"),
          expr("coalesce(rk_h1, 999) - coalesce(rk_h2, 999)")
            .as("rank_gain"))
        .orderBy(desc("rank_gain"), asc("event_type"))
    }),

    "composite_survival" -> ((s, dir) => {
      val life = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(expr("datediff(max(ts), min(ts))").as("life_days"))
      life.withColumn("d", explode(expr("array(0, 7, 14, 21, 28)")))
        .filter(col("life_days") >= col("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("n_survived"))
        .withColumn("n_total",
          max(when(col("d") === 0, col("n_survived")))
            .over(Window.partitionBy()))
        .select(col("d").as("day"), col("n_survived"),
          expr("(n_survived * 1000000) div n_total").as("survival_ppm"))
        .orderBy(col("day"))
    }),

    // Linear multi-touch attribution (the even-split sibling of
    // composite_attribution's last-touch): every click/view in the 7
    // days before a purchase gets an equal share of its cents —
    // share = cents div n with the remainder assigned to the EARLIEST
    // touch (declared tie-break), so attributed cents sum EXACTLY to
    // purchase cents (the audit invariant a float split cannot give).
    // Purchase×touch pairing rides the user_id shuffle spine (per-
    // purchase fan-out bounded by a user's 7-day touch count); the
    // per-purchase count/rank windows share one pid exchange; one
    // final bounded hash agg per touch type.
    "composite_attribution_linear" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          floor(unix_timestamp(col("ts"))).cast("long").as("es"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          col("es").as("pes"), col("cents"))
      val t = e.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_id").as("tid"),
          col("es").as("tes"), col("event_type").as("ttype"))
      val pair = p.join(t, Seq("user_id"))
        .filter(col("tes") < col("pes") &&
          col("pes") - col("tes") <= 7L * 86400L)
      val byP = Window.partitionBy(col("pid"))
      val rk = row_number().over(
        Window.partitionBy(col("pid")).orderBy(col("tes"), col("tid")))
      pair.withColumn("n", count(lit(1)).over(byP))
        .withColumn("rk", rk)
        .withColumn("share",
          expr("cents div n + CASE WHEN rk = 1 THEN cents % n " +
            "ELSE 0 END"))
        .groupBy(col("ttype"))
        .agg(count(lit(1)).as("n_touches"),
          countDistinct(col("pid")).as("n_purchases"),
          sum(col("share")).as("attributed_cents"))
        .orderBy(col("ttype"))
    }),

    // Data-skipping effectiveness report (the clustering-depth metric
    // behind OPTIMIZE/Z-ORDER decisions): orders split into 32
    // file-sized buckets under two layouts — arrival order (orderkey
    // ranges) vs clustered on the lookup key (custkey ranges) — and
    // for each, the per-bucket custkey [min,max] extents and the mean
    // number of buckets whose extents a point lookup must read
    // (pairwise extent overlap). Arrival → every bucket spans the
    // key space (overlap ≈ 32, no skipping); clustered → ≈ 1. Bucket
    // widths from one collected bounds row (the agg_hist_eqdepth
    // scalar pattern); the overlap join is equi-keyed on layout over
    // the 64-row extent frame — bounded at 32² pairs per layout
    // regardless of fact size; the fact table pays one bucket agg.
    "layout_skipping_stats" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_custkey").cast("long").as("c"))
      // coalesce: an empty orders table yields (0, 0) bounds and an
      // empty result, not an NPE from reading a NULL max.
      val mx = o.agg(coalesce(max(col("k")), lit(0L)).as("mk"),
          coalesce(max(col("c")), lit(0L)).as("mc"))
        .collect()(0)
      val wk = mx.getLong(0) / 32 + 1
      val wc = mx.getLong(1) / 32 + 1
      val ext = o.groupBy(expr(s"k div $wk").as("b"))
        .agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
        .withColumn("layout", lit("arrival"))
        .unionAll(o.groupBy(expr(s"c div $wc").as("b"))
          .agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
          .withColumn("layout", lit("clustered")))
      val other = ext.select(col("layout").as("layout2"),
        col("lo").as("lo2"), col("hi").as("hi2"))
      ext.join(other, col("layout") === col("layout2") &&
          col("lo") <= col("hi2") && col("lo2") <= col("hi"))
        .groupBy(col("layout"), col("b"))
        .agg(count(lit(1)).as("n_overlap"))
        .groupBy(col("layout"))
        .agg(count(lit(1)).as("n_buckets"),
          expr("sum(n_overlap) * 100 div count(1)")
            .as("avg_overlap_x100"))
        .orderBy(col("layout"))
    }))

  def oracle: Map[String, String] = Map(
    "composite_trending" ->
      """WITH e AS (
        |  SELECT event_type,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dayn,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |bounds AS (SELECT min(dayn) AS d0, max(dayn) AS d1 FROM e),
        |tagged AS (
        |  SELECT event_type,
        |    CASE WHEN dayn <= (d0 + d1) // 2 THEN 0 ELSE 1 END AS half,
        |    cents
        |  FROM e CROSS JOIN bounds),
        |byhalf AS (
        |  SELECT event_type, half, CAST(sum(cents) AS BIGINT) AS rev
        |  FROM tagged GROUP BY event_type, half),
        |ranked AS (
        |  SELECT event_type, half, rev,
        |    CAST(row_number() OVER (PARTITION BY half
        |      ORDER BY rev DESC, event_type) AS BIGINT) AS rk
        |  FROM byhalf),
        |a AS (SELECT event_type, rev AS rev_h1, rk AS rk_h1
        |      FROM ranked WHERE half = 0),
        |b AS (SELECT event_type, rev AS rev_h2, rk AS rk_h2
        |      FROM ranked WHERE half = 1)
        |SELECT coalesce(a.event_type, b.event_type) AS event_type,
        |  coalesce(rev_h1, 0) AS rev_h1, coalesce(rev_h2, 0) AS rev_h2,
        |  rk_h1, rk_h2,
        |  coalesce(rk_h1, 999) - coalesce(rk_h2, 999) AS rank_gain
        |FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
        |ORDER BY rank_gain DESC, event_type""".stripMargin,

    "composite_survival" ->
      """WITH life AS (
        |  SELECT user_id,
        |    datediff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
        |      AS life_days
        |  FROM events GROUP BY user_id),
        |s AS (
        |  SELECT d.day, count(*) AS n_survived
        |  FROM life, (SELECT unnest([0, 7, 14, 21, 28]) AS day) d
        |  WHERE life_days >= d.day
        |  GROUP BY d.day),
        |t AS (
        |  SELECT *, max(CASE WHEN day = 0 THEN n_survived END) OVER ()
        |    AS n_total
        |  FROM s)
        |SELECT CAST(day AS INT) AS day, n_survived,
        |  CAST((n_survived * 1000000) // n_total AS BIGINT)
        |    AS survival_ppm
        |FROM t ORDER BY day""".stripMargin,

    "composite_attribution_linear" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (
        |  SELECT user_id, event_id AS pid, es AS pes, cents
        |  FROM e WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, event_id AS tid, es AS tes,
        |    event_type AS ttype
        |  FROM e WHERE event_type IN ('click', 'view')),
        |pair AS (
        |  SELECT p.pid, p.cents, t.tid, t.tes, t.ttype
        |  FROM p JOIN t ON p.user_id = t.user_id
        |  WHERE t.tes < p.pes AND p.pes - t.tes <= 7 * 86400),
        |w AS (
        |  SELECT ttype, pid, cents,
        |    count(*) OVER (PARTITION BY pid) AS n,
        |    row_number() OVER (PARTITION BY pid ORDER BY tes, tid)
        |      AS rk
        |  FROM pair),
        |sh AS (
        |  SELECT ttype, pid,
        |    cents // n + CASE WHEN rk = 1 THEN cents % n ELSE 0 END
        |      AS share
        |  FROM w)
        |SELECT ttype, count(*) AS n_touches,
        |  CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
        |  CAST(sum(share) AS BIGINT) AS attributed_cents
        |FROM sh GROUP BY ttype ORDER BY ttype""".stripMargin,

    "layout_skipping_stats" ->
      """WITH mx AS (
        |  SELECT max(CAST(o_orderkey AS BIGINT)) AS mk,
        |    max(CAST(o_custkey AS BIGINT)) AS mc FROM orders),
        |e AS (
        |  SELECT 'arrival' AS layout,
        |    CAST(o_orderkey AS BIGINT) // (mk // 32 + 1) AS b,
        |    min(CAST(o_custkey AS BIGINT)) AS lo,
        |    max(CAST(o_custkey AS BIGINT)) AS hi
        |  FROM orders, mx GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'clustered',
        |    CAST(o_custkey AS BIGINT) // (mc // 32 + 1),
        |    min(CAST(o_custkey AS BIGINT)),
        |    max(CAST(o_custkey AS BIGINT))
        |  FROM orders, mx GROUP BY 1, 2),
        |ov AS (
        |  SELECT a.layout, a.b, count(*) AS n_overlap
        |  FROM e a JOIN e b2 ON a.layout = b2.layout
        |    AND a.lo <= b2.hi AND b2.lo <= a.hi
        |  GROUP BY a.layout, a.b)
        |SELECT layout, count(*) AS n_buckets,
        |  CAST(sum(n_overlap) * 100 // count(*) AS BIGINT)
        |    AS avg_overlap_x100
        |FROM ov GROUP BY layout ORDER BY layout""".stripMargin,
    "win_drawdown" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |c1 AS (
        |  SELECT user_id, ts, event_id, cents,
        |    sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM e),
        |c2 AS (
        |  SELECT user_id, cents, cum,
        |    max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM c1)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(max(peak - cum) AS BIGINT) AS max_drawdown_cents,
        |  CAST(max(peak) AS BIGINT) AS peak_cents,
        |  CAST(sum(cents) AS BIGINT) AS final_cents
        |FROM c2 GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_underwater" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |c1 AS (
        |  SELECT user_id, ts, event_id,
        |    sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM e),
        |c2 AS (
        |  SELECT user_id, ts, event_id, cum,
        |    max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM c1),
        |m AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN cum < peak THEN 1 ELSE 0 END AS under,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) -
        |    row_number() OVER (PARTITION BY user_id,
        |      CASE WHEN cum < peak THEN 1 ELSE 0 END
        |      ORDER BY ts, event_id) AS grp
        |  FROM c2),
        |spell AS (
        |  SELECT user_id, grp, count(*) AS len
        |  FROM m WHERE under = 1 GROUP BY user_id, grp),
        |base AS (
        |  SELECT user_id, count(*) AS n_events,
        |    CAST(sum(under) AS BIGINT) AS n_under
        |  FROM m GROUP BY user_id),
        |mx AS (
        |  SELECT user_id, CAST(max(len) AS BIGINT) AS max_spell
        |  FROM spell GROUP BY user_id)
        |SELECT base.user_id, n_events, n_under,
        |  coalesce(max_spell, 0) AS max_spell
        |FROM base LEFT JOIN mx ON base.user_id = mx.user_id
        |ORDER BY base.user_id""".stripMargin,

    "agg_ratio_report" ->
      """WITH rev AS (
        |  SELECT n_name,
        |    sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |      AS HUGEINT)) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, CAST(rev AS BIGINT) AS rev_cents,
        |  CAST((rev * 1000000) // (SELECT sum(rev) FROM rev) AS BIGINT)
        |    AS share_ppm
        |FROM rev ORDER BY n_name""".stripMargin,

    "ts_burst" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS cnt
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |f AS (
        |  SELECT event_type, cnt,
        |    count(cnt) OVER w AS nprev,
        |    sum(cnt) OVER w AS sumprev
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY d
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |g AS (
        |  SELECT event_type, cnt,
        |    CASE WHEN nprev >= 4 AND cnt * nprev > 3 * sumprev
        |      THEN 1 ELSE 0 END AS is_burst
        |  FROM f)
        |SELECT event_type, count(*) AS n_days,
        |  CAST(sum(is_burst) AS BIGINT) AS n_burst_days,
        |  max(CASE WHEN is_burst = 1 THEN cnt END) AS max_burst_cnt
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,

    "composite_repeat_rate" ->
      """WITH per AS (
        |  SELECT year(o_orderdate) * 10 + quarter(o_orderdate) AS yq,
        |    o_custkey, count(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT yq, count(*) AS active,
        |  CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS repeaters,
        |  CAST(sum(n) AS BIGINT) AS n_orders,
        |  CAST((CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS HUGEINT)
        |    * 1000000) // count(*) AS BIGINT) AS repeat_ppm
        |FROM per GROUP BY yq ORDER BY yq""".stripMargin,

    "composite_stickiness" ->
      """WITH d AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |w AS (
        |  SELECT day, user_id,
        |    CAST(year(day) * 10000 + month(day) * 100 +
        |      (day(day) - 1) // 7 AS INT) AS week
        |  FROM d),
        |per_day AS (
        |  SELECT week, day, count(*) AS dau FROM w GROUP BY week, day),
        |by_week AS (
        |  SELECT week, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(dau) AS BIGINT) AS sum_dau
        |  FROM per_day GROUP BY week),
        |wau AS (
        |  SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM w GROUP BY week)
        |SELECT b.week, b.n_days, b.sum_dau, u.wau,
        |  CAST(b.sum_dau * 1000 // (b.n_days * u.wau) AS BIGINT)
        |    AS stickiness_permille
        |FROM by_week b JOIN wau u ON b.week = u.week
        |ORDER BY b.week""".stripMargin,

    "composite_seq_pattern" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), '' ORDER BY event_id)
        |      AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(seq) AS INT) AS n_events,
        |  CAST(len(regexp_extract_all(seq, 's[cv]*p')) AS BIGINT)
        |    AS n_conversions,
        |  CAST(len(regexp_extract_all(seq, 'ee+')) AS BIGINT)
        |    AS n_error_bursts
        |FROM s ORDER BY user_id""".stripMargin,

    "layout_range_bounds" ->
      s"""WITH c AS (
         |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |q AS (
         |  SELECT quantile_disc(cents,
         |    [${(1 to 31).map(i => i / 32.0).mkString(", ")}]) AS qs
         |  FROM c)
         |SELECT CAST(u.i AS INT) AS bucket,
         |  CAST(qs[CAST(u.i AS INT)] AS BIGINT) AS upper_cents
         |FROM q CROSS JOIN unnest(range(1, 32)) AS u(i)
         |ORDER BY bucket""".stripMargin,

    "llm_ngram_coverage" ->
      """WITH lt AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents),
        |bg AS (
        |  SELECT toks[i] || ' ' || toks[i + 1] AS g
        |  FROM lt, unnest(range(1, len(toks))) AS u(i)
        |  WHERE toks[i] <> '' AND toks[i + 1] <> ''),
        |c AS (SELECT g, count(*) AS n FROM bg GROUP BY g),
        |t AS (SELECT sum(CAST(n AS HUGEINT)) AS total FROM c),
        |top AS (SELECT g, n FROM c ORDER BY n DESC, g LIMIT 1000),
        |r AS (
        |  SELECT n,
        |    row_number() OVER (ORDER BY n DESC, g) AS rank,
        |    sum(n) OVER (ORDER BY n DESC, g ROWS UNBOUNDED PRECEDING)
        |      AS cum
        |  FROM top)
        |SELECT CAST(rank AS INT) AS rank, CAST(cum AS BIGINT) AS cum_cnt,
        |  CAST((CAST(cum AS HUGEINT) * 1000000) // total AS BIGINT)
        |    AS coverage_ppm
        |FROM r, t WHERE rank IN (10, 100, 1000) ORDER BY rank""".stripMargin)
}
