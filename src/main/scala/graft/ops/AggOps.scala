package graft.ops

import graft.Tables
import graft.Tables.{moneySum, exprSum, moneyAvg}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregations (SURVEY.md §2.2 "Aggregations").
  *
  * All grouped aggregates run as partial (map-side) + final aggregation
  * — Spark plans HashAggregate(partial) → Exchange(keys) →
  * HashAggregate(final), so only one pre-aggregated row per (partition,
  * group) crosses the shuffle. With a handful of groups that is a few
  * hundred rows of shuffle traffic regardless of input size — the shape
  * that survives 100 TB. Money sums go through exact decimals (see
  * [[graft.Tables]]) so the DuckDB oracle matches bit-for-bit.
  */
object AggOps extends OpPack {

  def queries: Map[String, Q] = Map(
    // TPC-H Q1-shaped flagship.
    "agg_group" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          exprSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          exprSum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("sum_charge"),
          moneyAvg(col("l_quantity")).as("avg_qty"),
          moneyAvg(col("l_extendedprice")).as("avg_price"),
          moneyAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "agg_global" -> ((s, dir) => {
      Tables(s, dir, "lineitem").agg(
        moneySum(col("l_extendedprice")).as("sum_price"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("n"),
        countDistinct(col("l_suppkey")).as("n_supp"))
    }),

    "agg_distinct" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Approx sketch — excluded from oracle by determinism rule ③; the
    // 100 TB answer to COUNT(DISTINCT user) is an HLL, not a shuffle of
    // every distinct value.
    "agg_approx_distinct" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
        .orderBy(col("event_type"))
    }),

    "agg_rollup" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), moneySum(col("c_acctbal")).as("sum_bal"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
    }),

    "agg_cube" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "agg_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |       CAST(grouping(o_orderstatus) AS INT) AS g_status,
          |       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
          |       count(*) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
          |""".stripMargin)
    }),

    "agg_having" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 16)
        .orderBy(col("o_custkey"))
    }),

    "agg_stats" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 2).as("sd_qty"),
          round(var_samp(col("l_quantity")), 2).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),

    // collect_set + array_sort, serialized with array_join so the
    // result cell is a flat string: array-valued cells are unhashable
    // in the driver's pandas-based compare (round-1 CORRECTNESS err),
    // so the serialized form is what makes this oracle-checkable.
    "agg_collect" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          array_join(array_sort(collect_set(col("o_orderstatus"))), "|")
            .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // PIVOT with an explicit value list (no extra distinct-values scan;
    // the rotation is a single conditional aggregation pass).
    "agg_pivot" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))
    }),

    // FILTER clause: per-predicate conditional aggregates in one pass
    // over the data (vs one scan per predicate).
    "agg_filter" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_f")
      s.sql(
        """SELECT l_returnflag,
          |  count(*) AS n,
          |  count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
          |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted
          |FROM lineitem_f
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    }),

    // Exact interpolating median (both engines: linear interpolation at
    // the midpoint; quantities are integral doubles so the result is an
    // exact .0/.5 value).
    "agg_median" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5)"), 1).as("med_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 1).as("p90_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Boolean aggregates + conditional count: predicate-valued partial
    // aggregation (map-side combine on 1-bit state — the cheapest
    // possible shuffle payload at scale).
    "agg_bool" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count_if(col("l_discount") > 0.05).as("n_disc"),
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_tax") > 0.07).as("any_hi_tax"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Value-at-extremum aggregates: max_by/min_by keyed on the UNIQUE
    // o_orderkey (deterministic — never arg-max a non-unique ordinate).
    // One-pass (value, key) partial state; no window, no second join.
    "agg_arg_max" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(max_by(col("o_totalprice"), col("o_orderkey"))
            .as("price_at_max_key"),
          min_by(col("o_totalprice"), col("o_orderkey"))
            .as("price_at_min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderpriority"))
    }),

    // Wide→long unpivot (melt): per-flag metric columns become
    // (metric, val) rows — one narrow pass over the already-aggregated
    // frame, no shuffle beyond the aggregation's.
    "agg_unpivot" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_price"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price")), "metric", "val")
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // Discrete (exact, non-interpolating) percentiles: the value IS a
    // row's value, so doubles pass through verbatim — no rounding
    // policy needed, unlike percentile_cont. Two-phase sort-based agg.
    "agg_percentile_disc" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
            .as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")
            .as("p90"))
        .orderBy(col("o_orderstatus"))
    }),

    // The skew report — the diagnostic an engineer runs on a join/agg
    // key BEFORE choosing a strategy (plain shuffle vs broadcast vs
    // salting vs AQE skew split): per-key group-size distribution
    // (count/sum/max/integer-mean, p50/p99 via percentile_disc), the
    // heaviest key (deterministic argmax: ties to the larger key id),
    // and its corpus share in ppm. Two chained map-side-combined hash
    // aggs (rows → key counts → 1-row summary) — profiling a 100 TB
    // key column shuffles |keys| partials then one row; this is the
    // query whose answer decides whether join_skew_salted's plan is
    // needed.
    "diag_skew_report" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("n")).as("n_rows"),
          max(col("n")).as("max_n"),
          expr("sum(n) div count(*)").as("mean_n"),
          // percentile_disc returns DOUBLE in Spark; the oracle CASTs
          // to BIGINT, so the engine side must too (4.0 vs 4 hash
          // differently even though they compare equal).
          expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n) " +
            "AS BIGINT)").as("p50_n"),
          expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n) " +
            "AS BIGINT)").as("p99_n"),
          // (n, key) ordering packed into one BIGINT — DuckDB's
          // arg_max can't order by a struct; n ≤ 1e8 and key < 1e10
          // keep the packing exact at any test sf.
          max_by(col("l_orderkey"),
            expr("n * 10000000000L + l_orderkey")).as("heaviest_key"))
        .withColumn("max_share_ppm",
          expr("max_n * 1000000 div n_rows"))
    }),

    // Table profiler (the Deequ/dbt-docs column-statistics report):
    // per-column non-null count, exact NDV, and min/max as one
    // long-format report. One UNION LEG PER COLUMN, each a narrow
    // single-column scan → partial-distinct two-phase agg: the
    // single-agg multi-countDistinct alternative plans one Expand
    // that multiplies every fact row ×|columns| before aggregating
    // (measured 4.1 s vs 1.3 s here — and ×6 shuffle volume at
    // 100 TB); per-column legs prune to one column each (columnar
    // scans are nearly free) and the legs run as independent stages.
    // Mixed types render through EXPLICITLY formatted strings (dates
    // via yyyy-MM-dd, money via cents — raw double/timestamp casts
    // render differently across engines). n_rows rides each leg's
    // count(*) — no extra pass.
    // Join fan-out pre-flight (the "will this join explode" check a
    // query doctor runs BEFORE shuffling 100 TB — diag_skew_report
    // profiles one table's key distribution; this PREDICTS the
    // self-join's output size from it): per-key counts c on the join
    // key, estimated pair output Σc² (exact — what
    // lineitem⋈lineitem ON l_partkey would emit), amplification in
    // milli (Σc²·1000 div Σc = expected fan-out per probe row), and
    // the hottest key with max-count/min-key tie-break via the packed
    // max_by both engines compute identically. One hash agg + a
    // 1-row rollup; squared counts ride DECIMAL(38,0)/HUGEINT.
    "diag_join_fanout" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
        .agg(
          count(lit(1)).as("n_keys"),
          sum(col("c")).as("n_rows"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("ep"),
          max(col("c")).as("hot_cnt"),
          max_by(col("l_partkey"),
            expr("c * 10000000000L + (9999999999L - l_partkey)"))
            .as("hot_key"))
        .select(col("n_keys"), col("n_rows"),
          expr("CAST(ep AS BIGINT)").as("est_pairs"),
          expr("CAST(ep * 1000 div n_rows AS BIGINT)")
            .as("amplification_milli"),
          col("hot_key"), col("hot_cnt"))
    }),

    // Class-balance diagnostic per corpus source (the label-skew
    // report a training-data curator reads before sampling weights):
    // per source, the majority language + its share in ppm, and the
    // Gini IMPURITY of the language mix in ppm — impurity =
    // 1 − Σ(c/n)² cleared to (n² − Σc²)·10⁶ div n², exact integers
    // (contrast agg_gini_wealth's Lorenz-based inequality index).
    // One (source × lang) hash agg — the per-source frame is bounded
    // by the label vocabulary, so the majority window is tiny.
    "diag_class_balance" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = Tables(s, dir, "documents")
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      val per = c.groupBy(col("source"))
        .agg(sum(col("c")).as("n_docs"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sum_c2"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("c").desc, col("lang"))
      val top = c.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("source"), col("lang").as("top_lang"),
          col("c").as("top_c"))
      per.join(top, "source")
        .select(col("source"), col("n_docs"), col("top_lang"),
          expr("CAST(CAST(top_c AS DECIMAL(38,0)) * 1000000 div n_docs " +
            "AS BIGINT)").as("top_share_ppm"),
          expr("CAST((CAST(n_docs AS DECIMAL(38,0)) * n_docs - sum_c2) " +
            "* 1000000 div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) " +
            "AS BIGINT)").as("impurity_ppm"))
        .orderBy(col("source"))
    }),

    "diag_profile" -> ((s, dir) => {
      def leg(df: org.apache.spark.sql.DataFrame, cn: String) =
        df.agg(count(lit(1)).as("n_rows"),
          count(col(cn)).as("n_nonnull"),
          countDistinct(col(cn)).as("ndv"),
          min(col(cn)).cast("string").as("min_s"),
          max(col(cn)).cast("string").as("max_s"))
          .withColumn("col_name", lit(cn))
      val o = Tables(s, dir, "orders")
      val day = o.select(date_format(col("o_orderdate"), "yyyy-MM-dd")
        .as("day"))
      val cents = o.select(
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      Seq(leg(o, "o_orderkey"), leg(o, "o_custkey"), leg(cents, "cents"),
        leg(day, "day"), leg(o, "o_orderpriority"),
        leg(o, "o_orderstatus"))
        .reduce(_ unionByName _)
        .select(col("col_name"), col("n_rows"), col("n_nonnull"),
          col("ndv"), col("min_s"), col("max_s"))
        .orderBy(col("col_name"))
    }),

    // Cross-dataset entity-overlap audit (the "are these the same
    // people" question every identity join starts with: how much of
    // the event stream's user population also appears as order
    // customers, and vice versa — run BEFORE anyone trusts a
    // stream⋈warehouse join): distinct key sets from both sides, the
    // intersection via one equi-join of the two DISTINCT frames
    // (shuffles carry unique keys only — never raw fact rows),
    // Jaccard and both containments in permille. Output is one row;
    // each fact table is scanned once into a map-side-combined
    // distinct.
    "diag_entity_overlap" -> ((s, dir) => {
      val a = Tables(s, dir, "events").select(col("user_id")).distinct()
        .withColumn("in_a", lit(1))
      val b = Tables(s, dir, "orders")
        .select(col("o_custkey").as("user_id")).distinct()
        .withColumn("in_b", lit(1))
      a.join(b, Seq("user_id"), "full")
        .agg(count(col("in_a")).as("n_events_users"),
          count(col("in_b")).as("n_order_custs"),
          sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
            .otherwise(0L)).as("n_both"),
          count(lit(1)).as("n_union"))
        .select(col("n_events_users"), col("n_order_custs"),
          col("n_both"), col("n_union"),
          expr("(n_both * 1000) div n_union").as("jaccard_pm"),
          expr("(n_both * 1000) div n_events_users")
            .as("events_covered_pm"),
          expr("(n_both * 1000) div n_order_custs")
            .as("orders_covered_pm"))
    }),

    // Arrival-completeness audit (the "did every day's partition
    // land" check a data-ops oncall runs before anyone trusts a
    // dashboard): per-day event counts joined against the FULL
    // calendar spine between the observed min and max day, so a day
    // with ZERO rows — invisible to any plain GROUP BY — surfaces as
    // an explicit gap row. The fact table pays ONE map-side-combined
    // daily agg; the spine explodes from that aggregate's 1-row
    // min/max frame (calendar-bounded at any data volume) and the
    // left join runs on two bounded day-keyed frames.
    "diag_day_gaps" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val spine = daily
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)"))
          .as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          when(col("n").isNull, 1).otherwise(0).cast("int").as("is_gap"))
        .orderBy(col("day"))
    }),

    // Storage-footprint profile per column (the byte budget that
    // drives projection and layout decisions — diag_profile answers
    // "what values", this answers "what does each column COST to
    // scan": a 100 TB projection plan starts from exactly this
    // table). Strings cost their character count (testdata is ASCII
    // — declared chars≡bytes rule), fixed-width numerics/timestamps
    // cost 8 bytes per non-null. One scan, six map-side-combined
    // 1-row aggregate legs unioned into a long-format frame;
    // avg_milli_bytes rides DECIMAL(38,0) (byte totals at 100 TB
    // overflow int64 under the ·1000 product).
    "diag_column_footprint" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      def strLeg(cn: String) =
        ev.agg(count(lit(1)).as("n_rows"),
          count(col(cn)).as("n_nonnull"),
          sum(length(col(cn)).cast("long")).as("total_bytes"))
          .withColumn("col_name", lit(cn))
      def fixLeg(cn: String) =
        ev.agg(count(lit(1)).as("n_rows"),
          count(col(cn)).as("n_nonnull"),
          (count(col(cn)) * 8).as("total_bytes"))
          .withColumn("col_name", lit(cn))
      Seq(fixLeg("event_id"), fixLeg("ts"), fixLeg("user_id"),
        strLeg("event_type"), fixLeg("value"), strLeg("props"))
        .reduce(_ unionByName _)
        .select(col("col_name"), col("n_rows"), col("n_nonnull"),
          col("total_bytes"),
          expr("CAST((CAST(total_bytes AS DECIMAL(38,0)) * 1000) " +
            "div greatest(n_nonnull, 1) AS BIGINT)")
            .as("avg_milli_bytes"))
        .orderBy(col("col_name"))
    }),

    // Distribution-drift monitor (the chi-square cousin of PSI, in
    // pure integers — PSI's ln() has no cross-engine-exact form):
    // order totals bucketed at $5000 (agg_hist's grid), split into
    // baseline (<1998) / current (≥1998) cohorts (orders span 1995–2001 in this testdata) in ONE scan, then
    // per-bucket expected-current e = n_base·N_cur div N_base and the
    // chi²-style term (n_cur−e)²·1000 div max(e,1) — the alarm a
    // feature-store monitor fires when a distribution shifts. The
    // cohort totals come from partition-less window sums over the
    // BUCKET frame (bounded by the price grid, ~dozens of rows — the
    // declared contract for partition-less windows), so there is no
    // scalar cross-join; squared deviations ride decimal(38,0).
    "diag_dist_drift" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .withColumn("bucket",
          expr("CAST(round(o_totalprice * 100) AS BIGINT) div 500000"))
        .withColumn("is_base",
          col("o_orderdate") < to_date(lit("1998-01-01")))
        .groupBy(col("bucket"))
        .agg(sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
          sum(when(!col("is_base"), 1L).otherwise(0L)).as("n_cur"))
        // n_base·N_cur rides DECIMAL(38,0): at 100 TB the raw BIGINT
        // product overflows int64 (Spark non-ANSI wraps silently,
        // DuckDB errors — an engine divergence). div still yields
        // BIGINT on decimal operands, so the output schema is stable.
        .withColumn("e_cur", expr(
          "(CAST(n_base AS DECIMAL(38,0)) * sum(n_cur) OVER ()) " +
            "div greatest(sum(n_base) OVER (), 1)"))
        .withColumn("chi2_term_milli", expr(
          "(CAST(n_cur - e_cur AS DECIMAL(38,0)) * (n_cur - e_cur) " +
            "* 1000) div greatest(e_cur, 1)"))
        .select(col("bucket"), col("n_base"), col("n_cur"),
          col("e_cur"), col("chi2_term_milli"))
        .orderBy(col("bucket"))
    }),

    // Data-quality constraint audit (the dbt-test / Deequ-style
    // contract suite run on every load): FK coverage, PK uniqueness,
    // value-range and null checks across three tables, as a
    // long-format (check, n_bad) frame — all zeros on healthy data,
    // each leg an independent anti-join or pushed filter count
    // (AQE broadcasts the shrunken sides; the unions are 1-row
    // frames). Auditing 100 TB costs one scan per constraint with
    // map-side-combined counting, never a row-level report unless a
    // check fails.
    "diag_dq_audit" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val li = Tables(s, dir, "lineitem")
      val ev = Tables(s, dir, "events")
      def leg(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_bad"))
          .select(lit(name).as("check"), col("n_bad"))
      leg("fk_orders_customer",
          o.join(c, o("o_custkey") === c("c_custkey"), "left_anti"))
        .unionAll(leg("fk_lineitem_orders",
          li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")))
        .unionAll(leg("pk_orders_dup",
          o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
            .filter(col("n") > 1)))
        .unionAll(leg("range_orders_totalprice",
          o.filter(col("o_totalprice") <= 0)))
        .unionAll(leg("range_lineitem_discount",
          li.filter(!col("l_discount").between(0, 0.5))))
        .unionAll(leg("null_events_props", ev.filter(col("props").isNull)))
        .orderBy(col("check"))
    }),

    // Mergeable moment shards — the pre-aggregation doctrine stated
    // as a query: each shard keeps (n, Σx, Σx², min, max) and the
    // global mean/variance derive from MERGED partials, never a
    // second data pass. Everything exact: cents through
    // DECIMAL(38,0) (Σx² at 10^12 rows × (5·10^7)² ≈ 10^27 — BIGINT
    // dies at 10^19, decimal does not), variance by the
    // cross-multiplied integral form (n·Σx² − (Σx)²) div n². The
    // oracle computes the same moments in ONE un-sharded pass —
    // a pass proves merge-equals-recompute bit-for-bit, which is
    // what makes tiered rollups (hour→day→month) trustworthy.
    "agg_merge_moments" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val li = Tables(s, dir, "lineitem")
        .select(
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
          expr("CAST(l_orderkey % 4 AS INT)").as("shard"))
      li.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents").cast(DecimalType(38, 0))).as("s"),
          sum((col("cents").cast(DecimalType(38, 0)) * col("cents"))
            .cast(DecimalType(38, 0))).as("ss"),
          min(col("cents")).as("mn"), max(col("cents")).as("mx"))
        .agg(sum(col("n")).as("n_rows"),
          sum(col("s")).as("s"), sum(col("ss")).as("ss"),
          min(col("mn")).as("min_cents"), max(col("mx")).as("max_cents"))
        .select(col("n_rows"),
          expr("CAST(s div n_rows AS BIGINT)").as("mean_cents"),
          expr("CAST((CAST(n_rows AS DECIMAL(38,0)) * ss - s * s) div " +
            "(CAST(n_rows AS DECIMAL(38,0)) * n_rows) AS BIGINT)")
            .as("var_cents2"),
          col("min_cents"), col("max_cents"))
    }),

    // k-anonymity / l-diversity governance audit (the privacy
    // pre-flight a training-data release runs): group the population
    // by its quasi-identifiers (nation × market segment), then report
    // how many groups — and how many PEOPLE — fall below k, plus the
    // worst-group l-diversity of a bucketed sensitive attribute
    // (account balance in 1k bands). Two-phase hash agg over ≤125
    // quasi-groups then a 1-row rollup: auditing 100 TB costs one
    // scan with map-side combine. A release gate reads one row:
    // groups_lt5 > 0 ⇒ generalize or suppress before shipping.
    "diag_kanon" -> ((s, dir) => {
      val g = Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("sz"),
          countDistinct(expr("CAST(floor(c_acctbal / 1000) AS BIGINT)"))
            .as("l_div"))
      g.agg(count(lit(1)).as("n_groups"),
        min(col("sz")).as("min_group"),
        sum(when(col("sz") < 5, 1L).otherwise(0L)).as("groups_lt5"),
        sum(when(col("sz") < 5, col("sz")).otherwise(0L))
          .as("persons_at_risk5"),
        sum(when(col("sz") < 2, 1L).otherwise(0L)).as("groups_lt2"),
        min(col("l_div")).as("min_l_diversity"))
    }),

    // Box-plot summary per group (the five-number + Tukey-fence
    // report every BI distribution panel draws): min / q1 / median /
    // q3 / max of quantity per return flag (percentile_disc — the
    // SKILL-pinned exact cross-engine quantile), plus outlier counts
    // past the 1.5·IQR fences tested in DOUBLED units (2q < 2q1−3·IQR
    // — no halves, every comparison integer-exact). Two passes: one
    // percentile agg over ≤3 groups, fences broadcast back onto the
    // scan for the conditional counts — the winsorize/skew_kurt
    // two-pass anchor shape; at 100 TB both passes are map-side-
    // combined scans.
    "agg_boxplot" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("CAST(l_quantity AS BIGINT)").as("q"))
      val box = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          min(col("q")).as("q_min"),
          expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY q) " +
            "AS BIGINT)").as("q1"),
          expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY q) " +
            "AS BIGINT)").as("med"),
          expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY q) " +
            "AS BIGINT)").as("q3"),
          max(col("q")).as("q_max"))
      li.join(broadcast(box), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n"), max(col("q_min")).as("q_min"),
          max(col("q1")).as("q1"), max(col("med")).as("med"),
          max(col("q3")).as("q3"), max(col("q_max")).as("q_max"),
          sum(when(expr("2 * q < 2 * q1 - 3 * (q3 - q1)"), 1L)
            .otherwise(0L)).as("n_out_lo"),
          sum(when(expr("2 * q > 2 * q3 + 3 * (q3 - q1)"), 1L)
            .otherwise(0L)).as("n_out_hi"))
        .orderBy(col("l_returnflag"))
    }),

    // Shannon entropy of each user's event-type mix in DECLARED
    // floor-log2 milli-bits (the llm_surprisal bit-length idiom:
    // LB(x) = length(bin(x)) = ⌊log2 x⌋ + 1, so the per-observation
    // surprisal LB(N)−LB(c) is the whole-bit information content and
    // H_milli = 1000·Σ c·(LB(N)−LB(c)) div N = 1000·(N·LB(N) − Σ
    // c·LB(c)) div N — pure integer bit math, cross-engine exact where
    // a float log2 would ride libm luck). The behavioral-diversity
    // score: 0 ⇔ a user does exactly one thing, higher ⇔ an even mix.
    // TWO map-side-combined hash aggs (type cells, then users) — the
    // classic two-phase distinct shape; entropy over 100 TB of events
    // costs one scan, key-proportional exchanges only.
    "diag_entropy" -> ((s, dir) => {
      val c = Tables(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      c.groupBy(col("user_id"))
        .agg(sum(col("c")).as("n_events"),
          count(lit(1)).as("n_types"),
          sum(col("c") * length(expr("bin(c)"))).as("sum_clb"))
        .select(col("user_id"), col("n_events"), col("n_types"),
          expr("CAST((1000 * (n_events * length(bin(n_events)) " +
            "- sum_clb)) div n_events AS BIGINT)")
            .as("entropy_millibits"))
        .orderBy(col("user_id"))
    }),

    // Transition entropy per user (diag_entropy's sequential sibling
    // — how PREDICTABLE is each user's next action given the last
    // one): the (prev_type → type) transition mix's Shannon entropy
    // in the same declared floor-log2 milli-bits (LB = length(bin);
    // H_milli = 1000·(N·LB(N) − Σ c·LB(c)) div N over transition
    // cells). A bot replaying one loop scores 0; organic browsing
    // scores high — the behavioral-predictability dial abuse
    // detection reads next to the unigram mix. ONE lag window on the
    // user_id exchange, then the two-phase cell→user hash agg —
    // key-proportional exchanges only.
    "diag_seq_entropy" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val cells = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("user_id"), col("prev"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      cells.groupBy(col("user_id"))
        .agg(sum(col("c")).as("n_trans"),
          count(lit(1)).as("n_cells"),
          sum(col("c") * length(expr("bin(c)"))).as("sum_clb"))
        .select(col("user_id"), col("n_trans"), col("n_cells"),
          expr("CAST((1000 * (n_trans * length(bin(n_trans)) " +
            "- sum_clb)) div n_trans AS BIGINT)")
            .as("entropy_millibits"))
        .orderBy(col("user_id"))
    }),

    // Deterministic mode: most frequent order priority per status,
    // ties broken lexicographically (the built-in `mode()` leaves tie
    // order engine-defined, so it is composed from count + top-1 here
    // — same two-phase agg + WindowGroupLimit shape as topk_per_group).
    "agg_mode" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(desc("n"), asc("o_orderpriority"))
      Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"),
          col("o_orderpriority").as("mode_priority"), col("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // Median absolute deviation — the robust spread partner to
    // agg_winsorize's robust totals: MAD = median(|x - median(x)|)
    // per group, immune to the outliers that inflate stddev. Two
    // passes (per-group median broadcast back, then the deviation
    // median); both medians are exact order statistics over member
    // values, so the doubles are bit-identical across engines.
    "agg_mad" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val med = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile_disc(0.5) WITHIN GROUP " +
          "(ORDER BY l_extendedprice)").as("median_price"))
      li.join(broadcast(med), Seq("l_returnflag"))
        .withColumn("absdev",
          abs(col("l_extendedprice") - col("median_price")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          first(col("median_price")).as("median_price"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY absdev)")
            .as("mad"))
        .orderBy(col("l_returnflag"))
    }),

    // Exact linear-regression moments per group — the distributed
    // regression primitive: slope/intercept of y = a + b·x recovered
    // from the five MERGEABLE sums (N, Σx, Σy, Σx², Σxy) in closed
    // form, with division (the only inexact step) pushed to integer-
    // x1000 output: b = (NΣxy − ΣxΣy)/D, a = (ΣyΣx² − ΣxΣxy)/D,
    // D = NΣx² − (Σx)². x = quantity (integer-valued by the data
    // contract, checked exact), y = price in exact cents; sums in
    // decimal(38,0) (HUGEINT oracle) because the cross terms pass 2⁶³
    // near 10¹⁰ rows/group. One two-phase hash agg — moments merge
    // across partitions and micro-batches, which sort-based fits
    // can't; this is the same partial-merge shape as
    // cdc_incremental_agg, applied to model fitting.
    "agg_regression" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("xq"),
          expr("CAST(round(CAST(l_extendedprice AS DECIMAL(18,6)) * 100," +
            " 0) AS BIGINT)").as("yc"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("xq").cast(dec)).as("sx"),
          sum(col("yc").cast(dec)).as("sy"),
          sum((col("xq") * col("xq")).cast(dec)).as("sxx"),
          sum((col("xq") * col("yc")).cast(dec)).as("sxy"))
        .withColumn("den",
          col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
        // the slope numerator CAN be negative (near-uncorrelated x,y);
        // verified empirically: DuckDB's `//` on HUGEINT truncates
        // toward zero exactly like Spark's `div`, so the plain
        // integral divide is bit-identical for either sign
        // den = 0 (a single point, or constant x) has no defined fit —
        // declared NULL in BOTH engines (lockstep with the oracle)
        .select(col("l_returnflag"), col("n"),
          expr("CAST(CASE WHEN den = 0 THEN NULL ELSE " +
            "(1000 * (n * sxy - sx * sy)) div den END AS BIGINT)")
            .as("slope_cents_x1000"),
          expr("CAST(CASE WHEN den = 0 THEN NULL ELSE " +
            "(1000 * (sy * sxx - sx * sxy)) div den END AS BIGINT)")
            .as("intercept_cents_x1000"))
        .orderBy(col("l_returnflag"))
    }),

    // Moment-based 2-sigma outlier gate, ALL-INTEGER: flag x iff
    // (N·x − S)² > 4·(N·Q − S²) — the |x−μ| > 2σ test multiplied out
    // so no division, sqrt, or float ever appears (N = count, S = Σx,
    // Q = Σx² per group). Complements the order-statistic family
    // (mad/winsorize): moment sums are single-pass, mergeable partials
    // — the form that streams and distributes where percentiles need a
    // sort or sketch. Products go through decimal(38,0) (HUGEINT in
    // the oracle): at 10¹⁰ rows/group the squared terms pass 2⁶³,
    // exactly the overflow this cast removes. Tiny per-group stats
    // frame broadcasts back; one scan + one broadcast join at 100 TB.
    "agg_outliers" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val stats = d.groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        sum(col("n_chars").cast(dec)).as("s"),
        sum((col("n_chars") * col("n_chars")).cast(dec)).as("q"))
      d.join(broadcast(stats), Seq("lang"))
        .withColumn("dev", col("n").cast(dec) * col("n_chars") - col("s"))
        .withColumn("is_outlier", col("dev") * col("dev") >
          (col("n").cast(dec) * col("q") - col("s") * col("s")) * 4)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("is_outlier"))
        .orderBy(col("doc_id"))
    }),

    // EXACT distinct counting via bitmap indexes — the third point on
    // the distinct-count cost curve (exact groupBy state ↔ bitmap ↔
    // HLL estimate): per (segment, 32k-bucket) bitmaps built by a
    // two-phase hash agg, distinct count = sum of per-bucket popcounts.
    // Bitmaps are fixed-size, mergeable (bitwise OR) and EXACT — the
    // materialized-rollup pattern warehouses use when estimates are
    // not acceptable; at 100 TB the shuffle carries 4 KB bitmaps per
    // (segment, bucket), not user ids. Oracle is the plain distinct.
    "agg_bitmap_distinct" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(col("event_type"),
          expr("bitmap_bucket_number(user_id)").as("bucket"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
          .as("bm"))
        .groupBy(col("event_type"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // Audience-overlap matrix on the SAME mergeable bitmap state as
    // agg_bitmap_distinct: exact |A∩B| per event-type pair WITHOUT a
    // user-level pair join, via inclusion-exclusion on per-(type,
    // 32k-bucket) bitmaps — |A∩B| = |A| + |B| − |A∪B|, union from the
    // built-in bitmap_or_agg. The fact table is scanned ONCE into
    // |types|×|buckets| KB-sized bitmaps; every pairwise overlap is
    // then bitmap algebra on that summary (bucket-co-partitioned
    // join, rows ∝ pairs×buckets, payload bytes not user ids) — at
    // 100 TB the user-exploded alternative shuffles the fact twice
    // per pair. Pairs sharing no user are dropped (declared; matches
    // the oracle's inner join). Jaccard in integer permille.
    "agg_bitmap_overlap" -> ((s, dir) => {
      val bm = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          expr("bitmap_bucket_number(user_id)").as("bucket"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
          .as("bm"))
      val tot = bm.groupBy(col("event_type"))
        .agg(sum(expr("bitmap_count(bm)")).as("n"))
      val l = bm.select(col("event_type").as("type_a"), col("bucket"),
        col("bm").as("bm_a"))
      val r = bm.select(col("event_type").as("type_b"), col("bucket"),
        col("bm").as("bm_b"))
      l.join(r, Seq("bucket")).filter(col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"), col("bucket"),
          (expr("bitmap_count(bm_a)") + expr("bitmap_count(bm_b)"))
            .as("s_ab"),
          explode(array(col("bm_a"), col("bm_b"))).as("x"))
        .groupBy(col("type_a"), col("type_b"), col("bucket"))
        .agg(first(col("s_ab")).as("s_ab"),
          expr("bitmap_count(bitmap_or_agg(x))").as("u"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(sum(col("s_ab") - col("u")).as("n_overlap"))
        .filter(col("n_overlap") > 0)
        .join(broadcast(tot.select(col("event_type").as("type_a"),
          col("n").as("n_a"))), "type_a")
        .join(broadcast(tot.select(col("event_type").as("type_b"),
          col("n").as("n_b"))), "type_b")
        .withColumn("jaccard_permille",
          expr("(n_overlap * 1000) div (n_a + n_b - n_overlap)"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_overlap"), col("jaccard_permille"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Winsorized robust statistics: per-group p05/p95 thresholds
    // (exact order statistics, broadcast back) clip the tails before
    // aggregating — the outlier-robust mean/total a data-quality
    // pipeline reports alongside the raw one. Two passes: a tiny
    // threshold agg + one clipped scan-agg; both two-phase, the join
    // is a broadcast on the group key.
    "agg_winsorize" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val th = li.groupBy(col("l_returnflag"))
        .agg(
          expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY l_extendedprice)")
            .as("p05"),
          expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)")
            .as("p95"))
      li.join(broadcast(th), Seq("l_returnflag"))
        .withColumn("clipped",
          least(greatest(col("l_extendedprice"), col("p05")), col("p95")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          Tables.moneySum(col("l_extendedprice")).as("raw_total"),
          Tables.moneySum(col("clipped")).as("wins_total"),
          sum(when(col("l_extendedprice") < col("p05") ||
            col("l_extendedprice") > col("p95"), 1L).otherwise(0L))
            .as("n_clipped"))
        .orderBy(col("l_returnflag"))
    }),

    // Weighted percentile (lower weighted quantile): the smallest
    // quantity whose CUMULATIVE extended-price weight reaches p% of
    // the group total — "what order size covers half the revenue",
    // the statistic plain percentile_disc cannot answer. Exact
    // integer closed form: ONE (flag, quantity) hash agg compresses
    // the fact table to ≤ 3×50 cells (map-side combined), then the
    // cumsum window and rank tests run on that dimension-bounded
    // frame — the fact scan is paid once and the window never sees
    // raw rows. Weights ride DECIMAL(38,0) (HUGEINT oracle): cum·10
    // passes 2^63 at the 100 TB contract.
    "agg_percentile_weighted" -> ((s, dir) => {
      val cell = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("CAST(l_quantity AS BIGINT)").as("q"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("w"))
        .groupBy(col("l_returnflag"), col("q"))
        .agg(expr("sum(CAST(w AS DECIMAL(38,0)))").as("wsum"))
      val win = Window.partitionBy(col("l_returnflag")).orderBy(col("q"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cell.withColumn("cum", sum(col("wsum")).over(win))
        .withColumn("total",
          sum(col("wsum")).over(Window.partitionBy(col("l_returnflag"))))
        .groupBy(col("l_returnflag"))
        .agg(
          expr("CAST(max(total) AS BIGINT)").as("total_weight_cents"),
          min(when(col("cum") * 2 >= col("total"), col("q"))).as("wp50"),
          min(when(col("cum") * 10 >= col("total") * 9, col("q")))
            .as("wp90"))
        .orderBy(col("l_returnflag"))
    }),

    // Equi-DEPTH histogram (the partner to agg_hist's equi-width and
    // agg_sketch_kll's approximation): 9 exact decile cuts, then
    // bucket id = Σ (value > cut_i) evaluated as a literal chain at
    // the scan, one two-phase hash agg. The cuts come from ONE
    // counts+cumsum pass over the DISTINCT values — smallest value
    // whose cumulative count·10 ≥ i·total, an all-integer rank test
    // that equals percentile_disc/quantile_disc (verified value-equal
    // at both test scales) at a fraction of the cost: nine separate
    // percentile_disc aggregates each buffer the whole column
    // (measured 16 s at sf0.1; this shape is ~1.4 s). The cumsum
    // window sorts distinct values, not rows; when even that is too
    // big the declared approximate path is the KLL sketch.
    "agg_hist_eqdepth" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val counts = li.groupBy(col("l_extendedprice").as("p"))
        .agg(count(lit(1)).as("n"))
      val cum = counts
        .withColumn("cum", sum(col("n")).over(
          Window.orderBy(col("p"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("n")).over(Window.partitionBy(lit(1))))
      val cutExprs = (1 to 9).map(i =>
        min(when(col("cum") * 10 >= col("total") * i, col("p")))
          .as(s"c$i"))
      val cuts = cum.agg(cutExprs.head, cutExprs.tail: _*).collect()(0)
      val bucket = (1 to 9).map(i =>
          when(col("l_extendedprice") > lit(cuts.getAs[Double](s"c$i")), 1)
            .otherwise(0))
        .reduce(_ + _)
      li.withColumn("bucket", bucket)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_items"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        .orderBy(col("bucket"))
    }),

    // Fixed-width histogram: $5000 price buckets over lineitem, one
    // two-phase hash agg (bucket id computed at the scan, map-side
    // combined — the distributed histogram needs no sort and no
    // per-value state). Bucketing on ROUNDED CENTS keeps everything
    // integer after one well-defined round, so both engines agree on
    // every boundary (floor-dividing the raw double would ride IEEE
    // representation luck at exact multiples).
    "agg_hist" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .withColumn("cents",
          round(col("l_extendedprice") * 100).cast("long"))
        .withColumn("bucket", expr("cents DIV 500000"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .withColumn("bucket_lo", col("bucket") * 5000)
        .select(col("bucket"), col("bucket_lo"), col("n_items"),
          col("sum_qty"))
        .orderBy(col("bucket"))
    }),

    // Referential-integrity coverage matrix — BOTH directions of
    // every FK edge in the star schema (diag_dq_audit counts the two
    // worst violation legs; this profiles all seven edges): orphan
    // child rows (FK points nowhere) AND unreferenced parents
    // (dimension rows no fact ever joins — dead weight a curation
    // pass should know about), plus parent coverage in permille.
    // SCALE: per edge, ONE child groupBy (map-side combined) + a
    // key-co-partitioned full outer join against the distinct parent
    // keys; everything downstream is a 1-row aggregate per edge.
    "diag_fk_coverage" -> ((s, dir) => {
      def edge(name: String, childT: String, ck: String,
          parentT: String, pk: String): DataFrame = {
        val cg = Tables(s, dir, childT)
          .groupBy(col(ck).as("k")).agg(count(lit(1)).as("cnt"))
        val p = Tables(s, dir, parentT)
          .select(col(pk).as("pk")).distinct()
        cg.join(p, col("k") === col("pk"), "full_outer")
          .agg(
            coalesce(sum(col("cnt")), lit(0L)).as("n_child"),
            coalesce(sum(when(col("pk").isNull, col("cnt"))), lit(0L))
              .as("n_orphan_rows"),
            count(col("pk")).as("n_parents"),
            sum(when(col("pk").isNotNull && col("k").isNull, 1L)
              .otherwise(0L)).as("n_unref_parents"))
          .select(lit(name).as("fk_edge"), col("n_child"),
            col("n_orphan_rows"), col("n_parents"),
            col("n_unref_parents"),
            expr("CAST(CASE WHEN n_parents > 0 THEN " +
              "((n_parents - n_unref_parents) * 1000) div n_parents " +
              "END AS BIGINT)").as("coverage_pm"))
      }
      fkEdges.map { case (n, ct, ck, pt, pk) => edge(n, ct, ck, pt, pk) }
        .reduce(_ unionAll _)
        .orderBy(col("fk_edge"))
    }),

    // Primary-key uniqueness profile across EVERY table in the
    // schema: per declared key, row/key counts, duplicated keys, rows
    // involved in duplicates, and the worst multiplicity — the audit
    // that found lineitem's (l_orderkey, l_linenumber) is NOT unique
    // in this testdata. One map-side-combined groupBy per table, then
    // 1-row rollups; scan-proportional at any scale.
    "diag_pk_dupes" -> ((s, dir) => {
      def leg(tbl: String, key: Column): DataFrame =
        Tables(s, dir, tbl).select(key.cast("string").as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("m"))
          .agg(sum(col("m")).as("n_rows"),
            count(lit(1)).as("n_keys"),
            sum(when(col("m") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
            sum(when(col("m") > 1, col("m")).otherwise(0L))
              .as("n_dup_rows"),
            max(col("m")).as("max_mult"))
          .select(lit(tbl).as("tbl"), col("n_rows"), col("n_keys"),
            col("n_dup_keys"), col("n_dup_rows"), col("max_mult"))
      leg("customer", col("c_custkey"))
        .unionAll(leg("documents", col("doc_id")))
        .unionAll(leg("embeddings", col("vec_id")))
        .unionAll(leg("events", col("event_id")))
        .unionAll(leg("lineitem",
          concat_ws(":", col("l_orderkey"), col("l_linenumber"))))
        .unionAll(leg("orders", col("o_orderkey")))
        .unionAll(leg("part", col("p_partkey")))
        .unionAll(leg("supplier", col("s_suppkey")))
        .orderBy(col("tbl"))
    }),

    // Quantile bands per segment (p10/p25/p50/p75/p90 of account
    // balance): FIVE percentile_disc cuts from ONE counts+cumsum pass
    // per group — the layout_range_bounds doctrine (each separate
    // percentile_disc aggregate buffers the whole column; the rank
    // test computes all five from the same bounded distinct-value
    // frame, value-exact cross-engine). Cumsum windows sort distinct
    // values per segment, never rows.
    "agg_quantile_bands" -> ((s, dir) => {
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("seg")).orderBy(col("cents"))
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("seg"))
      Tables(s, dir, "customer")
        .select(col("c_mktsegment").as("seg"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
        .groupBy(col("seg"), col("cents"))
        .agg(count(lit(1)).as("n"))
        .withColumn("cum", sum(col("n")).over(wc))
        .withColumn("tot", sum(col("n")).over(wt))
        .groupBy(col("seg"))
        .agg(
          min(when(col("cum") * 10 >= col("tot"), col("cents")))
            .as("p10"),
          min(when(col("cum") * 4 >= col("tot"), col("cents")))
            .as("p25"),
          min(when(col("cum") * 2 >= col("tot"), col("cents")))
            .as("p50"),
          min(when(col("cum") * 4 >= col("tot") * 3, col("cents")))
            .as("p75"),
          min(when(col("cum") * 10 >= col("tot") * 9, col("cents")))
            .as("p90"))
        .orderBy(col("seg"))
    }),

    // Trimmed mean per priority class — the robust mean that DROPS
    // the tails (agg_winsorize clamps them; trimming is the other
    // textbook fix): p10/p90 cuts from the counts+cumsum rank test,
    // then the mean over values BETWEEN the cuts inclusive (a
    // VALUE-based trim, declared — rank-level tie-splitting has no
    // cross-engine-exact form). Both the cuts and the trimmed sums
    // read the same bounded distinct-value frame; products ride
    // DECIMAL(38,0)/HUGEINT.
    "agg_trimmed_mean" -> ((s, dir) => {
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("prio")).orderBy(col("cents"))
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("prio"))
      val g = Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("prio"), col("cents"))
        .agg(count(lit(1)).as("n"))
        .withColumn("cum", sum(col("n")).over(wc))
        .withColumn("tot", sum(col("n")).over(wt))
      val cuts = g.groupBy(col("prio"))
        .agg(min(when(col("cum") * 10 >= col("tot"), col("cents")))
          .as("p10"),
          min(when(col("cum") * 10 >= col("tot") * 9, col("cents")))
            .as("p90"))
      g.join(broadcast(cuts), "prio")
        .groupBy(col("prio"))
        .agg(sum(col("n")).as("n_rows"),
          sum(when(col("cents").between(col("p10"), col("p90")),
            col("n")).otherwise(0L)).as("n_kept"),
          sum(expr("CAST(n AS DECIMAL(38,0)) * cents")).as("s_all"),
          sum(when(col("cents").between(col("p10"), col("p90")),
            expr("CAST(n AS DECIMAL(38,0)) * cents")).otherwise(
            expr("CAST(0 AS DECIMAL(38,0))"))).as("s_kept"))
        .select(col("prio"), col("n_rows"), col("n_kept"),
          expr("CAST(s_all div n_rows AS BIGINT)").as("mean_c"),
          expr("CAST(CASE WHEN n_kept > 0 THEN s_kept div n_kept END " +
            "AS BIGINT)").as("trimmed_mean_c"))
        .orderBy(col("prio"))
    })
  )

  /** The star schema's FK edges: (edge name, child table, child key,
    * parent table, parent key) — shared by diag_fk_coverage and its
    * oracle generator. */
  private val fkEdges = Seq(
    ("customer->nation", "customer", "c_nationkey", "nation",
      "n_nationkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders",
      "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier",
      "s_suppkey"),
    ("nation->region", "nation", "n_regionkey", "region",
      "r_regionkey"),
    ("orders->customer", "orders", "o_custkey", "customer",
      "c_custkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation",
      "n_nationkey"))

  /** DuckDB oracle leg for one FK edge (FULL JOIN of child key counts
    * against distinct parent keys — identical aggregate algebra to
    * the Spark side). */
  private def fkOracleLeg(name: String, childT: String, ck: String,
      parentT: String, pk: String): String =
    s"""SELECT '$name' AS fk_edge,
       |  CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_child,
       |  CAST(coalesce(sum(CASE WHEN pk IS NULL THEN cnt END), 0)
       |    AS BIGINT) AS n_orphan_rows,
       |  CAST(count(pk) AS BIGINT) AS n_parents,
       |  CAST(sum(CASE WHEN pk IS NOT NULL AND k IS NULL THEN 1
       |    ELSE 0 END) AS BIGINT) AS n_unref_parents,
       |  CAST(CASE WHEN count(pk) > 0 THEN
       |    ((count(pk) - sum(CASE WHEN pk IS NOT NULL AND k IS NULL
       |      THEN 1 ELSE 0 END)) * 1000) // count(pk)
       |    END AS BIGINT) AS coverage_pm
       |FROM (SELECT $ck AS k, count(*) AS cnt FROM $childT
       |      GROUP BY $ck) cg
       |FULL JOIN (SELECT DISTINCT $pk AS pk FROM $parentT) p
       |  ON k = pk""".stripMargin

  def oracle: Map[String, String] = Map(
    "agg_group" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Tables.sql.moneySum("l_quantity")} AS sum_qty,
         |  ${Tables.sql.moneySum("l_extendedprice")} AS sum_base_price,
         |  ${Tables.sql.exprSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${Tables.sql.exprSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${Tables.sql.moneyAvg("l_quantity")} AS avg_qty,
         |  ${Tables.sql.moneyAvg("l_extendedprice")} AS avg_price,
         |  ${Tables.sql.moneyAvg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_global" ->
      s"""SELECT ${Tables.sql.moneySum("l_extendedprice")} AS sum_price,
         |  ${Tables.sql.moneyAvg("l_quantity")} AS avg_qty,
         |  min(l_quantity) AS min_qty,
         |  max(l_quantity) AS max_qty,
         |  count(*) AS n,
         |  count(DISTINCT l_suppkey) AS n_supp
         |FROM lineitem""".stripMargin,

    "agg_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "agg_rollup" ->
      s"""SELECT n_name, c_mktsegment, count(*) AS n_cust,
         |  ${Tables.sql.moneySum("c_acctbal")} AS sum_bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP (n_name, c_mktsegment)
         |ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin,

    "agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  ${Tables.sql.moneySum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |       count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "agg_having" ->
      s"""SELECT o_custkey, count(*) AS n_orders,
         |  ${Tables.sql.moneySum("o_totalprice")} AS spend
         |FROM orders
         |GROUP BY o_custkey
         |HAVING count(*) >= 16
         |ORDER BY o_custkey""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag,
        |       round(stddev_samp(l_quantity), 2) AS sd_qty,
        |       round(var_samp(l_quantity), 2) AS var_qty,
        |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "agg_collect" ->
      """SELECT o_orderpriority,
        |       array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|')
        |         AS statuses,
        |       count(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "agg_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "agg_filter" ->
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "agg_median" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 1) AS med_qty,
        |  round(quantile_cont(l_quantity, 0.9), 1) AS p90_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "agg_bool" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_tax > 0.07) AS any_hi_tax,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "agg_arg_max" ->
      """SELECT o_orderpriority,
        |  arg_max(o_totalprice, o_orderkey) AS price_at_max_key,
        |  arg_min(o_totalprice, o_orderkey) AS price_at_min_key,
        |  max(o_orderkey) AS max_key
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // UNION ALL long-form — dialect-stable equivalent of UNPIVOT
    "agg_unpivot" ->
      s"""WITH g AS (
         |  SELECT l_returnflag,
         |    ${Tables.sql.moneySum("l_quantity")} AS sum_qty,
         |    ${Tables.sql.moneySum("l_extendedprice")} AS sum_price
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM g
         |UNION ALL
         |SELECT l_returnflag, 'sum_price', sum_price FROM g
         |ORDER BY l_returnflag, metric""".stripMargin,

    "agg_percentile_disc" ->
      """SELECT o_orderstatus,
        |  quantile_disc(o_totalprice, 0.5) AS p50,
        |  quantile_disc(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "diag_skew_report" ->
      """WITH c AS (
        |  SELECT l_orderkey, count(*) AS n
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(max(n) AS BIGINT) AS max_n,
        |  CAST(sum(n) // count(*) AS BIGINT) AS mean_n,
        |  CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50_n,
        |  CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99_n,
        |  arg_max(l_orderkey, n * 10000000000 + l_orderkey)
        |    AS heaviest_key,
        |  CAST(max(n) * 1000000 // sum(n) AS BIGINT) AS max_share_ppm
        |FROM c""".stripMargin,

    "diag_dq_audit" ->
      """SELECT * FROM (
        |  SELECT 'fk_orders_customer' AS "check",
        |    CAST(count(*) AS BIGINT) AS n_bad
        |  FROM orders WHERE o_custkey NOT IN
        |    (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders',
        |    CAST(count(*) AS BIGINT)
        |  FROM lineitem WHERE l_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'pk_orders_dup', CAST(count(*) AS BIGINT)
        |  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey
        |        HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'range_orders_totalprice', CAST(count(*) AS BIGINT)
        |  FROM orders WHERE o_totalprice <= 0
        |  UNION ALL
        |  SELECT 'range_lineitem_discount', CAST(count(*) AS BIGINT)
        |  FROM lineitem WHERE NOT (l_discount BETWEEN 0 AND 0.5)
        |  UNION ALL
        |  SELECT 'null_events_props', CAST(count(*) AS BIGINT)
        |  FROM events WHERE props IS NULL)
        |ORDER BY "check"""".stripMargin,

    // ONE un-sharded pass — merge-equals-recompute is the claim
    "agg_merge_moments" ->
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    sum(CAST(cents AS HUGEINT)) AS s,
        |    sum(CAST(cents AS HUGEINT) * cents) AS ss,
        |    min(cents) AS mn, max(cents) AS mx
        |  FROM c)
        |SELECT n_rows, CAST(s // n_rows AS BIGINT) AS mean_cents,
        |  CAST((n_rows * ss - s * s) //
        |    (CAST(n_rows AS HUGEINT) * n_rows) AS BIGINT) AS var_cents2,
        |  mn AS min_cents, mx AS max_cents
        |FROM a""".stripMargin,

    "diag_kanon" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS sz,
        |    count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |      AS l_div
        |  FROM customer GROUP BY c_nationkey, c_mktsegment)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(min(sz) AS BIGINT) AS min_group,
        |  CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_lt5,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
        |    AS persons_at_risk5,
        |  CAST(sum(CASE WHEN sz < 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_lt2,
        |  CAST(min(l_div) AS BIGINT) AS min_l_diversity
        |FROM g""".stripMargin,

    "agg_boxplot" ->
      """WITH li AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem),
        |box AS (
        |  SELECT l_returnflag, count(*) AS n, min(q) AS q_min,
        |    CAST(quantile_disc(q, 0.25) AS BIGINT) AS q1,
        |    CAST(quantile_disc(q, 0.5) AS BIGINT) AS med,
        |    CAST(quantile_disc(q, 0.75) AS BIGINT) AS q3,
        |    max(q) AS q_max
        |  FROM li GROUP BY l_returnflag)
        |SELECT li.l_returnflag,
        |  CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(q_min) AS BIGINT) AS q_min,
        |  CAST(max(q1) AS BIGINT) AS q1,
        |  CAST(max(med) AS BIGINT) AS med,
        |  CAST(max(q3) AS BIGINT) AS q3,
        |  CAST(max(q_max) AS BIGINT) AS q_max,
        |  CAST(sum(CASE WHEN 2 * q < 2 * q1 - 3 * (q3 - q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_out_lo,
        |  CAST(sum(CASE WHEN 2 * q > 2 * q3 + 3 * (q3 - q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_out_hi
        |FROM li JOIN box USING (l_returnflag)
        |GROUP BY li.l_returnflag ORDER BY l_returnflag""".stripMargin,

    "diag_entropy" ->
      """WITH ct AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY user_id, event_type),
        |u AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |    count(*) AS n_types,
        |    CAST(sum(c * length(bin(c))) AS BIGINT) AS sum_clb
        |  FROM ct GROUP BY user_id)
        |SELECT user_id, n_events, n_types,
        |  CAST((1000 * (n_events * length(bin(n_events)) - sum_clb))
        |    // n_events AS BIGINT) AS entropy_millibits
        |FROM u ORDER BY user_id""".stripMargin,

    "diag_seq_entropy" ->
      """WITH tr AS (
        |  SELECT user_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY event_id) AS prev,
        |    event_type
        |  FROM events),
        |ct AS (
        |  SELECT user_id, prev, event_type, count(*) AS c
        |  FROM tr WHERE prev IS NOT NULL
        |  GROUP BY user_id, prev, event_type),
        |u AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_trans,
        |    count(*) AS n_cells,
        |    CAST(sum(c * length(bin(c))) AS BIGINT) AS sum_clb
        |  FROM ct GROUP BY user_id)
        |SELECT user_id, n_trans, n_cells,
        |  CAST((1000 * (n_trans * length(bin(n_trans)) - sum_clb))
        |    // n_trans AS BIGINT) AS entropy_millibits
        |FROM u ORDER BY user_id""".stripMargin,

    "agg_mode" ->
      """SELECT o_orderstatus, mode_priority, n FROM (
        |  SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |    count(*) AS n,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY count(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    "agg_regression" ->
      """WITH b AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS HUGEINT)) AS sx,
        |    sum(CAST(round(CAST(l_extendedprice AS DECIMAL(18,6)) * 100,
        |             0) AS HUGEINT)) AS sy,
        |    sum(CAST(l_quantity AS HUGEINT)
        |        * CAST(l_quantity AS HUGEINT)) AS sxx,
        |    sum(CAST(l_quantity AS HUGEINT)
        |        * CAST(round(CAST(l_extendedprice AS DECIMAL(18,6)) * 100,
        |               0) AS HUGEINT)) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
        |    (1000 * (n * sxy - sx * sy))
        |       // (n * sxx - sx * sx) END AS BIGINT) AS slope_cents_x1000,
        |  CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
        |    (1000 * (sy * sxx - sx * sxy))
        |       // (n * sxx - sx * sx) END AS BIGINT)
        |    AS intercept_cents_x1000
        |FROM b ORDER BY l_returnflag""".stripMargin,

    "agg_outliers" ->
      """WITH st AS (
        |  SELECT lang, count(*) AS n,
        |    sum(CAST(n_chars AS HUGEINT)) AS s,
        |    sum(CAST(n_chars AS HUGEINT) * n_chars) AS q
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, lang, n_chars,
        |  (CAST(n AS HUGEINT) * n_chars - s)
        |    * (CAST(n AS HUGEINT) * n_chars - s)
        |    > (CAST(n AS HUGEINT) * q - s * s) * 4 AS is_outlier
        |FROM documents JOIN st USING (lang)
        |ORDER BY doc_id""".stripMargin,

    "agg_mad" ->
      """WITH med AS (
        |  SELECT l_returnflag,
        |    quantile_disc(l_extendedprice, 0.5) AS median_price
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT li.l_returnflag,
        |  count(*) AS n_items,
        |  any_value(median_price) AS median_price,
        |  quantile_disc(abs(l_extendedprice - median_price), 0.5) AS mad
        |FROM lineitem li JOIN med ON li.l_returnflag = med.l_returnflag
        |GROUP BY li.l_returnflag
        |ORDER BY li.l_returnflag""".stripMargin,

    "agg_bitmap_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "diag_join_fanout" ->
      """WITH k AS (
        |  SELECT l_partkey, count(*) AS c
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS est_pairs,
        |  CAST(sum(CAST(c AS HUGEINT) * c) * 1000 //
        |    CAST(sum(c) AS HUGEINT) AS BIGINT) AS amplification_milli,
        |  arg_max(l_partkey,
        |    c * 10000000000 + (9999999999 - l_partkey)) AS hot_key,
        |  max(c) AS hot_cnt
        |FROM k""".stripMargin,

    "diag_class_balance" ->
      """WITH c AS (
        |  SELECT source, lang, count(*) AS c
        |  FROM documents GROUP BY source, lang),
        |per AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
        |    sum(CAST(c AS HUGEINT) * c) AS sum_c2
        |  FROM c GROUP BY source),
        |top AS (
        |  SELECT source, lang AS top_lang, c AS top_c
        |  FROM (SELECT source, lang, c, row_number() OVER
        |          (PARTITION BY source ORDER BY c DESC, lang) AS rn
        |        FROM c)
        |  WHERE rn = 1)
        |SELECT per.source, n_docs, top_lang,
        |  CAST(CAST(top_c AS HUGEINT) * 1000000 // n_docs AS BIGINT)
        |    AS top_share_ppm,
        |  CAST((CAST(n_docs AS HUGEINT) * n_docs - sum_c2) * 1000000 //
        |    (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT)
        |    AS impurity_ppm
        |FROM per JOIN top ON per.source = top.source
        |ORDER BY per.source""".stripMargin,

    "diag_entity_overlap" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events),
        |b AS (SELECT DISTINCT o_custkey AS user_id FROM orders),
        |j AS (
        |  SELECT a.user_id AS ua, b.user_id AS ub
        |  FROM a FULL OUTER JOIN b ON a.user_id = b.user_id),
        |g AS (
        |  SELECT count(ua) AS n_events_users,
        |    count(ub) AS n_order_custs,
        |    CAST(sum(CASE WHEN ua IS NOT NULL AND ub IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
        |    count(*) AS n_union
        |  FROM j)
        |SELECT CAST(n_events_users AS BIGINT) AS n_events_users,
        |  CAST(n_order_custs AS BIGINT) AS n_order_custs, n_both,
        |  CAST(n_union AS BIGINT) AS n_union,
        |  CAST((n_both * 1000) // n_union AS BIGINT) AS jaccard_pm,
        |  CAST((n_both * 1000) // n_events_users AS BIGINT)
        |    AS events_covered_pm,
        |  CAST((n_both * 1000) // n_order_custs AS BIGINT)
        |    AS orders_covered_pm
        |FROM g""".stripMargin,

    "diag_day_gaps" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day
        |  FROM b)
        |SELECT strftime(spine.day, '%Y-%m-%d') AS day,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_events,
        |  CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY day""".stripMargin,

    "diag_column_footprint" ->
      """WITH legs AS (
        |  SELECT 'event_id' AS col_name, count(*) AS n_rows,
        |    count(event_id) AS n_nonnull,
        |    count(event_id) * 8 AS total_bytes FROM events
        |  UNION ALL
        |  SELECT 'ts', count(*), count(ts), count(ts) * 8 FROM events
        |  UNION ALL
        |  SELECT 'user_id', count(*), count(user_id),
        |    count(user_id) * 8 FROM events
        |  UNION ALL
        |  SELECT 'event_type', count(*), count(event_type),
        |    sum(length(event_type)) FROM events
        |  UNION ALL
        |  SELECT 'value', count(*), count(value), count(value) * 8
        |  FROM events
        |  UNION ALL
        |  SELECT 'props', count(*), count(props), sum(length(props))
        |  FROM events)
        |SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_nonnull AS BIGINT) AS n_nonnull,
        |  CAST(total_bytes AS BIGINT) AS total_bytes,
        |  CAST((CAST(total_bytes AS HUGEINT) * 1000)
        |    // greatest(n_nonnull, 1) AS BIGINT) AS avg_milli_bytes
        |FROM legs ORDER BY col_name""".stripMargin,

    "diag_profile" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    strftime(o_orderdate, '%Y-%m-%d') AS day,
        |    o_orderpriority, o_orderstatus
        |  FROM orders),
        |n AS (SELECT count(*) AS n_rows FROM t)
        |SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_nonnull AS BIGINT) AS n_nonnull,
        |  CAST(ndv AS BIGINT) AS ndv, min_s, max_s
        |FROM (
        |  SELECT 'o_orderkey' AS col_name, count(o_orderkey) AS n_nonnull,
        |    count(DISTINCT o_orderkey) AS ndv,
        |    CAST(min(o_orderkey) AS VARCHAR) AS min_s,
        |    CAST(max(o_orderkey) AS VARCHAR) AS max_s FROM t
        |  UNION ALL
        |  SELECT 'o_custkey', count(o_custkey), count(DISTINCT o_custkey),
        |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |  FROM t
        |  UNION ALL
        |  SELECT 'cents', count(cents), count(DISTINCT cents),
        |    CAST(min(cents) AS VARCHAR), CAST(max(cents) AS VARCHAR) FROM t
        |  UNION ALL
        |  SELECT 'day', count(day), count(DISTINCT day),
        |    min(day), max(day) FROM t
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(o_orderpriority),
        |    count(DISTINCT o_orderpriority),
        |    min(o_orderpriority), max(o_orderpriority) FROM t
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(o_orderstatus),
        |    count(DISTINCT o_orderstatus),
        |    min(o_orderstatus), max(o_orderstatus) FROM t)
        |CROSS JOIN n
        |ORDER BY col_name""".stripMargin,

    "diag_dist_drift" ->
      """WITH b AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 500000
        |      AS bucket,
        |    sum(CASE WHEN o_orderdate < DATE '1998-01-01'
        |        THEN 1 ELSE 0 END) AS n_base,
        |    sum(CASE WHEN o_orderdate < DATE '1998-01-01'
        |        THEN 0 ELSE 1 END) AS n_cur
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT bucket, n_base, n_cur,
        |    (CAST(n_base AS HUGEINT) * sum(n_cur) OVER ())
        |      // greatest(sum(n_base) OVER (), 1) AS e_cur
        |  FROM b)
        |SELECT bucket, CAST(n_base AS BIGINT) AS n_base,
        |  CAST(n_cur AS BIGINT) AS n_cur,
        |  CAST(e_cur AS BIGINT) AS e_cur,
        |  CAST((CAST(n_cur - e_cur AS HUGEINT) * (n_cur - e_cur)
        |        * 1000) // greatest(e_cur, 1) AS BIGINT)
        |    AS chi2_term_milli
        |FROM w ORDER BY bucket""".stripMargin,

    "agg_bitmap_overlap" ->
      """WITH du AS (
        |  SELECT DISTINCT event_type, user_id FROM events),
        |tot AS (SELECT event_type, count(*) AS n FROM du GROUP BY 1),
        |ov AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_overlap
        |  FROM du a JOIN du b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b,
        |  CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
        |  CAST(n_overlap AS BIGINT) AS n_overlap,
        |  CAST((n_overlap * 1000) // (ta.n + tb.n - n_overlap)
        |    AS BIGINT) AS jaccard_permille
        |FROM ov JOIN tot ta ON type_a = ta.event_type
        |        JOIN tot tb ON type_b = tb.event_type
        |ORDER BY type_a, type_b""".stripMargin,

    "agg_winsorize" ->
      s"""WITH th AS (
         |  SELECT l_returnflag,
         |    quantile_disc(l_extendedprice, 0.05) AS p05,
         |    quantile_disc(l_extendedprice, 0.95) AS p95
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT li.l_returnflag,
         |  count(*) AS n_items,
         |  ${Tables.sql.moneySum("l_extendedprice")} AS raw_total,
         |  ${Tables.sql.moneySum(
              "least(greatest(l_extendedprice, p05), p95)")} AS wins_total,
         |  CAST(sum(CASE WHEN l_extendedprice < p05
         |    OR l_extendedprice > p95 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_clipped
         |FROM lineitem li JOIN th ON li.l_returnflag = th.l_returnflag
         |GROUP BY li.l_returnflag
         |ORDER BY li.l_returnflag""".stripMargin,

    "agg_percentile_weighted" ->
      """WITH cell AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |    sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      AS HUGEINT)) AS wsum
        |  FROM lineitem GROUP BY l_returnflag, q),
        |w AS (
        |  SELECT l_returnflag, q,
        |    sum(wsum) OVER (PARTITION BY l_returnflag ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(wsum) OVER (PARTITION BY l_returnflag) AS total
        |  FROM cell)
        |SELECT l_returnflag,
        |  CAST(max(total) AS BIGINT) AS total_weight_cents,
        |  min(CASE WHEN cum * 2 >= total THEN q END) AS wp50,
        |  min(CASE WHEN cum * 10 >= total * 9 THEN q END) AS wp90
        |FROM w GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_hist_eqdepth" ->
      """WITH th AS (
        |  SELECT quantile_disc(l_extendedprice, 0.1) AS c1,
        |         quantile_disc(l_extendedprice, 0.2) AS c2,
        |         quantile_disc(l_extendedprice, 0.3) AS c3,
        |         quantile_disc(l_extendedprice, 0.4) AS c4,
        |         quantile_disc(l_extendedprice, 0.5) AS c5,
        |         quantile_disc(l_extendedprice, 0.6) AS c6,
        |         quantile_disc(l_extendedprice, 0.7) AS c7,
        |         quantile_disc(l_extendedprice, 0.8) AS c8,
        |         quantile_disc(l_extendedprice, 0.9) AS c9
        |  FROM lineitem)
        |SELECT CAST((l_extendedprice > c1)::int + (l_extendedprice > c2)::int
        |  + (l_extendedprice > c3)::int + (l_extendedprice > c4)::int
        |  + (l_extendedprice > c5)::int + (l_extendedprice > c6)::int
        |  + (l_extendedprice > c7)::int + (l_extendedprice > c8)::int
        |  + (l_extendedprice > c9)::int AS INT) AS bucket,
        |  count(*) AS n_items,
        |  min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |FROM lineitem, th
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "agg_hist" ->
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |         CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem)
        |SELECT cents // 500000 AS bucket,
        |  (cents // 500000) * 5000 AS bucket_lo,
        |  count(*) AS n_items,
        |  CAST(sum(qty) AS BIGINT) AS sum_qty
        |FROM c GROUP BY 1
        |ORDER BY bucket""".stripMargin,

    "diag_fk_coverage" ->
      (fkEdges.map { case (n, ct, ck, pt, pk) =>
        fkOracleLeg(n, ct, ck, pt, pk)
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n)") +
        " ORDER BY fk_edge"),

    "diag_pk_dupes" ->
      """WITH k AS (
        |  SELECT 'customer' AS tbl, CAST(c_custkey AS VARCHAR) AS k
        |    FROM customer
        |  UNION ALL SELECT 'documents', CAST(doc_id AS VARCHAR)
        |    FROM documents
        |  UNION ALL SELECT 'embeddings', CAST(vec_id AS VARCHAR)
        |    FROM embeddings
        |  UNION ALL SELECT 'events', CAST(event_id AS VARCHAR)
        |    FROM events
        |  UNION ALL SELECT 'lineitem', CAST(l_orderkey AS VARCHAR)
        |    || ':' || CAST(l_linenumber AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'orders', CAST(o_orderkey AS VARCHAR)
        |    FROM orders
        |  UNION ALL SELECT 'part', CAST(p_partkey AS VARCHAR)
        |    FROM part
        |  UNION ALL SELECT 'supplier', CAST(s_suppkey AS VARCHAR)
        |    FROM supplier),
        |g AS (SELECT tbl, k, count(*) AS m FROM k GROUP BY tbl, k)
        |SELECT tbl, CAST(sum(m) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_keys,
        |  CAST(sum(CASE WHEN m > 1 THEN m ELSE 0 END) AS BIGINT)
        |    AS n_dup_rows,
        |  CAST(max(m) AS BIGINT) AS max_mult
        |FROM g GROUP BY tbl ORDER BY tbl""".stripMargin,

    "agg_quantile_bands" ->
      """WITH c AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |g AS (SELECT seg, cents, count(*) AS n FROM c
        |      GROUP BY seg, cents),
        |w AS (
        |  SELECT seg, cents,
        |    sum(n) OVER (PARTITION BY seg ORDER BY cents) AS cum,
        |    sum(n) OVER (PARTITION BY seg) AS tot
        |  FROM g)
        |SELECT seg,
        |  min(CASE WHEN cum * 10 >= tot THEN cents END) AS p10,
        |  min(CASE WHEN cum * 4 >= tot THEN cents END) AS p25,
        |  min(CASE WHEN cum * 2 >= tot THEN cents END) AS p50,
        |  min(CASE WHEN cum * 4 >= tot * 3 THEN cents END) AS p75,
        |  min(CASE WHEN cum * 10 >= tot * 9 THEN cents END) AS p90
        |FROM w GROUP BY seg ORDER BY seg""".stripMargin,

    "agg_trimmed_mean" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |g AS (SELECT prio, cents, count(*) AS n FROM c
        |      GROUP BY prio, cents),
        |w AS (
        |  SELECT prio, cents, n,
        |    sum(n) OVER (PARTITION BY prio ORDER BY cents) AS cum,
        |    sum(n) OVER (PARTITION BY prio) AS tot
        |  FROM g),
        |cuts AS (
        |  SELECT prio,
        |    min(CASE WHEN cum * 10 >= tot THEN cents END) AS p10,
        |    min(CASE WHEN cum * 10 >= tot * 9 THEN cents END) AS p90
        |  FROM w GROUP BY prio)
        |SELECT w.prio, CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN cents BETWEEN p10 AND p90 THEN n
        |    ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CAST(n AS HUGEINT) * cents) // sum(n) AS BIGINT)
        |    AS mean_c,
        |  CAST(CASE WHEN sum(CASE WHEN cents BETWEEN p10 AND p90
        |      THEN n ELSE 0 END) > 0 THEN
        |    sum(CASE WHEN cents BETWEEN p10 AND p90 THEN
        |      CAST(n AS HUGEINT) * cents ELSE 0 END) //
        |    sum(CASE WHEN cents BETWEEN p10 AND p90 THEN n ELSE 0 END)
        |    END AS BIGINT) AS trimmed_mean_c
        |FROM w JOIN cuts ON w.prio = cuts.prio
        |GROUP BY w.prio ORDER BY w.prio""".stripMargin
  )
}
