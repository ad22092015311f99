package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan properties the 100 TB design relies on —
  * not just that results are right, but that Catalyst produced the
  * plan we architected for: pruned scans, pushed filters, broadcast
  * vs shuffle join selection, top-k without a global sort, and
  * window-group-limit pushdown (SURVEY.md §4.2).
  */
class PlanShapeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = LocalSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("scan_pruned reads only the projected columns") {
    val p = plan("scan_pruned")
    assert(p.contains("ReadSchema"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_extendedprice") && !read.contains("l_comment"))
  }

  test("scan_pushdown pushes the filter to the parquet reader") {
    val p = plan("scan_pushdown")
    assert(p.contains("PushedFilters: ["))
    assert(p.linesIterator.filter(_.contains("PushedFilters"))
      .exists(l => l.contains("IsNotNull") || l.contains("GreaterThan")
        || l.contains("LessThan")))
  }

  test("scan_events_pushdown pushes the ts range through the type normalization") {
    // graft.Tables normalizes events.ts (ns-legacy long / µs-NTZ
    // parquet) to TimestampType. The normalization must NOT sit as a
    // Project between the filter and the scan: a literal time range on
    // the one fact table where 100 TB time-range scans live has to
    // reach PushedFilters for row-group pruning.
    val p = plan("scan_events_pushdown")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.nonEmpty)
    assert(pushed.exists(l => l.contains("GreaterThanOrEqual(ts")
      && l.contains("LessThan(ts")),
      s"ts range not pushed to the parquet scan:\n${pushed.mkString("\n")}")
  }

  test("join_broadcast plans a BroadcastHashJoin with no fact-side shuffle") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("join_sortmerge honors the merge hint") {
    assert(plan("join_sortmerge").contains("SortMergeJoin"))
  }

  test("join_shuffle_hash honors the shuffle_hash hint") {
    assert(plan("join_shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("topk_limit plans TakeOrderedAndProject, not a global sort") {
    val p = plan("topk_limit")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("win_row_number gets the WindowGroupLimit pushdown") {
    assert(plan("win_row_number").contains("WindowGroupLimit"))
  }

  test("join_theta is a hash join on bands, not a nested-loop join") {
    val p = plan("join_theta")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("join_range_self is a banded hash join, not a nested-loop join") {
    val p = plan("join_range_self")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("cdc_snapshot_latest is a partial-aggregating argmax, not a window sort") {
    val p = plan("cdc_snapshot_latest")
    // max_by aggregation: map-side combine shuffles one row per key per
    // partition; a row_number window would shuffle + sort the full log.
    assert(!p.contains("Window"))
    assert(p.contains("partial_max_by") || p.contains("partial_maxby")
      || p.sliding("Aggregate".length).count(_ == "Aggregate") >= 2)
  }

  test("correlated scalar subquery decorrelates to an aggregate + join") {
    val p = plan("sub_scalar_corr")
    // no per-row subquery evaluation: Catalyst rewrites to a join
    // against the pre-aggregated per-group averages
    assert(!p.contains("ScalarSubquery"))
    assert(p.contains("Join"))
  }

  test("IN subquery plans as a semi join, not per-row probes") {
    val p = plan("sub_in")
    assert(p.contains("LeftSemi") || p.contains("Semi"))
  }

  test("EXISTS-in-disjunction plans an ExistenceJoin, not per-row probes") {
    val p = plan("join_existence")
    assert(p.contains("ExistenceJoin"))
  }

  test("LATERAL + LIMIT decorrelates to a WindowGroupLimit top-k join") {
    val p = plan("sub_lateral")
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("Join"))
  }

  test("agg_group uses two-phase hash aggregation") {
    val p = plan("agg_group")
    assert(p.contains("HashAggregate"))
    // partial + final pair ⇒ at least two HashAggregate nodes
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2)
  }

  test("whole-stage codegen covers the scan-filter-project hot path") {
    // Under AQE the codegen explain of a not-yet-executed adaptive plan
    // reports 0 subtrees; disable AQE for this one plan inspection.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("project_expr")(spark, sf)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
      assert(p.contains("WholeStageCodegen subtrees"))
      assert(!p.startsWith("Found 0 WholeStageCodegen"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("composite_q3 broadcasts the dim side and top-ks without a global sort") {
    val p = plan("composite_q3")
    assert(p.contains("BroadcastHashJoin"),
      s"filtered customer side should broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"LIMIT after ORDER BY must plan top-k, not a full sort:\n$p")
    assert(p.contains("PushedFilters"),
      s"date/segment filters should reach the scans:\n$p")
  }

  test("hash-coin sampling is a narrow-only plan: no shuffle before the sort") {
    // The 100 TB story of sample_hash/sample_stratified: the keep
    // decision is a scan-stage filter — the only wide stage allowed is
    // the final presentation ORDER BY (range partitioning).
    for (name <- Seq("sample_hash", "sample_stratified")) {
      val p = plan(name)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$name should not hash-shuffle:\n$p")
    }
  }

  test("gopher quality gate is a narrow-only plan: no shuffle before the sort") {
    // All three rules are per-row array arithmetic (higher-order
    // aggregate, no explode) — at 100 TB the gate runs at scan speed;
    // the only wide stage is the presentation ORDER BY.
    val p = plan("llm_quality_gopher")
    assert(!p.contains("Exchange hashpartitioning"),
      s"llm_quality_gopher should not hash-shuffle:\n$p")
  }

  test("winnowing fingerprints are a narrow-only plan: no shuffle, no window") {
    // The whole algorithm (k-gram polynomial hashes, per-window min,
    // distinct + digest) runs inside array expressions per document —
    // fingerprinting 100 TB is a scan-speed map; the only wide stage
    // is the presentation ORDER BY. A per-position formulation would
    // cost an explode + a doc_id shuffle + a WindowExec sort
    // (measured ~18× slower at sf0.1).
    val p = plan("llm_winnow")
    assert(!p.contains("Exchange hashpartitioning"),
      s"llm_winnow should not hash-shuffle:\n$p")
    assert(!p.contains("Window"),
      s"llm_winnow should not plan a window operator:\n$p")
  }

  test("MLM masking and int8 quantization are narrow-only plans") {
    // Both are pure per-row array-expression transforms (transform/
    // filter/aggregate + md5): at 100 TB they run at scan speed; the
    // only wide stage allowed is the presentation ORDER BY.
    for (name <- Seq("llm_mlm_mask", "llm_vec_quantize")) {
      val p = plan(name)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$name should not hash-shuffle:\n$p")
      assert(!p.contains("Window"),
        s"$name should not plan a window operator:\n$p")
    }
  }

  test("OHLC bars and the skew report aggregate without any window operator") {
    // ts_ohlc: min_by/max_by partials replace a per-key ordering
    // window — the shuffle carries one partial row per (map
    // partition, key). diag_skew_report: two chained hash aggs down
    // to one row; a window formulation would sort the whole key list.
    for (name <- Seq("ts_ohlc", "diag_skew_report")) {
      val p = plan(name)
      assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
        s"$name should be aggregation-shaped:\n$p")
      assert(!p.contains("Window"),
        s"$name should not plan a window operator:\n$p")
    }
  }

  test("sequence packing groups with exactly one hash shuffle") {
    // One exchange to co-locate each (lang, shard) group, sort-based
    // grouping after it — no second shuffle, no buffering aggregation.
    val p = plan("sample_pack")
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected exactly 1 hash exchange, got $n:\n$p")
  }

  test("cdc_scd2 history build is ONE keyed hash shuffle") {
    // Both window functions (version, valid_to) share the user_id
    // partitioning — Catalyst collapses them into one Window over one
    // Exchange; the presentation sort is a range partitioning, not a
    // second hash shuffle.
    val p = plan("cdc_scd2")
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected exactly 1 hash exchange, got $n:\n$p")
  }

  test("win_islands sessionization is ONE keyed hash shuffle") {
    // lag + running sum share the (user_id, ordering), and
    // HashPartitioning(user_id) already satisfies the
    // (user_id, session_id) grouping — so boundary marking, island
    // numbering AND the per-session rollup all ride a single
    // exchange; the presentation sort is range partitioning.
    val p = plan("win_islands")
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected exactly 1 hash exchange, got $n:\n$p")
  }

  test("ts_sessionize and win_sma_crossover are ONE keyed hash shuffle each") {
    // ts_sessionize: gap lag, per-user gap moments, running break-sum
    // AND the (user, session) rollup all ride one user_id exchange
    // (HashPartitioning(user_id) satisfies the two-key grouping) —
    // the win_islands doctrine. win_sma_crossover: both frame sums,
    // both counts and the lag share the same (user_id, event_id)
    // window spec.
    // ts_twap: the lead window and the weighted rollup share the
    // user_id exchange (HashPartitioning(user_id) satisfies the
    // single-key grouping trivially).
    for (name <- Seq("ts_sessionize", "win_sma_crossover", "ts_twap")) {
      val p = plan(name)
      val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(n == 1, s"$name: expected exactly 1 hash exchange, got $n:\n$p")
    }
  }

  test("decontamination probes a broadcast benchmark set — no corpus shuffle for the join") {
    val p = plan("llm_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark gram set should broadcast:\n$p")
  }

  test("composite_curate broadcasts the contamination probe; quality gate reaches the scan") {
    val p = plan("composite_curate")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark gram probe should broadcast:\n$p")
    // the integer quality rules are DataFilters at the file scan —
    // evaluated during the scan stage, before any shuffle
    assert(p.linesIterator.exists(l =>
      l.contains("DataFilters") && l.contains(">= 20")),
      s"quality gate should be a scan-stage filter:\n$p")
  }

  test("runtime bloom-filter join reduction injects might_contain on the probe side") {
    // The optimizer feature that replaces manual semi-join reduction
    // at 100 TB: a selective filter on one join side materializes a
    // bloom filter that pre-filters the other side's scan. Local
    // thresholds are tuned for big data — lower them to see the
    // rewrite on the test tables.
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_totalprice") > 500000) // selective build side
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"expected a bloom-filter probe in the optimized plan:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("join_bloom_prefilter probes the sketch below the join, at the scan stage") {
    // The explicit form of the runtime bloom reduction above: the
    // driver-built sketch rides as a literal inside a Filter that sits
    // BELOW the join on the orders side — probe rows drop during the
    // scan stage, before any Exchange. Top-down plan print: the join
    // appears above, the might_contain Filter after it (deeper), and
    // the orders scan deeper still with no Exchange between filter
    // and scan.
    val p = plan("join_bloom_prefilter")
    val ji = p.indexOf("Join")
    val fi = p.indexOf("might_contain")
    assert(ji >= 0 && fi > ji,
      s"bloom probe must be below the join (scan side):\n$p")
    val below = p.substring(fi)
    val scanI = below.indexOf("orders.parquet")
    assert(scanI >= 0, s"bloom filter must sit over the orders scan:\n$p")
    val ex = below.indexOf("Exchange")
    assert(ex < 0 || ex > scanI,
      s"no shuffle between the bloom probe and the orders scan:\n$p")
  }

  test("brute-force and IVF top-k are TakeOrderedAndProject, not a global window sort") {
    // The scale property: the corpus-sized candidate frame is reduced
    // per-partition (each partition keeps its own k, the driver merges
    // k×partitions rows); the ranking row_number window only ever sees
    // the ≤k survivors. A Window directly over the candidates would
    // sort the whole corpus in ONE partition.
    for (name <- Seq("llm_sim_cosine", "llm_ann_ivf")) {
      val p = plan(name)
      assert(p.contains("TakeOrderedAndProject"),
        s"$name top-k must plan TakeOrderedAndProject:\n$p")
      // top-down plan print: the (tiny) ranking Window must be the
      // PARENT of the TakeOrderedAndProject, i.e. appear above it —
      // proof its input is the k-bounded frame, not the corpus.
      val wi = p.indexOf("Window")
      val ti = p.indexOf("TakeOrderedAndProject")
      assert(wi >= 0 && wi < ti,
        s"$name ranking window must consume the limited frame:\n$p")
    }
  }

  test("no query plans an accidental nested-loop join or cartesian product") {
    // Intentional exceptions: join_cross is a declared cartesian of two
    // tiny dims; the ANN queries cross-join a broadcast single row or
    // the broadcast numCells×dim centroid table.
    // llm_triangles crosses two single-row aggregates (census totals);
    // llm_vocab broadcasts a single-row corpus total.
    // llm_dedup_semantic rides the same IVF assignment build as the
    // ANN queries (corpus × broadcast numCells-row centroid table).
    // llm_unigram_lm, llm_pmi, llm_ccnet_bucket, and cdc_compact cross
    // a broadcast single-row corpus total / retention cutoff (same
    // shape as llm_vocab); composite_scd2_pit
    // interval-joins a broadcast 3-row probe spine (no equi key by
    // design — the probe frame is constant-size, so the BNL side is
    // bounded at 3 rows).
    // composite_q11 / composite_q15 / composite_q22 cross a broadcast
    // 1-row scalar gate (total+count / max / mean-balance pair) — the
    // TPC-H scalar-subquery shape, same bound as llm_unigram_lm.
    // agg_sketch_ams crosses its two single-row aggregates (exact F2
    // × sketch estimate) — the llm_triangles census shape.
    // composite_basket crosses the broadcast 1-row basket total (the
    // scalar-gate shape again).
    val allowed = Set("join_cross", "llm_ann_ivf", "llm_sim_cosine",
      "llm_ann_knn", "llm_triangles", "llm_vocab", "llm_dedup_semantic",
      "llm_unigram_lm", "composite_scd2_pit", "llm_pmi",
      "llm_ccnet_bucket", "cdc_compact",
      "composite_q11", "composite_q15", "composite_q22",
      "agg_sketch_ams", "composite_basket",
      // llm_ngram_coverage crosses the broadcast 1-row corpus total
      // (scalar-gate shape) against the bounded top-1000 head frame.
      "llm_ngram_coverage",
      // llm_surprisal crosses the broadcast 1-row corpus token total
      // (the llm_unigram_lm scalar-gate shape).
      "llm_surprisal",
      // agg_lorenz_points crosses the broadcast 1-row cohort
      // size/total gate (the composite_q11 scalar-subquery shape).
      "agg_lorenz_points",
      // the exact-mode ANN siblings ride the same broadcast 1-row
      // probe / numCells×dim centroid crosses as llm_ann_ivf/knn.
      "llm_ann_ivf_exact", "llm_ann_knn_exact",
      // ts_seasonal_strength crosses the broadcast 1-row global-mean
      // anchor against the calendar-bounded daily frame (the
      // llm_unigram_lm scalar-gate shape).
      "ts_seasonal_strength",
      // the A/B distribution tests cross the broadcast 1-row
      // (n0, n1) arm totals against the price-range-bounded CDF
      // grid (scalar-gate shape); composite_ab_ks additionally joins
      // the broadcast 1-row max-deviation gate.
      "composite_ab_ks", "composite_ab_auc",
      // llm_bpe_train/apply cross each round's broadcast 1-row
      // best-pair frame against the vocabulary-bounded segmentation
      // (five scalar-gate crosses, one per merge round).
      "llm_bpe_train", "llm_bpe_apply",
      // sample_mixture_budget crosses the broadcast 1-row corpus
      // token total against the source-bounded quality frame.
      "sample_mixture_budget",
      // llm_sim_l2 crosses the broadcast 1-row probe vector (the
      // llm_sim_cosine shape).
      "llm_sim_l2",
      // sample_time_split crosses the broadcast 1-row percentile
      // cutoff (scalar-gate shape).
      "sample_time_split",
      // sample_rolling_origin crosses the broadcast 1-row fold-cut
      // frame (same scalar-gate shape).
      "sample_rolling_origin",
      // sample_purged_kfold crosses the broadcast 1-row (min, max)
      // span frame (same scalar-gate shape).
      "sample_purged_kfold",
      // composite_trending crosses the broadcast 1-row date bounds
      // (scalar-gate shape).
      "composite_trending",
      // cdc_merge_sources crosses the broadcast 1-row min-watermark
      // apply frontier (scalar-gate shape).
      "cdc_merge_sources",
      // fn_catalog_dot crosses the broadcast 1-row probe vector (the
      // llm_sim_cosine shape, through the FunctionCatalog route).
      "fn_catalog_dot",
      // llm_ann_pq_adc crosses the broadcast 1-row full-precision
      // probe against the PQ code scan (llm_sim_cosine shape).
      "llm_ann_pq_adc",
      // llm_ann_range crosses the broadcast 1-row quantized probe
      // (the same scalar-gate shape).
      "llm_ann_range",
      // llm_knn_agreement rides the same corpus × broadcast
      // numCells-row centroid cross as llm_ann_knn_exact (cell
      // assignment for every probe).
      "llm_knn_agreement",
      // llm_hard_negatives rides the identical corpus × broadcast
      // centroid cross (AnnIvf.hardNegatives cell assignment).
      "llm_hard_negatives",
      // agg_cohen_kappa crosses two broadcast 1-row scalar frames
      // (totals × marginal-product sum — scalar-gate shape).
      "agg_cohen_kappa",
      // agg_mutual_info crosses the bounded cell frame with the
      // broadcast 1-row total and 1-row H(x) frames (scalar gates).
      "agg_mutual_info",
      // geo_morans_i crosses the ≤1600-cell density frame with the
      // broadcast 1-row totals, then two 1-row scalar frames with
      // each other (scalar gates on a bounded frame).
      "geo_morans_i",
      // ts_aroon band-self-joins the calendar-bounded daily frame
      // (≤ |days|·25 rows at any SF — the argmax-recovery join).
      "ts_aroon",
      // llm_source_jsd theta-joins the |sources|-row per-source
      // total frame with itself to enumerate unordered pairs
      // (bounded at |S|² rows, the composite_scd2_pit probe shape).
      "llm_source_jsd")
    val offenders = SparkEntry.queries.keysIterator
      .filterNot(allowed)
      .filter { name =>
        val p = plan(name)
        p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct")
      }
      .toList
    assert(offenders.isEmpty, s"nested-loop plans: $offenders")
  }

  test("layout_hilbert and llm_vec_pq are narrow scans: no join, no window") {
    // Hilbert keys are 5 chained CASE projections; PQ codes are pure
    // per-row array expressions — both must stay scan-speed maps whose
    // only wide stages are the bucket agg / presentation ORDER BY.
    for (name <- Seq("layout_hilbert", "llm_vec_pq")) {
      val p = plan(name)
      assert(!p.contains("Join"), s"$name should not plan a join:\n$p")
      assert(!p.contains("Window"),
        s"$name should not plan a window operator:\n$p")
    }
  }

  test("per-group top-k profiles get the WindowGroupLimit pushdown") {
    // keyword/char/lift rankings keep only the per-partition top-k
    // heap — the full ranked lists never materialize.
    for (name <- Seq("llm_keyword_topk", "llm_char_freq",
        "llm_distinctive_terms")) {
      assert(plan(name).contains("WindowGroupLimit"),
        s"$name should push the rank filter into WindowGroupLimit")
    }
  }

  test("win_skyline and agg_gini_wealth avoid global-sort/pairwise plans") {
    // The skyline is a partitioned running-max sweep (no dominance
    // self-join); the Gini rank is the two-phase bucket rank (no
    // global single-partition row_number window).
    val sky = plan("win_skyline")
    assert(!sky.contains("BroadcastNestedLoopJoin") &&
      !sky.contains("CartesianProduct"),
      s"win_skyline must not plan a pairwise dominance join:\n$sky")
    val gini = plan("agg_gini_wealth")
    assert(!gini.contains("Window [row_number() windowspecdefinition()"),
      "agg_gini_wealth must not plan a partition-less row_number")
    // the only row_number window must be partitioned (by bucket)
    val winLines = gini.linesIterator
      .filter(l => l.contains("row_number()")).toList
    assert(winLines.forall(_.contains("windowspecdefinition(bucket")),
      s"global-sort rank detected:\n${winLines.mkString("\n")}")
  }

  test("round-6 widening operators keep their declared plan shapes") {
    // llm_embed_outlier's per-label top-5 must ride the group-limit
    // pushdown — the full ranked distance list never materializes.
    assert(plan("llm_embed_outlier").contains("WindowGroupLimit"),
      "llm_embed_outlier should push rk<=5 into WindowGroupLimit")
    // agg_tail_hill's top-256 is a per-partition heap, not a global
    // sort.
    assert(plan("agg_tail_hill").contains("TakeOrderedAndProject"),
      "agg_tail_hill should plan TakeOrderedAndProject")
    // hier_rollup: ONE rollup Expand over broadcast dimension joins —
    // a sort-merge join against a 25-row dimension is a planning bug.
    val hr = plan("hier_rollup")
    assert(hr.contains("Expand"), "hier_rollup should plan one Expand")
    assert(hr.contains("BroadcastHashJoin") &&
      !hr.contains("SortMergeJoin"),
      s"hier_rollup dims must broadcast:\n$hr")
    // agg_hhi's part dimension must broadcast onto the fact scan.
    val hhi = plan("agg_hhi")
    assert(hhi.contains("BroadcastHashJoin") &&
      !hhi.contains("SortMergeJoin"),
      s"agg_hhi part dim must broadcast:\n$hhi")
    // The sweep/series/cell windows must stay PARTITIONED — no
    // partition-less window may ever touch fact-proportional rows in
    // these (ts_concurrency's date-bucketed sweep is exactly the
    // declared scale contract).
    for ((name, key) <- Seq("ts_concurrency" -> "event_type",
        "ts_peak_detect" -> "user_id",
        "agg_percentile_weighted" -> "l_returnflag")) {
      val lines = plan(name).linesIterator
        .filter(_.contains("windowspecdefinition")).toList
      assert(lines.nonEmpty && lines.forall(_.contains(key)),
        s"$name windows must partition on $key:\n${lines.mkString("\n")}")
    }
  }

  test("round-11 shapes: single-pass lsh signatures, memoized covariance") {
    // llm_lsh_tune: the 8 per-seed minhashes are 8 min() columns in
    // ONE aggregation over the shingle frame — the only Generate in
    // the plan is the bounded 15-arm stack ABOVE the signature agg,
    // never a seed-explode below it (which would shuffle the corpus
    // shingle set 8x).
    val lsh = plan("llm_lsh_tune")
    val gens = lsh.linesIterator.filter(_.contains("Generate")).toList
    // legitimate generates: the 15-arm stack above the signature agg
    // and the in-row shingle explode in the (uncached) shingle build —
    // NEVER a seed-sequence explode (sequence(0, 7)) below the agg
    assert(gens.exists(_.contains("stack")),
      s"llm_lsh_tune banding must be the bounded stack:\n$lsh")
    assert(gens.forall(g => !g.contains("sequence(0, 7")),
      s"llm_lsh_tune must not explode seeds below the signature agg:\n" +
        gens.mkString("\n"))
    // the signature aggregate itself carries all 8 mins (partial →
    // map-side combined before its one exchange)
    assert(lsh.contains("partial_min"),
      "signature mins must map-side combine")
    // The PCA family rides ONE persisted covariance frame: after the
    // first member runs, subsequent members read the InMemory cache
    // instead of rescanning the corpus.
    SparkEntry.queries("llm_vec_cov")(spark, sf).collect()
    // the memoized eigensolve is a driver-bounded LocalRelation fed
    // from the persisted covariance — re-invoking the query must not
    // plan a fresh corpus scan
    val second = plan("llm_pca_exact")
    assert(!second.contains("Scan parquet"),
      s"llm_pca_exact must reuse the cached covariance:\n$second")
  }

  test("every declared query has an oracle or a documented exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // approx + ANN + sketches are approximate by design ⇒ rows-only
    // checks (sketch properties pinned in SketchSpec instead)
    assert(noOracle ==
      Set("agg_approx_distinct", "llm_ann_ivf", "llm_ann_knn",
        "agg_sketch_bloom", "agg_sketch_cms", "agg_sketch_hll",
        "agg_sketch_kll", "llm_dedup_semantic", "llm_pca_power"))
  }
}
