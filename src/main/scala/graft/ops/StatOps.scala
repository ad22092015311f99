package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust / order statistics beyond the moment-based aggregates:
  * Theil–Sen slope and Kendall rank correlation (the outlier-immune
  * siblings of agg_regression's OLS slope and ts_spearman's rho),
  * exact rolling medians, corpus language-model and keyword
  * statistics, chunked lexical diversity, and the Gini concentration
  * coefficient via a two-phase distributed rank (no global-sort
  * window). All integer-exact (permille / ppm fixed-point), every
  * product that could pass 2^63 at 100 TB routed through
  * DECIMAL(38,0) / HUGEINT.
  */
object StatOps extends OpPack {

  /** Per-user (earlier, later) event pairs with cent values — the
    * shared frame of the pairwise robust statistics. The self-join is
    * per-user-BLOCK-bounded (the declared bounded-block contract of
    * join_range_self / KnnJoin: a user's event count is bounded by the
    * retention window, so k² per user never approaches corpus²); the
    * join shuffles both sides on user_id once. */
  private def eventPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val c = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val a = c.select(col("user_id"), col("event_id").as("x1"),
      col("cents").as("y1"))
    val b = c.select(col("user_id").as("u2"), col("event_id").as("x2"),
      col("cents").as("y2"))
    a.join(b, col("user_id") === col("u2") && col("x1") < col("x2"))
      .select(col("user_id"), col("x1"), col("x2"), col("y1"), col("y2"))
  }

  def queries: Map[String, Q] = Map(
    // Chi-square association test between two categorical columns
    // (event type × day-of-week — "does behavior depend on weekday"):
    // the contingency-table independence statistic as per-cell
    // chi²-terms in milli-units, diag_dist_drift's exact integer form
    // (expected = row-margin·col-margin div N as an exact integer
    // div, term = (observed−expected)²·1000 div max(expected,1) —
    // deviations ≤ N so the squared product stays ≤ 38 digits even at
    // 10¹³ rows, where squaring the raw cross-products would not).
    // Day-of-week is days-since-epoch mod 7 (engine DOW builtins
    // disagree on week origin — the ts_seasonal_strength doctrine).
    // ONE map-side-combined hash agg over ≤|types|·7 cells; margins
    // are window sums over that BOUNDED cell frame (the declared
    // partition-less-window contract), so independence testing at
    // 100 TB costs exactly one scan.
    "agg_chi2_assoc" -> ((s, dir) => {
      val cell = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("unix_date(CAST(ts AS DATE)) % 7").as("wd"))
        .groupBy(col("event_type"), col("wd"))
        .agg(count(lit(1)).as("n"))
      cell
        .withColumn("n_type",
          sum(col("n")).over(Window.partitionBy(col("event_type"))))
        .withColumn("n_wd",
          sum(col("n")).over(Window.partitionBy(col("wd"))))
        .withColumn("n_tot", sum(col("n")).over(Window.partitionBy()))
        .withColumn("expected", expr(
          "CAST((CAST(n_type AS DECIMAL(38,0)) * n_wd) div n_tot " +
            "AS BIGINT)"))
        .select(col("event_type"), col("wd"), col("n"), col("expected"),
          expr("CAST((CAST(n - expected AS DECIMAL(38,0)) * " +
            "(n - expected) * 1000) div greatest(expected, 1) " +
            "AS BIGINT)").as("chi2_term_milli"))
        .orderBy(col("event_type"), col("wd"))
    }),

    // Cramér's V effect size (the NORMALIZED cousin of agg_chi2_assoc:
    // chi² says "dependent or not", V says "how strongly", comparable
    // across tables of different size and shape) between order status
    // and priority. Same exact integer doctrine as chi2_assoc:
    // expected = row·col div N (truncated identically both engines),
    // per-cell term in micro-units, then V²_ppm = Σterms div (N·k)
    // with k = min(r−1, c−1) — all on DECIMAL(38,0)/HUGEINT so the
    // squared deviations survive 10¹³-row tables. ONE ≤15-cell hash
    // agg; margins and the roll-up are windows/aggs on that bounded
    // cell frame (declared partition-less-window contract). A single-
    // category side (k = 0) is declared NULL.
    "agg_cramers_v" -> ((s, dir) => {
      val cells = Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("st"),
          col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n"))
      cells
        .withColumn("n_row",
          sum(col("n")).over(Window.partitionBy(col("st"))))
        .withColumn("n_col",
          sum(col("n")).over(Window.partitionBy(col("pri"))))
        .withColumn("n_tot", sum(col("n")).over(Window.partitionBy()))
        .withColumn("e", expr(
          "(CAST(n_row AS DECIMAL(38,0)) * n_col) div n_tot"))
        .withColumn("term_micro", expr(
          "(CAST(n - e AS DECIMAL(38,0)) * (n - e) * 1000000) " +
            "div greatest(e, 1)"))
        .agg(max(col("n_tot")).as("n_rows"),
          countDistinct(col("st")).as("n_r"),
          countDistinct(col("pri")).as("n_c"),
          sum(col("term_micro")).as("chi2_micro"))
        .select(col("n_rows"), col("n_r"), col("n_c"),
          expr("CAST(chi2_micro AS BIGINT)").as("chi2_micro"),
          expr("CAST(CAST(chi2_micro AS DECIMAL(38,0)) div " +
            "(CAST(n_rows AS DECIMAL(38,0)) * " +
            "nullif(least(n_r - 1, n_c - 1), 0)) AS BIGINT)")
            .as("v2_ppm"))
    }),

    // Two-feature OLS in EXACT integer arithmetic (agg_regression is
    // the single-feature sibling): per-user features x1 = even-event
    // spend (whole dollars — dollar granularity keeps the Cramer
    // determinant inside DECIMAL(38,0) out to ~10⁶ users), x2 =
    // event count; target z = odd-event spend. Central moments via
    // cross-multiplication (n·Sab − Sa·Sb — exact, no mean
    // subtraction), slopes by Cramer's rule on the 2×2 normal
    // equations: β1 = (Myy·Mxz − Mxy·Myz)/det, det = Mxx·Myy − Mxy².
    // Singular designs (det = 0) declared NULL. ONE per-user
    // map-side-combined agg + a 1-row moment rollup.
    "agg_regression_multi" -> ((s, dir) => {
      val per = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_id") % 2 === 0,
            expr("CAST(round(value) AS BIGINT)")).otherwise(0L)).as("x"),
          count(lit(1)).as("y"),
          sum(when(col("event_id") % 2 =!= 0,
            expr("CAST(round(value) AS BIGINT)")).otherwise(0L)).as("z"))
      per.agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("z")).as("sz"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * z")).as("sxz"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * z")).as("syz"))
        .withColumn("mxx", expr(
          "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
        .withColumn("myy", expr(
          "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
        .withColumn("mxy", expr(
          "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
        .withColumn("mxz", expr(
          "CAST(n AS DECIMAL(38,0)) * sxz - CAST(sx AS DECIMAL(38,0)) * sz"))
        .withColumn("myz", expr(
          "CAST(n AS DECIMAL(38,0)) * syz - CAST(sy AS DECIMAL(38,0)) * sz"))
        .withColumn("det", expr("mxx * myy - mxy * mxy"))
        .select(col("n"),
          expr("CASE WHEN det <> 0 THEN " +
            "CAST((myy * mxz - mxy * myz) * 1000 div det AS BIGINT) END")
            .as("beta1_milli"),
          expr("CASE WHEN det <> 0 THEN " +
            "CAST((mxx * myz - mxy * mxz) * 1000 div det AS BIGINT) END")
            .as("beta2_milli"))
    }),

    // Pairwise correlation structure of three per-user metrics
    // (spend, activity, tenure) — the feature-redundancy report run
    // before any model fit (agg_regression_multi then picks the
    // de-correlated pair): R² in permille with EVERY fraction cleared
    // — r² = (n·Sab − Sa·Sb)²·1000 div ((n·Saa − Sa²)·(n·Sbb − Sb²))
    // — plus the covariance sign, exact integers in both engines.
    // ONE per-user agg + a 1-row moment rollup unpivoted to the three
    // pair rows (stack/UNION — no second pass over the corpus).
    "agg_corr_pairs" -> ((s, dir) => {
      val per = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(expr("CAST(round(value) AS BIGINT)")).as("x"),
          count(lit(1)).as("y"),
          expr("CAST(datediff(max(ts), min(ts)) + 1 AS BIGINT)").as("z"))
      val g = per.agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("z")).as("sz"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
          sum(expr("CAST(z AS DECIMAL(38,0)) * z")).as("szz"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * z")).as("sxz"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * z")).as("syz"))
        .withColumn("mxx", expr(
          "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
        .withColumn("myy", expr(
          "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
        .withColumn("mzz", expr(
          "CAST(n AS DECIMAL(38,0)) * szz - CAST(sz AS DECIMAL(38,0)) * sz"))
        .withColumn("mxy", expr(
          "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
        .withColumn("mxz", expr(
          "CAST(n AS DECIMAL(38,0)) * sxz - CAST(sx AS DECIMAL(38,0)) * sz"))
        .withColumn("myz", expr(
          "CAST(n AS DECIMAL(38,0)) * syz - CAST(sy AS DECIMAL(38,0)) * sz"))
      def r2(cov: String, va: String, vb: String) =
        s"CASE WHEN $va > 0 AND $vb > 0 THEN " +
          s"CAST(($cov * $cov * 1000) div ($va * $vb) AS BIGINT) END"
      def sgn(cov: String) =
        s"CAST(CASE WHEN $cov > 0 THEN 1 WHEN $cov < 0 THEN -1 " +
          "ELSE 0 END AS BIGINT)"
      g.selectExpr(
          s"stack(3, " +
            s"'xy', ${r2("mxy", "mxx", "myy")}, ${sgn("mxy")}, " +
            s"'xz', ${r2("mxz", "mxx", "mzz")}, ${sgn("mxz")}, " +
            s"'yz', ${r2("myz", "myy", "mzz")}, ${sgn("myz")}) " +
            "AS (pair, r2_permille, cov_sign)")
        .orderBy(col("pair"))
    }),

    // Theil–Sen estimator: the median of all pairwise slopes — the
    // robust trend line (one gross outlier moves OLS arbitrarily,
    // moves the pairwise-slope median not at all). Slopes in integer
    // milli-cents-per-event-id ((Δy·1000) div Δx — truncation toward
    // zero identical in both engines); the median is percentile_disc
    // (an actual observed slope, never an interpolated float). Shape:
    // one user_id-shuffled bounded-block self-join + one hash agg.
    "ts_theilsen" -> ((s, dir) => {
      eventPairs(s, dir)
        .withColumn("slope_milli",
          expr("((y2 - y1) * 1000) div (x2 - x1)"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("CAST(percentile_disc(0.5) WITHIN GROUP " +
            "(ORDER BY slope_milli) AS BIGINT)").as("theil_slope_milli"))
        .orderBy(col("user_id"))
    }),

    // Kendall rank correlation (tau-a) of value vs event order per
    // user — the pair-concordance monotone-trend test (complements
    // ts_spearman's rank-difference form; tau has the cleaner
    // integer closed form: no squared deviations at all). x strictly
    // increases within a pair by construction, so concordant =
    // value rose, discordant = value fell, value ties count neither;
    // tau×1000 = (C − D)·1000 div n_pairs. Same bounded-block pair
    // frame + one hash agg.
    "ts_kendall" -> ((s, dir) => {
      eventPairs(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("y2") > col("y1"), 1L).otherwise(0L)).as("conc"),
          sum(when(col("y2") < col("y1"), 1L).otherwise(0L)).as("disc"))
        .withColumn("tau_milli",
          expr("((conc - disc) * 1000) div n_pairs"))
        .orderBy(col("user_id"))
    }),

    // Exact rolling median over the trailing 11 events per user — the
    // robust smoother a telemetry pipeline runs beside ts_ewma (one
    // spike moves a mean for 16 samples, a median not at all). The
    // 11-element frame is collected per row and median'd with narrow
    // array expressions (lower-median element, the percentile_disc
    // convention): O(frame) state per row on the ONE user_id
    // exchange every window op here shares — no second shuffle.
    "win_rolling_median" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-10, 0)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("win", collect_list(col("cents")).over(w))
        // all-null windows collect to an EMPTY list: median is NULL
        // (what the oracle's quantile_disc over nulls returns)
        .select(col("user_id"), col("event_id"), col("cents"),
          expr("CASE WHEN size(win) = 0 THEN NULL ELSE " +
            "element_at(array_sort(win), " +
            "CAST((size(win) + 1) div 2 AS INT)) END").as("med11"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Corpus bigram language model (the Markov sibling of
    // llm_unigram_lm): conditional next-token probability in ppm =
    // c(w1,w2)·10⁶ div c(w1·) over adjacent-token pairs, top-20 by
    // pair count. The count product rides DECIMAL(38,0): a 10¹²-pair
    // corpus count ×10⁶ overflows BIGINT. Narrow per-row pair
    // generation + two chained map-side-combined hash aggs + one
    // co-partitioned join on w1 + TakeOrderedAndProject — LM stats
    // over 100 TB are a scan plus vocabulary-sized shuffles.
    "llm_bigram_lm" -> ((s, dir) => {
      val bg = Tables(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr("transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .filter(col("w1") =!= "" && col("w2") =!= "")
      val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
      val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
      c2.join(c1, "w1")
        .withColumn("p_ppm",
          expr("CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div n1 " +
            "AS BIGINT)"))
        .select(col("w1"), col("w2"), col("n"), col("n1"), col("p_ppm"))
        .orderBy(desc("n"), asc("w1"), asc("w2"))
        .limit(20)
    }),

    // Per-document keyword extraction: top-3 tokens by integer
    // tf·rarity score (tf·10⁶ div df — the tf-idf ranking without the
    // log, so it stays exactly oracle-checkable; llm_tfidf holds the
    // corpus-level form). Deterministic tie-break (score desc, token
    // asc); the per-doc top-3 is a row_number window that gets the
    // WindowGroupLimit pushdown (never materializes full ranked
    // lists). Two hash aggs + one vocabulary-keyed co-partitioned
    // join + windowed top-k on the doc_id exchange.
    "llm_keyword_topk" -> ((s, dir) => {
      val tok = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val tf = tok.groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val win = Window.partitionBy(col("doc_id"))
        .orderBy(desc("score"), asc("w"))
      tf.join(dfq, "w")
        .withColumn("score",
          expr("CAST((CAST(tf AS DECIMAL(38,0)) * 1000000) div df " +
            "AS BIGINT)"))
        .withColumn("rnk", row_number().over(win).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("w"), col("tf"),
          col("df"), col("score"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // Chunked type-token ratio (MATTR's fixed-chunk form): lexical
    // diversity per 50-token chunk in permille, rolled up to per-doc
    // min/mean — the length-robust diversity signal (plain TTR decays
    // with doc length, chunked TTR does not; complements llm_gini's
    // concentration view). Position-based chunking (pos div 50), two
    // chained hash aggs ((doc, chunk) → doc), integer mean = sum div
    // n. Diversity over 100 TB is a scan plus doc-keyed shuffles.
    "llm_ttr_chunk" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "w")))
        .withColumn("chunk", expr("pos div 50"))
        .groupBy(col("doc_id"), col("chunk"))
        .agg(count(lit(1)).as("n_tok"),
          countDistinct(col("w")).as("n_distinct"))
        .withColumn("ttr_pm", expr("(n_distinct * 1000) div n_tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          min(col("ttr_pm")).as("min_ttr_pm"),
          expr("sum(ttr_pm) div count(*)").as("mean_ttr_pm"))
        .orderBy(col("doc_id"))
    }),

    // Product-quantization codes for the embedding corpus (the PQ
    // compressor front-end of an ANN index — 64 floats → one BIGINT
    // code): split each vector into 8 subvectors of 8 dims, scalar-
    // quantize each subvector MEAN over the exact micro-unit
    // representation to a 3-bit level on the fixed [-1, 1] grid
    // (no trained codebook — deterministic, mergeable, zero driver
    // state; the k-means-codebook variant is llm_ann_ivf's territory),
    // pack the 8 digits base-8, and emit the exact L1 reconstruction
    // error as the fidelity column a recall monitor thresholds on.
    // Entirely narrow per-row array expressions: compressing 100 TB of
    // vectors is a scan-speed map, NO shuffle.
    "llm_vec_pq" -> ((s, dir) => {
      Tables(s, dir, "embeddings")
        .withColumn("xu", expr(
          "transform(embedding, " +
            "x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
        .withColumn("digits", expr(
          "transform(sequence(0, 7), j -> least(greatest(" +
            "(aggregate(slice(xu, j * 8 + 1, 8), 0L, (a, v) -> a + v) " +
            "div 8 + 1000000) div 250000, 0L), 7L))"))
        .select(col("vec_id"),
          expr("aggregate(digits, 0L, (a, d) -> a * 8 + d)")
            .as("pq_code"),
          expr("aggregate(sequence(0, 63), 0L, (a, i) -> a + " +
            "abs(element_at(xu, CAST(i + 1 AS INT)) - " +
            "(element_at(digits, CAST(i div 8 + 1 AS INT)) * 250000 " +
            "- 875000)))").as("recon_err_u"))
        .orderBy(col("vec_id"))
    }),

    // PQ ADC search (asymmetric distance computation — the production
    // ANN scan shape: the probe stays full-precision, the corpus is
    // only its PQ codes): L1 distance between the probe and each
    // vector's grid reconstruction, integer fixed-point end-to-end
    // (the llm_vec_pq quantizer is deterministic arithmetic, so —
    // unlike learned-codebook PQ — the WHOLE search is hash-oracled,
    // not recall-pinned). Top-10 by (dist, vec_id), rank-only output.
    // SCALE: this is the memory-bandwidth story at 100 TB — the scan
    // touches one 24-bit code word per vector instead of 64 floats
    // (~10× less IO), and the probe rides a broadcast 1-row cross
    // (scalar-gate shape); ORDER BY+LIMIT keeps TakeOrderedAndProject
    // (per-partition top-k, driver merge — no global sort).
    "llm_ann_pq_adc" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .withColumn("xu", expr(
          "transform(embedding, " +
            "x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
      val codes = emb.withColumn("digits", expr(
          "transform(sequence(0, 7), j -> least(greatest(" +
            "(aggregate(slice(xu, j * 8 + 1, 8), 0L, (a, v) -> a + v) " +
            "div 8 + 1000000) div 250000, 0L), 7L))"))
        .select(col("vec_id"), col("digits"))
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("xu").as("probe_u"))
      val scored = codes.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        // fused native ADC (graft.functions.PqAdcL1) — bit-identical
        // to the HOF fold it replaced, but a codegen loop instead of
        // an interpreted lambda per element
        .withColumn("dist_u", expr("pq_adc_l1(probe_u, digits)"))
        .select(col("vec_id"), col("dist_u"))
        .orderBy(col("dist_u"), col("vec_id")).limit(10)
      scored.withColumn("rank", row_number().over(
          Window.orderBy(col("dist_u"), col("vec_id"))).cast("int"))
        .select(col("rank"), col("vec_id"), col("dist_u"))
        .orderBy(col("rank"))
    }),

    // Per-nation Pareto frontier (skyline) of customers on
    // (revenue, account balance): a customer is on the frontier iff no
    // other customer of the nation weakly dominates it (>= in both
    // coordinates, > in one; exact coordinate duplicates keep only the
    // smallest custkey — declared, shared verbatim with the oracle).
    // The skyline is the classic single-sweep: sort the PARTITIONED
    // window by (rev desc, bal desc, key) and keep rows whose balance
    // strictly exceeds the running max of all predecessors — O(1)
    // window state, one nation-keyed exchange, never a pairwise
    // dominance join.
    "win_skyline" -> ((s, dir) => {
      val rev = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("rev_c"))
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_c"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(desc("rev_c"), desc("bal_c"), asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
      c.join(rev, col("c_custkey") === col("o_custkey"))
        .withColumn("max_prev_bal", max(col("bal_c")).over(w))
        .filter(col("max_prev_bal").isNull ||
          col("bal_c") > col("max_prev_bal"))
        .select(col("c_nationkey"), col("c_custkey"), col("rev_c"),
          col("bal_c"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    }),

    // Rolling MAD outlier detector (the Hampel filter): per row, the
    // trailing-11 median AND the median absolute deviation from it —
    // both exact lower-median order statistics over the same collected
    // frame — flagging |x − med| > 6·MAD. The fully-robust anomaly
    // gate (ts_anomaly's z-score breaks when the window itself holds
    // outliers; the MAD does not). O(frame) state per row on the ONE
    // user_id exchange; constant-window frames (MAD = 0) flag any
    // deviation, declared.
    "win_rolling_mad" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-10, 0)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("win", collect_list(col("cents")).over(w))
        // all-null windows collect to an EMPTY list: NULL median/MAD
        .withColumn("med11",
          expr("CASE WHEN size(win) = 0 THEN NULL ELSE " +
            "element_at(array_sort(win), " +
            "CAST((size(win) + 1) div 2 AS INT)) END"))
        .withColumn("mad11",
          expr("CASE WHEN size(win) = 0 THEN NULL ELSE " +
            "element_at(array_sort(transform(win, " +
            "v -> abs(v - med11))), CAST((size(win) + 1) div 2 AS INT)) " +
            "END"))
        .select(col("user_id"), col("event_id"), col("cents"),
          col("med11"), col("mad11"),
          expr("abs(cents - med11) > 6 * mad11").as("is_outlier"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Power-of-two (log2) histogram of order totals — the bucket
    // shape for heavy-tailed metrics (latency/size/money histograms
    // double their bucket width, they don't fix it): bucket = bit
    // length of the cent amount, computed by BASE-2 STRING LENGTH
    // (identical in both engines — no float log2 anywhere), with the
    // exact [2^(b−1), 2^b) bounds. One scan + one ~27-group
    // map-side-combined hash agg.
    "agg_hist_log2" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .withColumn("cents",
          expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .withColumn("bits",
          expr("CAST(length(conv(CAST(cents AS STRING), 10, 2)) " +
            "AS BIGINT)"))
        .groupBy(col("bits"))
        .agg(count(lit(1)).as("n"),
          min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"))
        .withColumn("lo", expr("CAST(pow(2, bits - 1) AS BIGINT)"))
        .withColumn("hi", expr("CAST(pow(2, bits) AS BIGINT) - 1"))
        .select(col("bits"), col("lo"), col("hi"), col("n"),
          col("min_cents"), col("max_cents"))
        .orderBy(col("bits"))
    }),

    // Distinctive vocabulary per source (the segment-profiling cousin
    // of llm_tfidf): top-3 tokens by integer lift ppm =
    // (tf_src·total_corpus·10⁶) div (total_src·tf_corpus), minimum
    // support tf_src ≥ 5 (declared — lift over singleton counts is
    // noise). The corpus total rides a window sum over the BOUNDED
    // |sources| frame (no scalar cross-join); everything else is
    // vocabulary-keyed co-partitioned joins + a WindowGroupLimit
    // top-3. Products in DECIMAL(38,0)/HUGEINT (tf·total·10⁶ ≈ 10³⁰
    // at 100 TB).
    "llm_distinctive_terms" -> ((s, dir) => {
      val tf = Tables(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("tf_s"))
      val srcTot = tf.groupBy(col("source"))
        .agg(sum(col("tf_s")).as("total_s"))
        .withColumn("total_c", expr("sum(total_s) OVER ()"))
      val corpusTf = tf.groupBy(col("w")).agg(sum(col("tf_s")).as("tf_c"))
      val win = Window.partitionBy(col("source"))
        .orderBy(desc("lift_ppm"), asc("w"))
      tf.join(srcTot, "source").join(corpusTf, "w")
        .filter(col("tf_s") >= 5)
        .withColumn("lift_ppm", expr(
          "CAST((CAST(tf_s AS DECIMAL(38,0)) * total_c * 1000000) div " +
            "(CAST(total_s AS DECIMAL(38,0)) * tf_c) AS BIGINT)"))
        .withColumn("rnk", row_number().over(win).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("source"), col("rnk"), col("w"), col("tf_s"),
          col("lift_ppm"))
        .orderBy(col("source"), col("rnk"))
    }),

    // Benford first-digit audit of order totals (the classic
    // fabricated-numbers screen: organically-grown monetary amounts
    // follow log10(1+1/d); invented ones don't): observed first-digit
    // shares in ppm against the Benford expectation (embedded as exact
    // integer ppm CONSTANTS — public math, no runtime logs, so the
    // whole audit stays integer-exact), absolute deviation per digit.
    // First digit via BIGINT→string cast (identical text both
    // engines). One scan + one 9-group hash agg + a 9-row window
    // total: auditing 100 TB of amounts is a map-side-combined count.
    "agg_benford" -> ((s, dir) => {
      // round(1e6 * log10(1 + 1/d)) for d = 1..9
      val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
        66947L, 57992L, 51153L, 45757L)
      val benfordCase = benford.zipWithIndex
        .map { case (v, i) => s"WHEN ${i + 1} THEN ${v}L" }
        .mkString("CASE digit ", " ", " END")
      Tables(s, dir, "orders")
        .withColumn("digit", expr(
          "CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) " +
            "AS STRING), 1, 1) AS BIGINT)"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .withColumn("share_ppm", expr(
          "CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div " +
            "sum(n) OVER () AS BIGINT)"))
        .withColumn("benford_ppm", expr(benfordCase))
        .withColumn("dev_ppm", abs(col("share_ppm") - col("benford_ppm")))
        .select(col("digit"), col("n"), col("share_ppm"),
          col("benford_ppm"), col("dev_ppm"))
        .orderBy(col("digit"))
    }),

    // Event-type transition matrix (the Markov flow behind a Sankey /
    // user-journey diagram): per-user consecutive event-type pairs
    // (event_id order), corpus-wide counts, and the conditional
    // next-step probability in ppm per source type. One lag window on
    // the user_id exchange + one |types|²-group hash agg + a
    // co-partitioned join against source totals — journey analytics
    // over 100 TB is a windowed scan plus tiny-key shuffles.
    "composite_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val pairs = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
      val cnt = pairs.groupBy(col("from_type"),
        col("event_type").as("to_type")).agg(count(lit(1)).as("n"))
      val tot = pairs.groupBy(col("from_type"))
        .agg(count(lit(1)).as("n_from"))
      cnt.join(tot, "from_type")
        .withColumn("p_ppm", expr(
          "CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div n_from " +
            "AS BIGINT)"))
        .select(col("from_type"), col("to_type"), col("n"),
          col("n_from"), col("p_ppm"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Rolling OLS slope over the trailing 10 events per user (the
    // windowed trend detector beside win_rolling_median's level and
    // ts_ewma's smoothing): x = within-user row position, y = cents;
    // slope×1000 = (kΣxy − ΣxΣy)·1000 div (kΣx² − (Σx)²) from FOUR
    // frame sums over the SAME user_id exchange (row_number + sums in
    // one window pass each, O(1) state); every product rides
    // DECIMAL(38,0) and the zero-variance frame (k=1) yields NULL
    // through the same CASE in both engines.
    "win_rolling_slope" -> ((s, dir) => {
      val ord = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val w = ord.rowsBetween(-9, 0)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("x", row_number().over(ord).cast("long"))
        .withColumn("k", count(lit(1)).over(w))
        .withColumn("sx", sum(col("x")).over(w))
        .withColumn("sy", sum(col("cents")).over(w))
        .withColumn("sxy",
          sum(expr("CAST(x AS DECIMAL(38,0)) * cents")).over(w))
        .withColumn("sxx",
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).over(w))
        .select(col("user_id"), col("event_id"), col("cents"),
          expr("CAST(CASE WHEN k * sxx - CAST(sx AS DECIMAL(38,0)) * sx " +
            "<> 0 THEN ((k * sxy - CAST(sx AS DECIMAL(38,0)) * sy) " +
            "* 1000) div (k * sxx - CAST(sx AS DECIMAL(38,0)) * sx) " +
            "END AS BIGINT)").as("slope_milli"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Per-language character-frequency profile: top-5 non-space
    // characters with corpus share in ppm — the encoding-anomaly /
    // mojibake / wrong-language-id detector every web-corpus intake
    // runs (a lang bucket whose top chars aren't that script's is
    // misrouted). Character explosion is a narrow regexp_extract_all
    // (identical '.' semantics in Java regex and RE2), then two
    // map-side-combined hash aggs + a WindowGroupLimit top-5 per lang;
    // count×10⁶ rides DECIMAL(38,0)/HUGEINT.
    "llm_char_freq" -> ((s, dir) => {
      val ch = Tables(s, dir, "documents")
        .select(col("lang"),
          explode(expr("regexp_extract_all(text, '.', 0)")).as("ch"))
        .filter(col("ch") =!= " ")
      val cnt = ch.groupBy(col("lang"), col("ch")).agg(count(lit(1)).as("n"))
      val tot = ch.groupBy(col("lang")).agg(count(lit(1)).as("tot"))
      val win = Window.partitionBy(col("lang")).orderBy(desc("n"), asc("ch"))
      cnt.join(tot, "lang")
        .withColumn("share_ppm",
          expr("CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div tot " +
            "AS BIGINT)"))
        .withColumn("rnk", row_number().over(win).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("lang"), col("rnk"), col("ch"), col("n"),
          col("share_ppm"))
        .orderBy(col("lang"), col("rnk"))
    }),

    // Gini concentration coefficient of customer revenue (the revenue
    // inequality audit behind composite_pareto's 80/20 view), exact in
    // permille: G = (2·Σ iᐧxᵢ − (n+1)·Σx) div (n·Σx) over ascending
    // ranks. The rank is the SCALE PATH: a global row_number window is
    // a single-partition sort, so ranks come from a TWO-PHASE
    // distributed prefix rank instead (the llm_token_shards idiom) —
    // bucket on the $10k revenue grid, per-bucket row_number on the
    // bucket exchange, plus the grid histogram's prefix sum (a
    // partition-less window over the BOUNDED price grid — the declared
    // contract); bucket order is monotone in cents so the composed
    // rank equals the global one. Rank·value products ride
    // DECIMAL(38,0) (i·x reaches n·Σx ≈ 10²⁷ at 100 TB).
    "agg_gini_wealth" -> ((s, dir) => {
      val rev = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val b = rev.withColumn("bucket", expr("cents div 1000000"))
      val hist = b.groupBy(col("bucket")).agg(count(lit(1)).as("bn"))
        .withColumn("cum_before",
          expr("coalesce(sum(bn) OVER (ORDER BY bucket " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"))
        .select(col("bucket"), col("cum_before"))
      val win = Window.partitionBy(col("bucket"))
        .orderBy(col("cents"), col("o_custkey"))
      b.withColumn("rk_in", row_number().over(win).cast("long"))
        .join(hist, "bucket")
        .withColumn("i", col("cum_before") + col("rk_in"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("total_cents"),
          sum(expr("CAST(i AS DECIMAL(38,0)) * cents")).as("iwx"))
        .select(col("n_customers"), col("total_cents"),
          expr("CAST(((2 * iwx - CAST(n_customers + 1 AS DECIMAL(38,0)) " +
            "* total_cents) * 1000) div " +
            "(CAST(n_customers AS DECIMAL(38,0)) * total_cents) " +
            "AS BIGINT)").as("gini_permille"))
    }),

    // Higher-moment shape profile (skewness/kurtosis) of quantity per
    // return flag — the distribution-shape audit beyond agg_stats'
    // mean/stddev. Exact integer protocol: anchor = floor group mean
    // (one tiny agg, broadcast back — the winsorize two-pass shape),
    // central power sums m2/m3/m4 over d = q − anchor in
    // DECIMAL(38,0) (q ≤ 50 ⇒ Σd⁴ ≤ 6.25e6·n, 38-digit-safe at
    // 10¹² rows); kurtosis = n·m4·1000 div m2² exactly; skewness via
    // the DECLARED two-step division sign(m3)·((m3² div m2 div m2)·
    // n·1000 div m2) — m2³ would pass 38 digits, the staged floors
    // are the published cross-engine formula. Two fact scans total.
    "agg_skew_kurt" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("CAST(l_quantity AS BIGINT)").as("q"))
      val anchor = li.groupBy(col("l_returnflag"))
        .agg(expr("sum(q) div count(1)").as("a"))
      li.join(broadcast(anchor), Seq("l_returnflag"))
        .withColumn("d", col("q") - col("a"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          max(col("a")).as("anchor_qty"),
          expr("sum(CAST(d * d AS DECIMAL(38,0)))").as("m2"),
          expr("sum(CAST(d * d * d AS DECIMAL(38,0)))").as("m3"),
          expr("sum(CAST(d * d * d * d AS DECIMAL(38,0)))").as("m4"))
        .select(col("l_returnflag"), col("n_items"), col("anchor_qty"),
          expr("CAST(m2 AS BIGINT)").as("m2"),
          expr("CAST(m3 AS BIGINT)").as("m3"),
          expr("CAST(CASE WHEN m2 > 0 THEN " +
            "(CASE WHEN m3 < 0 THEN -1 ELSE 1 END) * " +
            "(((m3 * m3 div m2 div m2) * n_items * 1000) " +
            "div m2) END AS BIGINT)").as("skew_sq_milli_signed"),
          expr("CAST(CASE WHEN m2 > 0 THEN " +
            "(m4 * n_items * 1000) div (m2 * m2) END AS BIGINT)")
            .as("kurt_milli"))
        .orderBy(col("l_returnflag"))
    }),

    // Histogram mode detection (bimodality screen — a mean/stddev
    // summary silently averages two populations into a value neither
    // has): $5000-bucket counts of order totals, a bucket is a mode
    // iff strictly above both neighbors AND above max_count/20 (the
    // integer noise floor that keeps one-row wiggles out). One
    // two-phase hash agg compresses the fact to the bounded bucket
    // grid; the neighbor lags and the global max ride that ~27-row
    // frame. Emits the mode rows themselves (bucket, bounds, count).
    "diag_bimodality" -> ((s, dir) => {
      val hist = Tables(s, dir, "orders")
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT) " +
          "div 500000").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("bucket"))
      hist
        .withColumn("pn", coalesce(lag(col("n"), 1).over(w), lit(0L)))
        .withColumn("nn", coalesce(lead(col("n"), 1).over(w), lit(0L)))
        .withColumn("mx", max(col("n")).over(Window.partitionBy()))
        .filter(col("n") > col("pn") && col("n") > col("nn") &&
          col("n") * 20 >= col("mx"))
        .select(col("bucket"), (col("bucket") * 500000L).as("lo_cents"),
          col("n").as("n_orders"))
        .orderBy(col("bucket"))
    }),

    // Lorenz curve coordinates (the 10-point readout behind
    // agg_gini_wealth's single number): customers ranked by revenue
    // ascending, decile = (rank−1)·10 div n, each decile's customer
    // count, cents and cumulative share ppm — "the bottom 50 % hold
    // X % of revenue". SCALE PATH: ranks from the same TWO-PHASE
    // bucket rank as agg_gini_wealth ($10k-grid bucket + per-bucket
    // row_number + grid-histogram prefix sum), never a global
    // single-partition rank window; the cohort size crosses as the
    // standard broadcast 1-row scalar gate (BNL-allowlisted); the
    // cumulative window rides the 10-row decile frame.
    "agg_lorenz_points" -> ((s, dir) => {
      val rev = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val b = rev.withColumn("bucket", expr("cents div 1000000"))
      val hist = b.groupBy(col("bucket")).agg(count(lit(1)).as("bn"))
        .withColumn("cum_before",
          expr("coalesce(sum(bn) OVER (ORDER BY bucket " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"))
        .select(col("bucket"), col("cum_before"))
      val tot = rev.agg(count(lit(1)).as("n_total"),
        sum(col("cents")).as("cents_total"))
      val win = Window.partitionBy(col("bucket"))
        .orderBy(col("cents"), col("o_custkey"))
      b.withColumn("rk_in", row_number().over(win).cast("long"))
        .join(hist, "bucket")
        .withColumn("i", col("cum_before") + col("rk_in"))
        .crossJoin(broadcast(tot))
        .withColumn("decile", expr("((i - 1) * 10) div n_total"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("cents"),
          max(col("cents_total")).as("ct"))
        .withColumn("cum_cents", sum(col("cents")).over(
          Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("decile"), col("n_customers"), col("cents"),
          expr("CAST((CAST(cum_cents AS DECIMAL(38,0)) * 1000000) " +
            "div ct AS BIGINT)").as("cum_share_ppm"))
        .orderBy(col("decile"))
    }),

    // Herfindahl–Hirschman concentration index per brand (the
    // antitrust-standard market-power audit; rank-free complement of
    // agg_gini_wealth): HHI_ppm = Σ share_i² = Σ cents_i²·10⁶ div
    // (Σcents)² over each brand's supplier revenue — 10⁶ = monopoly,
    // 10⁶/n = perfect competition. Part dim broadcasts onto the fact
    // scan; two chained map-side-combined hash aggs (fact → supplier
    // cells → 25-brand rollup); squared cents in DECIMAL(38,0)/
    // HUGEINT.
    "agg_hhi" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            .as("cents"))
      val p = Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_suppkey"))
        .agg(sum(col("cents")).as("sc"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("sc")).as("total_cents"),
          expr("sum(CAST(sc AS DECIMAL(38,0)) * sc)").as("sq"))
        .select(col("p_brand"), col("n_suppliers"), col("total_cents"),
          expr("CAST((sq * 1000000) div " +
            "(CAST(total_cents AS DECIMAL(38,0)) * total_cents) " +
            "AS BIGINT)").as("hhi_ppm"))
        .orderBy(col("p_brand"))
    }),

    // Hill tail-index estimator of the order-total distribution in
    // floor-log2 bits (how heavy is the revenue tail — Pareto-like
    // data gives 1/α ≈ mean log-excess of the top order statistics):
    // top-256 totals via TakeOrderedAndProject (per-partition heap,
    // never a global sort), bits = base-2 string length (the integer
    // log2 idiom), 1/α in milli-bits = Σ(bits − min_bits)·1000 div
    // (k−1) over the ONE bounded 256-row frame.
    "agg_tail_hill" -> ((s, dir) => {
      val top = Tables(s, dir, "orders")
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)")
          .as("cents"), col("o_orderkey"))
        .orderBy(desc("cents"), asc("o_orderkey"))
        .limit(256)
        .withColumn("bits", length(expr("bin(cents)")).cast("long"))
      top.agg(count(lit(1)).as("k"),
          max(col("cents")).as("max_cents"),
          min(col("bits")).as("min_bits"),
          sum(col("bits")).as("sum_bits"))
        .select(col("k"), col("max_cents"),
          // k <= 1 has no excess statistics — declared NULL in both
          // engines rather than a div-by-zero artifact.
          expr("CASE WHEN k > 1 THEN " +
            "((sum_bits - k * min_bits) * 1000) div (k - 1) END")
            .as("hill_inv_alpha_milli_bits"))
    }),

    // Cohen's kappa between the LABELED document language and the
    // n-gram predictor's output (llm_lang_mismatch's confusion matrix
    // collapsed to the chance-corrected agreement scalar): po/pe in
    // exact integer ppm, kappa_milli = 1000·(po−pe) div (1e6−pe).
    // The marginal-product sum rides DECIMAL(38,0)/HUGEINT (na·nb ≤
    // n², past 2^63 at ~10^10 docs), and the possibly-negative
    // numerator rides the wide type where both engines truncate
    // toward zero. SCALE: the predictor is llm_lang_id's broadcast
    // profile join; everything after it is a ≤|langs|² cell frame.
    "agg_cohen_kappa" -> ((s, dir) => {
      val cm = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"))
        .join(TextOps.langPred(s, dir)
          .select(col("doc_id"), col("pred_lang")), "doc_id")
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("c"))
      val tot = cm.agg(sum(col("c")).as("n"),
        sum(when(col("lang") === col("pred_lang"), col("c"))
          .otherwise(0L)).as("agree"))
      val pe = cm.groupBy(col("lang")).agg(sum(col("c")).as("na"))
        .join(cm.groupBy(col("pred_lang")).agg(sum(col("c")).as("nb")),
          col("lang") === col("pred_lang"))
        .agg(sum(expr("CAST(na AS DECIMAL(38,0)) * nb")).as("pesum"))
      tot.crossJoin(broadcast(pe))
        .select(col("n").as("n_docs"),
          expr("CAST(CAST(agree AS DECIMAL(38,0)) * 1000000 div n " +
            "AS BIGINT)").as("po_ppm"),
          expr("CAST(pesum * 1000000 div " +
            "(CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)").as("pe_ppm"))
        .withColumn("kappa_milli",
          expr("CASE WHEN pe_ppm = 1000000 THEN NULL ELSE " +
            "CAST(CAST(po_ppm - pe_ppm AS DECIMAL(38,0)) * 1000 div " +
            "(1000000 - pe_ppm) AS BIGINT) END"))
    }),

    // Matthews correlation of a binary screen (is the order URGENT?)
    // against a fixed price-threshold predictor (cents > 25,000,000 —
    // a declared constant; data-derived cuts belong to
    // sample_curriculum's quartile machinery). MCC needs a square
    // root, which has no cross-engine-exact form on counts past 2^53
    // — so the registered statistic is the SIGNED SQUARED MCC in ppm:
    // sign(tp·tn−fp·fn)·(tp·tn−fp·fn)²·10⁶ div Π(margins), every term
    // exact under DECIMAL(38,0)/HUGEINT (num² ≤ n⁴/16 ≤ 10³⁰ at 10⁷
    // rows — inside both wide types). One map-side-combined global
    // agg; zero margin ⇒ NULL (declared).
    "agg_mcc" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select((col("o_orderpriority") === "1-URGENT").as("act"),
          (round(col("o_totalprice") * 100).cast("long") >
            lit(25000000L)).as("pred"))
        .agg(
          sum(when(col("act") && col("pred"), 1L).otherwise(0L))
            .as("tp"),
          sum(when(!col("act") && col("pred"), 1L).otherwise(0L))
            .as("fp"),
          sum(when(col("act") && !col("pred"), 1L).otherwise(0L))
            .as("fn"),
          sum(when(!col("act") && !col("pred"), 1L).otherwise(0L))
            .as("tn"))
        .withColumn("mcc2_ppm_signed", expr(
          "CASE WHEN (tp+fp) = 0 OR (tp+fn) = 0 OR (tn+fp) = 0 OR " +
            "(tn+fn) = 0 THEN NULL ELSE " +
            "CAST((CASE WHEN CAST(tp AS DECIMAL(38,0))*tn >= " +
            "CAST(fp AS DECIMAL(38,0))*fn THEN 1 ELSE -1 END) * " +
            "((CAST(tp AS DECIMAL(38,0))*tn - CAST(fp AS DECIMAL(38,0))*fn) * " +
            "(CAST(tp AS DECIMAL(38,0))*tn - CAST(fp AS DECIMAL(38,0))*fn) * 1000000) div " +
            "(CAST(tp+fp AS DECIMAL(38,0))*(tp+fn)*(tn+fp)*(tn+fn)) " +
            "AS BIGINT) END"))
    }),

    // Mutual information between event type and day-of-week, plus
    // Theil's uncertainty coefficient U(x|y)-style normalization — in
    // the DECLARED floor-log2 quantization (length(bin(v)) is
    // floor(log2)+1 in both engines; the +1s cancel in the LB(c·N) −
    // LB(cx·cy) difference, llm_surprisal's idiom). mi_scaled can be
    // negative under quantization — it rides the wide type. SCALE:
    // ONE hash agg to the ≤|types|·7 cell frame; every join after it
    // is on bounded margins.
    "agg_mutual_info" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_mi")
      s.sql(mutualInfoSql("DECIMAL(38,0)", "div",
        d => s"unix_date($d)", "events_mi"))
    }),

    // Wald–Wolfowitz runs test (is a user's value sequence random or
    // clustered around its median?): sign = cents > per-user
    // percentile_disc median (OBSERVED value ⇒ exact both engines;
    // at-median rows count as low, declared), runs counted by one
    // sign-change lag, compared to the expected run count
    // E = 1 + 2·n1·n0/(n1+n0) by cross-multiplication:
    // ratio_pm = 1000·runs·(n1+n0) div ((n1+n0) + 2·n1·n0) — under
    // 1000 ⇒ clustered (trendy/bot-like), over ⇒ oscillating. ONE
    // median agg joined back co-partitioned + ONE lag window + ONE
    // hash agg, all on the user_id exchange.
    "agg_runs_test" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val med = ev.groupBy(col("user_id"))
        .agg(expr("CAST(percentile_disc(0.5) WITHIN GROUP " +
          "(ORDER BY cents) AS BIGINT)").as("med_c"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      ev.join(med, Seq("user_id"))
        .withColumn("hi", (col("cents") > col("med_c")).cast("int"))
        .withColumn("brk",
          when(lag(col("hi"), 1).over(w).isNull ||
            lag(col("hi"), 1).over(w) =!= col("hi"), 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("hi").cast("long")).as("n_above"),
          sum(lit(1L) - col("hi")).as("n_low"),
          sum(col("brk")).as("n_runs"))
        .withColumn("ratio_pm",
          expr("CAST((1000 * n_runs * (n_above + n_low)) div " +
            "((n_above + n_low) + 2 * n_above * n_low) AS BIGINT)"))
        .orderBy(col("user_id"))
    })
  )

  /** Floor-log2 mutual-information SQL (wide-type, integer-div, and
    * epoch-days tokens per engine — the seasonStrengthSql
    * convention). */
  private[ops] def mutualInfoSql(wide: String, divOp: String,
      daysFn: String => String, table: String): String =
    s"""WITH e AS (
       |  SELECT event_type AS x,
       |    ${daysFn("CAST(ts AS DATE)")} % 7 AS y
       |  FROM $table),
       |cxy AS (
       |  SELECT x, y, CAST(count(*) AS BIGINT) AS c
       |  FROM e GROUP BY x, y),
       |cx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM cxy
       |       GROUP BY x),
       |cy AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cxy
       |       GROUP BY y),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cxy),
       |mi AS (
       |  SELECT CAST(sum(c * (CAST(length(bin(c * n)) AS BIGINT)
       |    - CAST(length(bin(cx * cy)) AS BIGINT))) AS $wide)
       |    AS mi_scaled
       |  FROM cxy JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN tot),
       |hx AS (
       |  SELECT CAST(n AS $wide) * length(bin(n))
       |    - sum(CAST(cx AS $wide) * length(bin(cx))) AS hx_scaled
       |  FROM cx CROSS JOIN tot GROUP BY n)
       |SELECT n,
       |  CAST((mi_scaled * 1000) $divOp n AS BIGINT) AS mi_mb,
       |  CAST((hx_scaled * 1000) $divOp n AS BIGINT) AS hx_mb,
       |  CAST(CASE WHEN hx_scaled > 0 THEN
       |    (mi_scaled * 1000) $divOp hx_scaled END AS BIGINT)
       |    AS theil_u_milli
       |FROM mi CROSS JOIN hx CROSS JOIN tot""".stripMargin

  def oracle: Map[String, String] = Map(
    "agg_chi2_assoc" ->
      """WITH cell AS (
        |  SELECT event_type,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
        |      AS wd,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, wd, CAST(n AS BIGINT) AS n,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n_type,
        |    CAST(sum(n) OVER (PARTITION BY wd) AS BIGINT) AS n_wd,
        |    CAST(sum(n) OVER () AS BIGINT) AS n_tot
        |  FROM cell),
        |x AS (
        |  SELECT event_type, wd, n,
        |    CAST((CAST(n_type AS HUGEINT) * n_wd) // n_tot AS BIGINT)
        |      AS expected
        |  FROM m)
        |SELECT event_type, wd, n, expected,
        |  CAST((CAST(n - expected AS HUGEINT) * (n - expected) * 1000)
        |    // greatest(expected, 1) AS BIGINT) AS chi2_term_milli
        |FROM x ORDER BY event_type, wd""".stripMargin,

    "agg_cramers_v" ->
      """WITH cell AS (
        |  SELECT o_orderstatus AS st, o_orderpriority AS pri,
        |    count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT st, pri, CAST(n AS BIGINT) AS n,
        |    CAST(sum(n) OVER (PARTITION BY st) AS BIGINT) AS n_row,
        |    CAST(sum(n) OVER (PARTITION BY pri) AS BIGINT) AS n_col,
        |    CAST(sum(n) OVER () AS BIGINT) AS n_tot
        |  FROM cell),
        |x AS (
        |  SELECT st, pri, n, n_tot,
        |    CAST((CAST(n_row AS HUGEINT) * n_col) // n_tot AS HUGEINT)
        |      AS e
        |  FROM m),
        |t AS (
        |  SELECT max(n_tot) AS n_rows,
        |    count(DISTINCT st) AS n_r,
        |    count(DISTINCT pri) AS n_c,
        |    sum((CAST(n - e AS HUGEINT) * (n - e) * 1000000)
        |      // greatest(e, 1)) AS chi2_micro
        |  FROM x)
        |SELECT CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_r AS BIGINT) AS n_r, CAST(n_c AS BIGINT) AS n_c,
        |  CAST(chi2_micro AS BIGINT) AS chi2_micro,
        |  CAST(CAST(chi2_micro AS HUGEINT) // (CAST(n_rows AS HUGEINT)
        |    * nullif(least(n_r - 1, n_c - 1), 0)) AS BIGINT) AS v2_ppm
        |FROM t""".stripMargin,

    "agg_corr_pairs" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS x,
        |    count(*) AS y,
        |    CAST(datediff('day', CAST(min(ts) AS DATE),
        |      CAST(max(ts) AS DATE)) + 1 AS BIGINT) AS z
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx,
        |    CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(z) AS HUGEINT) AS sz,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(z AS HUGEINT) * z) AS szz,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * z) AS sxz,
        |    sum(CAST(y AS HUGEINT) * z) AS syz
        |  FROM per),
        |m AS (
        |  SELECT n * sxx - sx * sx AS mxx, n * syy - sy * sy AS myy,
        |    n * szz - sz * sz AS mzz, n * sxy - sx * sy AS mxy,
        |    n * sxz - sx * sz AS mxz, n * syz - sy * sz AS myz
        |  FROM g)
        |SELECT pair, r2_permille, cov_sign FROM (
        |  SELECT 'xy' AS pair,
        |    CASE WHEN mxx > 0 AND myy > 0 THEN
        |      CAST((mxy * mxy * 1000) // (mxx * myy) AS BIGINT) END
        |      AS r2_permille,
        |    CAST(CASE WHEN mxy > 0 THEN 1 WHEN mxy < 0 THEN -1
        |      ELSE 0 END AS BIGINT) AS cov_sign
        |  FROM m
        |  UNION ALL
        |  SELECT 'xz',
        |    CASE WHEN mxx > 0 AND mzz > 0 THEN
        |      CAST((mxz * mxz * 1000) // (mxx * mzz) AS BIGINT) END,
        |    CAST(CASE WHEN mxz > 0 THEN 1 WHEN mxz < 0 THEN -1
        |      ELSE 0 END AS BIGINT)
        |  FROM m
        |  UNION ALL
        |  SELECT 'yz',
        |    CASE WHEN myy > 0 AND mzz > 0 THEN
        |      CAST((myz * myz * 1000) // (myy * mzz) AS BIGINT) END,
        |    CAST(CASE WHEN myz > 0 THEN 1 WHEN myz < 0 THEN -1
        |      ELSE 0 END AS BIGINT)
        |  FROM m) t
        |ORDER BY pair""".stripMargin,

    "agg_regression_multi" ->
      """WITH per AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_id % 2 = 0
        |        THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS x,
        |    count(*) AS y,
        |    sum(CASE WHEN event_id % 2 <> 0
        |        THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS z
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx,
        |    CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(z) AS HUGEINT) AS sz,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * z) AS sxz,
        |    sum(CAST(y AS HUGEINT) * z) AS syz
        |  FROM per),
        |m AS (
        |  SELECT n,
        |    n * sxx - sx * sx AS mxx, n * syy - sy * sy AS myy,
        |    n * sxy - sx * sy AS mxy, n * sxz - sx * sz AS mxz,
        |    n * syz - sy * sz AS myz
        |  FROM g),
        |d AS (SELECT *, mxx * myy - mxy * mxy AS det FROM m)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CASE WHEN det <> 0 THEN
        |    CAST((myy * mxz - mxy * myz) * 1000 // det AS BIGINT) END
        |    AS beta1_milli,
        |  CASE WHEN det <> 0 THEN
        |    CAST((mxx * myz - mxy * mxz) * 1000 // det AS BIGINT) END
        |    AS beta2_milli
        |FROM d""".stripMargin,

    "agg_skew_kurt" ->
      """WITH li AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem),
        |anch AS (
        |  SELECT l_returnflag, sum(q) // count(*) AS a
        |  FROM li GROUP BY l_returnflag),
        |m AS (
        |  SELECT li.l_returnflag, count(*) AS n_items, max(a) AS anchor_qty,
        |    sum(CAST((q - a) * (q - a) AS HUGEINT)) AS m2,
        |    sum(CAST((q - a) * (q - a) * (q - a) AS HUGEINT)) AS m3,
        |    sum(CAST((q - a) * (q - a) * (q - a) * (q - a) AS HUGEINT))
        |      AS m4
        |  FROM li JOIN anch ON li.l_returnflag = anch.l_returnflag
        |  GROUP BY li.l_returnflag)
        |SELECT l_returnflag, n_items, CAST(anchor_qty AS BIGINT)
        |    AS anchor_qty,
        |  CAST(m2 AS BIGINT) AS m2, CAST(m3 AS BIGINT) AS m3,
        |  CAST(CASE WHEN m2 > 0 THEN
        |    (CASE WHEN m3 < 0 THEN -1 ELSE 1 END)
        |      * (((m3 * m3 // m2 // m2) * n_items * 1000) // m2)
        |  END AS BIGINT) AS skew_sq_milli_signed,
        |  CAST(CASE WHEN m2 > 0 THEN
        |    (m4 * n_items * 1000) // (m2 * m2) END AS BIGINT)
        |    AS kurt_milli
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "diag_bimodality" ->
      """WITH h AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 500000
        |    AS bucket, count(*) AS n
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT bucket, n,
        |    coalesce(lag(n, 1) OVER (ORDER BY bucket), 0) AS pn,
        |    coalesce(lead(n, 1) OVER (ORDER BY bucket), 0) AS nn,
        |    max(n) OVER () AS mx
        |  FROM h)
        |SELECT bucket, bucket * 500000 AS lo_cents,
        |  n AS n_orders
        |FROM w
        |WHERE n > pn AND n > nn AND n * 20 >= mx
        |ORDER BY bucket""".stripMargin,

    "agg_lorenz_points" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |t AS (SELECT count(*) AS n_total,
        |        CAST(sum(cents) AS HUGEINT) AS cents_total FROM rev),
        |r AS (
        |  SELECT cents,
        |    row_number() OVER (ORDER BY cents, o_custkey) AS i
        |  FROM rev),
        |d AS (
        |  SELECT ((i - 1) * 10) // n_total AS decile, cents
        |  FROM r, t),
        |g AS (
        |  SELECT decile, count(*) AS n_customers,
        |    CAST(sum(cents) AS BIGINT) AS cents
        |  FROM d GROUP BY decile),
        |c AS (
        |  SELECT *, sum(cents) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS cum_cents
        |  FROM g)
        |SELECT CAST(decile AS BIGINT) AS decile, n_customers, cents,
        |  CAST((CAST(cum_cents AS HUGEINT) * 1000000) // cents_total
        |    AS BIGINT) AS cum_share_ppm
        |FROM c, t ORDER BY decile""".stripMargin,

    "agg_hhi" ->
      """WITH j AS (
        |  SELECT p.p_brand, l.l_suppkey,
        |    CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
        |      AS HUGEINT) AS sc
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2)
        |SELECT p_brand, count(*) AS n_suppliers,
        |  CAST(sum(sc) AS BIGINT) AS total_cents,
        |  CAST((sum(sc * sc) * 1000000) // (sum(sc) * sum(sc))
        |    AS BIGINT) AS hhi_ppm
        |FROM j GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "agg_tail_hill" ->
      """WITH top AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(length(bin(CAST(round(o_totalprice * 100) AS BIGINT)))
        |      AS BIGINT) AS bits
        |  FROM orders
        |  ORDER BY cents DESC, o_orderkey ASC LIMIT 256)
        |SELECT count(*) AS k, max(cents) AS max_cents,
        |  CAST(CASE WHEN count(*) > 1 THEN
        |    ((sum(bits) - count(*) * min(bits)) * 1000)
        |      // (count(*) - 1) END AS BIGINT)
        |    AS hill_inv_alpha_milli_bits
        |FROM top""".stripMargin,
    "ts_theilsen" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (
        |  SELECT a.user_id,
        |    ((b.cents - a.cents) * 1000) // (b.event_id - a.event_id)
        |      AS slope_milli
        |  FROM c a JOIN c b
        |    ON a.user_id = b.user_id AND a.event_id < b.event_id)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(quantile_disc(slope_milli, 0.5) AS BIGINT)
        |    AS theil_slope_milli
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_kendall" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (
        |  SELECT a.user_id, a.cents AS y1, b.cents AS y2
        |  FROM c a JOIN c b
        |    ON a.user_id = b.user_id AND a.event_id < b.event_id),
        |g AS (
        |  SELECT user_id, count(*) AS n_pairs,
        |    sum(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) AS conc,
        |    sum(CASE WHEN y2 < y1 THEN 1 ELSE 0 END) AS disc
        |  FROM p GROUP BY user_id)
        |SELECT user_id, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(conc AS BIGINT) AS conc, CAST(disc AS BIGINT) AS disc,
        |  CAST(((conc - disc) * 1000) // n_pairs AS BIGINT) AS tau_milli
        |FROM g ORDER BY user_id""".stripMargin,

    "win_rolling_median" ->
      """SELECT user_id, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5)
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS med11
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "llm_bigram_lm" ->
      """WITH lt AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bg AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM lt, unnest(range(1, len(toks))) AS u(i)
        |  WHERE toks[i] <> '' AND toks[i + 1] <> ''),
        |c2 AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1)
        |SELECT c2.w1, c2.w2, CAST(n AS BIGINT) AS n,
        |  CAST(n1 AS BIGINT) AS n1,
        |  CAST((CAST(n AS HUGEINT) * 1000000) // n1 AS BIGINT) AS p_ppm
        |FROM c2 JOIN c1 USING (w1)
        |ORDER BY n DESC, w1, w2 LIMIT 20""".stripMargin,

    "llm_keyword_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |t2 AS (SELECT doc_id, w FROM tok WHERE w <> ''),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM t2
        |       GROUP BY doc_id, w),
        |dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        |sc AS (
        |  SELECT tf.doc_id, tf.w, tf.tf, dfq.df,
        |    CAST((CAST(tf.tf AS HUGEINT) * 1000000) // dfq.df AS BIGINT)
        |      AS score
        |  FROM tf JOIN dfq USING (w)),
        |r AS (
        |  SELECT doc_id, w, tf, df, score,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY score DESC, w) AS rnk
        |  FROM sc)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, w,
        |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
        |FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,

    "llm_ttr_chunk" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, (pos - 1) // 50 AS chunk,
        |    count(*) AS n_tok, count(DISTINCT w) AS n_distinct
        |  FROM t GROUP BY doc_id, chunk),
        |cr AS (
        |  SELECT doc_id, chunk,
        |    (n_distinct * 1000) // n_tok AS ttr_pm
        |  FROM ch)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(min(ttr_pm) AS BIGINT) AS min_ttr_pm,
        |  CAST(sum(ttr_pm) // count(*) AS BIGINT) AS mean_ttr_pm
        |FROM cr GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "llm_ann_pq_adc" ->
      """WITH u AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
        |      AS xu
        |  FROM embeddings),
        |e AS (
        |  SELECT vec_id,
        |    generate_subscripts(xu, 1) - 1 AS i,
        |    unnest(xu) AS v
        |  FROM u),
        |sv AS (
        |  SELECT vec_id, i // 8 AS j, sum(v) AS s
        |  FROM e GROUP BY vec_id, i // 8),
        |dg AS (
        |  SELECT vec_id, j,
        |    least(greatest((s // 8 + 1000000) // 250000, 0), 7) AS d
        |  FROM sv),
        |pe AS (
        |  SELECT generate_subscripts(xu, 1) - 1 AS i, unnest(xu) AS v
        |  FROM u WHERE vec_id = 0),
        |dist AS (
        |  SELECT g.vec_id,
        |    CAST(sum(abs(pe.v - (g.d * 250000 - 875000))) AS BIGINT)
        |      AS dist_u
        |  FROM dg g JOIN pe ON pe.i // 8 = g.j
        |  WHERE g.vec_id <> 0
        |  GROUP BY g.vec_id),
        |top AS (
        |  SELECT * FROM dist ORDER BY dist_u, vec_id LIMIT 10)
        |SELECT CAST(row_number() OVER (ORDER BY dist_u, vec_id) AS INT)
        |    AS rank, vec_id, dist_u
        |FROM top ORDER BY rank""".stripMargin,

    "llm_vec_pq" ->
      """WITH u AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
        |      AS xu
        |  FROM embeddings),
        |e AS (
        |  SELECT vec_id,
        |    generate_subscripts(xu, 1) - 1 AS i,
        |    unnest(xu) AS v
        |  FROM u),
        |sv AS (
        |  SELECT vec_id, i // 8 AS j, sum(v) AS s
        |  FROM e GROUP BY vec_id, i // 8),
        |dg AS (
        |  SELECT vec_id, j,
        |    least(greatest((s // 8 + 1000000) // 250000, 0), 7) AS d
        |  FROM sv),
        |pc AS (
        |  SELECT vec_id,
        |    sum(d * CAST(power(8, 7 - j) AS BIGINT)) AS code
        |  FROM dg GROUP BY vec_id),
        |er AS (
        |  SELECT e.vec_id,
        |    sum(abs(e.v - (dg.d * 250000 - 875000))) AS err
        |  FROM e JOIN dg ON e.vec_id = dg.vec_id AND e.i // 8 = dg.j
        |  GROUP BY e.vec_id)
        |SELECT pc.vec_id, CAST(code AS BIGINT) AS pq_code,
        |  CAST(err AS BIGINT) AS recon_err_u
        |FROM pc JOIN er ON pc.vec_id = er.vec_id
        |ORDER BY pc.vec_id""".stripMargin,

    "win_skyline" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS rev_c
        |  FROM orders GROUP BY o_custkey),
        |c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer),
        |j AS (
        |  SELECT c_nationkey, c_custkey, rev_c, bal_c,
        |    max(bal_c) OVER (PARTITION BY c_nationkey
        |      ORDER BY rev_c DESC, bal_c DESC, c_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS max_prev_bal
        |  FROM c JOIN rev ON c_custkey = o_custkey)
        |SELECT c_nationkey, c_custkey, rev_c, bal_c
        |FROM j WHERE max_prev_bal IS NULL OR bal_c > max_prev_bal
        |ORDER BY c_nationkey, c_custkey""".stripMargin,

    "win_rolling_mad" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id, cents,
        |    list(cents) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS win
        |  FROM c),
        |m AS (
        |  SELECT user_id, event_id, cents, win,
        |    CAST(list_sort(win)[(len(win) + 1) // 2] AS BIGINT) AS med11
        |  FROM w),
        |m2 AS (
        |  SELECT user_id, event_id, cents, med11,
        |    CAST(list_sort(list_transform(win, v -> abs(v - med11)))
        |      [(len(win) + 1) // 2] AS BIGINT) AS mad11
        |  FROM m)
        |SELECT user_id, event_id, cents, med11, mad11,
        |  abs(cents - med11) > 6 * mad11 AS is_outlier
        |FROM m2 ORDER BY user_id, event_id""".stripMargin,

    "agg_hist_log2" ->
      """WITH c AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |b AS (
        |  SELECT cents,
        |    CAST(length(to_base(cents, 2)) AS BIGINT) AS bits
        |  FROM c),
        |g AS (
        |  SELECT bits, count(*) AS n, min(cents) AS min_cents,
        |    max(cents) AS max_cents
        |  FROM b GROUP BY bits)
        |SELECT bits, CAST(power(2, bits - 1) AS BIGINT) AS lo,
        |  CAST(power(2, bits) AS BIGINT) - 1 AS hi,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(min_cents AS BIGINT) AS min_cents,
        |  CAST(max_cents AS BIGINT) AS max_cents
        |FROM g ORDER BY bits""".stripMargin,

    "llm_distinctive_terms" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |t2 AS (SELECT source, w FROM tok WHERE w <> ''),
        |tf AS (SELECT source, w, count(*) AS tf_s FROM t2
        |       GROUP BY source, w),
        |st AS (
        |  SELECT source, sum(tf_s) AS total_s,
        |    sum(sum(tf_s)) OVER () AS total_c
        |  FROM tf GROUP BY source),
        |ct AS (SELECT w, sum(tf_s) AS tf_c FROM tf GROUP BY w),
        |sc AS (
        |  SELECT tf.source, tf.w, tf.tf_s,
        |    CAST((CAST(tf.tf_s AS HUGEINT) * st.total_c * 1000000) //
        |      (CAST(st.total_s AS HUGEINT) * ct.tf_c) AS BIGINT)
        |      AS lift_ppm
        |  FROM tf JOIN st USING (source) JOIN ct USING (w)
        |  WHERE tf.tf_s >= 5),
        |r AS (
        |  SELECT source, w, tf_s, lift_ppm,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY lift_ppm DESC, w) AS rnk
        |  FROM sc)
        |SELECT source, CAST(rnk AS BIGINT) AS rnk, w,
        |  CAST(tf_s AS BIGINT) AS tf_s, lift_ppm
        |FROM r WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin,

    "agg_benford" ->
      """WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
        |w AS (
        |  SELECT digit, n,
        |    CAST((CAST(n AS HUGEINT) * 1000000) // sum(n) OVER ()
        |      AS BIGINT) AS share_ppm
        |  FROM g),
        |b AS (
        |  SELECT digit, n, share_ppm,
        |    CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
        |      WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |      WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
        |      WHEN 9 THEN 45757 END AS BIGINT) AS benford_ppm
        |  FROM w)
        |SELECT digit, CAST(n AS BIGINT) AS n, share_ppm, benford_ppm,
        |  abs(share_ppm - benford_ppm) AS dev_ppm
        |FROM b ORDER BY digit""".stripMargin,

    "composite_transitions" ->
      """WITH p AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY event_id) AS from_type
        |  FROM events),
        |p2 AS (SELECT from_type, event_type AS to_type FROM p
        |       WHERE from_type IS NOT NULL),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p2
        |      GROUP BY 1, 2),
        |t AS (SELECT from_type, count(*) AS n_from FROM p2 GROUP BY 1)
        |SELECT c.from_type, c.to_type, CAST(n AS BIGINT) AS n,
        |  CAST(n_from AS BIGINT) AS n_from,
        |  CAST((CAST(n AS HUGEINT) * 1000000) // n_from AS BIGINT)
        |    AS p_ppm
        |FROM c JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    "win_rolling_slope" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, cents,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS x
        |  FROM c),
        |s AS (
        |  SELECT user_id, event_id, cents,
        |    count(*) OVER wf AS k,
        |    sum(x) OVER wf AS sx,
        |    sum(cents) OVER wf AS sy,
        |    sum(CAST(x AS HUGEINT) * cents) OVER wf AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) OVER wf AS sxx
        |  FROM r
        |  WINDOW wf AS (PARTITION BY user_id ORDER BY event_id
        |                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, cents,
        |  CAST(CASE WHEN k * sxx - CAST(sx AS HUGEINT) * sx <> 0
        |    THEN ((k * sxy - CAST(sx AS HUGEINT) * sy) * 1000)
        |         // (k * sxx - CAST(sx AS HUGEINT) * sx)
        |    END AS BIGINT) AS slope_milli
        |FROM s ORDER BY user_id, event_id""".stripMargin,

    "llm_char_freq" ->
      """WITH ch AS (
        |  SELECT lang, unnest(regexp_extract_all(text, '.')) AS ch
        |  FROM documents),
        |ch2 AS (SELECT lang, ch FROM ch WHERE ch <> ' '),
        |c2 AS (SELECT lang, ch, count(*) AS n FROM ch2
        |       GROUP BY lang, ch),
        |tot AS (SELECT lang, count(*) AS tot FROM ch2 GROUP BY lang),
        |r AS (
        |  SELECT c2.lang, c2.ch, c2.n, tot.tot,
        |    CAST((CAST(n AS HUGEINT) * 1000000) // tot AS BIGINT)
        |      AS share_ppm,
        |    row_number() OVER (PARTITION BY c2.lang
        |                       ORDER BY n DESC, ch) AS rnk
        |  FROM c2 JOIN tot USING (lang))
        |SELECT lang, CAST(rnk AS BIGINT) AS rnk, ch,
        |  CAST(n AS BIGINT) AS n, share_ppm
        |FROM r WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,

    "agg_gini_wealth" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY o_custkey),
        |rk AS (
        |  SELECT cents,
        |    row_number() OVER (ORDER BY cents, o_custkey) AS i
        |  FROM rev)
        |SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST(((2 * sum(CAST(i AS HUGEINT) * cents)
        |         - CAST(count(*) + 1 AS HUGEINT) * sum(cents)) * 1000)
        |       // (CAST(count(*) AS HUGEINT) * sum(cents)) AS BIGINT)
        |    AS gini_permille
        |FROM rk""".stripMargin,

    "agg_cohen_kappa" ->
      """WITH t AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |t2 AS (SELECT * FROM t WHERE w <> ''),
        |profile AS (
        |  SELECT lang AS cand_lang, w AS pw FROM (
        |    SELECT lang, w, row_number() OVER (PARTITION BY lang
        |      ORDER BY count(*) DESC, w ASC) AS rn
        |    FROM t2 GROUP BY lang, w)
        |  WHERE rn <= 5),
        |hits AS (
        |  SELECT doc_id, cand_lang, count(*) AS hits
        |  FROM t2 JOIN profile ON w = pw
        |  GROUP BY doc_id, cand_lang),
        |pred AS (
        |  SELECT doc_id, cand_lang AS pred_lang FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY hits DESC, cand_lang ASC) AS rn FROM hits)
        |  WHERE rn = 1),
        |cm AS (
        |  SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents d JOIN pred p USING (doc_id)
        |  GROUP BY d.lang, p.pred_lang),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN lang = pred_lang THEN c ELSE 0 END)
        |    AS BIGINT) AS agree FROM cm),
        |pe AS (SELECT CAST(sum(CAST(na AS HUGEINT) * nb) AS HUGEINT)
        |    AS pesum
        |  FROM (SELECT lang AS k, CAST(sum(c) AS BIGINT) AS na
        |        FROM cm GROUP BY lang) a
        |  JOIN (SELECT pred_lang AS k, CAST(sum(c) AS BIGINT) AS nb
        |        FROM cm GROUP BY pred_lang) b USING (k)),
        |f AS (SELECT n,
        |  CAST(CAST(agree AS HUGEINT) * 1000000 // n AS BIGINT)
        |    AS po_ppm,
        |  CAST(pesum * 1000000 // (CAST(n AS HUGEINT) * n) AS BIGINT)
        |    AS pe_ppm
        |  FROM tot CROSS JOIN pe)
        |SELECT n AS n_docs, po_ppm, pe_ppm,
        |  CAST(CASE WHEN pe_ppm = 1000000 THEN NULL ELSE
        |    CAST(po_ppm - pe_ppm AS HUGEINT) * 1000 //
        |      (1000000 - pe_ppm) END AS BIGINT) AS kappa_milli
        |FROM f""".stripMargin,

    "agg_mcc" ->
      """WITH b AS (
        |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1
        |      ELSE 0 END AS act,
        |    CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
        |      > 25000000 THEN 1 ELSE 0 END AS pred
        |  FROM orders),
        |m AS (SELECT
        |  CAST(sum(act * pred) AS BIGINT) AS tp,
        |  CAST(sum((1 - act) * pred) AS BIGINT) AS fp,
        |  CAST(sum(act * (1 - pred)) AS BIGINT) AS fn,
        |  CAST(sum((1 - act) * (1 - pred)) AS BIGINT) AS tn
        |  FROM b)
        |SELECT tp, fp, fn, tn,
        |  CASE WHEN (tp+fp) = 0 OR (tp+fn) = 0 OR (tn+fp) = 0 OR
        |      (tn+fn) = 0 THEN NULL ELSE
        |    CAST((CASE WHEN CAST(tp AS HUGEINT)*tn >=
        |        CAST(fp AS HUGEINT)*fn THEN 1 ELSE -1 END) *
        |      ((CAST(tp AS HUGEINT)*tn - CAST(fp AS HUGEINT)*fn) *
        |       (CAST(tp AS HUGEINT)*tn - CAST(fp AS HUGEINT)*fn)
        |       * 1000000) //
        |      (CAST(tp+fp AS HUGEINT)*(tp+fn)*(tn+fp)*(tn+fn))
        |      AS BIGINT) END AS mcc2_ppm_signed
        |FROM m""".stripMargin,

    "agg_mutual_info" -> mutualInfoSql("HUGEINT", "//",
      d => s"datediff('day', DATE '1970-01-01', $d)", "events"),

    "agg_runs_test" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |m AS (
        |  SELECT user_id,
        |    CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med_c
        |  FROM e GROUP BY user_id),
        |s AS (
        |  SELECT e.user_id, e.event_id,
        |    CASE WHEN e.cents > m.med_c THEN 1 ELSE 0 END AS hi
        |  FROM e JOIN m USING (user_id)),
        |r AS (
        |  SELECT user_id, hi,
        |    CASE WHEN lag(hi, 1) OVER w IS NULL
        |      OR lag(hi, 1) OVER w <> hi THEN 1 ELSE 0 END AS brk
        |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |g AS (
        |  SELECT user_id, CAST(sum(hi) AS BIGINT) AS n_above,
        |    CAST(sum(1 - hi) AS BIGINT) AS n_low,
        |    CAST(sum(brk) AS BIGINT) AS n_runs
        |  FROM r GROUP BY user_id)
        |SELECT user_id, n_above, n_low, n_runs,
        |  CAST((1000 * n_runs * (n_above + n_low)) //
        |    ((n_above + n_low) + 2 * n_above * n_low) AS BIGINT)
        |    AS ratio_pm
        |FROM g ORDER BY user_id""".stripMargin
  )
}
