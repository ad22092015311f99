package graft.ops

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Sketch aggregates (SURVEY.md §2.2 "Sketches"): Bloom filter and
  * Count-Min Sketch over the driver testdata, the two probabilistic
  * summaries a 100 TB pipeline leans on when exact state is too big.
  *
  * Scale shape: both sketches build in ONE distributed pass
  * (`DataFrameStatFunctions` runs a treeAggregate — per-partition
  * sketches merged pairwise; bloom merge is bitwise OR, CMS merge is
  * elementwise addition, both commutative and associative, so the
  * result is independent of partition order and count: deterministic
  * run to run). The finished sketch is KBs on the driver regardless of
  * input size, and the probe side never shuffles: the Bloom probe is
  * the same codegen'd [[BloomFilterMightContain]] expression Spark's
  * runtime filter injection uses (the sketch rides into executors as a
  * literal), evaluated row-local inside WholeStageCodegen.
  *
  * Both queries are approximate-by-design ⇒ no DuckDB oracle (rule ③,
  * same as `agg_approx_distinct`): rows-only driver check, sketch
  * properties pinned by SketchSpec (bloom: zero false negatives, FP
  * rate within fpp; CMS: never underestimates, overshoot ≤ eps·N).
  * Their row-level OUTPUT is still deterministic: fixed sketch
  * parameters + fixed seed + order-independent merges.
  */
object SketchOps extends OpPack {

  /** Codegen'd Bloom-filter membership probe: the driver-built sketch
    * is embedded as a binary literal (Spark's own runtime-filter wire
    * format), so executors evaluate membership without any lookup
    * table join. */
  /** `df.stat.bloomFilter` NPEs on an EMPTY frame (null aggregation
    * buffer inside Spark); an empty build side means an empty filter
    * — nothing can match, which is exactly what a fresh bloom says. */
  private def bloomOf(df: org.apache.spark.sql.DataFrame, colName: String,
      expectedNumItems: Long, fpp: Double): BloomFilter =
    if (df.isEmpty) BloomFilter.create(expectedNumItems, fpp)
    else df.stat.bloomFilter(colName, expectedNumItems, fpp)

  private def mightContain(bf: BloomFilter, value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    GraftExpressionBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      GraftExpressionBridge.expression(value.cast("long"))))
  }

  /** Shared body of `agg_sketch_theta` / `agg_sketch_theta_cap`:
    * one theta sketch per day (capacity 2^lgK), then day-over-day
    * retention by sketch INTERSECTION on the driver over the ~30
    * collected sketches — the fact table is scanned ONCE regardless
    * of how many segment pairs are probed. */
  private def thetaRetention(s: org.apache.spark.sql.SparkSession,
      dir: String, lgK: Int): org.apache.spark.sql.DataFrame = {
    val daily = Tables(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(graft.functions.ThetaSketch.agg(col("user_id"), lgK).as("sk"))
      .orderBy(col("day"))
      .collect()
    val rows = daily.indices.map { i =>
      val day = daily(i).getAs[java.sql.Date]("day")
      val sk = daily(i).getAs[Array[Byte]]("sk")
      val retained =
        if (i + 1 < daily.length &&
            daily(i + 1).getAs[java.sql.Date]("day").toLocalDate ==
              day.toLocalDate.plusDays(1))
          graft.functions.ThetaSketch.intersect(sk,
            daily(i + 1).getAs[Array[Byte]]("sk"))
        else 0L
      (day, graft.functions.ThetaSketch.estimate(sk), retained)
    }
    s.createDataFrame(rows).toDF("day", "n_active", "n_retained")
      .orderBy(col("day"))
  }

  def queries: Map[String, Q] = Map(
    // Bloom semi-join pre-filter, the classic use: summarize the keys
    // on one side of a join (customers that placed orders) in a few
    // KB, probe the other side without shuffling it. Output compares
    // the sketch's answer against the exact semi-join per segment, so
    // the false-positive behavior is visible (and deterministic).
    "agg_sketch_bloom" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val bf = bloomOf(orders, "o_custkey",
        expectedNumItems = 20000L, fpp = 0.03)
      val withOrders = orders
        .select(col("o_custkey").as("c_custkey")).distinct()
      Tables(s, dir, "customer")
        .join(withOrders.withColumn("has_orders", lit(1)),
          Seq("c_custkey"), "left_outer")
        .withColumn("probe", mightContain(bf, col("c_custkey")))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(when(col("probe"), 1L).otherwise(0L)).as("n_probe_pass"),
          sum(when(col("has_orders") === 1, 1L).otherwise(0L))
            .as("n_with_orders"),
          sum(when(col("probe") && col("has_orders").isNull, 1L)
            .otherwise(0L)).as("n_false_positive"))
        .orderBy(col("c_mktsegment"))
    }),

    // Theta sketches add what HLL cannot: set INTERSECTION between
    // segment summaries. One KB-sized sketch per day of active users
    // (native TypedImperativeAggregate, map-side combined), then
    // day-over-day retention = |sketch(d) ∩ sketch(d+1)| computed on
    // the driver over the ~30 collected sketches — the fact table is
    // scanned ONCE regardless of how many segment pairs are probed.
    // Below the sketch's 4096-hash capacity (both test scales: ≤1500
    // distinct users) theta is EXACT, so this query carries a real
    // DuckDB oracle; above capacity the declared semantics degrade to
    // an estimate (the 100 TB trade this sketch exists for).
    "agg_sketch_theta" -> ((s, dir) => thetaRetention(s, dir, lgK = 12)),

    // The CAPACITY CONTRACT made a query (VERDICT r10 task 7): the
    // same daily-active/retention program with the sketch's nominal
    // capacity sized to the segment (lgK=15 → 32,768 retained
    // hashes), so exactness holds through sf1's ~13,400 distinct
    // actives/day where the default 4,096-hash sketch has degraded —
    // by declared theta semantics — to a ±2% estimate. The pair
    // documents the production knob: size lgK to the largest segment
    // the exactness contract must cover; pay 8x the (still KB-scale)
    // sketch bytes for it. Oracle = the same exact SQL — this variant
    // hash-matches it at EVERY test scale including sf1.
    "agg_sketch_theta_cap" -> ((s, dir) =>
      thetaRetention(s, dir, lgK = 15)),

    // The sketch composed into an EXACT operator — the production use
    // of agg_sketch_bloom's machinery: summarize the filtered build
    // side's join keys in a few KB, drop probe-side rows at the SCAN
    // stage (before the join shuffle) via the codegen'd might_contain
    // literal, then run the normal join, which eliminates the sketch's
    // false positives. Output is bit-identical to the plain join — the
    // oracle is the plain join — but at 100 TB the shuffle carries
    // only ~|match| + fpp·|orders| rows instead of every order.
    // (Spark's runtime bloom-filter injection does this automatically
    // for qualifying shapes — PlanShapeSpec:176 pins that path; this
    // query is the explicit, always-on form with the sketch built
    // where the pipeline author chooses.)
    "join_bloom_prefilter" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val bf = bloomOf(cust, "c_custkey",
        expectedNumItems = 20000L, fpp = 0.03)
      Tables(s, dir, "orders")
        .filter(mightContain(bf, col("o_custkey")))
        .join(cust.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Tables.moneySum(col("o_totalprice")).as("total_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // Mergeable sketch COLUMNS — the pre-aggregation pattern that
    // makes 100 TB dashboards possible: materialize a small HLL
    // sketch per (event_type, day) segment once, then answer distinct
    // counts over ANY segment combination by unioning sketches (KBs)
    // instead of rescanning events. HLL register state is a pure
    // elementwise max ⇒ insertion- and merge-order insensitive, so
    // the union of daily partials has exactly the same registers as a
    // direct whole-column sketch (SketchSpec pins estimate equality
    // and the error vs exact distinct). Built-in datasketches
    // functions — hll_sketch_agg / hll_union_agg — both two-phase
    // hash aggregates with map-side partials.
    "agg_sketch_hll" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val daily = e.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = daily.groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("est_users"), count(lit(1)).as("n_partials"))
      val exact = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      merged.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_partials"), col("est_users"),
          col("exact_users"))
        .orderBy(col("event_type"))
    }),

    // Mergeable KLL quantile sketch columns — percentiles of a 100 TB
    // column from KB-sized per-group summaries: one distributed pass
    // builds a KllDoublesSketch per return flag (native
    // TypedImperativeAggregate, map-side combined partials), the
    // driver decodes p50/p90/p99 from the ≤3 collected sketches.
    // Unlike `percentile` (exact, buffers every value per group) the
    // state is O(k·log n) regardless of input size. Approximate by
    // design (KLL compaction flips a random coin once n > k, so
    // reruns can differ within the pinned ±1.65 % rank-error band) ⇒
    // rows-only check, rule ③; SketchSpec pins the rank-error
    // bound vs the exact order statistic and merge-vs-direct
    // agreement.
    "agg_sketch_kll" -> ((s, dir) => {
      val perFlag = Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.KllSketch
            .agg(col("l_extendedprice").cast("double")).as("sk"),
          count(lit(1)).as("n_items"))
        .collect()
      val rows = perFlag.map { r =>
        val sk = r.getAs[Array[Byte]]("sk")
        (r.getAs[String]("l_returnflag"), r.getAs[Long]("n_items"),
          graft.functions.KllSketch.quantile(sk, 0.5),
          graft.functions.KllSketch.quantile(sk, 0.9),
          graft.functions.KllSketch.quantile(sk, 0.99))
      }.toSeq
      s.createDataFrame(rows)
        .toDF("l_returnflag", "n_items", "p50", "p90", "p99")
        .orderBy(col("l_returnflag"))
    }),

    // Misra-Gries frequent-items sketch: above-average keys of
    // l_suppkey (count ≥ the per-key mean, both derived from the
    // sketch's own streamLength/numActive so the query is scale-
    // factor-free AND non-empty at every scale — a fixed stream
    // fraction goes empty once key cardinality grows past it, which
    // would leave the extraction path untimed at bench scale). One
    // pass with a fixed 2048-slot budget; while distinct keys fit
    // under the purge capacity (all driver test scales: ≤1000
    // suppkeys vs 1536 slots) counters are never decremented ⇒
    // estimates are EXACT, numActive is the exact distinct count, and
    // the result is partition-order independent, so this carries a
    // real DuckDB oracle — same exact-below-capacity contract as
    // agg_sketch_theta. Above capacity the declared semantics degrade
    // to the ε·N overcount band with no false negatives (SketchSpec
    // pins that regime on a synthetic wide-key stream).
    "agg_sketch_freq" -> ((s, dir) => {
      val bytes = Tables(s, dir, "lineitem")
        .agg(graft.functions.FreqSketch.agg(col("l_suppkey")).as("sk"))
        .collect()(0).getAs[Array[Byte]]("sk")
      val threshold = math.ceil(
        graft.functions.FreqSketch.streamLength(bytes).toDouble /
          graft.functions.FreqSketch.numActive(bytes)).toLong
      val rows = graft.functions.FreqSketch.frequentItems(bytes, threshold)
      s.createDataFrame(rows).toDF("l_suppkey", "est_count")
        .orderBy(col("est_count").desc, col("l_suppkey"))
    }),

    // Count-Min heavy-hitter estimation: one pass over lineitem
    // builds a fixed-size frequency summary of l_suppkey; the probe
    // reports estimated vs exact counts for a fixed key set. CMS never
    // undercounts (collisions only ADD), which the output exposes.
    "agg_sketch_cms" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val cms = li.stat.countMinSketch(col("l_suppkey"),
        eps = 0.001, confidence = 0.99, seed = 42)
      val probes = (1L to 25L).map(k => (k, cms.estimateCount(k)))
      val est = s.createDataFrame(probes).toDF("l_suppkey", "est_count")
      val exact = li.filter(col("l_suppkey").between(1, 25))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("true_count"))
      est.join(exact, Seq("l_suppkey"), "left_outer")
        .select(col("l_suppkey"), col("est_count"),
          coalesce(col("true_count"), lit(0L)).as("true_count"),
          (col("est_count") - coalesce(col("true_count"), lit(0L)))
            .as("overshoot"))
        .orderBy(col("l_suppkey"))
    }),

    // AMS (Alon-Matias-Szegedy 1996) second-frequency-moment sketch:
    // F2 = Σ_v f_v² (self-join size / skew mass of the key) estimated
    // from 16 ±1-signed counters built in ONE pass ([[amsCounters]] —
    // no groupBy on the key, constant state), then median-of-4-means
    // over the squared counters. The 4-value median uses the
    // sort-free identity (Σ − min − max) div 2. Deterministic
    // md5-derived signs (rule: derandomized sketches carry REAL
    // oracles — same doctrine as sample_hash's md5 coin), so the
    // estimate, the exact F2 and the signed error are all
    // hash-checked against DuckDB. Integer-exact under decimal(38,0)
    // up to counter² < 2⁶³ (≈3·10⁹ rows per sketch — beyond that,
    // widen the fixed point; declared bound). At 100 TB: the exact F2
    // needs a full key shuffle; the sketch needs 16 longs.
    "agg_sketch_ams" -> ((s, dir) => {
      val base = Tables(s, dir, "events").select(col("user_id"))
      val exact = base.groupBy(col("user_id"))
        .agg(count(lit(1)).as("c"))
        .agg(expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS BIGINT)")
          .as("f2_exact"))
      val ctr = base
        .withColumn("amsh",
          expr("md5(concat('ams', CAST(user_id AS STRING)))"))
        .agg(amsCounters(0), (1 until 16).map(amsCounters): _*)
      val est = ctr
        .selectExpr("stack(16, " +
          (0 until 16).map(r => s"$r, c$r").mkString(", ") + ") AS (r, c)")
        .groupBy(expr("r div 4").as("g"))
        .agg(expr("sum(CAST(c AS DECIMAL(38,0)) * c) div 4").as("m"))
        .agg(expr("CAST((sum(m) - min(m) - max(m)) div 2 AS BIGINT)")
          .as("f2_est"))
      exact.crossJoin(est)
        .select(col("f2_exact"), col("f2_est"),
          expr("CAST(((f2_est - f2_exact) * 1000) div f2_exact " +
            "AS BIGINT)").as("err_permille"))
    }),

    // Derandomized HyperLogLog with a REAL oracle (the AMS doctrine
    // extended to cardinality): registers from the md5 hash — 60-bit
    // h, bucket = top 6 bits (m=64), rank ρ = 55 − bitlength(54-bit
    // suffix) capped at 54 — and the raw HLL estimate α·m²/Σ2^(−Mⱼ)
    // evaluated as an EXACT RATIONAL: numer = Σ2^(54−Rⱼ) (empty
    // buckets contribute 2^54) stays under 2^60, and the α=0.709
    // product rides DECIMAL(38,0)/HUGEINT — zero floats anywhere, so
    // estimate, exact count and signed error all hash-check against
    // DuckDB (unlike agg_sketch_hll's datasketches registers, which
    // only Spark can derive). Registers are max-merge ⇒ one
    // (type, bucket) hash agg, map-side combined; 64 longs of state
    // per group at any scale.
    "agg_sketch_hll_det" -> ((s, dir) => {
      val B = 18014398509481984L // 2^54
      val e = Tables(s, dir, "events")
        .select(col("event_type"), col("user_id"))
        .withColumn("h",
          expr("CAST(conv(substring(md5(concat('hll', " +
            "CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
        .withColumn("bucket", expr(s"h div $B"))
        .withColumn("rho",
          expr(s"least(55 - length(bin(h % $B)), CAST(54 AS INT))"))
      val reg = e.groupBy(col("event_type"), col("bucket"))
        .agg(max(col("rho")).as("r"))
      val est = reg.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nb"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), 54 - r)")).as("sp"))
        .withColumn("numer", expr(s"sp + (64 - nb) * $B"))
        .select(col("event_type"),
          expr(s"CAST((CAST(709 AS DECIMAL(38,0)) * 4096 * $B) " +
            "div (CAST(1000 AS DECIMAL(38,0)) * numer) AS BIGINT)")
            .as("est_users"))
      val exactD = Tables(s, dir, "events").groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      est.join(exactD, Seq("event_type"))
        .select(col("event_type"), col("est_users"), col("exact_users"),
          expr("CAST(((est_users - exact_users) * 1000) " +
            "div exact_users AS BIGINT)").as("err_permille"))
        .orderBy(col("event_type"))
    }),

    // Derandomized Bloom filter with a REAL oracle: k=4 bit positions
    // per key from md5 slices into m=65536 bits; the filter is the
    // DISTINCT position set of the build side (orders' custkeys — at
    // most m rows however large the build is), and a probe passes iff
    // all 4 of its positions are present (count of semi-join matches
    // = 4). Same report shape as agg_sketch_bloom (probe pass vs
    // exact membership vs false positives per segment) but every
    // number is deterministic and hash-checked — the false-positive
    // BEHAVIOR of a Bloom filter, pinned cross-engine. Probe-side
    // work is 4 narrow (pos)-keyed lookups against a broadcast-sized
    // position set; no fact-table shuffle.
    "agg_sketch_bloom_det" -> ((s, dir) => {
      def positions(key: String): Column =
        expr(s"transform(sequence(0, 3), i -> " +
          "CAST(conv(substring(md5(concat('bf', CAST(i AS STRING), " +
          s"':', CAST($key AS STRING))), 1, 8), 16, 10) " +
          "AS BIGINT) % 65536)")
      val bits = Tables(s, dir, "orders")
        .select(col("o_custkey")).distinct()
        .select(explode(positions("o_custkey")).as("pos"))
        .distinct()
      val withOrders = Tables(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey")).distinct()
        .withColumn("has_orders", lit(1))
      val probe = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .select(col("c_custkey"), col("c_mktsegment"),
          explode(positions("c_custkey")).as("pos"))
        .join(bits.withColumn("hit", lit(1L)), Seq("pos"), "left_outer")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg((sum(coalesce(col("hit"), lit(0L))) === 4L).as("probe"))
      probe.join(withOrders, Seq("c_custkey"), "left_outer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(when(col("probe"), 1L).otherwise(0L)).as("n_probe_pass"),
          sum(when(col("has_orders") === 1, 1L).otherwise(0L))
            .as("n_with_orders"),
          sum(when(col("probe") && col("has_orders").isNull, 1L)
            .otherwise(0L)).as("n_false_positive"))
        .orderBy(col("c_mktsegment"))
    }),

    // Derandomized quantile sketch with a REAL oracle, completing the
    // _det family (hll/bloom/cms → kll): KLL's randomness is the
    // compaction coin, so the deterministic stand-in is an equi-width
    // cell-count summary — the cumsum-cuts machinery of
    // agg_hist_eqdepth run as a sketch: ONE map-side-combined hash agg
    // of (flag, cents div W) counts (mergeable: counts add; state
    // bounded by value-range/W ≈ 110 cells here, declared resolution
    // W = $1000), cumulative sum over the bounded cell frame, and the
    // q-quantile estimate = upper bound of the first cell whose
    // cumulative count crosses ⌈q·n⌉. Quantile contract: value error
    // < W and one-sided rank excess < the crossing cell's count —
    // both EXACT integer statements, so estimate AND the audited rank
    // of each estimate hash-check against DuckDB (unlike
    // agg_sketch_kll's datasketches compactor, whose coin only Spark
    // can flip). The rank audit is a second pass by construction —
    // same est-vs-exact report shape as agg_sketch_hll_det.
    "agg_sketch_kll_det" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val W = 100000L // cents per cell = $1000 value resolution
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      val cum = li
        .groupBy(col("l_returnflag"), expr(s"cents div $W").as("cell"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("cell"))))
        .withColumn("n", sum(col("c")).over(
          Window.partitionBy(col("l_returnflag"))))
      def estQ(q: Int) =
        min(when(col("cum") * 100 >= col("n") * q,
          (col("cell") + 1) * W - 1)).as(s"p${q}_est")
      val est = cum.groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n_items"), estQ(50), estQ(90), estQ(99))
      li.join(broadcast(est), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(max(col("n_items")).as("n_items"),
          max(col("p50_est")).as("p50_est"),
          max(col("p90_est")).as("p90_est"),
          max(col("p99_est")).as("p99_est"),
          sum(when(col("cents") <= col("p50_est"), 1L).otherwise(0L))
            .as("rank_p50"),
          sum(when(col("cents") <= col("p90_est"), 1L).otherwise(0L))
            .as("rank_p90"),
          sum(when(col("cents") <= col("p99_est"), 1L).otherwise(0L))
            .as("rank_p99"))
        .orderBy(col("l_returnflag"))
    }),

    // Derandomized Count-Min with a REAL oracle: d=4 rows × w=256
    // md5-bucketed counters built in one 4×-exploded map-side-
    // combined hash agg (1024 cells of state at any scale); the
    // point-query estimate is the min over a key's 4 counters, which
    // never undercounts (collisions only add) — estimate, exact and
    // overshoot for probe keys 1..25 all hash-checked cross-engine
    // (agg_sketch_cms's Spark countMinSketch seed is not derivable in
    // DuckDB; this one is).
    "agg_sketch_cms_det" -> ((s, dir) => {
      val cells = Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), explode(expr("sequence(0, 3)")).as("r"))
        .withColumn("b",
          expr("CAST(conv(substring(md5(concat('cms', " +
            "CAST(r AS STRING), ':', CAST(l_suppkey AS STRING))), " +
            "1, 8), 16, 10) AS BIGINT) % 256"))
        .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
      val probes = s.range(1, 26).toDF("l_suppkey")
        .select(col("l_suppkey"), explode(expr("sequence(0, 3)")).as("r"))
        .withColumn("b",
          expr("CAST(conv(substring(md5(concat('cms', " +
            "CAST(r AS STRING), ':', CAST(l_suppkey AS STRING))), " +
            "1, 8), 16, 10) AS BIGINT) % 256"))
      val est = probes.join(cells, Seq("r", "b"), "left_outer")
        .groupBy(col("l_suppkey"))
        .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
      val exact = Tables(s, dir, "lineitem")
        .filter(col("l_suppkey").between(1, 25))
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("true_count"))
      est.join(exact, Seq("l_suppkey"), "left_outer")
        .select(col("l_suppkey"), col("est_count"),
          coalesce(col("true_count"), lit(0L)).as("true_count"),
          (col("est_count") - coalesce(col("true_count"), lit(0L)))
            .as("overshoot"))
        .orderBy(col("l_suppkey"))
    })
  )

  /** Sum of 16 deterministic AMS ±1 counters built in ONE scan with
    * ONE md5 per row: counter r's sign is the parity class of hex
    * NIBBLE r of md5('ams' ‖ key) — 16 sign streams sliced from one
    * 128-bit digest (declared independence trade: 4-bit slices of
    * one strong hash, adequate for the F2 median-of-means; the
    * one-digest-per-(key, r) alternative hashes 16× per row). A
    * plain map-side-combined aggregate whose shuffle is 16 longs per
    * map partition; signs are a pure function of the key, so the
    * sketch is deterministic, mergeable (counters add), and
    * identically derivable in DuckDB — which is what makes this the
    * one frequency-moment sketch with a REAL hash oracle. */
  private def amsCounters(r: Int): Column =
    sum(expr(s"CASE WHEN substr(amsh, ${r + 1}, 1) " +
      "IN ('0','1','2','3','4','5','6','7') " +
      "THEN 1L ELSE -1L END")).as(s"c$r")

  // agg_sketch_bloom / agg_sketch_cms are approximate by design —
  // rows-only checks (rule ③); properties pinned in SketchSpec.
  // join_bloom_prefilter is EXACT (the join verifies the sketch), so
  // its oracle is the plain join.
  /** The exact daily-active/retention SQL both theta variants verify
    * against (both are in the exact regime at their declared
    * capacities). */
  private val thetaRetentionSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
      |), act AS (
      |  SELECT day, count(*) AS n_active FROM du GROUP BY day
      |), ret AS (
      |  SELECT a.day, count(*) AS n_retained
      |  FROM du a JOIN du b
      |    ON b.day = a.day + INTERVAL 1 DAY AND a.user_id = b.user_id
      |  GROUP BY a.day)
      |SELECT act.day, n_active,
      |  CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained
      |FROM act LEFT JOIN ret ON act.day = ret.day
      |ORDER BY act.day""".stripMargin

  def oracle: Map[String, String] = Map(
    "agg_sketch_hll_det" ->
      """WITH e AS (
        |  SELECT event_type, user_id,
        |    CAST(('0x' || substr(md5('hll' || CAST(user_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) AS h
        |  FROM events),
        |b AS (
        |  SELECT event_type, h // 18014398509481984 AS bucket,
        |    least(55 - length(bin(h % 18014398509481984)), 54) AS rho
        |  FROM e),
        |reg AS (
        |  SELECT event_type, bucket, max(rho) AS r
        |  FROM b GROUP BY event_type, bucket),
        |agg AS (
        |  SELECT event_type, count(*) AS nb,
        |    sum(CAST(1 AS BIGINT) << (54 - r)) AS sp
        |  FROM reg GROUP BY event_type),
        |est AS (
        |  SELECT event_type,
        |    CAST((CAST(709 AS HUGEINT) * 4096 * 18014398509481984)
        |      // (CAST(1000 AS HUGEINT)
        |          * (sp + (64 - nb) * 18014398509481984))
        |      AS BIGINT) AS est_users
        |  FROM agg),
        |ex AS (
        |  SELECT event_type, count(DISTINCT user_id) AS exact_users
        |  FROM events GROUP BY event_type)
        |SELECT est.event_type, est_users, exact_users,
        |  CAST(((est_users - exact_users) * 1000) // exact_users
        |    AS BIGINT) AS err_permille
        |FROM est JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "agg_sketch_bloom_det" ->
      """WITH ks AS (SELECT unnest(generate_series(0, 3)) AS i),
        |bits AS (
        |  SELECT DISTINCT
        |    CAST(('0x' || substr(md5('bf' || CAST(i AS VARCHAR) || ':'
        |      || CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 65536
        |      AS pos
        |  FROM (SELECT DISTINCT o_custkey FROM orders) CROSS JOIN ks),
        |wo AS (SELECT DISTINCT o_custkey AS c_custkey, 1 AS has_orders
        |       FROM orders),
        |pp AS (
        |  SELECT c.c_custkey, c.c_mktsegment,
        |    CAST(('0x' || substr(md5('bf' || CAST(i AS VARCHAR) || ':'
        |      || CAST(c.c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 65536
        |      AS pos
        |  FROM customer c CROSS JOIN ks),
        |pr AS (
        |  SELECT pp.c_custkey, pp.c_mktsegment,
        |    sum(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END) = 4
        |      AS probe
        |  FROM pp LEFT JOIN bits ON pp.pos = bits.pos
        |  GROUP BY pp.c_custkey, pp.c_mktsegment)
        |SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CASE WHEN probe THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_probe_pass,
        |  CAST(sum(CASE WHEN has_orders = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_with_orders,
        |  CAST(sum(CASE WHEN probe AND has_orders IS NULL THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_false_positive
        |FROM pr LEFT JOIN wo USING (c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "agg_sketch_kll_det" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |cells AS (
        |  SELECT l_returnflag, cents // 100000 AS cell, count(*) AS c
        |  FROM li GROUP BY l_returnflag, cell),
        |cum AS (
        |  SELECT l_returnflag, cell, c,
        |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY cell) AS cum,
        |    sum(c) OVER (PARTITION BY l_returnflag) AS n
        |  FROM cells),
        |est AS (
        |  SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_items,
        |    min(CASE WHEN cum * 100 >= n * 50
        |      THEN (cell + 1) * 100000 - 1 END) AS p50_est,
        |    min(CASE WHEN cum * 100 >= n * 90
        |      THEN (cell + 1) * 100000 - 1 END) AS p90_est,
        |    min(CASE WHEN cum * 100 >= n * 99
        |      THEN (cell + 1) * 100000 - 1 END) AS p99_est
        |  FROM cum GROUP BY l_returnflag)
        |SELECT li.l_returnflag, max(n_items) AS n_items,
        |  max(p50_est) AS p50_est, max(p90_est) AS p90_est,
        |  max(p99_est) AS p99_est,
        |  CAST(sum(CASE WHEN cents <= p50_est THEN 1 ELSE 0 END)
        |    AS BIGINT) AS rank_p50,
        |  CAST(sum(CASE WHEN cents <= p90_est THEN 1 ELSE 0 END)
        |    AS BIGINT) AS rank_p90,
        |  CAST(sum(CASE WHEN cents <= p99_est THEN 1 ELSE 0 END)
        |    AS BIGINT) AS rank_p99
        |FROM li JOIN est ON li.l_returnflag = est.l_returnflag
        |GROUP BY li.l_returnflag
        |ORDER BY li.l_returnflag""".stripMargin,

    "agg_sketch_cms_det" ->
      """WITH rs AS (SELECT unnest(generate_series(0, 3)) AS r),
        |cells AS (
        |  SELECT r,
        |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || ':'
        |      || CAST(l_suppkey AS VARCHAR)), 1, 8)) AS BIGINT) % 256
        |      AS b,
        |    count(*) AS c
        |  FROM lineitem CROSS JOIN rs GROUP BY 1, 2),
        |pk AS (SELECT unnest(generate_series(1, 25)) AS l_suppkey),
        |pp AS (
        |  SELECT pk.l_suppkey, rs.r,
        |    CAST(('0x' || substr(md5('cms' || CAST(rs.r AS VARCHAR)
        |      || ':' || CAST(pk.l_suppkey AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 256 AS b
        |  FROM pk CROSS JOIN rs),
        |est AS (
        |  SELECT l_suppkey, min(coalesce(c, 0)) AS est_count
        |  FROM pp LEFT JOIN cells ON pp.r = cells.r AND pp.b = cells.b
        |  GROUP BY l_suppkey),
        |ex AS (
        |  SELECT l_suppkey, count(*) AS true_count FROM lineitem
        |  WHERE l_suppkey BETWEEN 1 AND 25 GROUP BY l_suppkey)
        |SELECT est.l_suppkey AS l_suppkey,
        |  CAST(est_count AS BIGINT) AS est_count,
        |  CAST(coalesce(true_count, 0) AS BIGINT) AS true_count,
        |  CAST(est_count - coalesce(true_count, 0) AS BIGINT)
        |    AS overshoot
        |FROM est LEFT JOIN ex ON est.l_suppkey = ex.l_suppkey
        |ORDER BY l_suppkey""".stripMargin,

    "agg_sketch_ams" ->
      """WITH ex AS (
        |  SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT)
        |    AS f2_exact
        |  FROM (SELECT count(*) AS c FROM events GROUP BY user_id)),
        |rs AS (SELECT unnest(generate_series(0, 15)) AS r),
        |ctr AS (
        |  SELECT r,
        |    sum(CASE WHEN substr(md5('ams' || CAST(user_id AS VARCHAR)),
        |          r + 1, 1)
        |          IN ('0','1','2','3','4','5','6','7')
        |        THEN 1 ELSE -1 END) AS c
        |  FROM events CROSS JOIN rs GROUP BY r),
        |mg AS (
        |  SELECT r // 4 AS g,
        |    sum(CAST(c AS HUGEINT) * c) // 4 AS m
        |  FROM ctr GROUP BY 1),
        |es AS (
        |  SELECT CAST((sum(m) - min(m) - max(m)) // 2 AS BIGINT)
        |    AS f2_est
        |  FROM mg)
        |SELECT f2_exact, f2_est,
        |  CAST(((f2_est - f2_exact) * 1000) // f2_exact AS BIGINT)
        |    AS err_permille
        |FROM ex CROSS JOIN es""".stripMargin,

    // exact below sketch capacity (≤1500 distinct users vs 4096
    // retained hashes at both test scales) — see ThetaSketchAgg doc
    "agg_sketch_theta" -> thetaRetentionSql,

    // same exact program; the lgK=15 variant's capacity covers sf1's
    // ~13,400 actives/day, so THIS oracle stays a hash match there too
    "agg_sketch_theta_cap" -> thetaRetentionSql,

    "join_bloom_prefilter" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders,
         |  ${Tables.sql.moneySum("o_totalprice")} AS total_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    // exact below purge capacity (≤1000 distinct suppkeys vs 1536
    // slots at every test scale) — see FreqItemsAgg doc. NULL keys
    // never enter the sketch (update skips them), streamLength counts
    // only ingested rows, numActive is the exact distinct count in
    // the sub-capacity regime — so the oracle mirrors all three:
    // non-null rows only, threshold = ceil(rows / distinct keys)
    "agg_sketch_freq" ->
      """SELECT l_suppkey, count(*) AS est_count
        |FROM lineitem WHERE l_suppkey IS NOT NULL
        |GROUP BY l_suppkey
        |HAVING count(*) >= (
        |  SELECT CAST(ceil(1.0 * count(l_suppkey)
        |    / count(DISTINCT l_suppkey)) AS BIGINT)
        |  FROM lineitem)
        |ORDER BY est_count DESC, l_suppkey""".stripMargin
  )
}
