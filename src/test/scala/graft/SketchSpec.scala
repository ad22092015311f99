package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sketch-aggregate properties that stand in for a DuckDB
  * oracle (agg_sketch_bloom / agg_sketch_cms are approximate by
  * design, rule ③):
  *
  *  - Bloom: ZERO false negatives (every customer with orders passes
  *    the probe) and a false-positive rate consistent with fpp;
  *  - CMS: never underestimates (overshoot >= 0 for every key) and
  *    overshoot is bounded by eps·N;
  *  - both outputs are deterministic across independent runs (order-
  *    independent sketch merges + fixed seeds).
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = LocalSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("bloom probe has zero false negatives and bounded FP rate") {
    val rows = SparkEntry.queries("agg_sketch_bloom")(spark, dir).collect()
    assert(rows.nonEmpty)
    var totalNo = 0L
    var totalFp = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_customers")
      val pass = r.getAs[Long]("n_probe_pass")
      val withO = r.getAs[Long]("n_with_orders")
      val fp = r.getAs[Long]("n_false_positive")
      // no false negatives: everything with orders passes the probe
      assert(pass >= withO, s"false negatives in segment ${r.get(0)}")
      assert(pass === withO + fp)
      totalNo += n - withO
      totalFp += fp
    }
    // fpp = 0.03 at 20k capacity, far undersubscribed at sf0.01 —
    // allow generous slack (5x) over the nominal rate
    assert(totalFp.toDouble <= math.max(1.0, 0.15 * totalNo),
      s"FP rate too high: $totalFp of $totalNo non-members")
  }

  test("CMS never underestimates and overshoot is within eps*N") {
    val rows = SparkEntry.queries("agg_sketch_cms")(spark, dir).collect()
    assert(rows.length === 25)
    val n = Tables(spark, dir, "lineitem").count()
    rows.foreach { r =>
      val over = r.getAs[Long]("overshoot")
      assert(over >= 0L, s"CMS underestimated key ${r.get(0)}")
      assert(over <= (0.001 * n).toLong + 1,
        s"overshoot $over exceeds eps*N for key ${r.get(0)}")
    }
  }

  test("HLL partial-union equals the direct sketch; estimate near exact") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("agg_sketch_hll")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_users")
      val exact = r.getAs[Long]("exact_users")
      assert(r.getAs[Long]("n_partials") > 1, "must union several partials")
      // default lgConfigK=12 → RSE ≈ 1.6%; allow 4 sigma
      assert(math.abs(est - exact) <= math.max(2.0, 0.065 * exact),
        s"HLL estimate $est too far from exact $exact (${r.get(0)})")
    }
    // mergeability is LOSSLESS for HLL (register state = elementwise
    // max): union-of-daily-partials must estimate EXACTLY like one
    // direct sketch over the whole column
    val e = Tables(spark, dir, "events")
    val direct = e.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .as("direct_est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("est_users") === direct(r.getString(0)),
        s"partial union diverged from direct sketch for ${r.get(0)}")
    }
  }

  test("theta sketch: exact below capacity, intersection counts shared keys") {
    import org.apache.spark.sql.functions._
    import graft.functions.ThetaSketch
    def sketchOf(range: Range): Array[Byte] = {
      val df = spark.createDataFrame(range.map(i => Tuple1(i.toLong)))
        .toDF("k")
        .repartition(4) // force partial sketches + a merge
      df.agg(ThetaSketch.agg(col("k")).as("sk"))
        .head.getAs[Array[Byte]]("sk")
    }
    val a = sketchOf(0 until 100)
    val b = sketchOf(50 until 150)
    assert(ThetaSketch.estimate(a) === 100L) // exact mode
    assert(ThetaSketch.estimate(b) === 100L)
    assert(ThetaSketch.intersect(a, b) === 50L) // the op HLL can't do
    assert(ThetaSketch.intersect(a, a) === 100L)
    assert(ThetaSketch.intersect(a, sketchOf(500 until 600)) === 0L)
  }

  test("theta above capacity degrades to a bounded estimate (declared)") {
    import graft.functions.ThetaSketch
    // 100k distinct keys >> 4096 retained hashes: the declared
    // above-capacity semantics are an estimate with RSE ≈ 1/√4096 ≈
    // 1.56%; assert 4σ. (Below capacity the oracle asserts exactness.)
    val sk = spark.sql(
      "SELECT theta_sketch_agg(id) AS sk FROM range(0, 100000)")
      .head.getAs[Array[Byte]]("sk")
    val est = ThetaSketch.estimate(sk)
    assert(math.abs(est - 100000L) <= (4 * 0.0156 * 100000).toLong,
      s"theta estimate $est outside 4-sigma of 100000")
  }

  test("theta_sketch_agg is registered as a SQL function") {
    import graft.functions.ThetaSketch
    val sk = spark.sql(
      "SELECT theta_sketch_agg(id) AS sk FROM range(0, 1000)")
      .head.getAs[Array[Byte]]("sk")
    assert(ThetaSketch.estimate(sk) === 1000L)
  }

  test("KLL quantiles are true stream members within the rank-error bound") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("agg_sketch_kll")(spark, dir).collect()
    assert(rows.nonEmpty)
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("double").as("v"))
      .collect()
      .groupBy(_.getAs[String]("l_returnflag"))
      .map { case (f, rs) => (f, rs.map(_.getAs[Double]("v")).sorted) }
    // k=200 ⇒ ~1.65% single-sided normalized rank error at 99%
    // confidence; assert a 2x slack band per quantile
    val eps = 0.033
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val exact = li(flag)
      assert(r.getAs[Long]("n_items") === exact.length.toLong)
      for ((rank, cname) <- Seq((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))) {
        val q = r.getAs[Double](cname)
        // KLL reports sampled stream values, never interpolations
        assert(exact.contains(q), s"$flag/$cname=$q not a stream member")
        val obsRank = exact.count(_ <= q).toDouble / exact.length
        assert(math.abs(obsRank - rank) <= eps,
          s"$flag/$cname rank $obsRank outside $rank±$eps")
      }
    }
  }

  test("KLL merged partials honor the same rank-error bound") {
    import org.apache.datasketches.kll.KllDoublesSketch
    // driver-side model of the distributed merge: 8 partials over
    // disjoint slices, merged pairwise — exactly what the
    // TypedImperativeAggregate does across partitions
    val n = 40000
    val data = (0 until n).map(i => ((i * 2654435761L) % 1000003L).toDouble)
    val parts = data.grouped(n / 8).toSeq
    val merged = KllDoublesSketch.newHeapInstance(200)
    parts.foreach { p =>
      val sk = KllDoublesSketch.newHeapInstance(200)
      p.foreach(sk.update)
      merged.merge(sk)
    }
    val sorted = data.sorted
    for (rank <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val q = merged.getQuantile(rank,
        org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
      val obsRank = sorted.count(_ <= q).toDouble / n
      assert(math.abs(obsRank - rank) <= 0.033,
        s"merged rank $obsRank outside $rank±0.033")
    }
  }

  test("freq sketch is exact below purge capacity (matches groupBy)") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("agg_sketch_freq")(spark, dir).collect()
    assert(rows.nonEmpty)
    // non-null rows/keys only — the sketch never ingests nulls, and
    // the query's threshold derives from streamLength/numActive
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_suppkey").isNotNull)
    val n = li.count()
    val nKeys = li.select(col("l_suppkey")).distinct().count()
    val threshold = math.ceil(n.toDouble / nKeys).toLong
    val exact = li.groupBy(col("l_suppkey")).count()
      .filter(col("count") >= threshold)
      .collect()
      .map(r => r.getAs[Long]("l_suppkey") -> r.getAs[Long]("count"))
      .toMap
    assert(rows.length === exact.size)
    rows.foreach { r =>
      val k = r.getAs[Long]("l_suppkey")
      assert(exact.get(k).contains(r.getAs[Long]("est_count")),
        s"suppkey $k: sketch ${r.getAs[Long]("est_count")} != exact")
    }
    // sub-capacity regime ⇒ zero worst-case error recorded
    val bytes = li.agg(graft.functions.FreqSketch.agg(col("l_suppkey"))
      .as("sk")).collect()(0).getAs[Array[Byte]]("sk")
    assert(graft.functions.FreqSketch.maxError(bytes) === 0L)
  }

  test("freq sketch above capacity: no false negatives, bounded overcount") {
    import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
    // 5000 distinct uniform keys >> 192 purge slots (maxMapSize=256),
    // plus 20 genuinely heavy keys whose true count (2000) exceeds the
    // guarantee floor eps*N ≈ (3.5/256)*90000 ≈ 1230 — the
    // over-capacity regime the 100 TB path hits. Misra-Gries
    // guarantees: upper bound never below true count (⇒
    // NO_FALSE_NEGATIVES finds every above-floor heavy hitter) and
    // maxError ≤ ~(3.5/maxMapSize)·N.
    val heavy = (1L to 20L).flatMap(k => Seq.fill(2000)(1000000L + k))
    val noise = (0 until 50000).map(i => (i * 48271L) % 5000L)
    val stream = heavy ++ noise
    val sk = new LongsSketch(256)
    stream.foreach(sk.update)
    val maxErr = sk.getMaximumError
    assert(maxErr > 0L, "stream did not exceed purge capacity")
    assert(maxErr <= (3.5 / 256 * stream.length).toLong,
      s"maxError $maxErr exceeds epsilon*N")
    assert(maxErr < 2000L, "heavy keys not above the guarantee floor")
    val found = sk.getFrequentItems(2000L, ErrorType.NO_FALSE_NEGATIVES)
      .map(_.getItem).toSet
    (1L to 20L).foreach { k =>
      assert(found.contains(1000000L + k), s"heavy key $k missed")
    }
    (1L to 20L).foreach { k =>
      val est = sk.getEstimate(1000000L + k)
      assert(est >= 2000L - maxErr && est <= 2000L + maxErr,
        s"heavy key $k estimate $est outside 2000±$maxErr")
    }
  }

  test("derandomized sketch family keeps the one-sided error contracts") {
    // The _det siblings are fully hash-oracled, but the SKETCH
    // guarantees themselves (one-sided error) are pinned here so a
    // hash-equal-but-wrong-both-sides regression cannot slip through:
    // Bloom admits no false negative (every with-orders customer
    // passes), CMS never undercounts, and the HLL raw estimate is
    // within the ±2σ ≈ ±26% relative band for m=64 registers.
    val bloom = SparkEntry.queries("agg_sketch_bloom_det")(spark, dir)
      .collect()
    assert(bloom.nonEmpty)
    bloom.foreach { r =>
      assert(r.getAs[Long]("n_probe_pass") >=
        r.getAs[Long]("n_with_orders"),
        s"bloom_det false negative in segment ${r.get(0)}")
    }
    val cms = SparkEntry.queries("agg_sketch_cms_det")(spark, dir)
      .collect()
    assert(cms.length === 25)
    cms.foreach { r =>
      assert(r.getAs[Long]("overshoot") >= 0L,
        s"cms_det undercounted key ${r.get(0)}")
    }
    val hll = SparkEntry.queries("agg_sketch_hll_det")(spark, dir)
      .collect()
    assert(hll.nonEmpty)
    hll.foreach { r =>
      val err = math.abs(r.getAs[Long]("err_permille"))
      assert(err <= 260L,
        s"hll_det error ${err} permille outside the m=64 band")
    }
    // kll_det: each estimate's audited rank crosses ⌈q·n⌉ from above
    // (one-sided by construction — the crossing-cell upper bound) and
    // the estimates are quantile-monotone.
    val kll = SparkEntry.queries("agg_sketch_kll_det")(spark, dir)
      .collect()
    assert(kll.nonEmpty)
    kll.foreach { r =>
      val n = r.getAs[Long]("n_items")
      for (q <- Seq(50, 90, 99))
        assert(r.getAs[Long](s"rank_p$q") * 100 >= n * q,
          s"kll_det p$q rank below target in flag ${r.get(0)}")
      assert(r.getAs[Long]("p50_est") <= r.getAs[Long]("p90_est") &&
        r.getAs[Long]("p90_est") <= r.getAs[Long]("p99_est"),
        s"kll_det estimates not monotone in flag ${r.get(0)}")
    }
  }

  test("kll_sketch_agg and freq_items_agg are registered as SQL functions") {
    val kllBytes = spark.sql(
      "SELECT kll_sketch_agg(CAST(id AS DOUBLE)) AS sk FROM range(0, 100)")
      .head.getAs[Array[Byte]]("sk")
    // n=100 < k=200: sketch is in exact mode, median of 0..99 = 49
    assert(graft.functions.KllSketch.quantile(kllBytes, 0.5) === 49.0)
    val freqBytes = spark.sql(
      "SELECT freq_items_agg(id % 10) AS sk FROM range(0, 1000)")
      .head.getAs[Array[Byte]]("sk")
    val items = graft.functions.FreqSketch.frequentItems(freqBytes, 100L)
    assert(items.toMap === (0L to 9L).map(_ -> 100L).toMap)
  }

  test("theta capacity contract: lgK sizes the exact regime (agg_sketch_theta_cap)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 20000).select(col("id"))
    // lgK=15 → 32,768 nominal: EXACT at 20k distinct — the regime
    // sf1's ~13,400 actives/day sits in for agg_sketch_theta_cap
    val cap = df.agg(graft.functions.ThetaSketch.agg(col("id"), 15).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    assert(graft.functions.ThetaSketch.estimate(cap) === 20000L,
      "lgK=15 must be exact at 20k distinct")
    // default lgK=12 → 4,096 nominal: declared estimate semantics
    // above capacity — bounded, not exact
    val dflt = df.agg(graft.functions.ThetaSketch.agg(col("id")).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    val est = graft.functions.ThetaSketch.estimate(dflt)
    assert(math.abs(est - 20000L) <= 1000L,
      s"default capacity estimate out of theta bounds: $est")
  }

  test("sketch outputs are deterministic across runs") {
    for (q <- Seq("agg_sketch_bloom", "agg_sketch_cms", "agg_sketch_hll",
        "agg_sketch_theta", "agg_sketch_theta_cap", "agg_sketch_freq")) {
      val a = SparkEntry.queries(q)(spark, dir).collect().toSeq
      val b = SparkEntry.queries(q)(spark, dir).collect().toSeq
      assert(a === b, s"$q not deterministic")
    }
  }
}
