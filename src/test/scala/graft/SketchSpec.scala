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

  test("sketch outputs are deterministic across runs") {
    for (q <- Seq("agg_sketch_bloom", "agg_sketch_cms", "agg_sketch_hll",
        "agg_sketch_theta")) {
      val a = SparkEntry.queries(q)(spark, dir).collect().toSeq
      val b = SparkEntry.queries(q)(spark, dir).collect().toSeq
      assert(a === b, s"$q not deterministic")
    }
  }
}
