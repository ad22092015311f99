package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins partition pruning on a date-partitioned layout — at 100 TB the
  * event log is stored partitioned by day, and a time-range query must
  * touch only the matching directories (PartitionFilters), not filter
  * post-scan.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  test("date-partitioned events: time-range scan prunes to matching partitions") {
    val root = Files.createTempDirectory("graft-part").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(root)

    val days = spark.read.parquet(root).select("day").distinct().count()
    assert(days > 3, s"need several partitions to prove pruning, got $days")

    val firstDay = spark.read.parquet(root)
      .agg(min(col("day"))).head().getDate(0).toString
    val q = spark.read.parquet(root).filter(col("day") === firstDay)
    val plan = q.queryExecution.executedPlan.toString

    // the day predicate must be a PartitionFilter (directory pruning),
    // NOT a post-scan data filter
    val scanLine = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse(plan)
    assert(scanLine.contains("day"),
      s"day predicate not in PartitionFilters:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(day)"),
      "day should be partition-pruned, not row-filtered")

    // and the pruned scan reads only that day's rows
    val expected = spark.read.parquet(root)
      .groupBy("day").count()
      .filter(col("day") === firstDay).head().getLong(1)
    assert(q.count() === expected)
  }

  test("dynamic partition pruning: a filtered dim join prunes fact " +
      "partitions at runtime") {
    // The star-schema accelerator at 100 TB: the fact side is
    // partitioned on the join key, the dim side's selective filter is
    // only known at runtime — DPP turns the dim's matching keys into a
    // runtime PartitionFilter on the fact scan, so only the matching
    // day directories are read (a static plan would scan every
    // partition and filter post-join).
    val root = Files.createTempDirectory("graft-dpp").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(root)
    val fact = spark.read.parquet(root)
    val firstDay = fact.agg(min(col("day"))).head().getDate(0)
    import spark.implicits._
    // the dim must be a real source (a LocalRelation would constant-
    // fold the filter away and the DPP rule would see no selective
    // predicate on the build side)
    val dimPath = Files.createTempDirectory("graft-dpp-dim").toString
    Seq((firstDay, "target"),
        (java.sql.Date.valueOf(firstDay.toLocalDate.plusDays(1)), "other"))
      .toDF("d_day", "tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val q = fact.join(dim, col("day") === col("d_day"))
      .filter(col("tag") === "target")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP in plan:\n$plan")
    assert(q.count() ===
      fact.filter(col("day") === firstDay).count())
  }

  test("sink_partitioned's read-back prunes on the partition column") {
    // build the query once so it writes its partitioned scratch dir
    ops.ScanOps.queries("sink_partitioned")(spark, "/root/testdata/sf0.001")
      .collect()
    val scratch = s"${ops.ScanOps.scratchRoot}/part-orders"
    val q = spark.read.parquet(scratch)
      .filter(col("o_orderpriority") === "1-URGENT")
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse(plan)
    assert(scanLine.contains("o_orderpriority"),
      s"priority predicate not in PartitionFilters:\n$plan")
  }
}
