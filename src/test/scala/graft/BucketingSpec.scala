package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bucketing path from SCALING.md: a fact-fact equi-join on
  * pre-bucketed tables must plan with NO Exchange on either side — the
  * co-located join that replaces the per-query shuffle when the same
  * key is joined repeatedly at 100 TB.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("join on bucketed tables needs no shuffle; unbucketed join needs two") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")

    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_bucketed")

      val bucketed = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val bp = bucketed.queryExecution.executedPlan.toString
      assert(bp.contains("SortMergeJoin"))
      assert(!bp.contains("Exchange"),
        s"bucketed join should not shuffle:\n$bp")

      val unbucketed = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val up = unbucketed.queryExecution.executedPlan.toString
      assert(up.contains("Exchange"),
        "control: the unbucketed join is expected to shuffle")

      // and the co-located join returns the same rows
      assert(bucketed.count() === unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("group-by on the bucket key needs no hash Exchange (sink_bucketed layout)") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    try {
      o.write.mode("overwrite").bucketBy(8, "o_custkey")
        .sortBy("o_custkey").saveAsTable("o_bucketed_agg")
      val agg = spark.table("o_bucketed_agg")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed scan should already satisfy the agg distribution:\n$plan")
      // control: the same agg over the raw parquet must shuffle
      val control = o.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
      assert(control.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "control: unbucketed agg is expected to shuffle")
      assert(agg.count() === control.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS o_bucketed_agg")
    }
  }
}
