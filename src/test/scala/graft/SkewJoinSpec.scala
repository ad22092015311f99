package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins AQE skew-join splitting — the runtime answer to skewed keys
  * SCALING.md leans on (alongside manual salting, llm_lang_partition).
  * One key owning most of the fact side must be split into multiple
  * tasks at runtime, visible as skew=true on the final sort-merge join.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  test("AQE splits a skewed partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.get(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 95% of the fact rows share key 0; dimension is uniform.
      val fact = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 100)
          .as("k"), concat(lit("payload-"), col("id")).as("payload"))
      val dim = spark.range(100).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("d"))
      val joined = fact.join(dim.hint("merge"), "k")
      // execute THIS QueryExecution (count() would plan a new one and
      // leave joined's adaptive plan unfinalized)
      assert(joined.collect().length === 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split sort-merge join:\n$finalPlan")
    } finally keep.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
