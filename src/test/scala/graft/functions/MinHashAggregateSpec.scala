package graft.functions

import graft.LocalSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The imperative MinHash aggregate must compute exactly
  * min_i(mix(h + GOLDEN·(i+1))) per position — verified against a
  * plain-Scala reference — and behave like any min under partial
  * aggregation (order/partitioning invariant).
  */
class MinHashAggregateSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  private val GOLDEN = 0x9e3779b97f4a7c15L
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("signature equals the per-position min of the mixed hashes") {
    import spark.implicits._
    val hs = Seq(3L, -17L, 123456789L, Long.MinValue + 5, 0L)
    val n = 16
    val got = hs.toDF("h").agg(MinHashSignature.of(col("h"), n).as("sig"))
      .head().getSeq[Long](0)
    val want = (0 until n).map(i =>
      hs.map(h => mix(h + GOLDEN * (i + 1))).min)
    assert(got == want)
  }

  test("partitioning-invariant: same signature for any row distribution") {
    import spark.implicits._
    val hs = (1L to 1000L).map(h => h * 2654435761L)
    val one = hs.toDF("h").coalesce(1)
      .agg(MinHashSignature.of(col("h"), 32)).head().getSeq[Long](0)
    val many = hs.toDF("h").repartition(13)
      .agg(MinHashSignature.of(col("h"), 32)).head().getSeq[Long](0)
    assert(one == many)
  }

  test("minhash_signature is callable from SQL via GraftExtensions") {
    import spark.implicits._
    Seq(3L, 4L, 5L).toDF("h").createOrReplaceTempView("mh_sql_test")
    val sig = spark.sql(
      "SELECT minhash_signature(h, 8) AS sig FROM mh_sql_test")
      .head().getSeq[Long](0)
    assert(sig.length == 8)
    val want = (0 until 8).map(i =>
      Seq(3L, 4L, 5L).map(h => mix(h + GOLDEN * (i + 1))).min)
    assert(sig == want)
  }

  test("grouped signatures: one array per group, independent mins") {
    import spark.implicits._
    val df = Seq((1, 10L), (1, 20L), (2, 10L)).toDF("g", "h")
    val rows = df.groupBy("g")
      .agg(MinHashSignature.of(col("h"), 8).as("sig"))
      .orderBy("g").collect()
    val sig1 = rows(0).getSeq[Long](1)
    val sig2 = rows(1).getSeq[Long](1)
    // group 2 saw only h=10; group 1's mins can only be <= group 2's
    // where the h=20 mixes win, and equal elsewhere
    assert(sig1.zip(sig2).forall { case (a, b) => a <= b })
    assert(sig2 == (0 until 8).map(i => mix(10L + GOLDEN * (i + 1))))
  }
}
