package graft.operators

import graft.LocalSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the AllPairs/PPJoin prefix-filter guarantee: candidate
  * generation from the df-rarest prefixes is LOSSLESS for pairs at or
  * above the Jaccard threshold (verified against the quadratic
  * brute-force join), and the index is genuinely partial (smaller
  * than the full posting index). */
class PrefixFilterJoinSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  /** Synthetic token sets with controlled overlaps: a dup cluster
    * (J=1), a high pair (J≈0.82), a mid pair (J=0.5), and unrelated
    * docs sharing one hot token ("the") with everyone. */
  private def corpus(): DataFrame = {
    import spark.implicits._
    val docs: Seq[(Long, Seq[String])] = Seq(
      1L -> (Seq("the") ++ (1 to 10).map("a" + _)),
      2L -> (Seq("the") ++ (1 to 10).map("a" + _)),            // J=1 with 1
      3L -> (Seq("the") ++ (1 to 9).map("a" + _) ++ Seq("z1")), // J=10/12 with 1
      4L -> (Seq("the") ++ (1 to 5).map("a" + _) ++ (1 to 5).map("b" + _)),
      5L -> (Seq("the") ++ (1 to 10).map("c" + _)),
      6L -> (Seq("the") ++ (1 to 10).map("d" + _)))
    docs.toDF("doc_id", "ws")
      .select(col("doc_id"), explode(col("ws")).as("w"))
  }

  private def brute(tokens: DataFrame, num: Int, den: Int): Set[(Long, Long)] = {
    val ta = tokens.select(col("doc_id").as("doc_a"), col("w"))
    val tb = tokens.select(col("doc_id").as("doc_b"), col("w").as("w_b"))
    val sizes = tokens.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    ta.join(tb, col("w") === col("w_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(col("i") * den >= (col("na") + col("nb") - col("i")) * num)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("candidates are a superset of every true pair at the threshold") {
    val t = corpus()
    for ((num, den) <- Seq((4, 5), (1, 2), (9, 10))) {
      val truth = brute(t, num, den)
      val cand = PrefixFilterJoin.candidatePairs(t, "doc_id", "w", num, den)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(truth.subsetOf(cand),
        s"tau=$num/$den missing ${truth -- cand}")
    }
  }

  test("verified join equals brute force exactly") {
    val t = corpus()
    val cand = PrefixFilterJoin.candidatePairs(t, "doc_id", "w", 4, 5)
    val got = MinHashLsh.verifyJaccard(cand, t, "doc_id", "w", 4, 5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(t, 4, 5))
    // docs 1,2 identical; 3 differs from each by one token (J=10/12);
    // 4,5,6 relate to no one at 0.8 despite the shared hot token
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("prefix index is a strict subset of the full posting index and " +
      "excludes the globally hottest token at tau=0.8") {
    val t = corpus()
    // reconstruct the prefix the operator indexes (same definitions)
    val dfc = t.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val sizes = t.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val ranked = t.join(dfc, "w")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("df"), col("w"))))
      .join(sizes, "doc_id")
      .filter(col("rk") <= col("n") - expr("(n * 4 + 4) div 5") + lit(1))
    val prefixRows = ranked.count()
    assert(prefixRows < t.count())
    // "the" appears in all 6 docs (max df) — never in any 11-token
    // doc's 3-slot prefix
    assert(ranked.filter(col("w") === "the").count() == 0)
  }
}
