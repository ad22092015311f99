package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r12 BPE rewrite's parity (VERDICT r12 item 7 / ADVICE):
  * the Spark side of llm_bpe_train / llm_bpe_apply is a driver loop
  * (TextOps.bpeChain) that hand-implements the semantics the shared
  * SQL text (bpeTrainSql / bpeApplySql) declares — and the oracle
  * still runs that SQL verbatim. This suite executes the SQL text IN
  * SPARK on tiny constructed corpora and asserts the registered
  * queries produce byte-identical rows, covering exactly the branches
  * the sf0.01 oracle corpus never exercises:
  *
  *  - a TIE round (two pairs with equal count → (cnt DESC, a, b)
  *    tie-break),
  *  - an EMPTY-merge round before BpeRounds (best_r empty → seg_r
  *    empties through the CROSS JOIN → no later merges, apply joins
  *    nothing),
  *  - multibyte (non-ASCII) tokens through replace()'s left-to-right
  *    non-overlapping literal semantics.
  */
class BpeParitySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  /** Writes `texts` as a documents.parquet under a fresh tmp dir and
    * returns (dir, view) with the same rows registered as a temp view
    * for the SQL text. */
  private def corpus(name: String, texts: Seq[(Long, String, String)])
      : (String, String) = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(s"bpe-parity-$name").toString
    val df = texts.toDF("doc_id", "lang", "text")
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val view = s"bpe_parity_$name"
    df.createOrReplaceTempView(view)
    (dir, view)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  /** tie in round 1 ((a,b) vs (c,d) both cnt 2 → (a,b) by pair asc);
    * multibyte 'é' merges in rounds 3-4; every word is a single token
    * after round 4, so round 5's best is EMPTY — seg5 empties and
    * apply returns zero rows. */
  private lazy val exhausted = corpus("exhausted", Seq(
    (1L, "en", "ab ab cd"),
    (2L, "fr", "cd héé")))

  /** longer words so all 5 rounds merge and apply is non-empty —
    * including a doubled bigram ("prefix prefixprefix") so replace()'s
    * left-to-right non-overlapping semantics shows in the output. */
  private lazy val live = corpus("live", Seq(
    (1L, "en", "abcdef abcdef ghijkl abcdef"),
    (2L, "de", "ababab ghijkl héhéhé"),
    (3L, "en", "abcdef ghijkl ababab")))

  for ((label, c) <- Seq("exhausted-corpus" -> (() => exhausted),
                         "live-corpus" -> (() => live))) {
    test(s"llm_bpe_train driver loop == bpeTrainSql text ($label)") {
      val (dir, view) = c()
      val engine = rows(SparkEntry.queries("llm_bpe_train")(spark, dir))
      val sql = rows(spark.sql(
        graft.ops.TextOps.bpeTrainSql(spark = true, view)))
      assert(engine == sql)
      if (label == "exhausted-corpus")
        assert(engine.size < graft.ops.TextOps.BpeRounds,
          "corpus must exercise the empty-merge branch")
    }

    test(s"llm_bpe_apply driver loop == bpeApplySql text ($label)") {
      val (dir, view) = c()
      val engine = rows(SparkEntry.queries("llm_bpe_apply")(spark, dir))
      val sql = rows(spark.sql(
        graft.ops.TextOps.bpeApplySql(spark = true, view)))
      assert(engine == sql)
      if (label == "exhausted-corpus")
        assert(engine.isEmpty,
          "empty seg5 must empty the apply join in BOTH renderings")
    }
  }
}
