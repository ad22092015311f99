package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the declared df-cap semantics of the shingle-Jaccard dedup
  * family (DedupOps.DfCap) on a synthetic corpus that actually
  * exceeds the cap — something the driver testdata never does:
  *
  *  - the cap is UNIFORM: minhash-LSH and the exact inverted-index
  *    variant are blind to the same pairs (a boilerplate-only
  *    duplicate group is invisible to both, not just to one);
  *  - the declared fallback holds: boilerplate-only duplicates are
  *    still caught by exact dedup, and stay singleton clusters in the
  *    CC labeling;
  *  - discriminative near-dups are found by both family members.
  *
  * Corpus: 130 byte-identical docs of pure boilerplate (every trigram
  * has df = 130 > DfCap = 128), one near-dup pair with unique tokens,
  * one unrelated doc.
  */
class DfCapFamilySpec extends AnyFunSuite {

  private lazy val spark = LocalSpark.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("dfcap").toString
    val boiler = (1 to 10).map(i => s"c$i").mkString(" ")
    val near1 = (1 to 12).map(i => s"u$i").mkString(" ")
    val near2 = (1 to 11).map(i => s"u$i").mkString(" ") + " u13"
    val lone = (1 to 10).map(i => s"z$i").mkString(" ")
    val rows =
      (0L until 130L).map(i => (i, boiler, "en", "web", boiler.length.toLong)) ++
        Seq((200L, near1, "en", "web", near1.length.toLong),
          (201L, near2, "en", "web", near2.length.toLong),
          (300L, lone, "en", "web", lone.length.toLong))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def pairs(q: String): Set[(Long, Long)] =
    SparkEntry.queries(q)(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash and the exact inverted index are blind to the same " +
      "boilerplate group and find the same discriminative near-dup") {
    val mh = pairs("llm_dedup_minhash")
    val ng = pairs("llm_dedup_ngram")
    // both find the real near-dup (shingle J = 9/11 clears both bars)
    assert(mh === Set((200L, 201L)))
    assert(ng.contains((200L, 201L)))
    // family-consistent blindness: no member sees any pair among the
    // 130 IDENTICAL boilerplate docs (every gram capped out)
    assert(!mh.exists { case (a, b) => a < 130 || b < 130 })
    assert(!ng.exists { case (a, b) => a < 130 || b < 130 })
  }

  test("declared fallback: boilerplate-only duplicates are caught by " +
      "exact dedup and stay singleton clusters") {
    val exact = SparkEntry.queries("llm_dedup_exact")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact(0L) === 130L) // one canonical row for the 130 copies
    val clusters = SparkEntry.queries("llm_dedup_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 130L).forall(i => clusters(i) == i)) // singletons
    assert(clusters(201L) === 200L) // the real near-dup still clusters
  }
}
