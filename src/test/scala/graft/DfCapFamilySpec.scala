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

  // A second corpus where the boilerplate is a long SHARED RUN inside
  // otherwise-distinct docs: unique fixed-width prefix (alignment
  // preserved) + a 199-char common tail in 130 docs. Exact dedup sees
  // nothing (no two texts equal); the df-capped shingle family is
  // blind (every tail trigram has df = 130 > 128, and each kept
  // gram contains the doc's unique prefix). llm_dedup_substr is the
  // operator DfCap's doc points at for exactly this case.
  private lazy val runDir: String = {
    val d = java.nio.file.Files.createTempDirectory("dfcaprun").toString
    val tail = (1 to 40).map(i => f"bp$i%02d").mkString(" ") // 199 chars
    val rows = (0L until 130L).map { i =>
      val text = f"q$i%03d " + tail // 5-char prefix keeps windows aligned
      (i, text, "en", "web", text.length.toLong)
    } ++ Seq({
      val lone = (1 to 41).map(i => s"z$i").mkString(" ")
      (300L, lone, "en", "web", lone.length.toLong)
    })
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("duplicated-span detection catches long shared runs the capped " +
      "family and exact dedup both miss") {
    // capped family: blind to the 130-doc shared tail
    val ng = SparkEntry.queries("llm_dedup_ngram")(spark, runDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ng.isEmpty, s"capped ngram dedup should see no pairs: $ng")
    // exact dedup: no byte-identical docs to merge
    val exact = SparkEntry.queries("llm_dedup_exact")(spark, runDir)
      .collect().map(_.getLong(1))
    assert(exact.forall(_ == 1L), "no doc should have exact copies")
    // substring-span detection: the aligned tail windows surface the
    // full 130-doc boilerplate cluster
    val spans = SparkEntry.queries("llm_dedup_substr")(spark, runDir)
      .collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ")))
    assert(spans.nonEmpty, "shared tail must produce duplicated spans")
    assert(spans.exists(_._1 == 130L),
      s"some span must cover all 130 boilerplate docs: ${spans.toSeq}")
  }
}
