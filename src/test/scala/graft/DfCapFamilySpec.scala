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

  test("containment catches a short doc embedded in a long one where " +
      "symmetric Jaccard stays below its threshold") {
    // The Broder-containment claim from the SURVEY row: doc A (11
    // tokens → 9 shingles) verbatim inside doc B with 200 extra
    // tokens → J = 9/209 ≈ 0.043 < 0.05 (llm_dedup_ngram's gate), but
    // C = 9/min(9, 209) = 1.0 ≥ 0.8 — only the asymmetric measure
    // sees the embedding.
    val d = java.nio.file.Files.createTempDirectory("contain").toString
    val short = (1 to 11).map(i => s"s$i").mkString(" ")
    val long = short + " " + (1 to 200).map(i => s"x$i").mkString(" ")
    val rows = Seq((1L, short, "en", "web", short.length.toLong),
      (2L, long, "en", "web", long.length.toLong))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    def pairSet(q: String): Set[(Long, Long)] =
      SparkEntry.queries(q)(spark, d)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet("llm_dedup_containment") === Set((1L, 2L)))
    assert(!pairSet("llm_dedup_ngram").contains((1L, 2L)))
    val contained = SparkEntry.queries("llm_dedup_containment")(spark, d)
      .select("contained").head().getLong(0)
    assert(contained === 1L)
  }

  test("winnowing: docs sharing a run of >= k+w-1 chars share a " +
      "fingerprint hash at ANY alignment; disjoint docs share none") {
    // The theorem that makes winnowing the answer to llm_dedup_substr's
    // declared stride-alignment sensitivity (SURVEY row): a shared run
    // of >= k+w-1 = 11 chars contains at least one FULL window of w
    // k-grams; within the run both docs see the identical hash
    // sequence in the same relative order, so the leftmost-min
    // selection picks the same HASH (positions differ — compare the
    // unpacked sel div 2^20 component). Checked at several offsets,
    // including ones misaligned with llm_dedup_substr's 32-stride.
    import org.apache.spark.sql.functions.{col, explode}
    val run = "the_shared_run_of_text_42"
    def hashes(text: String, off: Int): Set[Long] = {
      val df = spark.createDataFrame(Seq((1L, text)))
        .toDF("doc_id", "text")
      graft.ops.TextOps.winnowFps(df)
        .select(explode(col("fps")).as("sel")).collect()
        .map(_.getLong(0) / 1048576L).toSet
    }
    val base = hashes("aaaaaaaaaaaaa" + run + "bbbb", 0)
    for (off <- Seq(0, 1, 5, 17, 31)) {
      val other = hashes(("c" * off) + run + "dddddddd", off)
      assert(base.intersect(other).nonEmpty,
        s"no shared fingerprint hash at offset $off")
    }
    // negative control: disjoint-alphabet docs share nothing
    val disjoint = hashes("xyzwvu_totally_different_payload_q", 0)
    assert(base.intersect(disjoint).isEmpty)
  }

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
