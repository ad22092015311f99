package graft.operators

import graft.LocalSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SimHash machinery directly (llm_dedup_simhash's exact
  * J = 1 form blocks on the whole fingerprint and never exercises the
  * segment join, so the pigeonhole guarantee lives here):
  * fingerprints of similar token sets are hamming-close, and
  * candidatePairs NEVER misses a pair within its declared distance —
  * the d+1-segment pigeonhole is a hard guarantee, not a probability.
  */
class SimHashSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  import spark.implicits._

  private def tokensOf(docs: (Long, String)*) =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))

  test("identical token sets get identical fingerprints; one swapped token flips few bits") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val t = tokensOf(
      (1L, base), (2L, base),
      (3L, base.replace("tok7", "zzz7")))
    val fp = SimHash.fingerprints(t, "doc_id", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    val d = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    assert(d > 0 && d <= 16, s"one-token swap should flip few bits, got $d")
  }

  test("pigeonhole candidates catch EVERY pair within the declared distance") {
    // plant fingerprints at controlled distances around a base value;
    // candidatePairs(maxDist = 3) must surface every pair whose true
    // distance is <= 3 (pigeonhole over 4 segments is exhaustive)
    val base = 0x0123456789ABCDEFL
    def flip(v: Long, bits: Int*) = bits.foldLeft(v)((a, b) => a ^ (1L << b))
    val fps = Seq(
      (1L, base),
      (2L, flip(base, 0)),          // d(1,2)=1
      (3L, flip(base, 5, 21, 40)),  // d(1,3)=3
      (4L, flip(base, 1, 17, 33, 49)), // d(1,4)=4 — one flip per segment
      (5L, ~base)                   // far away
    ).toDF("doc_id", "simhash")
    val got = SimHash.candidatePairs(fps, "doc_id", maxDist = 3)
      .as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))
    assert(got.contains((1L, 3L)))
    // d(2,3) = 4 exceeds maxDist: shares a segment (a candidate) but
    // the hamming filter rejects it
    assert(!got.contains((2L, 3L)))
    // distance-4 with one flip in EVERY 16-bit segment shares no
    // segment with the base — the pigeonhole bound is tight
    assert(!got.contains((1L, 4L)))
    assert(!got.contains((1L, 5L)))
  }
}
