package graft.operators

import graft.LocalSpark
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[SequencePack]]'s next-fit semantics against a sequential
  * reference fold, plus the invariants that make packed output usable
  * as training shards: capacity is respected (except single oversized
  * docs), pack ids are dense and monotone in doc order, and every doc
  * appears exactly once.
  */
class SequencePackSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(r.passed, r.status.toString)
  }

  /** Sequential next-fit reference: the spec the distributed operator
    * must reproduce per group. */
  private def referencePack(toks: Seq[(Long, Int)], cap: Int): Map[Long, Long] = {
    var pack = 0L; var fill = 0L
    toks.sortBy(_._1).map { case (id, tok) =>
      if (fill > 0 && fill + tok > cap) { pack += 1; fill = 0 }
      fill += tok
      id -> pack
    }.toMap
  }

  private val docsGen: Gen[List[(Long, String, Long, Int)]] =
    Gen.listOfN(80, for {
      id <- Gen.chooseNum(0L, 500L)
      g <- Gen.oneOf("en", "fr", "zh")
      sh <- Gen.chooseNum(0L, 2L)
      tok <- Gen.chooseNum(1, 150) // some docs exceed cap=100 on their own
    } yield (id, g, sh, tok))

  test("matches the sequential next-fit reference per group") {
    import spark.implicits._
    check(Prop.forAll(docsGen) { rows0 =>
      val rows = rows0.distinctBy(_._1) // unique doc ids
      rows.isEmpty || {
        val df = rows.toDF("doc_id", "lang", "shard", "tok")
        val out = SequencePack(df, "doc_id", "tok", "lang", "shard", 100)
          .as[(Long, String, Long, Long, Int)].collect()
        val expected = rows.groupBy(r => (r._2, r._3)).flatMap {
          case (_, grp) => referencePack(grp.map(r => (r._1, r._4)), 100)
        }
        out.length == rows.size &&
          out.forall { case (id, _, _, packId, _) => expected(id) == packId }
      }
    })
  }

  /** Sequential FFD reference: descending token order (ties: id asc),
    * each doc into the first open bin with room. */
  private def referenceFfd(toks: Seq[(Long, Int)], cap: Int): Map[Long, Long] = {
    val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
    toks.sortBy { case (id, tok) => (-tok, id) }.map { case (id, tok) =>
      var i = 0
      while (i < fills.length && fills(i) + tok > cap) i += 1
      if (i == fills.length) fills += 0L
      fills(i) += tok
      id -> i.toLong
    }.toMap
  }

  test("FFD matches the sequential first-fit-decreasing reference per group") {
    import spark.implicits._
    check(Prop.forAll(docsGen) { rows0 =>
      val rows = rows0.distinctBy(_._1)
      rows.isEmpty || {
        val df = rows.toDF("doc_id", "lang", "shard", "tok")
        val out = SequencePack
          .firstFitDecreasing(df, "doc_id", "tok", "lang", "shard", 100)
          .as[(Long, String, Long, Long, Int)].collect()
        val expected = rows.groupBy(r => (r._2, r._3)).flatMap {
          case (_, grp) => referenceFfd(grp.map(r => (r._1, r._4)), 100)
        }
        out.length == rows.size &&
          out.forall { case (id, _, _, packId, _) => expected(id) == packId }
      }
    })
  }

  test("FFD respects capacity on random input") {
    import spark.implicits._
    check(Prop.forAll(docsGen) { rows0 =>
      val rows = rows0.distinctBy(_._1)
      rows.isEmpty || {
        val df = rows.toDF("doc_id", "lang", "shard", "tok")
        SequencePack
          .firstFitDecreasing(df, "doc_id", "tok", "lang", "shard", 100)
          .as[(Long, String, Long, Long, Int)].collect()
          .groupBy(r => (r._2, r._3)).forall { case (_, grp) =>
            grp.groupBy(_._4).values.forall(p =>
              p.map(_._5.toLong).sum <= 100 || p.size == 1)
          }
      }
    })
  }

  test("FFD beats next-fit on order-adversarial input (the reason it exists)") {
    // Alternating 60/50 in id order, cap 100: next-fit can never pair
    // anything (60+50 and 50+60 both overflow) → one pack per doc;
    // FFD packs the 50s pairwise → 3n/4 packs. (NOT asserted as a
    // universal ≤ — FFD's 11/9·OPT worst cases CAN lose to a luckily
    // ordered next-fit; per-instance dominance is not a theorem.)
    import spark.implicits._
    val n = 40
    val rows = (0 until n).map(i =>
      (i.toLong, "en", 0L, if (i % 2 == 0) 60 else 50))
    val df = rows.toDF("doc_id", "lang", "shard", "tok")
    def packs(out: Array[(Long, String, Long, Long, Int)]): Int =
      out.map(_._4).distinct.length
    val nf = packs(SequencePack(df, "doc_id", "tok", "lang", "shard", 100)
      .as[(Long, String, Long, Long, Int)].collect())
    val ffd = packs(SequencePack
      .firstFitDecreasing(df, "doc_id", "tok", "lang", "shard", 100)
      .as[(Long, String, Long, Long, Int)].collect())
    assert(nf === n) // every doc alone
    assert(ffd === n / 2 + n / 4) // 20 singleton 60s + 10 paired-50 packs
  }

  test("capacity respected except single oversized docs; pack ids dense & monotone") {
    import spark.implicits._
    check(Prop.forAll(docsGen) { rows0 =>
      val rows = rows0.distinctBy(_._1)
      rows.isEmpty || {
        val df = rows.toDF("doc_id", "lang", "shard", "tok")
        val out = SequencePack(df, "doc_id", "tok", "lang", "shard", 100)
          .as[(Long, String, Long, Long, Int)].collect()
        out.groupBy(r => (r._2, r._3)).forall { case (_, grp) =>
          val byPack = grp.groupBy(_._4)
          val packIds = byPack.keys.toSeq.sorted
          val dense = packIds == (0L until packIds.size.toLong)
          val fits = byPack.values.forall(p =>
            p.map(_._5.toLong).sum <= 100 || p.size == 1)
          // pack id never decreases as doc id increases
          val monotone = grp.sortBy(_._1).map(_._4)
            .sliding(2).forall(w => w.size < 2 || w(0) <= w(1))
          dense && fits && monotone
        }
      }
    })
  }
}
