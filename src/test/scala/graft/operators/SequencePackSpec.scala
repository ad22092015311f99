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
