package graft.operators

import graft.LocalSpark
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics that the oracle query can't pin (its single
  * carry column is never null): whole-record carry, inclusive ties,
  * and collision detection.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  test("carries the latest right row WHOLE — no field mixing across rows") {
    import spark.implicits._
    // r2 is newest and has ask=null; the left row must see r2's
    // (bid=20, ask=null), NOT r2.bid combined with r1.ask.
    val right = Seq((1, 1L, 101L, Some(10.0), Some(11.0)),
        (1, 2L, 102L, Some(20.0), Option.empty[Double]))
      .toDF("k", "ts", "seq", "bid", "ask")
    val left = Seq((1, 3L, 103L, "probe")).toDF("k", "ts", "seq", "tag")
    val out = AsOfJoin(left, right, key = "k", tsCol = "ts", seqCol = "seq",
      carry = Map("bid" -> "bid_q", "ask" -> "ask_q")).head()
    assert(out.getAs[Double]("bid_q") == 20.0)
    assert(out.isNullAt(out.fieldIndex("ask_q")),
      "stale ask from an older right row leaked through")
  }

  test("a right row at exactly the left timestamp matches (inclusive)") {
    import spark.implicits._
    val right = Seq((1, 5L, 201L, 7.0)).toDF("k", "ts", "seq", "v")
    val left = Seq((1, 5L, 202L, "x")).toDF("k", "ts", "seq", "tag")
    val out = AsOfJoin(left, right, "k", "ts", "seq",
      Map("v" -> "v_asof")).head()
    assert(out.getAs[Double]("v_asof") == 7.0)
  }

  test("no right row before the left row leaves nulls, not garbage") {
    import spark.implicits._
    val right = Seq((1, 9L, 301L, 7.0)).toDF("k", "ts", "seq", "v")
    val left = Seq((1, 2L, 302L, "early")).toDF("k", "ts", "seq", "tag")
    val out = AsOfJoin(left, right, "k", "ts", "seq",
      Map("v" -> "v_asof")).head()
    assert(out.isNullAt(out.fieldIndex("v_asof")))
  }

  test("carry destination colliding with a left column is rejected") {
    import spark.implicits._
    val right = Seq((1, 1L, 1L, 1.0)).toDF("k", "ts", "seq", "v")
    val left = Seq((1, 2L, 2L, "x")).toDF("k", "ts", "seq", "tag")
    intercept[IllegalArgumentException] {
      AsOfJoin(left, right, "k", "ts", "seq", Map("v" -> "tag"))
    }
  }
}
