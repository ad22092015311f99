package graft.operators

import graft.LocalSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite


/** Pins the declared contract of the exact within-block kNN join
  * (`llm_knn_join`): (1) the block-cardinality guard fails fast —
  * before any quadratic work — with a message pointing at the IVF
  * path; (2) at or under the bound, results equal a brute-force
  * local model; (3) the bound is inclusive (== maxBlockSize passes).
  */
class KnnJoinSpec extends AnyFunSuite {

  private lazy val spark = LocalSpark.spark

  /** n vectors at irregular ring angles (0.7·i — no two pairs at the
    * same angular distance, so every similarity comparison has a fat
    * margin and float evaluation order cannot flip a rank). */
  private def vec(i: Int): Seq[Double] = {
    val a = 0.7 * i
    Seq(math.cos(a), math.sin(a), 0.03 * i)
  }

  private def corpus(n: Int, labels: Int => String): DataFrame = {
    val rows = (0 until n).map(i => (i.toLong, labels(i), vec(i)))
    spark.createDataFrame(rows).toDF("vec_id", "label", "embedding")
  }

  test("guard fails fast on an oversized label block, naming the IVF path") {
    val df = corpus(12, _ => "hot") // one block of 12
    val e = intercept[IllegalArgumentException] {
      KnnJoin.exactWithinBlocks(df, "vec_id", "label", "embedding",
        k = 3, maxBlockSize = 10L)
    }
    assert(e.getMessage.contains("quadratic"))
    assert(e.getMessage.contains("llm_ann_knn"))
    assert(e.getMessage.contains("maxBlockSize=10"))
  }

  test("NULL labels are exempt from the guard (they join to nothing)") {
    val rows = (0 until 12).map(i =>
      (i.toLong, if (i < 4) "a" else null, vec(i)))
    val df = spark.createDataFrame(rows)
      .toDF("vec_id", "label", "embedding")
    // 8 null-label rows exceed maxBlockSize=5 but cost zero pairs —
    // the guard must not trip; output covers only the real block
    val out = KnnJoin.exactWithinBlocks(df, "vec_id", "label", "embedding",
      k = 2, maxBlockSize = 5L)
    assert(out.count() === 8L) // 4 labeled probes x 2 neighbors
  }

  test("block exactly at maxBlockSize passes the guard") {
    val df = corpus(10, _ => "hot")
    val out = KnnJoin.exactWithinBlocks(df, "vec_id", "label", "embedding",
      k = 2, maxBlockSize = 10L)
    assert(out.count() === 20L) // 10 probes x 2 neighbors
  }

  test("exact within bounded blocks matches the brute-force model") {
    val df = corpus(24, i => s"b${i % 3}") // 3 blocks of 8
    val got = KnnJoin
      .exactWithinBlocks(df, "vec_id", "label", "embedding",
        k = 3, maxBlockSize = 8L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap

    // local brute force with the same tie-breaks (sim desc, id asc)
    val vecs = (0 until 24).map(i => i.toLong -> vec(i).toArray).toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val d = x.zip(y).map { case (a, b) => a * b }.sum
      d / (math.sqrt(x.map(a => a * a).sum) * math.sqrt(y.map(a => a * a).sum))
    }
    val expected = for {
      i <- 0L until 24L
      block = (0L until 24L).filter(j => j != i && j % 3 == i % 3)
      (j, rank) <- block
        .map(j => (j, cos(vecs(i), vecs(j))))
        .sortBy { case (j, s) => (-s, j) }
        .take(3).map(_._1).zipWithIndex
    } yield (i, rank + 1) -> j
    assert(got === expected.toMap)
  }
}
