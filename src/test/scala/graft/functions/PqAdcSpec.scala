package graft.functions

import graft.LocalSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native PqAdcL1 expression must match the HOF fold it replaced
  * bit for bit (pure integer arithmetic, so this is exact equality,
  * not float discipline), keep null/ragged semantics, and be
  * reachable from SQL via GraftExtensions.
  */
class PqAdcSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bit-identical to the HOF fold over real PQ codes") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("xu", expr(
        "transform(embedding, " +
          "x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
      .withColumn("digits", expr(
        "transform(sequence(0, 7), j -> least(greatest(" +
          "(aggregate(slice(xu, j * 8 + 1, 8), 0L, (a, v) -> a + v) " +
          "div 8 + 1000000) div 250000, 0L), 7L))"))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("xu").as("probe_u"))
    val mismatches = e.crossJoin(broadcast(probe))
      .withColumn("native", expr("pq_adc_l1(probe_u, digits)"))
      .withColumn("hof", expr(
        "aggregate(sequence(0, 63), 0L, (a, i) -> a + " +
          "abs(element_at(probe_u, CAST(i + 1 AS INT)) - " +
          "(element_at(digits, CAST(i div 8 + 1 AS INT)) * 250000 " +
          "- 875000)))"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches === 0)
  }

  test("known grid values: digit d reconstructs to d*250000 - 875000") {
    import spark.implicits._
    // probe of 4 elements, 2 digits -> subvector width 2
    val df = Seq((Array(0L, 0L, 1000000L, 1000000L), Array(0L, 7L)))
      .toDF("p", "d")
    // digit 0 -> -875000 (|0 - -875000| = 875000 each);
    // digit 7 -> 875000 (|1000000 - 875000| = 125000 each)
    val got = df.select(VectorFunctions.pqAdcL1(col("p"), col("d")))
      .head().getLong(0)
    assert(got === 2 * 875000L + 2 * 125000L)
  }

  test("ragged codes and null sides yield null — never a partial distance") {
    import spark.implicits._
    // 5 elements over 2 digits: not divisible -> null
    val ragged = Seq((Array(1L, 2L, 3L, 4L, 5L), Array(1L, 2L)))
      .toDF("p", "d")
    assert(ragged.select(VectorFunctions.pqAdcL1(col("p"), col("d")))
      .head().isNullAt(0))
    val emptyCode = Seq((Array(1L, 2L), Array.empty[Long])).toDF("p", "d")
    assert(emptyCode.select(VectorFunctions.pqAdcL1(col("p"), col("d")))
      .head().isNullAt(0))
    val withNull = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]]))
      .toDF("p", "d")
    assert(withNull.select(VectorFunctions.pqAdcL1(col("p"), col("d")))
      .head().isNullAt(0))
  }
}
