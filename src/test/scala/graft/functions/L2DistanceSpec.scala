package graft.functions

import graft.LocalSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native L2DistanceSq expression must match the HOF fold's
  * left-to-right double accumulation exactly (the DotProduct
  * discipline), keep the same null/ragged semantics, and be reachable
  * from SQL via GraftExtensions.
  */
class L2DistanceSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def hofL2(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) =>
      (p.cast("double") - q.cast("double")) *
        (p.cast("double") - q.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the HOF fold on float embeddings") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("p"))
    val mismatches = e.crossJoin(broadcast(probe))
      .withColumn("native",
        VectorFunctions.l2DistanceSq(col("embedding"), col("p")))
      .withColumn("hof", hofL2(col("embedding"), col("p")))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches === 0)
  }

  test("interpreted value on a known vector; self-distance is zero") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 6.0, 8.0)))
      .toDF("a", "b")
    val got = df.select(
      VectorFunctions.l2DistanceSq(col("a"), col("b")).as("d"))
      .head().getDouble(0)
    assert(got === (9.0 + 16.0 + 25.0))
    val self = df.select(
      VectorFunctions.l2DistanceSq(col("a"), col("a")).as("d"))
      .head().getDouble(0)
    assert(self === 0.0)
  }

  test("ragged arrays and null sides yield null — no silent partial distance") {
    import spark.implicits._
    val ragged = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(ragged.select(
      VectorFunctions.l2DistanceSq(col("a"), col("b"))).head().isNullAt(0))
    val withNull = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(withNull.select(
      VectorFunctions.l2DistanceSq(col("a"), col("b"))).head().isNullAt(0))
  }

  test("l2_distance_sq is registered as a SQL function via GraftExtensions") {
    val got = spark.sql(
      "SELECT l2_distance_sq(array(1.0D, 2.0D), array(3.0D, 5.0D)) AS d")
      .head().getDouble(0)
    assert(got === (4.0 + 9.0))
  }
}
