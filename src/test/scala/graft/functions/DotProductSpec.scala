package graft.functions

import graft.LocalSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native DotProduct expression must be bit-identical to the
  * higher-order-function fold it replaced (left-to-right double
  * accumulation), on both the float testdata arrays and double arrays,
  * or the DuckDB oracle hashes would drift.
  */
class DotProductSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def hofDot(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the HOF fold on float embeddings") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val mismatches = e
      .withColumn("native", VectorFunctions.dotProduct(
        col("embedding"), col("embedding")))
      .withColumn("hof", hofDot(col("embedding"), col("embedding")))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches === 0)
  }

  test("bit-identical on double arrays (post-normalization shape)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("d", transform(col("embedding"), x => x.cast("double")))
    val mismatches = e
      .withColumn("native", VectorFunctions.dotProduct(col("d"), col("d")))
      .withColumn("hof", aggregate(zip_with(col("d"), col("d"),
        (p, q) => p * q), lit(0.0), (acc, v) => acc + v))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches === 0)
  }

  test("interpreted eval matches codegen (known vector)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val got = df.select(
      VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
      .head().getDouble(0)
    assert(got === (4.0 + 10.0 + 18.0))
  }

  test("ragged arrays yield null, matching the HOF fold (no silent truncation)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val native = df.select(
      VectorFunctions.dotProduct(col("a"), col("b")).as("d")).head()
    assert(native.isNullAt(0))
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
      (p, q) => p * q), lit(0.0), (acc, v) => acc + v).as("d")).head()
    assert(hof.isNullAt(0)) // same semantics as the fold we replaced
  }

  test("null array yields null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
      .head()
    assert(r.isNullAt(0))
  }

  test("non-array input is rejected at analysis time") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorFunctions.dotProduct(col("a"), col("b"))).collect()
    }
  }

  test("dot_product is registered as a SQL function via GraftExtensions") {
    spark.read.parquet(s"$sf/embeddings.parquet")
      .createOrReplaceTempView("emb_sql_test")
    val n = spark.sql(
      """SELECT vec_id, dot_product(embedding, embedding) AS d
        |FROM emb_sql_test WHERE dot_product(embedding, embedding) > 0
        |""".stripMargin).count()
    assert(n > 0)
  }

  test("cosineSim of a vector with itself is 1.0") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val off = e.withColumn("c",
        VectorFunctions.cosineSim(col("embedding"), col("embedding")))
      .filter(abs(col("c") - 1.0) > 1e-9)
      .count()
    assert(off === 0)
  }
}
