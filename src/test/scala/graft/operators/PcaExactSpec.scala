package graft.operators

import graft.{LocalSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fixed-point eigensolve behind `llm_pca_exact` (squaring +
  * power iteration on the exact integer covariance, LlmOps
  * .pcaExactSql): on a corpus with a planted dominant direction the
  * max-normalized loadings recover it; the output is deterministic,
  * sign-canonical, max-normalized; and the Rayleigh eigenvalue is a
  * valid share of the trace. The cross-engine bit-equality of the
  * same SQL text is what the CORRECTNESS gate hash-checks. */
class PcaExactSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  /** Same planted corpus as PcaPowerSpec: 200 vectors in R^16,
    * x_i = a_i*u + fixed integer-pattern noise, u = normalized
    * (1, 2, ..., 16). */
  private def planted() = {
    import spark.implicits._
    val d = 16
    val uRaw = (1 to d).map(_.toDouble).toArray
    val un = math.sqrt(uRaw.map(e => e * e).sum)
    val u = uRaw.map(_ / un)
    val rows = (0 until 200).map { i =>
      val a = (i % 7 - 3).toDouble
      val x = (0 until d).map { p =>
        (a * u(p) + ((i * 31 + p * 17) % 11 - 5) * 0.01).toFloat
      }
      (i.toLong, x)
    }
    (rows.toDF("vec_id", "embedding"), u)
  }

  private def solve(df: org.apache.spark.sql.DataFrame) =
    graft.ops.LlmOps.pcaExact(spark, graft.ops.LlmOps.covCellsOf(df))
      .collect().sortBy(_.getInt(0))

  test("recovers a planted dominant direction, max-normalized and sign-canonical") {
    val (df, u) = planted()
    val rows = solve(df)
    assert(rows.length == 16)
    val v = rows.map(_.getLong(1).toDouble)
    val vn = math.sqrt(v.map(e => e * e).sum)
    val cos = v.zip(u).map { case (a, b) => a / vn * b }.sum
    assert(math.abs(cos) > 0.999, s"cos(loading, planted) = $cos")
    // max-norm contract: the largest |loading| is exactly 10^6 and
    // positive (sign canonicalization)
    val m = v.map(math.abs).max
    assert(m == 1e6, s"max |loading_u| = $m")
    assert(v(v.indices.maxBy(i => (math.abs(v(i)), -i))) > 0)
    // eigenvalue is a valid share of the trace
    val lam = rows.head.getLong(2)
    val evr = rows.head.getLong(3)
    assert(lam > 0 && evr > 0 && evr <= 1000000L,
      s"lambda=$lam evr_ppm=$evr")
    // the planted direction dominates: it carries most of the scatter
    assert(evr > 500000L, s"planted corpus should have evr >> 0.5: $evr")
  }

  test("deterministic across runs") {
    val (df, _) = planted()
    val a = solve(df).map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val b = solve(df).map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("testdata corpus: near-isotropic evr, full dim, agrees with the generated-SQL contract") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val rows = solve(e)
    assert(rows.length == 64)
    val evr = rows.head.getLong(3)
    // near-isotropic synthetic embeddings: above the 1/64 floor,
    // nowhere near 1 (numpy cross-check: true evr_ppm = 28935 at
    // sf0.001; the fixed-point result matched to the ppm)
    assert(evr > 1000000L / 64 && evr < 900000L, s"evr_ppm=$evr")
  }
}
