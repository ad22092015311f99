package graft.operators

import graft.{LocalSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the power-iteration contract: on a corpus with a planted
  * dominant direction the returned loadings recover it; the result is
  * deterministic across runs; and the eigenvalue is a valid Rayleigh
  * share of the total scatter. */
class PcaPowerSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  /** 200 vectors in R^16: x_i = a_i·u + small deterministic noise,
    * a_i ∈ {-3…3}, u = normalized(1, 2, …, 16). No rand(): noise is a
    * fixed trig-free integer pattern scaled down. */
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

  test("recovers a planted dominant direction") {
    val (df, u) = planted()
    val (v, lam, tot) = PcaPower.dominant(df, "embedding")
    val cos = v.zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.99, s"cos(v, planted) = $cos")
    assert(lam > 0 && lam <= tot + 1e-9, s"lambda=$lam total=$tot")
  }

  test("deterministic across runs and sign-canonical") {
    val (df, _) = planted()
    val (v1, l1, _) = PcaPower.dominant(df, "embedding")
    val (v2, l2, _) = PcaPower.dominant(df, "embedding")
    assert(v1.toSeq == v2.toSeq && l1 == l2)
    val m = v1.indices.maxBy(i => (math.abs(v1(i)), -i))
    assert(v1(m) > 0, "largest-magnitude loading must be positive")
    assert(math.abs(v1.map(e => e * e).sum - 1.0) < 1e-9, "unit norm")
  }

  test("explained-scatter share on the testdata corpus is sane") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val (v, lam, tot) = PcaPower.dominant(e, "embedding")
    assert(v.length == 64)
    // near-isotropic synthetic embeddings: the top component explains
    // more than the 1/64 isotropic floor but nowhere near everything
    assert(lam / tot > 1.0 / 64 && lam / tot < 0.9, s"evr=${lam / tot}")
  }
}
