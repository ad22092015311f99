package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dominant principal component of an embedding corpus via distributed
  * power iteration — the building block behind PCA whitening, spectral
  * outlier pruning, and embedding-drift monitoring in training-data
  * pipelines.
  *
  * Each iteration is ONE pass over the corpus: score every vector with
  * the broadcast current direction (codegen dot product), then
  * accumulate the d-dimensional update in a single (pos)-keyed hash
  * aggregation — the driver only ever sees d rows per round (d = 64
  * here), never vectors. Centering is algebraic (x·s sums corrected by
  * μ·Σs), so the arrays are never materialized centered. At 100 TB:
  * `iters` broadcast scans + tiny shuffles; no driver-side corpus
  * work. Deterministic: fixed uniform init, fixed iteration count, no
  * rand(); the returned direction's sign is canonicalized (largest-
  * magnitude loading positive) so runs and engines agree.
  */
object PcaPower {

  /** @return (unit loadings[d], eigenvalue λ of the scatter matrix,
    *         total scatter Σ‖x−μ‖²) */
  def dominant(vectors: DataFrame, embCol: String,
      iters: Int = 8): (Array[Double], Double, Double) = {
    val x = vectors
      .select(transform(col(embCol), e => e.cast("double")).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = x.count().toDouble
      val perPos = x.select(posexplode(col("x")).as(Seq("pos", "v")))
        .groupBy(col("pos"))
        .agg(sum(col("v")).as("s"), sum(col("v") * col("v")).as("ss"))
        .orderBy(col("pos")).collect()
      val d = perPos.length
      // empty corpus: no positions, no direction — stay total
      if (n == 0 || d == 0) return (Array.empty[Double], 0.0, 0.0)
      val mu = perPos.map(r => r.getDouble(1) / n)
      val totalScatter =
        perPos.map(_.getDouble(2)).sum - n * mu.map(m => m * m).sum
      var v = Array.fill(d)(1.0 / math.sqrt(d))
      var lambda = 0.0
      for (_ <- 0 until iters) {
        val vlit = array(v.toSeq.map(lit): _*)
        val muDotV = mu.zip(v).map { case (a, b) => a * b }.sum
        // s_i = (x_i − μ)·v; w_p = Σ_i (x_ip − μ_p)·s_i
        //     = Σ_i x_ip·s_i − μ_p·Σ_i s_i  (one grouped pass)
        val agg = x
          .withColumn("sc",
            graft.functions.VectorFunctions.dotProduct(col("x"), vlit)
              - lit(muDotV))
          .select(col("sc"), posexplode(col("x")).as(Seq("pos", "xv")))
          .groupBy(col("pos"))
          .agg(sum(col("xv") * col("sc")).as("a"), sum(col("sc")).as("b"))
          .orderBy(col("pos")).collect()
        val w = agg.map(r =>
          r.getDouble(1) - mu(r.getInt(0)) * r.getDouble(2))
        lambda = math.sqrt(w.map(e => e * e).sum)
        v = w.map(_ / lambda)
      }
      // canonical sign: the largest-magnitude loading is positive
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v = v.map(-_)
      (v, lambda, totalScatter)
    } finally { x.unpersist(); () }
  }
}
