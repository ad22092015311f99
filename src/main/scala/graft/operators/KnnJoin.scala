package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact k-nearest-neighbor JOIN within label blocks, with a hard
  * block-cardinality guard.
  *
  * The candidate frame of an exact within-block kNN is quadratic in
  * the block size: a block of n vectors yields n·(n−1) pairs. That is
  * the right plan when blocks are bounded (per-tenant, per-language,
  * per-shard spaces of up to ~10⁵ vectors — ~10¹⁰ dot products spread
  * across a cluster), and a non-starter when one label dominates a
  * 100 TB corpus. This operator makes the boundary explicit: it
  * FAILS FAST — before launching the quadratic join — if any block
  * exceeds `maxBlockSize`, pointing at the IVF path
  * ([[AnnIvf.knnJoin]], query `llm_ann_knn`) whose candidate frame is
  * corpus × nprobe/numCells regardless of label skew.
  *
  * The guard is one aggregation pass over (label) — map-side combined,
  * tiny result — run as a separate action so the quadratic stage is
  * never even scheduled on oversized input.
  *
  * Scale shape of the join itself: embeddings are L2-normalized once
  * per row (each pair then costs a single dot product — the codegen'd
  * [[graft.functions.VectorFunctions.dotProduct]]), pairs come from a
  * label equi-join (hash-partitioned by label, never a cross join),
  * and the per-probe top-k `row_number <= k` filter is planned as
  * WindowGroupLimit, so each map task keeps at most k candidates per
  * probe before the window shuffle.
  */
object KnnJoin {

  private def dotd(x: Column, y: Column): Column =
    graft.functions.VectorFunctions.dotProduct(x, y)

  /** Exact top-`k` neighbors per vector within its `labelCol` block.
    * Output: (idCol, rank, nbr_id) ordered by similarity desc with
    * deterministic id tie-breaks — rank-only, no floats escape.
    *
    * @throws IllegalArgumentException if any label block holds more
    *         than `maxBlockSize` vectors (use [[AnnIvf.knnJoin]]).
    */
  def exactWithinBlocks(vectors: DataFrame, idCol: String,
      labelCol: String, embCol: String, k: Int,
      maxBlockSize: Long = DefaultMaxBlockSize): DataFrame = {
    // NULL labels never satisfy the equi-join below (no candidate
    // pairs), so they cost nothing and are exempt from the bound.
    val oversized = vectors.filter(col(labelCol).isNotNull)
      .groupBy(col(labelCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBlockSize)
      .orderBy(desc("n"))
      .limit(1)
      .collect()
    require(oversized.isEmpty, {
      val r = oversized.head
      s"exact kNN join is quadratic in label-block size: block " +
        s"'${r.get(0)}' has ${r.getLong(1)} vectors " +
        s"(> maxBlockSize=$maxBlockSize), i.e. ~${r.getLong(1)}^2 " +
        s"candidate pairs. Use the IVF path (AnnIvf.knnJoin / " +
        s"llm_ann_knn) for unbounded corpora, or raise maxBlockSize " +
        s"if the quadratic cost is intended."
    })

    // L2-normalize once per row; each pair below is one dot product.
    val unit = {
      val asD = transform(col(embCol), x => x.cast("double"))
      vectors
        .withColumn("__d", asD)
        .withColumn("__norm", sqrt(dotd(col("__d"), col("__d"))))
        .withColumn("__unit", transform(col("__d"), x => x / col("__norm")))
        .drop("__d", "__norm")
    }
    val l = unit.select(col(idCol), col(labelCol), col("__unit"))
    val r = unit.select(col(idCol).as("nbr_id"),
      col(labelCol).as("__label_r"), col("__unit").as("__unit_r"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(desc("sim"), asc("nbr_id"))
    l.join(r, l(labelCol) === r("__label_r") && l(idCol) =!= r("nbr_id"))
      .withColumn("sim", dotd(col("__unit"), col("__unit_r")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("nbr_id"))
  }

  /** Past this, the quadratic block cost (~10¹⁰ pairs) stops being a
    * sane default and the IVF path should be chosen explicitly. */
  val DefaultMaxBlockSize: Long = 100000L
}
