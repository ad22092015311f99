package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest-neighbor search over an embedding
  * column.
  *
  * Index build: a deterministic coarse quantizer (the first
  * `numCells` vectors by id act as cell seeds — swap in k-means||
  * centroids at production scale); every vector is assigned to its
  * most-similar seed by a broadcast join, giving an inverted file
  * partitioned by `cell`. At 100 TB the assignment is one broadcast
  * pass over the corpus and the index is written back bucketed by
  * cell, so a query touches only `nprobe / numCells` of the data —
  * that is the entire point vs. the brute-force scan.
  *
  * Query: rank cells by probe-to-seed similarity, scan the top
  * `nprobe` cells, return the exact top-k within them. Results are
  * exact-within-probed-cells (the property the unit test pins).
  */
object AnnIvf {

  private[graft] def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  /** Assign every vector to its nearest seed cell.
    * @return (idCol, cell INT, embedding) */
  def buildIndex(vectors: DataFrame, idCol: String, embCol: String,
      numCells: Int): DataFrame = {
    val seeds = vectors.filter(col(idCol) < numCells)
      .select(col(idCol).cast("int").as("cell"),
        col(embCol).as("seed_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(desc("cell_sim"), asc("cell"))
    vectors.crossJoin(broadcast(seeds))
      .withColumn("cell_sim", cosine(col(embCol), col("seed_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cell"), col(embCol))
  }

  /** Exact top-k within the `nprobe` cells nearest to the probe
    * vector. `probe` must be a single-row frame with column `embCol`. */
  def query(index: DataFrame, probe: DataFrame, idCol: String,
      embCol: String, k: Int, nprobe: Int): DataFrame = {
    val p = probe.select(col(embCol).as("probe_emb"))
    // Rank cells by probe-to-seed similarity using the seed row of
    // each cell (id == cell for seed rows).
    val cells = index.filter(col(idCol) === col("cell").cast("long"))
      .crossJoin(broadcast(p))
      .withColumn("cell_sim", cosine(col(embCol), col("probe_emb")))
      .orderBy(desc("cell_sim"), asc("cell"))
      .limit(nprobe)
      .select(col("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("sim"), asc(idCol))
    index.join(broadcast(cells), "cell")
      .crossJoin(broadcast(p))
      .withColumn("sim", cosine(col(embCol), col("probe_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("rank"), col(idCol), col("cell"))
  }
}
