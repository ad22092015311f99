package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest-neighbor search over an embedding
  * column.
  *
  * Index build: deterministic seeding (the first `numCells` vectors by
  * id) followed by `refineIters` Lloyd iterations run entirely as
  * DataFrame ops — assign every vector to its most-similar centroid via
  * a broadcast join, recompute each centroid as the elementwise mean of
  * its members (posexplode → per-(cell, pos) avg → re-collect), repeat.
  * At 100 TB each iteration is one broadcast pass over the corpus plus
  * one aggregation keyed by (cell, dim); the centroid table is
  * `numCells × dim` doubles — always broadcastable.
  *
  * Query: rank cells by probe-to-centroid similarity, scan the top
  * `nprobe` cells, return the exact top-k within them. Results are
  * exact-within-probed-cells (the property the unit test pins); a
  * query touches `~nprobe / numCells` of the data — that is the entire
  * point vs. the brute-force scan.
  */
object AnnIvf {

  private[graft] def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  /** Index = per-vector cell assignment + the cell centroids. */
  final case class IvfIndex(assignments: DataFrame, centroids: DataFrame)

  // max_by argmax, not a row_number window: the aggregation combines
  // map-side, so the corpus×numCells candidate frame is reduced before
  // the shuffle instead of shuffled-and-sorted whole (same reasoning as
  // cdc_snapshot_latest). Ties break to the LOWEST cell via -cell in
  // the ordering struct.
  private def assign(vectors: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame): DataFrame = {
    vectors.crossJoin(broadcast(centroids))
      .withColumn("cell_sim", cosine(col(embCol), col("centroid")))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("cell"), col(embCol).as("emb")),
        struct(col("cell_sim"), (-col("cell")).as("tie"))).as("best"))
      .select(col(idCol), col("best.cell").as("cell"),
        col("best.emb").as(embCol))
  }

  /** Elementwise mean of each cell's member vectors. */
  private def recompute(assigned: DataFrame, embCol: String): DataFrame = {
    assigned
      .select(col("cell"), posexplode(col(embCol)).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("centroid"))
  }

  /** Build the inverted file: seed deterministically, refine with
    * `refineIters` Lloyd iterations, assign with the final centroids. */
  def buildIndex(vectors: DataFrame, idCol: String, embCol: String,
      numCells: Int, refineIters: Int = 1): IvfIndex = {
    var centroids = vectors.filter(col(idCol) < numCells)
      .select(col(idCol).cast("int").as("cell"),
        transform(col(embCol), x => x.cast("double")).as("centroid"))
    (1 to refineIters).foreach { _ =>
      centroids = recompute(
        assign(vectors, idCol, embCol, centroids), embCol)
    }
    IvfIndex(assign(vectors, idCol, embCol, centroids), centroids)
  }

  /** Exact top-k within the `nprobe` cells nearest to the probe
    * vector. `probe` must be a single-row frame with column `embCol`. */
  def query(index: IvfIndex, probe: DataFrame, idCol: String,
      embCol: String, k: Int, nprobe: Int): DataFrame = {
    val p = probe.select(col(embCol).as("probe_emb"))
    val cells = index.centroids
      .crossJoin(broadcast(p))
      .withColumn("cell_sim", cosine(col("centroid"), col("probe_emb")))
      .orderBy(desc("cell_sim"), asc("cell"))
      .limit(nprobe)
      .select(col("cell"))
    val w = Window.orderBy(desc("sim"), asc(idCol))
    index.assignments.join(broadcast(cells), "cell")
      .crossJoin(broadcast(p))
      .withColumn("sim", cosine(col(embCol), col("probe_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("rank"), col(idCol), col("cell"))
  }
}
