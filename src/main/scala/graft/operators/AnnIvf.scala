package graft.operators
import graft.Lineage.LineageOps

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

  /** First-`numCells`-by-id seeding — via orderBy + limit, not
    * filter(id < numCells), so sparse/offset id spaces still seed the
    * full centroid set. Cell ids are dense 0..numCells-1 by row_number
    * over the (tiny, already-limited) seed frame. */
  private def seedFirstN(vectors: DataFrame, idCol: String, embCol: String,
      numCells: Int): DataFrame =
    vectors
      .select(col(idCol),
        transform(col(embCol), x => x.cast("double")).as("centroid"))
      .orderBy(col(idCol)).limit(numCells)
      .withColumn("cell",
        (row_number().over(Window.orderBy(col(idCol))) - 1).cast("int"))
      .select(col("cell"), col("centroid"))

  /** Deterministic k-means|| seeding (Bahmani et al., "Scalable
    * k-means++", VLDB 2012): `rounds` distributed oversampling passes,
    * each keeping points with probability ∝ their cosine distance to
    * the current center set (the pseudo-uniform draw is
    * xxhash64(id, round) — reproducible, no rand()), then a driver-side
    * greedy weighted farthest-first reduction of the ~oversample·k
    * sampled centers down to `numCells`. Each pass is one broadcast
    * join over the corpus; the driver only ever sees the small sampled
    * set, so the construction holds at 100 TB. Far-better-spread seeds
    * than first-N: balanced cells, higher recall at the same nprobe. */
  private def seedKMeansPar(vectors: DataFrame, idCol: String,
      embCol: String, numCells: Int, rounds: Int = 2,
      oversample: Int = 4): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val v = vectors
      .select(col(idCol).as("__id"),
        transform(col(embCol), x => x.cast("double")).as("__emb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centers = v.orderBy(col("__id")).limit(1)
      .select(col("__emb").as("centroid")).lineageCut(true)
    val l = (oversample.toLong * numCells).toDouble
    (1 to rounds).foreach { r =>
      val costs = v.crossJoin(broadcast(centers))
        .withColumn("sim", cosine(col("__emb"), col("centroid")))
        .groupBy(col("__id"))
        .agg(max_by(col("__emb"), col("sim")).as("__emb"),
          (lit(1.0) - max(col("sim"))).as("cost"))
      val phi = math.max(
        costs.agg(sum(col("cost"))).first().getDouble(0), 1e-12)
      // pseudo-uniform in [0,1) from the id + round number
      val u = pmod(xxhash64(col("__id"), lit(r)), lit(1000000007L))
        .cast("double") / 1.000000007e9
      val sampled = costs.filter(u < lit(l) * col("cost") / lit(phi))
        .select(col("__emb").as("centroid"))
      centers = centers.union(sampled).lineageCut(true)
    }
    // Weight each sampled center by the population it attracts (one
    // distributed argmax pass), then reduce to numCells on the driver:
    // greedily take the heaviest center, then repeatedly the center
    // maximizing weight × cosine-distance-to-nearest-chosen.
    val cArr = centers.as[Seq[Double]].collect().map(_.toArray)
    val idxCenters = cArr.toIndexedSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toDF("cidx", "centroid")
    val weights = v.crossJoin(broadcast(idxCenters))
      .withColumn("sim", cosine(col("__emb"), col("centroid")))
      .groupBy(col("__id"))
      .agg(max_by(struct(col("cidx"), (-col("cidx")).as("tie")),
        struct(col("sim"), (-col("cidx")).as("tie"))).as("best"))
      .groupBy(col("best.cidx").as("cidx")).agg(count(lit(1)).as("w"))
      .as[(Int, Long)].collect().toMap
    v.unpersist()
    def cosLocal(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    val w = cArr.indices.map(i => weights.getOrElse(i, 0L).toDouble)
    val chosen = scala.collection.mutable.ArrayBuffer[Int]()
    chosen += w.zipWithIndex.maxBy { case (wt, i) => (wt, -i) }._2
    while (chosen.size < math.min(numCells, cArr.length)) {
      val next = cArr.indices.filterNot(chosen.contains).maxBy { i =>
        val dNear = 1.0 - chosen.map(j => cosLocal(cArr(i), cArr(j))).max
        (w(i) * dNear, -i)
      }
      chosen += next
    }
    chosen.toIndexedSeq.zipWithIndex
      .map { case (ci, cell) => (cell, cArr(ci).toSeq) }
      .toDF("cell", "centroid")
      .select(col("cell").cast("int").as("cell"), col("centroid"))
  }

  /** Build the inverted file: seed deterministically (k-means|| by
    * default, `seeding = "first"` for the plain first-N-by-id variant),
    * refine with `refineIters` Lloyd iterations, assign with the final
    * centroids. */
  def buildIndex(vectors0: DataFrame, idCol: String, embCol: String,
      numCells: Int, refineIters: Int = 1,
      seeding: String = "kmeans||"): IvfIndex = {
    // a NULL embedding has no position in the space — absent from the
    // index by definition (keeps the build total on dirty corpora)
    val vectors = vectors0.filter(col(embCol).isNotNull)
    val n = vectors.count()
    // degenerate corpora stay total: fewer vectors than cells clamps
    // the cell count (every vector its own cell); an EMPTY corpus
    // builds an empty index, and knnJoin over it yields no pairs
    val cells = math.min(numCells.toLong, math.max(n, 1L)).toInt
    if (n == 0L)
      return IvfIndex(
        assign(vectors, idCol, embCol,
          seedFirstN(vectors, idCol, embCol, cells)),
        seedFirstN(vectors, idCol, embCol, cells))
    val seeds = seeding match {
      case "first" => seedFirstN(vectors, idCol, embCol, cells)
      case _ => seedKMeansPar(vectors, idCol, embCol, cells)
    }
    // k-means|| can come up short when the corpus has fewer distinct
    // vectors than cells — top up from the first-N pool.
    val nSeeds = seeds.count()
    val topped =
      if (nSeeds == cells) seeds
      else seedFirstN(vectors, idCol, embCol, cells)
    var centroids = topped
    (1 to refineIters).foreach { _ =>
      centroids = recompute(
        assign(vectors, idCol, embCol, centroids), embCol)
    }
    IvfIndex(assign(vectors, idCol, embCol, centroids), centroids)
  }

  /** IVF-accelerated kNN JOIN: every indexed vector is a probe, and
    * each probe scans only its `nprobe` most-similar cells — the
    * all-pairs candidate frame is corpus × (nprobe/numCells) instead of
    * corpus², which is the whole point at 100 TB (the label-blocked
    * exact variant is `llm_knn_join`; this is the unblocked scale
    * path). Output: (probe_id, rank, nbr_id), exact within the probed
    * cells.
    */
  /** Every corpus vector as a probe with its top-`nprobe` nearest
    * cells — the shared candidate-generation front half of
    * [[knnJoin]] and [[hardNegatives]] (ONE definition so the
    * cell-probing semantics — tie-break, WindowGroupLimit shape —
    * cannot silently diverge between the two). */
  private def probedCells(index: IvfIndex, idCol: String,
      embCol: String, nprobe: Int): DataFrame = {
    // top-nprobe cells per probe (WindowGroupLimit keeps ≤nprobe rows
    // per probe before the shuffle)
    val wc = Window.partitionBy(col("probe_id"))
      .orderBy(desc("cell_sim"), asc("cell"))
    index.assignments
      .select(col(idCol).as("probe_id"), col(embCol).as("probe_emb"))
      .crossJoin(broadcast(index.centroids))
      .withColumn("cell_sim", cosine(col("probe_emb"), col("centroid")))
      .withColumn("cr", row_number().over(wc))
      .filter(col("cr") <= nprobe)
      .select(col("probe_id"), col("probe_emb"), col("cell"))
  }

  def knnJoin(index: IvfIndex, idCol: String, embCol: String,
      k: Int, nprobe: Int): DataFrame = {
    // each neighbor lives in exactly one cell (assignments partition
    // the corpus), so every (probe, nbr) candidate pair is unique
    val wk = Window.partitionBy(col("probe_id"))
      .orderBy(desc("sim"), asc("nbr_id"))
    probedCells(index, idCol, embCol, nprobe)
      .join(index.assignments.select(col("cell"),
        col(idCol).as("nbr_id"), col(embCol).as("nbr_emb")), "cell")
      .filter(col("nbr_id") =!= col("probe_id"))
      .withColumn("sim", cosine(col("probe_emb"), col("nbr_emb")))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("nbr_id"))
  }

  /** Hard-negative mining (the contrastive-training sampler: each
    * probe's most-similar WRONG-label vector — the negatives that
    * actually move a contrastive loss): identical probed-cell
    * candidate generation to [[knnJoin]], with the label-mismatch
    * predicate inside the join and rank 1 by (sim DESC, id ASC) —
    * rank-only output, the knn_exact cross-engine determinism
    * doctrine. `labels` = (idCol, labelCol). At nprobe = numCells the
    * result is exact; at nprobe ≪ numCells it is the cell-bounded
    * production shape (same declared trade as the ANN family). */
  def hardNegatives(index: IvfIndex, idCol: String, embCol: String,
      labels: DataFrame, labelCol: String, nprobe: Int): DataFrame = {
    val wk = Window.partitionBy(col("probe_id"))
      .orderBy(desc("sim"), asc("neg_id"))
    probedCells(index, idCol, embCol, nprobe)
      .join(labels.select(col(idCol).as("probe_id"),
        col(labelCol).as("probe_label")), "probe_id")
      .join(index.assignments.select(col("cell"),
        col(idCol).as("neg_id"), col(embCol).as("neg_emb")), "cell")
      .join(labels.select(col(idCol).as("neg_id"),
        col(labelCol).as("neg_label")), "neg_id")
      .filter(col("neg_id") =!= col("probe_id") &&
        col("neg_label") =!= col("probe_label"))
      .withColumn("sim", cosine(col("probe_emb"), col("neg_emb")))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") === 1)
      .select(col("probe_id"), col("probe_label"), col("neg_id"),
        col("neg_label"))
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
    // orderBy+limit(k) plans TakeOrderedAndProject: each partition of
    // the probed cells keeps its own k candidates and the driver merges
    // k×partitions rows — a global row_number window here would pull
    // every candidate (~nprobe/numCells of the corpus) into ONE
    // partition. Only the ≤k survivors see the ranking window.
    val top = index.assignments.join(broadcast(cells), "cell")
      .crossJoin(broadcast(p))
      .withColumn("sim", cosine(col(embCol), col("probe_emb")))
      .orderBy(desc("sim"), asc(idCol))
      .limit(k)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("sim"), asc(idCol))))
      .select(col("rank"), col(idCol), col("cell"))
  }
}
