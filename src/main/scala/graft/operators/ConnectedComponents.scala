package graft.operators
import graft.Lineage.LineageOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation.
  *
  * Input: an undirected edge list (any direction, duplicates fine).
  * Output: one row per vertex appearing in an edge, labeled with the
  * minimum vertex id of its component (`id`, `component`).
  *
  * Each round is one shuffle — join every vertex's current label to
  * its neighbors, take the per-vertex min of (own ∪ neighbor) labels —
  * so convergence takes O(component diameter) rounds; near-dup /
  * similarity graphs have tiny diameters in practice, and `maxRounds`
  * bounds the adversarial chain case.
  *
  * One Spark JOB per round: the new label frame is lazily
  * local-checkpointed (`localCheckpoint(eager = false)` truncates the
  * logical plan to a leaf IMMEDIATELY — each round's frame is
  * referenced twice downstream, so without truncation the plan tree
  * doubles per round and explainString alone OOMs — but materializes
  * only when first acted on), and the convergence count is that first
  * action. For graphs whose diameter is NOT known-small, use
  * [[BigStarCC]] (O(log n) rounds).
  */
object ConnectedComponents {

  def run(edgeList: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25): DataFrame = {
    val pairs = edgeList
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val edges = pairs
      .union(pairs.select(col("__dst").as("__src"), col("__src").as("__dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("__src").as("id")).distinct()
      .withColumn("component", col("id"))
      .lineageCut(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("id", "__dst"), "__dst")
        .select(col("__src").as("id"), col("component"),
          lit(null).cast("long").as("own"))
      // fold the vertex's previous label into the same aggregation
      // (min ignores the neighbor rows' null `own`): the convergence
      // count below filters on (component < own), and computing it
      // materializes the lazy checkpoint — ONE job does both.
      val next = labels
        .select(col("id"), col("component"), col("component").as("own"))
        .union(viaNeighbor)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"), min(col("own")).as("own"))
        .lineageCut(false)
      changed = next.filter(col("component") < col("own")).count()
      labels = next.select(col("id"), col("component"))
      rounds += 1
    }
    edges.unpersist()
    labels
  }
}
