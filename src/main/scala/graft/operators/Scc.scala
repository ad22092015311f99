package graft.operators
import graft.Lineage.LineageOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a BOUNDED directed graph by
  * path-doubling transitive closure: `rounds` squarings of the
  * reachability relation cover every path up to length 2^rounds, so
  * a fixed round count is EXACT once 2^rounds ≥ |V| — no convergence
  * action, statically unrolled like the pagerank/LPA loops. The SCC
  * id is the minimum node of the mutual-reachability class
  * (u ~ v iff reach(u,v) ∧ reach(v,u)).
  *
  * Intended for bounded node domains (state machines, category
  * graphs): the closure is O(|V|²) rows — independent of the fact
  * data that produced the edges, which is what makes it safe at
  * 100 TB. Each round is localCheckpoint'd (eager=false) so the plan
  * stays one round deep instead of 2^rounds upstream copies (the
  * iterative-loop doctrine from the verify gotchas).
  */
object Scc {

  /** `edges`: (src, dst) over a bounded node domain. Returns
    * (node, scc_id) for every node incident to an edge; isolated
    * nodes are the caller's to union in (their SCC is themselves).
    *
    * `rounds` is a MINIMUM: the actual count is max(rounds,
    * ceil(log2(|V|))), derived from a driver-side distinct-node count
    * (one cheap job on the bounded domain), so callers whose node
    * domain exceeds 2^rounds get a still-exact closure instead of
    * silently split components. */
  def components(edges: DataFrame, rounds: Int = 6): DataFrame = {
    val nodeCount = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().count()
    val needed =
      if (nodeCount < 2) 1
      else 64 - java.lang.Long.numberOfLeadingZeros(nodeCount - 1)
    val effectiveRounds = math.max(rounds, needed)
    var reach = edges.select(col("src"), col("dst")).distinct()
      .lineageCut(false)
    for (_ <- 1 to effectiveRounds) {
      val hop = reach.select(col("src"), col("dst").as("mid"))
        .join(reach.select(col("src").as("mid"), col("dst")), "mid")
        .select(col("src"), col("dst"))
      reach = reach.union(hop).distinct().lineageCut(false)
    }
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val mutual = reach.intersect(
      reach.select(col("dst").as("src"), col("src").as("dst")))
    nodes
      .join(mutual.select(col("src").as("peer"), col("dst").as("node")),
        Seq("node"), "left_outer")
      .groupBy(col("node")).agg(min(col("peer")).as("mp"))
      .select(col("node"),
        when(col("mp").isNull, col("node"))
          .otherwise(least(col("node"), col("mp"))).as("scc_id"))
  }
}
