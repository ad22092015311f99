package graft.ops
import graft.Lineage.LineageOps

import graft.Tables
import org.apache.spark.sql.functions._

/** Bounded-depth hierarchy analytics over the dimensional
  * region→nation→segment tree (SURVEY.md §2.2 — the dimension-path
  * rollups a CDC-fed warehouse serves; reference consumers read flat
  * row streams, client.go:383-414, and aggregate downstream).
  *
  * Scale contract: the hierarchy is DIMENSIONAL (5 regions × 25
  * nations × 5 segments) so every traversal is a broadcast join
  * against the fact side — depth is statically bounded, so no
  * recursion and no iterative driver loop exists here; `rollup`
  * computes every level in ONE pass with partial (map-side)
  * aggregation, which is the shape that survives a 100 TB fact scan.
  * Money rides integer cents; shares are integer ppm (both engines
  * truncate integer division toward zero — SKILL-pinned).
  */
object HierOps extends OpPack {

  def queries: Map[String, Q] = Map(
    // Path-labeled rollup of customer account balance over the
    // 3-level dimension tree. ONE `rollup` pass gives leaf, nation,
    // region and grand-total rows; the level falls out of which
    // columns the rollup NULLed (dimension names are non-null by the
    // testdata contract, so NULL ⟺ rolled-up — no grouping() bitmask
    // gymnastics needed); `concat_ws` skips the NULLed-out levels so
    // each row carries its materialized path
    // ('AMERICA/NATION_1/BUILDING', …, '' at the root). Dims
    // broadcast onto the customer scan; the rollup is a single hash
    // agg with partial combine — no per-level re-scan.
    "hier_rollup" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      val n = Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = Tables(s, dir, "region")
        .select(col("r_regionkey"), col("r_name"))
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("acctbal_cents"))
        .select(
          expr("CAST(CASE WHEN c_mktsegment IS NOT NULL THEN 3 " +
            "WHEN n_name IS NOT NULL THEN 2 " +
            "WHEN r_name IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)")
            .as("lvl"),
          concat_ws("/", col("r_name"), col("n_name"),
            col("c_mktsegment")).as("path"),
          col("n_customers"), col("acctbal_cents"))
        .orderBy(col("lvl"), col("path"))
    }),

    // Closure-table build + subtree rollup (the org-chart/BOM pattern:
    // materialize every (ancestor, descendant) pair once, then ANY
    // subtree aggregate is a plain join — no per-query recursion):
    // edges are ROOT→region→nation, the closure is a recursive CTE
    // (Spark 4 UnionLoop — tree edges, so UNION ALL enumerates each
    // pair exactly once, no DISTINCT needed), and the rollup reports
    // per ancestor its descendant count, leaf (nation) count, and the
    // customers in its subtree. SCALE: the closure is DIMENSION-
    // bounded (depth × |dim| pairs at any fact volume) and the only
    // fact-proportional work is the one map-side-combined per-nation
    // customer count — the closure frame then joins BROADCAST onto
    // that ≤|nations| aggregate, never onto facts.
    "hier_closure" -> ((s, dir) => {
      val n = Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = Tables(s, dir, "region")
        .select(col("r_regionkey"), col("r_name"))
      r.select(lit("ROOT").as("parent"), col("r_name").as("child"))
        .union(n.join(broadcast(r),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name").as("parent"), col("n_name").as("child")))
        .createOrReplaceTempView("hier_edges")
      Tables(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_cust"))
        .createOrReplaceTempView("hier_leaf")
      n.select(col("n_name")).createOrReplaceTempView("hier_nations")
      s.sql("""
        WITH RECURSIVE closure(ancestor, descendant) AS (
          SELECT parent, child FROM hier_edges
          UNION ALL
          SELECT c.ancestor, e.child
          FROM closure c JOIN hier_edges e ON e.parent = c.descendant
        )
        SELECT ancestor, count(*) AS n_desc,
          CAST(sum(CASE WHEN nn.n_name IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaf,
          CAST(sum(coalesce(lc.n_cust, 0)) AS BIGINT) AS n_customers
        FROM closure
        LEFT JOIN hier_nations nn ON closure.descendant = nn.n_name
        LEFT JOIN hier_leaf lc ON closure.descendant = lc.n_name
        GROUP BY ancestor ORDER BY ancestor""")
    }),

    // Per-leaf hierarchy path + contribution shares: each
    // (nation, segment) leaf's materialized path, its customer count,
    // and its cents share of the parent nation and of the grand total
    // (ppm). Leaf frame is dimension-bounded (≤125 rows), so the
    // parent/total windows are windows over a TINY aggregate — the
    // fact table is touched exactly once by the leaf hash agg.
    "hier_path" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = Tables(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      val n = Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = Tables(s, dir, "region")
        .select(col("r_regionkey"), col("r_name"))
      val leaf = c
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("cents"))
      leaf
        .withColumn("nation_cents",
          sum(col("cents")).over(Window.partitionBy(col("n_name"))))
        .withColumn("total_cents",
          sum(col("cents")).over(Window.partitionBy()))
        .select(
          concat_ws("/", col("r_name"), col("n_name"),
            col("c_mktsegment")).as("path"),
          col("n_customers"),
          col("cents").as("acctbal_cents"),
          expr("CAST((CAST(cents AS DECIMAL(38,0)) * 1000000) " +
            "div nation_cents AS BIGINT)").as("nation_share_ppm"),
          expr("CAST((CAST(cents AS DECIMAL(38,0)) * 1000000) " +
            "div total_cents AS BIGINT)").as("total_share_ppm"))
        .orderBy(col("path"))
    }),

    // Lowest common ancestor over the dimension tree (the
    // "nearest shared rollup level" question a drill-across query
    // plans with): nodes are the (region/nation/segment) leaves that
    // actually occur in customer data; each explodes to its ancestor
    // PATHS (ROOT, region, region/nation, full leaf path — paths,
    // not bare names, so the ancestor key is globally unique), pairs
    // join on shared ancestors and keep the DEEPEST one
    // (max_by(anc, depth) — depth is unique per ancestor within a
    // pair, so the argmax is deterministic); tree distance falls out
    // as 6 − 2·lca_depth (leaves sit at depth 3). SCALE: facts pay
    // ONE distinct-combo hash agg; the ancestor/pair frames are
    // dimension-bounded (≤125 leaves, ≤500 ancestor rows, ≤7750
    // pairs) at any fact volume — the closure-explode LCA pattern
    // never touches the fact table again.
    "hier_lca" -> ((s, dir) => {
      val n = Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = Tables(s, dir, "region")
        .select(col("r_regionkey"), col("r_name"))
      // distinct FIRST (the fact table collapses to ≤125 key combos
      // in one map-side-combined pass), dims join onto that bounded
      // frame — the ancestor-union legs below then recompute a
      // ≤125-row plan, never the fact scan
      val leaf = Tables(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"))
        .distinct()
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("c_mktsegment"))
        .withColumn("node_id", concat_ws("/", col("r_name"),
          col("n_name"), col("c_mktsegment")))
        .lineageCut(false)
      val anc = leaf.select(col("node_id"), lit(0).as("depth"),
          lit("ROOT").as("anc"))
        .unionByName(leaf.select(col("node_id"), lit(1).as("depth"),
          col("r_name").as("anc")))
        .unionByName(leaf.select(col("node_id"), lit(2).as("depth"),
          concat_ws("/", col("r_name"), col("n_name")).as("anc")))
        .unionByName(leaf.select(col("node_id"), lit(3).as("depth"),
          col("node_id").as("anc")))
      val a = anc.select(col("node_id").as("node_a"), col("depth"),
        col("anc"))
      val b = anc.select(col("node_id").as("node_b"),
        col("depth").as("depth_b"), col("anc"))
      a.join(b, Seq("anc"))
        .filter(col("node_a") < col("node_b") &&
          col("depth") === col("depth_b"))
        .groupBy(col("node_a"), col("node_b"))
        .agg(max(col("depth")).as("lca_depth"),
          expr("max_by(anc, depth)").as("lca"))
        .select(col("node_a"), col("node_b"), col("lca"),
          col("lca_depth").cast("int").as("lca_depth"),
          (lit(6) - col("lca_depth") * 2).cast("int").as("dist"))
        .orderBy(col("node_a"), col("node_b"))
    }))

  def oracle: Map[String, String] = Map(
    "hier_lca" ->
      """WITH leaf AS (
        |  SELECT DISTINCT r.r_name, n.n_name, c.c_mktsegment,
        |    concat_ws('/', r.r_name, n.n_name, c.c_mktsegment)
        |      AS node_id
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey),
        |anc AS (
        |  SELECT node_id, 0 AS depth, 'ROOT' AS anc FROM leaf
        |  UNION ALL
        |  SELECT node_id, 1, r_name FROM leaf
        |  UNION ALL
        |  SELECT node_id, 2, concat_ws('/', r_name, n_name) FROM leaf
        |  UNION ALL
        |  SELECT node_id, 3, node_id FROM leaf)
        |SELECT a.node_id AS node_a, b.node_id AS node_b,
        |  arg_max(a.anc, a.depth) AS lca,
        |  CAST(max(a.depth) AS INT) AS lca_depth,
        |  CAST(6 - 2 * max(a.depth) AS INT) AS dist
        |FROM anc a JOIN anc b
        |  ON a.anc = b.anc AND a.depth = b.depth
        |  AND a.node_id < b.node_id
        |GROUP BY a.node_id, b.node_id
        |ORDER BY node_a, node_b""".stripMargin,
    "hier_closure" ->
      """WITH RECURSIVE edges AS (
        |  SELECT 'ROOT' AS parent, r_name AS child FROM region
        |  UNION ALL
        |  SELECT r.r_name, n.n_name
        |  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey),
        |lc AS (
        |  SELECT n.n_name, count(*) AS n_cust
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY n.n_name),
        |closure(ancestor, descendant) AS (
        |  SELECT parent, child FROM edges
        |  UNION ALL
        |  SELECT cl.ancestor, e.child
        |  FROM closure cl JOIN edges e ON e.parent = cl.descendant)
        |SELECT ancestor, count(*) AS n_desc,
        |  CAST(sum(CASE WHEN nn.n_name IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_leaf,
        |  CAST(sum(coalesce(lc.n_cust, 0)) AS BIGINT) AS n_customers
        |FROM closure
        |LEFT JOIN (SELECT n_name FROM nation) nn
        |  ON closure.descendant = nn.n_name
        |LEFT JOIN lc ON closure.descendant = lc.n_name
        |GROUP BY ancestor ORDER BY ancestor""".stripMargin,

    "hier_rollup" ->
      """WITH j AS (
        |  SELECT r.r_name, n.n_name, c.c_mktsegment,
        |    CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey)
        |SELECT
        |  CAST(CASE WHEN c_mktsegment IS NOT NULL THEN 3
        |    WHEN n_name IS NOT NULL THEN 2
        |    WHEN r_name IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS lvl,
        |  concat_ws('/', r_name, n_name, c_mktsegment) AS path,
        |  count(*) AS n_customers,
        |  CAST(sum(cents) AS BIGINT) AS acctbal_cents
        |FROM j
        |GROUP BY ROLLUP (r_name, n_name, c_mktsegment)
        |ORDER BY lvl, path""".stripMargin,

    "hier_path" ->
      """WITH j AS (
        |  SELECT r.r_name, n.n_name, c.c_mktsegment,
        |    CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey),
        |leaf AS (
        |  SELECT r_name, n_name, c_mktsegment,
        |    count(*) AS n_customers, CAST(sum(cents) AS BIGINT) AS cents
        |  FROM j GROUP BY r_name, n_name, c_mktsegment),
        |w AS (
        |  SELECT *,
        |    sum(cents) OVER (PARTITION BY n_name) AS nation_cents,
        |    sum(cents) OVER () AS total_cents
        |  FROM leaf)
        |SELECT concat_ws('/', r_name, n_name, c_mktsegment) AS path,
        |  n_customers, cents AS acctbal_cents,
        |  CAST((CAST(cents AS HUGEINT) * 1000000) // nation_cents
        |    AS BIGINT) AS nation_share_ppm,
        |  CAST((CAST(cents AS HUGEINT) * 1000000) // total_cents
        |    AS BIGINT) AS total_share_ppm
        |FROM w ORDER BY path""".stripMargin)
}
