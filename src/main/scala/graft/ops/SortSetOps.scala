package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k + set operations (SURVEY.md §2.2).
  *
  * `topk_limit` must plan as `TakeOrderedAndProject` (per-partition
  * heap of K, merge K·partitions at the driver) — a global sort for a
  * LIMIT 10 is the anti-pattern. `topk_per_group` uses the window
  * row_number + filter shape that Spark 4 rewrites to a group-limit
  * pushdown. Set operations shuffle once on the full row as key.
  */
object SortSetOps extends OpPack {

  private def sliceA(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "orders").filter(col("o_totalprice") > 490000)
      .select(col("o_orderkey"), col("o_totalprice"))
  private def sliceB(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 485000)
      .select(col("o_orderkey"), col("o_totalprice"))

  def queries: Map[String, Q] = Map(
    "sort_multi" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .withColumn("maybe_status",
          when(col("o_orderstatus") === "O", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")))
        .filter(col("o_totalprice") > 495000)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"), col("maybe_status"))
        .orderBy(asc("o_orderpriority"), desc("o_totalprice"),
          asc_nulls_last("maybe_status"), asc("o_orderkey"))
    }),

    "topk_limit" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    "topk_per_group" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_mktsegment"))
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      Tables(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("c_custkey"),
          col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    // Top-k WITH TIES (SQL's FETCH FIRST k ROWS WITH TIES): rank()
    // instead of row_number() keeps every row tied with the k-th —
    // the report semantics a human expects from "top 3 balances"
    // when balances repeat. Same WindowGroupLimit pushdown shape as
    // topk_per_group (per-partition local top-k before the shuffle);
    // ties only widen the k-th rank's group.
    "topk_with_ties" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_mktsegment"))
        .orderBy(desc("c_nationkey"))
      Tables(s, dir, "customer")
        .withColumn("rk", rank().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("c_custkey"),
          col("c_nationkey"))
        .orderBy(col("c_mktsegment"), col("rk"), col("c_custkey"))
    }),

    "set_union_all" -> ((s, dir) => {
      sliceA(s, dir).unionAll(sliceB(s, dir))
        .orderBy(col("o_orderkey"), col("o_totalprice"))
    }),

    "set_union_distinct" -> ((s, dir) => {
      sliceA(s, dir).union(sliceB(s, dir)).distinct()
        .orderBy(col("o_orderkey"), col("o_totalprice"))
    }),

    "set_intersect" -> ((s, dir) => {
      val a = Tables(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"))
      val b = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      a.intersect(b).orderBy(col("c_custkey"))
    }),

    "set_except" -> ((s, dir) => {
      val a = Tables(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"))
      val b = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      a.except(b).orderBy(col("c_custkey"))
    }),

    // Bag semantics: duplicates participate with multiplicity
    // (|A∩B| copies = min count, |A−B| copies = count difference).
    "set_intersect_all" -> ((s, dir) => {
      val a = Tables(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select(col("l_suppkey"))
      val b = Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") >= 48)
        .select(col("l_suppkey"))
      a.intersectAll(b).orderBy(col("l_suppkey"))
    }),

    "set_except_all" -> ((s, dir) => {
      val a = Tables(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select(col("l_suppkey"))
      val b = Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") >= 48)
        .select(col("l_suppkey"))
      a.exceptAll(b).orderBy(col("l_suppkey"))
    }),

    // Symmetric difference under BAG semantics: rows in exactly one
    // side (surviving by multiplicity difference), tagged with their
    // origin — EXCEPT ALL in both directions, one union. Each leg
    // shuffles once on the full row as key; the reconciliation query
    // ("which rows changed between two snapshots, and which side")
    // that diff_snapshot answers keyed, this answers positionless.
    "set_symmetric_diff" -> ((s, dir) => {
      val a = Tables(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select(col("l_suppkey"))
      val b = Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") >= 48)
        .select(col("l_suppkey"))
      a.exceptAll(b).withColumn("side", lit("A"))
        .union(b.exceptAll(a).withColumn("side", lit("B")))
        .orderBy(col("side"), col("l_suppkey"))
    }),

    // Schema-mismatched union: branches with different column sets
    // merged by NAME (missing columns null-padded), the schema-drift
    // union a long-lived ingest pipeline needs. Positional unionAll
    // would mis-align or reject these.
    "set_union_by_name" -> ((s, dir) => {
      val a = Tables(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val b = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(asc("o_orderkey"), asc_nulls_first("o_orderpriority"))
    })
  )

  private val sliceASql =
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 490000"
  private val sliceBSql =
    "SELECT o_orderkey, o_totalprice FROM orders " +
      "WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 485000"

  def oracle: Map[String, String] = Map(
    "sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS maybe_status
        |FROM orders
        |WHERE o_totalprice > 495000
        |ORDER BY o_orderpriority ASC, o_totalprice DESC,
        |  maybe_status ASC NULLS LAST, o_orderkey ASC""".stripMargin,

    "topk_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "topk_with_ties" ->
      """SELECT c_mktsegment, rk, c_custkey, c_nationkey FROM (
        |  SELECT c_mktsegment, c_custkey, c_nationkey,
        |         CAST(rank() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_nationkey DESC) AS BIGINT)
        |           AS rk
        |  FROM customer) t
        |WHERE rk <= 3
        |ORDER BY c_mktsegment, rk, c_custkey""".stripMargin,

    "topk_per_group" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer)
        |WHERE rn <= 3
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "set_union_all" ->
      s"""SELECT * FROM (($sliceASql) UNION ALL ($sliceBSql))
         |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "set_union_distinct" ->
      s"""SELECT * FROM (($sliceASql) UNION ($sliceBSql))
         |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,

    "set_except" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,

    "set_intersect_all" ->
      """SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49
        |INTERSECT ALL
        |SELECT l_suppkey FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 48
        |ORDER BY l_suppkey""".stripMargin,

    "set_except_all" ->
      """SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49
        |EXCEPT ALL
        |SELECT l_suppkey FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 48
        |ORDER BY l_suppkey""".stripMargin,

    "set_symmetric_diff" ->
      """WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49),
        |b AS (SELECT l_suppkey FROM lineitem
        |      WHERE l_returnflag = 'R' AND l_quantity >= 48)
        |SELECT * FROM (
        |  SELECT l_suppkey, 'A' AS side FROM
        |    (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |  UNION ALL
        |  SELECT l_suppkey, 'B' AS side FROM
        |    (SELECT * FROM b EXCEPT ALL SELECT * FROM a))
        |ORDER BY side, l_suppkey""".stripMargin,

    "set_union_by_name" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_totalprice > 450000
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, o_orderpriority
        |  FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY o_orderkey ASC, o_orderpriority ASC NULLS FIRST""".stripMargin
  )
}
