package graft.ops

import graft.Tables

/** Subqueries (engine addition; SURVEY.md §4.2 names decorrelation as
  * a Catalyst capability the inventory should consume). All four are
  * declared through `spark.sql` so the analyzer sees real subquery
  * constructs and rewrites them itself: a scalar aggregate subquery
  * (one broadcast row), a correlated scalar subquery (decorrelated to
  * an aggregate + join), IN / NOT IN (null-aware) subqueries
  * (rewritten to semi / anti joins — the scale path: one shuffle, not
  * per-row probes).
  */
object SubqueryOps extends OpPack {

  private def reg(s: org.apache.spark.sql.SparkSession, dir: String,
      names: String*): Unit =
    names.foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))

  def queries: Map[String, Q] = Map(
    // Uncorrelated scalar subquery: orders above 1.5x the global
    // average price.
    "sub_scalar" -> ((s, dir) => {
      reg(s, dir, "orders")
      s.sql("""
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey""")
    }),

    // Correlated scalar subquery: each order compared to its own
    // priority class's average — Catalyst decorrelates to an
    // aggregate-then-join, never a per-row re-scan.
    "sub_scalar_corr" -> ((s, dir) => {
      reg(s, dir, "orders")
      s.sql("""
        SELECT o_orderkey, o_orderpriority
        FROM orders o
        WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                                  FROM orders o2
                                  WHERE o2.o_orderpriority = o.o_orderpriority)
        ORDER BY o_orderkey""")
    }),

    // IN subquery → left-semi join.
    "sub_in" -> ((s, dir) => {
      reg(s, dir, "customer", "nation")
      s.sql("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = 2)
          AND c_acctbal > 9000
        ORDER BY c_custkey""")
    }),

    // NOT IN over a non-null key column → null-aware anti join.
    "sub_not_in" -> ((s, dir) => {
      reg(s, dir, "customer", "orders")
      s.sql("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 400000)
          AND c_acctbal > 9500
        ORDER BY c_custkey""")
    }),

    // EXISTS in a disjunction cannot rewrite to a plain semi join (the
    // other disjunct must still pass rows through) → Catalyst plans an
    // ExistenceJoin: a semi-join variant emitting an exists flag
    // consumed by the filter. Still one hash join, not per-row probes.
    "join_existence" -> ((s, dir) => {
      reg(s, dir, "customer", "orders")
      s.sql("""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE c_acctbal > 9900
           OR EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 550000)
        ORDER BY c_custkey""")
    }),

    // LATERAL correlated subquery: per-customer top order. Catalyst
    // decorrelates the LIMIT-bearing lateral into a window top-k join
    // — never a per-row re-scan of orders.
    // Quantified comparison — SQL's `> ALL (...)`: suppliers whose
    // balance beats EVERY customer balance in their nation. Spark's
    // grammar has no ALL, so the engine expresses the universal
    // quantifier as its canonical decorrelated rewrite — per-nation
    // max + one comparison (an aggregated join, never per-row
    // re-execution); the ORACLE evaluates DuckDB's NATIVE `> ALL`
    // against it, cross-checking the rewrite's semantics including
    // the vacuous-truth case (nations with no customers keep their
    // suppliers — the LEFT JOIN's NULL branch).
    // RELATIONAL DIVISION (Codd's ÷ — "customers who ordered under
    // EVERY priority class", the universal-quantifier query FOR ALL
    // that EXISTS-based subqueries can't say directly): the classic
    // double-NOT-EXISTS collapses, under Catalyst, to the count
    // formulation planned here explicitly — per-customer DISTINCT
    // divisor coverage == |divisor| (the divisor cardinality itself a
    // scalar subquery, broadcast as a 1-row gate). Two-phase distinct
    // count on the custkey exchange; the divisor set is dimension-
    // bounded. The textbook operator the reference's consumers would
    // push to a warehouse.
    "sub_division" -> ((s, dir) => {
      reg(s, dir, "orders", "customer")
      s.sql("""
        SELECT c.c_custkey, c.c_name,
          count(DISTINCT o.o_orderpriority) AS n_priorities
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        HAVING count(DISTINCT o.o_orderpriority) =
          (SELECT count(DISTINCT o_orderpriority) FROM orders)
        ORDER BY c.c_custkey""")
    }),

    "sub_all" -> ((s, dir) => {
      reg(s, dir, "supplier", "customer")
      s.sql("""
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM supplier
        LEFT JOIN (
          SELECT c_nationkey, max(c_acctbal) AS mx
          FROM customer WHERE c_acctbal IS NOT NULL
          GROUP BY c_nationkey) m
          ON m.c_nationkey = s_nationkey
        WHERE m.mx IS NULL OR s_acctbal > m.mx
        ORDER BY s_suppkey""")
    }),

    "sub_lateral" -> ((s, dir) => {
      reg(s, dir, "customer", "orders")
      s.sql("""
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 1) t
        WHERE c_acctbal > 9000
        ORDER BY c_custkey""")
    })
  )

  def oracle: Map[String, String] = Map(
    "sub_scalar" ->
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "sub_scalar_corr" ->
      """SELECT o_orderkey, o_orderpriority
        |FROM orders o
        |WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
        |                          FROM orders o2
        |                          WHERE o2.o_orderpriority = o.o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,

    "sub_in" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_regionkey = 2)
        |  AND c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,

    "sub_not_in" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_totalprice > 400000)
        |  AND c_acctbal > 9500
        |ORDER BY c_custkey""".stripMargin,

    "join_existence" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE c_acctbal > 9900
        |   OR EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 550000)
        |ORDER BY c_custkey""".stripMargin,

    "sub_division" ->
      """SELECT c.c_custkey, c.c_name,
        |  CAST(count(DISTINCT o.o_orderpriority) AS BIGINT)
        |    AS n_priorities
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey, c.c_name
        |HAVING count(DISTINCT o.o_orderpriority) =
        |  (SELECT count(DISTINCT o_orderpriority) FROM orders)
        |ORDER BY c.c_custkey""".stripMargin,

    "sub_all" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier
        |WHERE s_acctbal > ALL (
        |  SELECT c_acctbal FROM customer
        |  WHERE c_nationkey = s_nationkey AND c_acctbal IS NOT NULL)
        |ORDER BY s_suppkey""".stripMargin,

    "sub_lateral" ->
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 1) t ON true
        |WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin
  )
}
