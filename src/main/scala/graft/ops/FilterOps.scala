package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Projections / filters / predicates (SURVEY.md §2.2).
  *
  * Every predicate here is a plain Catalyst expression, so it is
  * pushed to the Parquet scan (or evaluated inside whole-stage
  * codegen) — nothing materializes intermediate rows. At 100 TB the
  * only cost is the scan itself.
  */
object FilterOps extends OpPack {

  def queries: Map[String, Q] = Map(
    "filter_pred" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 &&
          (col("l_discount") < 0.02 || col("l_discount") > 0.08))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"))
    }),

    "filter_in" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") && col("l_quantity") <= 2)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    }),

    "filter_between" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate").between(lit("1999-06-01"), lit("1999-06-30")))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast("date").as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_date"))
    }),

    "filter_like" -> ((s, dir) => {
      Tables(s, dir, "part")
        .filter(col("p_type").like("%AND%") && col("p_name").like("%a%"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey"))
    }),

    "filter_null" -> ((s, dir) => {
      // Testdata has no physical NULLs; derive one with nullif-shaped
      // logic so IS NULL / IS NOT NULL are genuinely exercised.
      Tables(s, dir, "orders")
        .withColumn("maybe_status",
          when(col("o_orderstatus") === "O", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")))
        .filter(col("maybe_status").isNotNull && col("o_totalprice") > 490000)
        .select(col("o_orderkey"), col("maybe_status"))
        .orderBy(col("o_orderkey"))
    }),

    "project_expr" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49)
        .select(col("l_orderkey"), col("l_linenumber"),
          Tables.money(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("net_price"),
          Tables.money(col("l_extendedprice") * col("l_discount")).as("disc_amt"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("net_price"), col("disc_amt"))
    })
  )

  def oracle: Map[String, String] = Map(
    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity > 45 AND (l_discount < 0.02 OR l_discount > 0.08)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin,

    "filter_in" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_quantity <= 2
        |ORDER BY l_orderkey, l_linenumber, l_returnflag""".stripMargin,

    "filter_between" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1999-06-01' AND TIMESTAMP '1999-06-30'
        |ORDER BY l_orderkey, l_linenumber, ship_date""".stripMargin,

    "filter_like" ->
      """SELECT p_partkey, p_name, p_type
        |FROM part
        |WHERE p_type LIKE '%AND%' AND p_name LIKE '%a%'
        |ORDER BY p_partkey""".stripMargin,

    "filter_null" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS maybe_status
        |FROM orders
        |WHERE (CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END) IS NOT NULL
        |  AND o_totalprice > 490000
        |ORDER BY o_orderkey""".stripMargin,

    "project_expr" ->
      s"""SELECT l_orderkey, l_linenumber,
         |       ${Tables.sql.money("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS net_price,
         |       ${Tables.sql.money("l_extendedprice * l_discount")} AS disc_amt
         |FROM lineitem
         |WHERE l_quantity >= 49
         |ORDER BY l_orderkey, l_linenumber, net_price, disc_amt""".stripMargin
  )
}
