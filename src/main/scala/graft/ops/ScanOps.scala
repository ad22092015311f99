package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Scans / sources (SURVEY.md §2.2 "Scans / sources / sinks").
  *
  * These exist to prove the scan path is scale-correct: `scan_pruned`
  * must show only two columns in `ReadSchema`, `scan_pushdown` must
  * show the shipdate range under `PushedFilters` — i.e. Catalyst pushes
  * both projection and predicate into the vectorized Parquet reader,
  * which is what makes a 100 TB scan feasible (read 2 columns of a
  * 16-column table, skip row groups by min/max stats).
  */
object ScanOps extends OpPack {

  def queries: Map[String, Q] = Map(
    "scan_parquet" -> ((s, dir) => {
      // Count-shaped full-scan: the aggregate is computed per input
      // partition (partial) then merged — no wide shuffle of raw rows.
      Tables(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(col("l_linenumber").cast("long")).as("sum_linenumber"))
    }),

    "scan_pruned" -> ((s, dir) => {
      // Column-pruned scan: ReadSchema must contain exactly these cols.
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        // (l_orderkey, l_linenumber) is NOT unique in the testdata —
        // total order needs every output column.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    "scan_pushdown" -> ((s, dir) => {
      // Predicate pushed to Parquet (PushedFilters: [GreaterThanOrEqual,
      // LessThan] on l_shipdate) → row-group skipping at scale.
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
                col("l_shipdate") <  lit("1997-07-01"))
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_shipdate").cast("date").as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_date"))
    })
  )

  def oracle: Map[String, String] = Map(
    "scan_parquet" ->
      """SELECT count(*) AS n_rows,
        |       count(DISTINCT l_orderkey) AS n_orders,
        |       CAST(sum(l_linenumber) AS BIGINT) AS sum_linenumber
        |FROM lineitem""".stripMargin,

    "scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    "scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-07-01'
        |ORDER BY l_orderkey, l_linenumber, ship_date""".stripMargin
  )
}
