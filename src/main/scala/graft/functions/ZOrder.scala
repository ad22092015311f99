package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** 2-D Morton (Z-order) curve key: interleaves the low `bits` bits of
  * two integer dimension expressions into a single sort key. Sorting /
  * range-partitioning a table by this key clusters BOTH dimensions at
  * once, so parquet footer min/max stats prune files for predicates on
  * either column — the multi-dimensional data-layout trick behind
  * Delta/Iceberg Z-ordering, expressed here as a pure codegen'd
  * Catalyst expression (`aggregate` over a constant-folded `sequence`,
  * no UDF, stays inside whole-stage codegen).
  *
  * Cross-engine note: built only from shiftleft/shiftright/&, which
  * DuckDB expresses identically (`<<`/`>>`/`&` over BIGINT), so
  * Z-values are oracle-checkable bit-for-bit.
  */
object ZOrder {

  /** Morton key over two SQL fragments (cast to BIGINT internally).
    * `bits` per dimension, so the result occupies `2*bits` bits. */
  def zvalue(x: String, y: String, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    expr(
      s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) ->
         |  acc + shiftleft(shiftright(CAST(($x) AS BIGINT), i) & 1, 2*i)
         |      + shiftleft(shiftright(CAST(($y) AS BIGINT), i) & 1, 2*i+1))
         |""".stripMargin)
  }

  /** Reference implementation for property tests. */
  def zvalueRef(x: Long, y: Long, bits: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < bits) {
      acc += (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
      i += 1
    }
    acc
  }
}
