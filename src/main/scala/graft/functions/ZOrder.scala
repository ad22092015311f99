package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** 2-D Morton (Z-order) curve key: interleaves the low `bits` bits of
  * two integer dimension expressions into a single sort key. Sorting /
  * range-partitioning a table by this key clusters BOTH dimensions at
  * once, so parquet footer min/max stats prune files for predicates on
  * either column — the multi-dimensional data-layout trick behind
  * Delta/Iceberg Z-ordering.
  *
  * The interleave is the classic magic-mask bit spread
  * (v|v<<8 & 0x00FF00FF, …, v|v<<1 & 0x55555555) — pure bitwise
  * arithmetic over BIGINT, so it stays inside whole-stage codegen
  * (a higher-order `aggregate` fold would be CodegenFallback), and
  * DuckDB evaluates the identical expression with `<<`/`|`/`&`, so
  * Z-values are oracle-checkable bit-for-bit.
  */
object ZOrder {

  private val steps =
    Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `v` to even bit positions, as SQL text;
    * `shl` renders a left shift in the target dialect. */
  private def spread(v: String, shl: (String, Int) => String): String =
    steps.foldLeft(v) { case (acc, (s, mask)) =>
      s"((($acc) | ${shl(acc, s)}) & $mask)"
    }

  private def zSql(x: String, y: String, bits: Int,
      shl: (String, Int) => String): String = {
    require(bits >= 1 && bits <= 16, s"bits out of range: $bits")
    val mask = (1L << bits) - 1
    val xs = spread(s"(CAST(($x) AS BIGINT) & $mask)", shl)
    val ys = spread(s"(CAST(($y) AS BIGINT) & $mask)", shl)
    s"($xs + 2 * $ys)"
  }

  /** Morton key over two Spark SQL fragments. */
  def zvalue(x: String, y: String, bits: Int): Column =
    expr(zSql(x, y, bits, (e, s) => s"shiftleft($e, $s)"))

  /** The identical expression in DuckDB dialect, for oracle SQL. */
  def duckdbZ(x: String, y: String, bits: Int): String =
    zSql(x, y, bits, (e, s) => s"(($e) << $s)")

  /** The same computation as a composed Catalyst expression tree —
    * used by [[graft.GraftExtensions]] to register the SQL function
    * `zorder_key(x, y[, bits])`. Built entirely from existing codegen
    * primitives (shift/and/or/add), so no new Expression class and no
    * codegen fallback. */
  def zExprTree(x: org.apache.spark.sql.catalyst.expressions.Expression,
      y: org.apache.spark.sql.catalyst.expressions.Expression,
      bits: Int): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    require(bits >= 1 && bits <= 16, s"bits out of range: $bits")
    def spread(v: Expression): Expression =
      steps.foldLeft(v) { case (acc, (s, mask)) =>
        BitwiseAnd(BitwiseOr(acc, ShiftLeft(acc, Literal(s))),
          Literal(mask))
      }
    val m = Literal((1L << bits) - 1)
    val xs = spread(BitwiseAnd(Cast(x, LongType), m))
    val ys = spread(BitwiseAnd(Cast(y, LongType), m))
    Add(xs, Multiply(Literal(2L), ys))
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
