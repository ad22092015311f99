package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two `array<float|double>` columns.
  *
  * The higher-order-function encoding `aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)` allocates an intermediate array and interprets two
  * lambdas per row — per-pair cost that dominates every vector operator
  * (kNN join, embedding near-dup, IVF ANN) at scale. This expression
  * compiles to a tight loop over the unsafe array data inside
  * whole-stage codegen: no allocation, no virtual calls in the hot
  * path.
  *
  * Accumulation is left-to-right in double precision — bit-identical to
  * the HOF fold it replaces (and to DuckDB's `list_cosine_similarity`
  * evaluation order), so oracle hashes are unaffected.
  *
  * Null semantics: null array on either side ⇒ null, and arrays of
  * DIFFERENT lengths ⇒ null — matching the HOF fold, where zip_with
  * pads the shorter side with nulls and the null product poisons the
  * sum. A silent truncation here would return a plausible partial dot
  * product for ragged/corrupt rows. Null *elements* are not expected
  * (embeddings are dense); their slot value is read as-is, matching
  * the HOF's behavior on unsafe arrays.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elem(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other           => other
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if Seq(a, b).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elem(left) == FloatType
    val rf = elem(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val a = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val b = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += a * b
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elem(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elem(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $x.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $x.$lGet($i) * (double) $y.$rGet($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** Native codegen'd SQUARED Euclidean distance over two
  * `array<float|double>` columns — the other half of the vector-
  * similarity surface (cosine ranks by angle, L2 by magnitude-aware
  * distance; IVF literature uses both). Squared deliberately: the
  * sqrt is monotone, so rankings are identical without it, and the
  * sum of squared diffs stays a single left-to-right double
  * accumulation — the same evaluation-order discipline as
  * [[DotProduct]]. Same null semantics: null side ⇒ null, ragged
  * lengths ⇒ null, never a silent partial distance. */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elem(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other           => other
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if Seq(a, b).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elem(left) == FloatType
    val rf = elem(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val a = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val b = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = a - b
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elem(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elem(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $x.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $d =
         |      (double) $x.$lGet($i) - (double) $y.$rGet($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceSq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_distance_sq"
}

/** Native codegen'd PQ ASYMMETRIC-DISTANCE computation: L1 distance
  * between a fixed-point probe vector (`array<bigint>`, the µ-unit
  * encoding of llm_vec_pq) and the GRID RECONSTRUCTION of a product-
  * quantized code (`array<bigint>` of per-subvector digits). The grid
  * is the format's pinned llm_vec_pq contract — digit d reconstructs
  * to `d·250000 − 875000` µ-units, every element of a subvector
  * sharing its digit — fused here so the ADC scan neither allocates a
  * reconstruction array nor interprets a lambda per element (the
  * higher-order `aggregate(sequence(...))` form it replaces pays
  * ~86 µs/vector at 64 dims; this is a tight codegen loop). Subvector
  * width = probe length / code length; ragged inputs (null side,
  * empty code, non-divisible lengths) ⇒ null, never a partial
  * distance. Arithmetic is pure integer, so results are bit-identical
  * to the HOF fold and the DuckDB oracle. */
case class PqAdcL1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (m == 0 || n % m != 0) return null
    val w = n / m
    var s = 0L
    var i = 0
    while (i < n) {
      val recon = y.getLong(i / w) * 250000L - 875000L
      s += math.abs(x.getLong(i) - recon)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val w = ctx.freshName("w")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      val recon = ctx.freshName("recon")
      s"""
         |final int $n = $x.numElements();
         |final int $m = $y.numElements();
         |if ($m == 0 || $n % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $w = $n / $m;
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $recon = $y.getLong($i / $w) * 250000L - 875000L;
         |    $s += java.lang.Math.abs($x.getLong($i) - $recon);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcL1 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc_l1"
}

/** Column-API entry points for the native vector expressions. */
object VectorFunctions {

  /** Fused PQ ADC L1 distance (native, codegen'd) — see [[PqAdcL1]]. */
  def pqAdcL1(probe: Column, digits: Column): Column =
    GraftExpressionBridge.column(PqAdcL1(
      GraftExpressionBridge.expression(probe),
      GraftExpressionBridge.expression(digits)))

  /** `Σ (a(i)−b(i))²` in double precision (native, codegen'd). */
  def l2DistanceSq(a: Column, b: Column): Column =
    GraftExpressionBridge.column(L2DistanceSq(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  /** `Σ a(i)·b(i)` in double precision (native, codegen'd). */
  def dotProduct(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DotProduct(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  /** Cosine similarity `a·b / (|a|·|b|)` — same formula shape
    * (`dot/sqrt(dot)/sqrt(dot)`) as the HOF version it replaces, so
    * float behavior is unchanged. */
  def cosineSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotProduct(a, b) / sqrt(dotProduct(a, a)) / sqrt(dotProduct(b, b))
  }

  /** Appends a unit-normalized double copy of `embCol` as `outCol`
    * (cast → L2 norm via one native dot → elementwise divide). The
    * shared normalize-once-per-row step of every cosine pair join
    * (llm_dedup_embed, llm_dedup_semantic): one dot per PAIR
    * afterwards instead of three. */
  def withUnitVector(df: org.apache.spark.sql.DataFrame, embCol: String,
      outCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, sqrt, transform}
    df.withColumn("__d", transform(col(embCol), x => x.cast("double")))
      .withColumn("__norm", sqrt(dotProduct(col("__d"), col("__d"))))
      .withColumn(outCol, transform(col("__d"), x => x / col("__norm")))
      .drop("__d", "__norm")
  }
}
