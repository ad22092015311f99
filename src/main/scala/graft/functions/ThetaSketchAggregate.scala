package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Theta sketch of a LONG key column as a native imperative aggregate
  * (Apache DataSketches `theta.Union` buffer) — the mergeable summary
  * that, unlike HLL, supports set INTERSECTION and DIFFERENCE between
  * segments after the fact: materialize one KB-sized sketch per
  * segment once, then answer "users in A ∩ B" for arbitrary segment
  * pairs without rescanning the fact table. (Spark 4 ships HLL
  * functions but no theta surface — this is the §2.3-② custom-
  * aggregate extension point, same shape as [[MinHashSignature]].)
  *
  * Buffer = a theta Union; `update` feeds raw longs, `merge` unions
  * the partial's compact sketch — commutative/associative/idempotent
  * (retain-min-hashes under a shared theta), so map-side combine
  * applies and the result is independent of partition order. Output
  * is the compact sketch's wire bytes (`BinaryType`), consumed by
  * [[ThetaSketch.estimate]] / [[ThetaSketch.intersect]].
  *
  * Determinism/exactness contract (what lets the query carry a DuckDB
  * oracle): below the sketch's nominal capacity (default lgK=12 →
  * 4096 retained hashes) a theta sketch is EXACT — it holds every
  * distinct key's hash, `getEstimate` is integral, and intersection
  * counts shared 64-bit hashes (collisions across ≤4k keys:
  * ~1e-13, and in any case FIXED for fixed input). Above capacity it
  * degrades to an estimate — declared semantics, mirrored by the
  * rows-only fallback the ANN family uses.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a LONG key, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult())
    b1
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult().toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.heapifyCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "theta_sketch_agg"
}

object ThetaSketch {
  /** Aggregate column: `theta_sketch_agg(longKey)` → compact sketch
    * bytes (`binary`). `lgK` is the CAPACITY knob: the sketch is
    * EXACT below 2^lgK retained hashes (default lgK=12 → 4096),
    * estimate-regime above — size the nominal capacity to the
    * segment cardinality the exactness contract must cover. */
  def agg(key: Column, lgK: Int = 12): Column =
    GraftExpressionBridge.column(
      ThetaSketchAgg(GraftExpressionBridge.expression(key), lgK)
        .toAggregateExpression())

  /** Distinct-count estimate of a compact sketch (exact below the
    * sketch's nominal capacity). */
  def estimate(bytes: Array[Byte]): Long =
    math.rint(Sketches.heapifyCompactSketch(Memory.wrap(bytes))
      .getEstimate).toLong

  /** Intersection cardinality estimate of two compact sketches. */
  def intersect(a: Array[Byte], b: Array[Byte]): Long = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.heapifyCompactSketch(Memory.wrap(a)))
    i.intersect(Sketches.heapifyCompactSketch(Memory.wrap(b)))
    math.rint(i.getResult().getEstimate).toLong
  }
}
