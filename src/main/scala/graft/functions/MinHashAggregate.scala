package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash signature as ONE imperative aggregate (the SURVEY §2.3-②
  * "TypedImperativeAggregate for MinHash at 100 TB" upgrade).
  *
  * The declarative form — `numHashes` separate `min(mix(i, h))`
  * aggregates — works but generates `numHashes` update expressions per
  * row inside the hash-aggregate codegen; at 128 hashes the generated
  * update method is enormous. This aggregate keeps one `long[numHashes]`
  * buffer and updates it in a tight JVM loop: per input row, one
  * expression evaluation (the pre-hashed token `h`) plus `numHashes`
  * integer mixes.
  *
  * The i-th hash function is a splitmix64-style finalizer over
  * `h + GOLDEN·(i+1)` — a standard pairwise-independent-enough family
  * for LSH banding. Only candidate *recall* depends on the family; the
  * dedup output is exact-verified afterwards, so any strong mixer is
  * semantically safe.
  *
  * Buffer is fixed-width; `merge` is elementwise min, so partial
  * aggregation (map-side combine) applies exactly like any min.
  */
case class MinHashSignature(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a LONG (pre-hashed token), got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  private val GOLDEN = 0x9e3779b97f4a7c15L

  @inline private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val m = mix(h + GOLDEN * (i + 1))
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    var i = 0
    while (i < numHashes) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSignature =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  /** Aggregate column: `minhash_signature(preHashedToken)` →
    * `array<long>` of length `numHashes`. */
  def of(preHashed: Column, numHashes: Int): Column =
    GraftExpressionBridge.column(
      MinHashSignature(GraftExpressionBridge.expression(preHashed), numHashes)
        .toAggregateExpression())
}
