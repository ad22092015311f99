package graft.functions

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketch of a DOUBLE column as a native
  * imperative aggregate — the fixed-size answer to "p50/p90/p99 of a
  * 100 TB column" that `percentile` (exact, full sort/collect per
  * group) cannot give. Buffer = a heap `KllDoublesSketch(k)`; partials
  * merge associatively (KLL compaction commutes with merge up to its
  * declared rank error), so map-side combine applies and the driver
  * sees one ~KB sketch per group regardless of input size.
  *
  * Error contract: k=200 gives ~1.65 % one-sided normalized rank
  * error at 99 % confidence (Karnin-Lang-Liberty, FOCS 2016) —
  * SketchSpec pins the observed rank error of every reported
  * quantile under this bound against the exact order statistic.
  *
  * Determinism: KLL compaction keeps odd- or even-indexed survivors
  * by a random coin, so byte-identical reruns are NOT guaranteed once
  * n > k — this aggregate is approximate-by-design (rows-only
  * correctness, rule ③), unlike [[ThetaSketchAgg]] whose sub-capacity
  * regime is exact. The VALUES it reports are always true stream
  * members (KLL stores samples, never interpolates), and the rank
  * error bound holds on every run.
  */
case class KllDoublesAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a DOUBLE value, got ${child.dataType.sql}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllDoublesAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "kll_sketch_agg"
}

object KllSketch {
  /** Aggregate column: `kll_sketch_agg(doubleValue)` → KLL sketch
    * bytes (`binary`). */
  def agg(value: Column, k: Int = 200): Column =
    GraftExpressionBridge.column(
      KllDoublesAgg(GraftExpressionBridge.expression(value), k)
        .toAggregateExpression())

  /** Quantile estimate at `rank` ∈ [0,1] from sketch wire bytes
    * (INCLUSIVE criteria = the order-statistic convention
    * `percentile_disc` uses: smallest value whose inclusive rank ≥
    * `rank`). */
  def quantile(bytes: Array[Byte], rank: Double): Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    // an empty sketch (all-null input) has no order statistics —
    // NaN keeps the op total instead of throwing
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }
}

/** Misra-Gries frequent-items sketch of a LONG key column
  * (DataSketches `LongsSketch`) — heavy hitters in one pass with a
  * fixed `maxMapSize`-entry budget, the summary a 100 TB token/key
  * frequency scan keeps when the exact groupBy state is too big.
  * Partials merge by counter addition + shared purge, preserving the
  * guarantee `lb ≤ true ≤ ub` with `ub - lb ≤ getMaximumError`.
  *
  * Exactness contract (same shape as [[ThetaSketchAgg]]): while the
  * number of distinct keys stays under the sketch's purge capacity
  * (0.75·maxMapSize active slots), NO counter is ever decremented —
  * estimates are exact counts, `getMaximumError == 0`, and the result
  * is independent of partition order (pure counter addition). All
  * driver test scales sit in that regime (≤1000 distinct suppkeys vs
  * 1536 slots at the default 2048), so `agg_sketch_freq` carries a
  * real DuckDB oracle; above capacity the declared semantics degrade
  * to the Misra-Gries (ε = 3.5/maxMapSize)·N error band — SketchSpec
  * pins the over-capacity no-false-negative + error-band behavior.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a LONG key, got ${child.dataType.sql}")

  override def createAggregationBuffer(): LongsSketch =
    new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: LongsSketch, b2: LongsSketch): LongsSketch =
    b1.merge(b2)

  override def eval(buf: LongsSketch): Any = buf.toByteArray

  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "freq_items_agg"
}

object FreqSketch {
  /** Aggregate column: `freq_items_agg(longKey)` → frequent-items
    * sketch bytes (`binary`). */
  def agg(key: Column, maxMapSize: Int = 2048): Column =
    GraftExpressionBridge.column(
      FreqItemsAgg(GraftExpressionBridge.expression(key), maxMapSize)
        .toAggregateExpression())

  /** Heavy hitters with estimated count ≥ threshold, no false
    * negatives (every key whose TRUE count ≥ threshold is present;
    * exact ⇒ no false positives either). Returns (item, estimate)
    * sorted by the caller. */
  def frequentItems(bytes: Array[Byte], threshold: Long): Seq[(Long, Long)] = {
    val sk = LongsSketch.getInstance(Memory.wrap(bytes))
    sk.getFrequentItems(threshold, ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate)).toSeq
  }

  /** Total stream length recorded by the sketch (exact always). */
  def streamLength(bytes: Array[Byte]): Long =
    LongsSketch.getInstance(Memory.wrap(bytes)).getStreamLength

  /** Number of keys currently tracked (== exact distinct count while
    * under purge capacity; an undercount once purging starts). */
  def numActive(bytes: Array[Byte]): Long =
    LongsSketch.getInstance(Memory.wrap(bytes)).getNumActiveItems.toLong

  /** Worst-case overcount bound (0 while under purge capacity). */
  def maxError(bytes: Array[Byte]): Long =
    LongsSketch.getInstance(Memory.wrap(bytes)).getMaximumError
}
