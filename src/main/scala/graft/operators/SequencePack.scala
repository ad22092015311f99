package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Next-fit sequence packing — the training-data step that groups
  * documents into fixed-capacity context windows ("packs") before
  * tokenized examples are written out.
  *
  * Semantics (deterministic, engine-independent): within each group
  * (e.g. `(lang, shard)`), walk documents in ascending `idCol` order
  * keeping a running fill; when adding the next document would exceed
  * `capacity` tokens, close the pack and start a new one with that
  * document. A single document larger than `capacity` gets a pack of
  * its own. Pack ids are 0-based per group.
  *
  * Scale design: packing is inherently sequential *within* a group, so
  * the group is the parallelism unit — shard each language by a
  * deterministic key (`doc_id % nShards`) so every group fits one
  * task's memory and the 100 TB corpus packs in parallel across
  * `nLangs × nShards` tasks. `flatMapSortedGroups` rides Spark's
  * sort-based grouping: rows arrive already ordered by `idCol`, so no
  * per-group in-memory sort or buffering is needed — the fold is a
  * strict O(1)-state pass over the sorted iterator.
  */
object SequencePack {

  // Public: Dataset encoders generate bytecode that constructs these
  // reflectively; `private` members break the generated SafeProjection.
  case class DocTok(id: Long, grp_a: String, grp_b: Long, tok: Int)
  case class Packed(id: Long, grp_a: String, grp_b: Long,
      pack_id: Long, tok: Int)

  /** @param docs    frame with `idCol` (long), `tokCol` (int tokens),
    *                and the two grouping columns
    * @return one row per input doc: (idCol, grpA, grpB, pack_id, tok)
    */
  def apply(docs: DataFrame, idCol: String, tokCol: String,
      grpA: String, grpB: String, capacity: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(capacity > 0, s"capacity must be positive: $capacity")
    // totality on dirty rows: a NULL token count packs as 0 tokens, a
    // NULL group key groups under a sentinel partition (the encoder's
    // non-nullable Int/Long fields would otherwise throw)
    val typed = docs.select(
      col(idCol).cast("long").as("id"),
      col(grpA).cast("string").as("grp_a"),
      coalesce(col(grpB).cast("long"), lit(Long.MinValue)).as("grp_b"),
      coalesce(col(tokCol).cast("int"), lit(0)).as("tok")).as[DocTok]
    typed
      .groupByKey(d => (d.grp_a, d.grp_b))
      .flatMapSortedGroups($"id") { case ((a, b), it) =>
        var pack = 0L
        var fill = 0L
        it.map { d =>
          if (fill > 0 && fill + d.tok > capacity) { pack += 1; fill = 0 }
          fill += d.tok
          Packed(d.id, a, b, pack, d.tok)
        }
      }
      .toDF("id", grpA, grpB, "pack_id", "tok")
      .withColumnRenamed("id", idCol)
  }

  /** First-fit-decreasing packing — same contract as [[apply]] but
    * with the classic FFD placement: within each group, documents are
    * taken in DESCENDING token order (ties: ascending id) and each is
    * placed into the lowest-numbered open pack that still has room,
    * opening a new pack only when none fits. FFD's waste is bounded
    * (≤ 11/9·OPT + 6/9 bins) where next-fit can waste up to half of
    * every pack on unlucky orderings — the trade is that packs no
    * longer preserve document order, which is why BOTH variants exist
    * (next-fit when curriculum/order matters, FFD when utilization
    * does).
    *
    * Determinism: the (tok desc, id asc) order is total, and placement
    * is a pure fold over it — same packs every run, independent of
    * partitioning (the group is still the parallelism unit;
    * `flatMapSortedGroups` delivers the iterator pre-sorted, and the
    * open-bin state is O(bins) per group, bins ≈ Σtok/capacity for a
    * shard-sized group). The first-fit scan is O(bins) per doc — the
    * textbook FFD cost; shard groups keep it task-local.
    *
    * A document larger than `capacity` still gets a pack of its own
    * (placement can't fit it anywhere, so it opens a new pack).
    */
  def firstFitDecreasing(docs: DataFrame, idCol: String, tokCol: String,
      grpA: String, grpB: String, capacity: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(capacity > 0, s"capacity must be positive: $capacity")
    // totality on dirty rows: a NULL token count packs as 0 tokens, a
    // NULL group key groups under a sentinel partition (the encoder's
    // non-nullable Int/Long fields would otherwise throw)
    val typed = docs.select(
      col(idCol).cast("long").as("id"),
      col(grpA).cast("string").as("grp_a"),
      coalesce(col(grpB).cast("long"), lit(Long.MinValue)).as("grp_b"),
      coalesce(col(tokCol).cast("int"), lit(0)).as("tok")).as[DocTok]
    typed
      .groupByKey(d => (d.grp_a, d.grp_b))
      .flatMapSortedGroups($"tok".desc, $"id") { case ((a, b), it) =>
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.map { d =>
          var i = 0
          while (i < fills.length && fills(i) + d.tok > capacity) i += 1
          if (i == fills.length) fills += 0L
          fills(i) += d.tok
          Packed(d.id, a, b, i.toLong, d.tok)
        }
      }
      .toDF("id", grpA, grpB, "pack_id", "tok")
      .withColumnRenamed("id", idCol)
  }
}
