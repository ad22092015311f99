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
    val typed = docs.select(
      col(idCol).cast("long").as("id"),
      col(grpA).cast("string").as("grp_a"),
      col(grpB).cast("long").as("grp_b"),
      col(tokCol).cast("int").as("tok")).as[DocTok]
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
}
