package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming next-fit sequence packing: the unbounded form of
  * [[graft.operators.SequencePack]] — documents arrive as a stream,
  * each (group) shard keeps its open pack as keyed state, and pack ids
  * continue seamlessly across micro-batches (a pack can span batches:
  * the open pack's fill carries over, so batch boundaries never force
  * padding waste).
  *
  * Determinism: arrival order within a micro-batch is not guaranteed
  * by Spark, so each batch's group iterator is sorted by `id` before
  * the fold — the assignment is then a pure function of (batch
  * partitioning, ids), and for a single-batch input it matches the
  * batch operator exactly (pinned by StreamingPackSpec).
  *
  * Scale: state per group is ONE (packId, fill) pair — O(groups)
  * total, no timeline buffering; the stream shuffles once per batch on
  * the group key into the state stores, exactly like any stateful agg.
  */
object StreamingSequencePack {

  /** One incoming document (pre-sharded: grp is e.g. "lang/shard"). */
  final case class DocIn(id: Long, grp: String, tok: Int)

  /** Open-pack state of one group. */
  final case class OpenPack(packId: Long, fill: Long)

  /** One assignment (append-mode output). */
  final case class Assigned(id: Long, grp: String, pack_id: Long, tok: Int)

  def assign(docs: Dataset[DocIn], capacity: Int): Dataset[Assigned] = {
    import docs.sparkSession.implicits._
    require(capacity > 0, s"capacity must be positive: $capacity")
    docs.groupByKey(_.grp)
      .flatMapGroupsWithState[OpenPack, Assigned](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (grp: String, it: Iterator[DocIn], state: GroupState[OpenPack]) =>
          val st = state.getOption.getOrElse(OpenPack(0L, 0L))
          var pack = st.packId
          var fill = st.fill
          val out = it.toArray.sortBy(_.id).map { d =>
            if (fill > 0 && fill + d.tok > capacity) { pack += 1; fill = 0 }
            fill += d.tok
            Assigned(d.id, grp, pack, d.tok)
          }
          state.update(OpenPack(pack, fill))
          out.iterator
      }
  }
}
