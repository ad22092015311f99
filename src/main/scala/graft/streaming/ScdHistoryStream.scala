package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD-type-2 maintenance: build the versioned dimension
  * history incrementally from an unbounded change stream — the
  * stateful form of the batch `cdc_scd2` query (the warehouse
  * materialization of the reference's before/after pairing,
  * `event.go:177-183`, generalized to full history).
  *
  * Semantics: events apply per key in `eventId` order (a CDC feed is
  * ordered per key by GTID — `client.go:144-162` delivers in wire
  * order; cross-key order is irrelevant). Each change CLOSES the
  * key's open version (emits it with `validToEvent` set) and opens
  * the next one (emitted with `isCurrent = true`). A stale event
  * (eventId at-or-below the open version's) is ignored — replays
  * cannot fork the history. The last emission per (key, version) is
  * therefore exactly the batch cdc_scd2 row, whatever the micro-batch
  * boundaries were — pinned in ScdHistoryStreamSpec against the batch
  * query on the same replayed log.
  *
  * Scale: state is ONE open row + a version counter per key (the
  * closed history lives in the sink, not the store), shuffled on the
  * key like every stateful operator — a 100 TB dimension's state is
  * O(live keys), and each micro-batch touches only its own keys.
  */
object ScdHistoryStream {

  /** One change event (envelope subset sufficient for versioning). */
  final case class Change(
      userId: Int, eventId: Long, eventType: String, value: Double)

  /** One SCD2 history row. `validToEvent = None` + `isCurrent` marks
    * the open version; a later batch re-emits it closed. */
  final case class ScdRow(userId: Int, eventId: Long, eventType: String,
      value: Double, version: Int, validToEvent: Option[Long],
      isCurrent: Boolean)

  private def updateKey(userId: Int, events: Iterator[Change],
      state: GroupState[ScdRow]): Iterator[ScdRow] = {
    val sorted = events.toSeq.sortBy(_.eventId)
    var cur = state.getOption
    val out = Seq.newBuilder[ScdRow]
    sorted.foreach { e =>
      if (cur.forall(_.eventId < e.eventId)) {
        cur.foreach { open =>
          out += open.copy(validToEvent = Some(e.eventId),
            isCurrent = false)
        }
        val next = ScdRow(userId, e.eventId, e.eventType, e.value,
          cur.map(_.version).getOrElse(0) + 1, None, isCurrent = true)
        out += next
        cur = Some(next)
      } // else: stale replay — the history already covers it
    }
    cur.foreach(state.update)
    out.result().iterator
  }

  /** Wire the stateful history over a stream of changes. Use with
    * `OutputMode.Update`: each micro-batch emits the versions it
    * closed plus the new open version — downstream keeps the LAST
    * emission per (key, version). */
  def history(changes: Dataset[Change]): Dataset[ScdRow] = {
    implicit val enc = Encoders.product[ScdRow]
    changes
      .groupByKey(_.userId)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateKey)
  }
}
