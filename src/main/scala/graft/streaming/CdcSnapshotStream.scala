package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC snapshot: maintain the current row state per key from
  * an unbounded change stream — the stateful, incremental form of the
  * batch `cdc_snapshot_latest` query, and the operator the reference's
  * channel consumer loop exists to feed (`client.go:144-162`: consume
  * events, apply to a materialized view).
  *
  * Semantics per event (reference event types, `event.go:167-183`):
  * `insert` / `update_after` upsert the key's state if the event is
  * newer by `(ts, eventId)`; `delete` removes it; `update_before` is a
  * no-op (the pre-image carries no new state). Out-of-order events
  * older than the current state are ignored — the state converges to
  * the same answer as the batch argmax regardless of arrival order
  * within a key.
  *
  * Scale: state lives in the executor state stores partitioned by key
  * (one shuffle of the incoming micro-batch). Live keys are O(table
  * size); delete tombstones are retained to block stale-event
  * resurrection and are evicted after `tombstoneTtl` (processing-time
  * timeout) — so total state is O(live keys + tombstones younger than
  * the TTL). With `tombstoneTtl = None` tombstones are kept forever
  * (choose this only when the stream is strictly ordered per key or
  * key reuse is impossible). Emitted rows are the *changed* snapshots
  * of each micro-batch (update-mode delta), so downstream sinks see a
  * changelog, not a rescan.
  */
object CdcSnapshotStream {

  /** One change event (envelope subset sufficient for state). */
  final case class Change(
      userId: Int, eventId: Long, ts: Long, eventType: String, value: Double)

  /** Current state of one key (None after delete → emitted tombstone). */
  final case class Snapshot(
      userId: Int, eventId: Long, ts: Long, value: Double, deleted: Boolean)

  def updateKey(tombstoneTtl: Option[String])(userId: Int,
      events: Iterator[Change],
      state: GroupState[Snapshot]): Iterator[Snapshot] = {
    // Timeouts are armed only on tombstones: a fired timeout means the
    // tombstone outlived its TTL — evict it.
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    // Apply this batch's events newest-last within the key.
    val sorted = events.toSeq.sortBy(e => (e.ts, e.eventId))
    var cur = state.getOption
    var changed = false
    sorted.foreach { e =>
      // The tombstone keeps the delete's (ts, eventId), so the same
      // newer-than test governs re-insert after delete: a genuinely
      // newer insert revives the key, a stale one stays dead (until
      // the tombstone's TTL evicts it).
      val newer = cur.forall(s =>
        e.ts > s.ts || (e.ts == s.ts && e.eventId > s.eventId))
      e.eventType match {
        case "insert" | "update_after" if newer =>
          cur = Some(Snapshot(userId, e.eventId, e.ts, e.value,
            deleted = false)); changed = true
        case "delete" if newer =>
          cur = Some(Snapshot(userId, e.eventId, e.ts, e.value,
            deleted = true)); changed = true
        case _ => // update_before / stale event: no state change
      }
    }
    cur.foreach { s =>
      state.update(s)
      // Spark clears a group's timeout on every invocation; re-arm it
      // while (and only while) the state is a tombstone.
      if (s.deleted) tombstoneTtl.foreach(state.setTimeoutDuration)
    }
    if (changed) cur.iterator else Iterator.empty
  }

  /** Wire the stateful snapshot over a stream of changes. Use with
    * `OutputMode.Update` — each micro-batch emits only keys whose
    * snapshot changed. `tombstoneTtl` (e.g. `"30 minutes"`) bounds how
    * long delete tombstones occupy the state store. */
  def snapshots(changes: Dataset[Change],
      tombstoneTtl: Option[String] = None): Dataset[Snapshot] = {
    implicit val enc = Encoders.product[Snapshot]
    val timeoutConf =
      if (tombstoneTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    changes
      .groupByKey(_.userId)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Update,
        timeoutConf)(updateKey(tombstoneTtl))
  }
}
