package graft.ops

import graft.Tables
import graft.Tables.money
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-semantics operators (SURVEY.md §2.2 "CDC-semantics"), run over
  * the `events` table as the CDC log stand-in. Each derives from a
  * concrete reference behavior (cited per query).
  *
  * Scale notes: snapshot/update-pair windows partition by the row key
  * (`user_id`) — state per key, one shuffle, no global ordering needed;
  * resume-from-GTID is a pushed-down range filter on the sequence
  * column (at rest this is a parquet min/max-pruned scan, on the wire
  * it is the server-side `WithGTID` skip, `client.go:122-126`).
  */
object CdcOps extends OpPack {

  def queries: Map[String, Q] = Map(
    // R14 `client.go:410-412`: DML ⇔ line starts with {"domain":.
    // Synthesize a raw JSON line per event (DDL-shaped every 10th) and
    // classify by prefix, exactly like the reference's isDMLEvent.
    "cdc_classify" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("raw",
          when(col("event_id") % 10 === 0,
            lit("""{"type": "record", "name": "ChangeRecord"}"""))
            .otherwise(concat(lit("{\"domain\": "),
              pmod(col("user_id"), lit(4)), lit("}"))))
        .select(col("event_id"),
          when(col("raw").startsWith("{\"domain\":"), "dml")
            .otherwise("ddl").as("kind"))
        .orderBy(col("event_id"))
    }),

    // R19 `event.go:216-218`: GTID = "{domain}-{server_id}-{sequence}"
    // with the synthetic mapping domain≔user_id%4, server≔3000,
    // seq≔event_id.
    "cdc_gtid" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_id"),
          concat_ws("-", pmod(col("user_id"), lit(4)), lit(3000),
            col("event_id")).as("gtid"))
        .orderBy(col("event_id"))
    }),

    // R20 `event.go:220-236`: envelope-strip projection — drop the
    // metadata columns, keep key + payload.
    "cdc_tabledata" -> ((s, dir) => {
      Tables(s, dir, "events")
        .drop("ts", "user_id", "event_type")
        .select(col("event_id"), money(col("value")).as("value"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id"))
    }),

    // The consumer pattern the channel API exists for
    // (`client.go:144-162`): materialize current state = latest event
    // per key. ts is monotone in event_id (TESTDATA), so the (ts desc,
    // event_id desc) order agrees across engines despite ns→µs.
    // max_by instead of a row_number window: the aggregate gets
    // map-side partial aggregation, so the shuffle carries one row per
    // (map partition, key) instead of the entire log — at 100 TB the
    // window variant shuffles and sorts every event; this shuffles
    // ~|keys| rows. (ts, event_id) is unique per user, so the argmax
    // is deterministic.
    "cdc_snapshot_latest" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("event_id"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("latest"))
        .select(col("user_id"), col("latest.event_id").as("event_id"),
          col("latest.event_type").as("event_type"),
          money(col("latest.value")).as("value"))
        .orderBy(col("user_id"))
    }),

    // Right-to-be-forgotten audit (the GDPR/CCPA erasure planner a
    // CDC-fed warehouse must run before acting on delete requests):
    // a deterministic md5-coin tombstone set (~1/8 of customers
    // standing in for the day's erasure queue), then the cascade
    // footprint — affected customers, their orders, those orders'
    // line items — as per-table purge counts plus the revenue cents
    // leaving the books. Each cascade leg is a key-co-partitioned
    // LEFT SEMI join (the tombstone side is tiny ⇒ AQE broadcasts
    // it, so at 100 TB the fact tables are probed map-side, never
    // reshuffled); the three 1-row aggregates union to a fixed 3-row
    // report.
    "cdc_forget_audit" -> ((s, dir) => {
      val tomb = Tables(s, dir, "customer")
        .filter(expr("substr(md5(concat('gdpr', CAST(c_custkey AS " +
          "STRING))), 1, 1)").isin("0", "1"))
        .select(col("c_custkey"))
      val ords = Tables(s, dir, "orders")
        .join(tomb.withColumnRenamed("c_custkey", "o_custkey"),
          Seq("o_custkey"), "left_semi")
      val lis = Tables(s, dir, "lineitem")
        .join(ords.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_semi")
      val c = tomb.agg(count(lit(1)).as("n_purge"),
          lit(0L).as("purged_cents"))
        .withColumn("tbl", lit("customer"))
      val o = ords.agg(count(lit(1)).as("n_purge"),
          coalesce(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")),
            lit(0L)).as("purged_cents"))
        .withColumn("tbl", lit("orders"))
      val l = lis.agg(count(lit(1)).as("n_purge"),
          coalesce(sum(expr("CAST(round(l_extendedprice * 100) " +
            "AS BIGINT)")), lit(0L)).as("purged_cents"))
        .withColumn("tbl", lit("lineitem"))
      c.unionByName(o).unionByName(l)
        .select(col("tbl"), col("n_purge"), col("purged_cents"))
        .orderBy(col("tbl"))
    }),

    // Time travel: the materialized table state AS OF three log
    // positions (event_id quartiles — collected scalars, same pattern
    // as ts_cusum's drift constant) in ONE hash aggregation: per key,
    // three conditional max_by's (ordering key nulled past the
    // boundary; max_by skips null keys in both engines), stacked to
    // long format (version, as_of_event, state). ts is monotone in
    // event_id (TESTDATA), so event_id order == time order. At
    // 100 TB: one |keys| shuffle serves EVERY requested version —
    // the per-version-rescan alternative pays the scan per snapshot.
    "cdc_time_travel" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val q = ev.agg(
        expr("CAST(percentile_disc(0.25) WITHIN GROUP " +
          "(ORDER BY event_id) AS BIGINT)"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP " +
          "(ORDER BY event_id) AS BIGINT)"),
        expr("CAST(percentile_disc(0.75) WITHIN GROUP " +
          "(ORDER BY event_id) AS BIGINT)"))
        .collect()(0)
      // empty events: NULL percentiles; any literal keeps the op
      // total (the grouped frame below is empty anyway)
      def qAt(i: Int) = if (q.isNullAt(i)) 0L else q.getLong(i)
      val (q1, q2, q3) = (qAt(0), qAt(1), qAt(2))
      def snapAt(b: Long) = max_by(
        struct(col("event_id"), col("event_type"), col("value")),
        when(col("event_id") <= b, col("event_id")))
      ev.groupBy(col("user_id"))
        .agg(snapAt(q1).as("s1"), snapAt(q2).as("s2"), snapAt(q3).as("s3"))
        .selectExpr("user_id",
          s"stack(3, 1, CAST($q1 AS BIGINT), s1, " +
            s"2, CAST($q2 AS BIGINT), s2, " +
            s"3, CAST($q3 AS BIGINT), s3) AS (version, as_of_event, sn)")
        .filter(col("sn").isNotNull)
        .select(col("version"), col("as_of_event"), col("user_id"),
          col("sn.event_id").as("event_id"),
          col("sn.event_type").as("event_type"),
          money(col("sn.value")).as("value"))
        .orderBy(col("version"), col("user_id"))
    }),

    // Log compaction with tombstone GC (the Kafka-compacted-topic /
    // delete-retention semantics a long-lived CDC changelog needs —
    // the reference's consumer materializes state forever,
    // client.go:144-162; compaction is what makes that affordable):
    // latest event per key (same map-side-combined max_by as
    // cdc_snapshot_latest); keys whose latest is a delete ('error',
    // the cdc_merge_upsert convention) stay as TOMBSTONES only while
    // recent enough for lagging consumers to observe — past the
    // retention cutoff (bottom 99% of the event_id range; ts is
    // monotone in event_id) they are PURGED from the compacted log.
    // The cutoff is a broadcast 1-row aggregate; at 100 TB compaction
    // is one |keys|-row shuffle + a broadcast scalar, never a re-sort.
    "cdc_compact" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val latest = ev.groupBy(col("user_id"))
        .agg(max_by(
          struct(col("event_id"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("latest"))
        .select(col("user_id"), col("latest.event_id").as("event_id"),
          col("latest.event_type").as("event_type"),
          money(col("latest.value")).as("value"))
      val cut = ev.agg(expr("max(event_id) * 99 div 100").as("cutoff"))
      latest.crossJoin(broadcast(cut))
        .withColumn("op",
          when(col("event_type") =!= "error", "live")
            .when(col("event_id") > col("cutoff"), "tombstone"))
        .filter(col("op").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("op"))
        .orderBy(col("user_id"))
    }),

    // `event.go:177-183`: update_before/update_after adjacency — pair
    // each event with its per-user successor via lead.
    "cdc_update_pairs" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .withColumn("next_event_id", lead(col("event_id"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("value_delta",
          money(lead(col("value"), 1).over(w) - col("value")))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("next_event_id"), col("next_type"), col("value_delta"))
        .orderBy(col("event_id"))
    }),

    // `WithGTID` resume (`client.go:122-126`, pinned by
    // `client_test.go:169-267`): everything at-or-after the offset, in
    // order. The >= filter is pushed to the parquet scan.
    "cdc_resume_gtid" -> ((s, dir) => {
      Tables(s, dir, "events")
        .filter(col("event_id") >= 500)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    // Per-(domain, server) GTID watermark map — the batch analogue of
    // the streaming source's per-stream resume state (the multi-domain
    // generalization of `WithGTID`, client.go:122-126): highest
    // delivered sequence and event count per replication stream, using
    // the same synthetic mapping as cdc_gtid.
    "cdc_watermarks" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("domain", pmod(col("user_id"), lit(4)))
        .withColumn("server_id", lit(3000))
        .groupBy(col("domain"), col("server_id"))
        .agg(max(col("event_id")).as("watermark_seq"),
          count(lit(1)).as("n_events"))
        .orderBy(col("domain"))
    }),

    // Per-stream staleness monitor (the "is replication healthy"
    // readout beside cdc_watermarks' position): per event_type, the
    // last-seen age vs the log head and the worst observed
    // inter-event gap — a stream whose lag_s exceeds its historical
    // max_gap_s has stalled, not merely slowed. ONE type-keyed
    // window (lag) + one hash agg; the log-head max rides a window
    // over the |types|-row aggregate, never the fact.
    "cdc_staleness" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("es"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("es"), col("event_id"))
      val g = e.withColumn("gap",
          col("es") - lag(col("es"), 1).over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          max(col("es")).as("last_es"),
          max(col("gap")).as("max_gap_s"))
      g.withColumn("head_es",
          max(col("last_es")).over(Window.partitionBy()))
        .select(col("event_type"), col("n_events"), col("max_gap_s"),
          (col("head_es") - col("last_es")).as("lag_s"),
          (col("head_es") - col("last_es") > col("max_gap_s"))
            .as("stalled"))
        .orderBy(col("event_type"))
    }),

    // SCD-type-2 history build: every change event opens a new version
    // of its key and closes the previous one (valid range expressed in
    // event_ids — ts is monotone in event_id per TESTDATA, and raw ns
    // timestamps must never be output). This is the standard warehouse
    // materialization of a CDC feed (the reference's update_before/
    // update_after pairing, event.go:177-183, generalized to full
    // history). One window per key partition — a single shuffle on
    // user_id, no global sort, state O(1) per row at 100 TB.
    "cdc_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          money(col("value")).as("value"))
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to_event", lead(col("event_id"), 1).over(w))
        .withColumn("is_current", col("valid_to_event").isNull)
        .orderBy(col("user_id"), col("version"))
    }),

    // MERGE-INTO semantics over the log: the base snapshot (latest
    // state per key at event_id < 800) has a delta batch (event_id >=
    // 800) applied — delta 'error' finals delete the key, other keys
    // upsert, untouched keys survive. This is the warehouse MERGE a
    // lakehouse engine runs per micro-batch; both snapshots are one
    // keyed window each and the merge is a single full-outer join on
    // the key — two shuffles total regardless of table size, and the
    // delta side is typically small enough to broadcast at 100 TB.
    "cdc_merge_upsert" -> ((s, dir) => {
      mergeUpsert(
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            money(col("value")).as("value")),
        splitAt = 800)
    }),

    // Incremental aggregate maintenance: per-key partial aggregates of
    // the base log merged with the delta batch's partials — count adds,
    // sum adds — and the merged result must equal a full recompute
    // (which is exactly what the oracle runs). The partial-merge shape
    // is why 100 TB aggregation streams: each micro-batch shuffles only
    // ITS rows; history is never re-read.
    "cdc_incremental_agg" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"))
      // Partials carry the same exact decimal(28,2) as Tables.moneySum,
      // so partial-merge and full recompute agree bit-for-bit.
      def partial(df: DataFrame, tag: String) =
        df.groupBy(col("user_id"))
          .agg(count(lit(1)).as(s"n_$tag"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
              .as(s"s_$tag"))
      val base = partial(ev.filter(col("event_id") < 800), "b")
      val delta = partial(ev.filter(col("event_id") >= 800), "d")
      base.join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
            .as("n_events"),
          round((coalesce(col("s_b"), lit(0)) + coalesce(col("s_d"), lit(0)))
            .cast("double"), 2).as("sum_value"))
        .orderBy(col("user_id"))
    }),

    // Incremental JOIN-view maintenance (IVM) from CDC deltas — the
    // delta-join algebra: for view V = A ⋈ B and arriving deltas,
    // ΔV = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB, merged into V's mergeable
    // aggregate state (count + exact decimal sum). The point at
    // 100 TB: maintaining the view touches only delta-sized joins —
    // ΔA⋈B broadcasts the dim, A⋈ΔB broadcasts the delta — never the
    // full fact re-join the oracle brute-forces. Partials carry
    // DECIMAL(28,2) so the four-way merge equals the full recompute
    // bit-for-bit (the cdc_incremental_agg doctrine, extended from a
    // keyed agg to a two-sided join view).
    "cdc_ivm_join" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast(DecimalType(28, 2)).as("price"))
      val cust = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      // the CDC cut: 20% of facts and 10% of dim rows arrive as deltas
      val aOld = orders.filter(col("o_orderkey") % 5 =!= 0)
      val aDel = orders.filter(col("o_orderkey") % 5 === 0)
      val bOld = cust.filter(col("c_custkey") % 10 =!= 0)
      val bDel = cust.filter(col("c_custkey") % 10 === 0)
      def part(a: DataFrame, b: DataFrame) =
        a.join(broadcast(b), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n"), sum(col("price")).as("sp"))
      part(aOld, bOld).unionAll(part(aDel, bOld))
        .unionAll(part(aOld, bDel)).unionAll(part(aDel, bDel))
        .groupBy(col("c_nationkey"))
        .agg(sum(col("n")).as("n_orders"),
          round(sum(col("sp")).cast("double"), 2).as("sum_price"))
        .orderBy(col("c_nationkey"))
    }),

    // Composite: the CDC warehouse path end to end — current state
    // (latest per key), deletes dropped, joined to the customer
    // dimension and rolled up per market segment. One snapshot window
    // + one fact-dim join + two-phase agg; exactly the nightly "state
    // of the world by segment" readout a CDC consumer materializes.
    "composite_cdc" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(desc("ts"), desc("event_id"))
      val snapshot = Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), money(col("value")).as("value"))
      snapshot
        .join(Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_live"),
          Tables.moneySum(col("value")).as("sum_value"))
        .orderBy(col("c_mktsegment"))
    }),

    // Replication-integrity audit — sequence-gap detection per domain
    // (the cdc_gtid domains): a missing sequence number is a LOST
    // EVENT, the failure a CDC consumer must detect before its
    // downstream state silently diverges. Per domain: expected-vs-
    // actual count (n_missing) and how many distinct gap runs (lag
    // jumps > 1). One domain-keyed window + the same-key rollup —
    // shared shuffle, O(1) state per row.
    "cdc_gap_detect" -> ((s, dir) => {
      val w = Window.partitionBy(col("domain")).orderBy(col("seq"))
      Tables(s, dir, "events")
        .select(pmod(col("user_id"), lit(4)).as("domain"),
          col("event_id").as("seq"))
        .withColumn("prev", lag(col("seq"), 1).over(w))
        .withColumn("jump",
          when(col("prev").isNotNull && col("seq") - col("prev") > 1, 1L)
            .otherwise(0L))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_events"),
          min(col("seq")).as("min_seq"), max(col("seq")).as("max_seq"),
          (max(col("seq")) - min(col("seq")) + 1 - count(lit(1)))
            .as("n_missing"),
          sum(col("jump")).as("n_gaps"))
        .orderBy(col("domain"))
    }),

    // Event-time disorder audit — the measurement that SIZES a
    // watermark: per key, how many events arrive (in event_id /
    // arrival order) with an event time EARLIER than the running
    // event-time high-water mark, and the worst such lateness in
    // integer microseconds. Run this over a replay before picking
    // `withWatermark` bounds; max_late_us IS the delay threshold that
    // would have dropped nothing. One user_id-keyed window + the same
    // keyed rollup (shared shuffle), running max is O(1) state per
    // row — linear at 100 TB.
    "cdc_ooo_audit" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("hwm", max(col("ts")).over(w))
        .withColumn("late_us",
          when(col("ts") < col("hwm"),
            unix_micros(col("hwm")) - unix_micros(col("ts")))
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_ooo"),
          max(col("late_us")).as("max_late_us"))
        .orderBy(col("user_id"))
    }),

    // Transaction-boundary integrity audit — the reference's envelope
    // carries (domain, sequence, event_number 1-based within the
    // transaction) (`event.go:189-200`), and a consumer that applies
    // transactions atomically must first verify it HAS the whole
    // transaction. Synthesis: 5-event transactions (sequence ≔
    // event_id div 5, event_number ≔ event_id % 5 + 1, domain from the
    // sequence so a txn never straddles domains), with every 97th
    // event dropped to simulate loss. Per (domain, sequence): event
    // count, distinct tables touched (event_type as the table-name
    // stand-in), max event_number, and the completeness flag
    // max_event_number == n_events — detects INTERIOR gaps (dense
    // 1..max); trailing loss is only visible to the next sequence's
    // arrival, which is cdc_gap_detect's job. One hash agg on the
    // (domain, sequence) key, map-side combined — the audit of a
    // 100 TB log shuffles |transactions| partial rows, not events.
    // Tamper-evident audit chain over each user's event stream (the
    // hash-chained ledger a compliance pipeline keeps NEXT to the CDC
    // log — any reorder, drop or edit anywhere in a user's history
    // changes that user's final link): chain = fold of
    // md5(acc || event) over the event-id-ordered serialization,
    // seeded at 'genesis'. Sequential by definition, yet ONE hash agg
    // + a per-row array fold: the chain folds WITHIN the bounded
    // per-user list (the collect contract), users in parallel. Event
    // ids zero-pad so string sort = numeric order in both engines;
    // md5 hex is byte-identical cross-engine (repo doctrine).
    "cdc_hash_chain" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          expr("sort_array(collect_list(concat(" +
            "lpad(CAST(event_id AS STRING), 12, '0'), ':', event_type)))")
            .as("evs"))
        .withColumn("chain", expr(
          "aggregate(evs, 'genesis', (acc, x) -> md5(concat(acc, x)))"))
        .select(col("user_id"), col("n_events"), col("chain"))
        .orderBy(col("user_id"))
    }),

    "cdc_txn_stats" -> ((s, dir) => {
      Tables(s, dir, "events")
        .filter(col("event_id") % 97 =!= 0)
        .withColumn("sequence", expr("event_id div 5"))
        .withColumn("domain", pmod(col("sequence"), lit(4)))
        .withColumn("event_number", (col("event_id") % 5 + 1).cast("int"))
        .groupBy(col("domain"), col("sequence"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_tables"),
          max(col("event_number")).as("max_event_number"))
        .withColumn("complete", col("max_event_number") === col("n_events"))
        .orderBy(col("domain"), col("sequence"))
    }),

    // SCD2 point-in-time lookup — the composite every warehouse runs
    // against its dimension history: rebuild the cdc_scd2 validity
    // ranges, then answer "which version was active at time T" for a
    // spine of probe instants (the global event_id quartiles, derived
    // in integer arithmetic so the probe set is scale-free). The probe
    // frame is 3 rows — broadcast against the history, the interval
    // predicate evaluates narrowly per history row, and the history
    // itself is the same single user_id-keyed window as cdc_scd2: at
    // 100 TB this is one keyed shuffle + a broadcast, never a
    // range-banded shuffle join. Users whose first version opens after
    // a probe have no active row there (inner join — declared).
    "composite_scd2_pit" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          money(col("value")).as("value"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val scd2 = ev
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to_event", lead(col("event_id"), 1).over(w))
      val probes = ev
        .agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
        .select(explode(array(
          expr("lo + ((hi - lo) * 1) div 4"),
          expr("lo + ((hi - lo) * 2) div 4"),
          expr("lo + ((hi - lo) * 3) div 4"))).as("probe_event"))
      scd2.join(broadcast(probes),
          col("event_id") <= col("probe_event") &&
            (col("valid_to_event").isNull ||
              col("probe_event") < col("valid_to_event")))
        .select(col("user_id"), col("probe_event"), col("version"),
          col("event_id").as("valid_from"), col("event_type"),
          col("value"))
        .orderBy(col("user_id"), col("probe_event"))
    }),

    // Snapshot DIFF — the warehouse table-compare: two versions of a
    // per-part rollup (v1 = shipped before 1995-07; v2 =
    // shipped before 1995-10 minus returned lines) full-outer-joined on the key
    // and every key classified added / removed / changed / unchanged
    // with both versions' values beside it. Shape at 100 TB: each
    // version is one two-phase agg over its own scan, the diff is a
    // single key-shuffled (AQE-broadcastable) full outer join of two
    // ALREADY-AGGREGATED frames — |keys|, not |rows|. Value equality
    // compares the exact decimal-summed money doubles, so the
    // classification is engine-deterministic.
    "diff_snapshot" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      def snap(pred: org.apache.spark.sql.Column) =
        li.filter(pred).groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n"),
            Tables.moneySum(col("l_extendedprice")).as("rev"))
      val v1 = snap(col("l_shipdate") < to_timestamp(lit("1995-07-01")))
        .select(col("l_partkey"), col("n").as("n_v1"),
          col("rev").as("rev_v1"))
      val v2 = snap(col("l_shipdate") < to_timestamp(lit("1995-10-01")) &&
          col("l_returnflag") =!= "R")
        .select(col("l_partkey"), col("n").as("n_v2"),
          col("rev").as("rev_v2"))
      v1.join(v2, Seq("l_partkey"), "full_outer")
        .withColumn("status",
          when(col("n_v1").isNull, "added")
            .when(col("n_v2").isNull, "removed")
            .when(col("n_v1") =!= col("n_v2") ||
              col("rev_v1") =!= col("rev_v2"), "changed")
            .otherwise("unchanged"))
        .select(col("l_partkey"), col("status"), col("n_v1"),
          col("n_v2"), col("rev_v1"), col("rev_v2"))
        .orderBy(col("l_partkey"))
    }),

    // Multi-source CDC merge frontier — the apply-side counterpart of
    // the reference's per-domain GTID watermark map (`event.go:216-218`
    // tracks one sequence per replication domain; a downstream applier
    // may only emit events ALL domains have passed, or cross-domain
    // ordering breaks). Domains here = event_id mod 2 (two source
    // servers interleaved into one log); each domain's watermark is
    // its max event time, the global safe-apply frontier is the MIN of
    // the watermarks, and every event at/before the frontier is
    // applicable while later ones are held back. SCALE: one map-side-
    // combined domain agg (2 rows) → 1-row frontier broadcast back
    // over the log (scalar-gate cross, PlanShapeSpec-allowlisted) →
    // one final 2-key agg; the log is scanned twice, never shuffled
    // wide.
    "cdc_merge_sources" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(pmod(col("event_id"), lit(2)).as("domain"),
          unix_micros(col("ts")).as("us"))
      val frontier = ev.groupBy(col("domain"))
        .agg(max(col("us")).as("wm_us"))
        .agg(min(col("wm_us")).as("frontier_us"))
      ev.crossJoin(broadcast(frontier))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_events"),
          max(col("us")).as("wm_us"),
          min(col("frontier_us")).as("frontier_us"),
          sum(when(col("us") <= col("frontier_us"), 1L).otherwise(0L))
            .as("n_applicable"),
          sum(when(col("us") > col("frontier_us"), 1L).otherwise(0L))
            .as("n_held"))
        .orderBy(col("domain"))
    }),

    // Multi-master conflict resolution census — the write-write audit
    // a bidirectional-replication topology needs beside
    // cdc_merge_sources' ordering frontier: two source domains
    // (event_id mod 2) write the SAME keys; per key, last-writer-wins
    // by event time (event_id breaks exact ties deterministically —
    // and the testdata's ts-monotone-in-event_id contract makes the
    // two orders agree), plus per-domain write counts and a conflict
    // flag (both domains wrote the key). The resolved value rides
    // max_by on the SAME ordering, so winner fields are mutually
    // consistent by construction. ONE map-side-combined hash agg:
    // auditing a 100 TB multi-master log shuffles |keys| partials,
    // never events.
    "cdc_conflict_lww" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          pmod(col("event_id"), lit(2)).as("domain"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("domain") === 0, 1L).otherwise(0L)).as("n_d0"),
          sum(when(col("domain") === 1, 1L).otherwise(0L)).as("n_d1"),
          max(col("event_id")).as("winner_event"),
          max_by(col("domain"), col("event_id")).as("winner_domain"),
          max_by(col("cents"), col("event_id")).as("winner_cents"))
        .withColumn("conflicted", col("n_d0") > 0 && col("n_d1") > 0)
        .orderBy(col("user_id"))
    }),

    // Compaction-planning audit (what cdc_compact's latest-state
    // materialization would THROW AWAY): per key, the events a
    // key-compactor could drop (everything between the first and last
    // change, n−2 floored at 0), and the net value movement those
    // intermediate states hide. The downstream sizing input for
    // log-compacted topics / MOR compaction cadence. ONE
    // map-side-combined hash agg — min_by/max_by carry one pair of
    // state each, the log is never windowed.
    "cdc_redundancy" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          min_by(col("cents"), col("event_id")).as("first_c"),
          max_by(col("cents"), col("event_id")).as("last_c"))
        .select(col("user_id"), col("n_events"),
          greatest(col("n_events") - 2, lit(0L)).as("n_droppable"),
          (col("last_c") - col("first_c")).as("net_change_c"))
        .orderBy(col("user_id"))
    }),

    // Hot-key churn census (the partition-sizing input for a CDC
    // apply loop: how skewed is the change volume across keys?):
    // per-key op counts bucketed by floor-log2 magnitude
    // (LB = length(bin(n)), the declared diag_entropy idiom), one
    // row per bucket with key/op tallies and the op share in
    // permille. Two map-side-combined hash aggs (key → bucket), the
    // 1-row total broadcasts as the standard scalar gate; a bucket
    // whose share dwarfs the rest IS the salting trigger at 100 TB.
    "cdc_key_churn" -> ((s, dir) => {
      val perKey = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ops"))
      perKey
        .groupBy(expr("CAST(length(bin(n_ops)) AS INT)").as("log2_bucket"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("n_ops")).as("total_ops"),
          min(col("n_ops")).as("min_ops"),
          max(col("n_ops")).as("max_ops"))
        .withColumn("ops_share_pm",
          expr("CAST((total_ops * 1000) div sum(total_ops) OVER () " +
            "AS BIGINT)"))
        .orderBy(col("log2_bucket"))
    })
  )

  /** MERGE-INTO over a keyed change log `(user_id, event_id,
    * event_type, value)`: base snapshot = latest state per key at
    * event_id < splitAt; the delta batch (event_id >= splitAt) is
    * applied in one full-outer join — a delta whose final event is
    * 'error' deletes the key, other delta keys upsert, untouched keys
    * survive. Property-tested in PropertySpec: the merged state equals
    * the full-log snapshot with the delta-tombstone rule, for ANY
    * split point. */
  private[graft] def mergeUpsert(ev: DataFrame, splitAt: Long): DataFrame = {
    def latest(df: DataFrame) = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(desc("event_id"))
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }
    val base = latest(ev.filter(col("event_id") < splitAt))
      .select(col("user_id"), col("event_id").as("b_event"),
        col("value").as("b_value"))
    val delta = latest(ev.filter(col("event_id") >= splitAt))
      .select(col("user_id"), col("event_id").as("d_event"),
        col("event_type").as("d_type"), col("value").as("d_value"))
    base.join(delta, Seq("user_id"), "full_outer")
      .filter(col("d_type").isNull || col("d_type") =!= "error")
      .select(col("user_id"),
        coalesce(col("d_event"), col("b_event")).as("event_id"),
        coalesce(col("d_value"), col("b_value")).as("value"),
        when(col("d_event").isNull, "kept")
          .when(col("b_event").isNull, "inserted")
          .otherwise("updated").as("op"))
      .orderBy(col("user_id"))
  }

  def oracle: Map[String, String] = Map(
    "cdc_merge_sources" ->
      """WITH ev AS (
        |  SELECT event_id % 2 AS domain, epoch_us(ts) AS us
        |  FROM events),
        |f AS (
        |  SELECT min(wm_us) AS frontier_us FROM (
        |    SELECT domain, max(us) AS wm_us FROM ev GROUP BY domain))
        |SELECT e.domain, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(e.us) AS BIGINT) AS wm_us,
        |  CAST(min(f.frontier_us) AS BIGINT) AS frontier_us,
        |  CAST(sum(CASE WHEN e.us <= f.frontier_us THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_applicable,
        |  CAST(sum(CASE WHEN e.us > f.frontier_us THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_held
        |FROM ev e, f GROUP BY e.domain ORDER BY e.domain""".stripMargin,

    "cdc_conflict_lww" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_id % 2 AS domain,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN domain = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_d0,
        |  CAST(sum(CASE WHEN domain = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_d1,
        |  max(event_id) AS winner_event,
        |  arg_max(domain, event_id) AS winner_domain,
        |  arg_max(cents, event_id) AS winner_cents,
        |  sum(CASE WHEN domain = 0 THEN 1 ELSE 0 END) > 0 AND
        |    sum(CASE WHEN domain = 1 THEN 1 ELSE 0 END) > 0
        |    AS conflicted
        |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin,

    "cdc_hash_chain" ->
      """SELECT user_id, count(*) AS n_events,
        |  list_reduce(
        |    list_prepend('genesis', list_sort(list(
        |      lpad(CAST(event_id AS VARCHAR), 12, '0') || ':' ||
        |      event_type))),
        |    (x, y) -> md5(x || y)) AS chain
        |FROM events GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "cdc_classify" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 10 = 0 THEN 'ddl' ELSE 'dml' END AS kind
        |FROM events ORDER BY event_id""".stripMargin,

    "cdc_gtid" ->
      """SELECT event_id,
        |  concat_ws('-', user_id % 4, 3000, event_id) AS gtid
        |FROM events ORDER BY event_id""".stripMargin,

    "cdc_tabledata" ->
      s"""SELECT event_id, ${Tables.sql.money("value")} AS value,
         |  CAST(json_extract_string(props, '$$.k') AS INT) AS k
         |FROM events ORDER BY event_id""".stripMargin,

    "cdc_forget_audit" ->
      """WITH tomb AS (
        |  SELECT c_custkey FROM customer
        |  WHERE substr(md5('gdpr' || CAST(c_custkey AS VARCHAR)), 1, 1)
        |    IN ('0', '1')),
        |ords AS (
        |  SELECT * FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM tomb)),
        |lis AS (
        |  SELECT * FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM ords))
        |SELECT tbl, CAST(n_purge AS BIGINT) AS n_purge,
        |  CAST(purged_cents AS BIGINT) AS purged_cents
        |FROM (
        |  SELECT 'customer' AS tbl, count(*) AS n_purge,
        |    0 AS purged_cents FROM tomb
        |  UNION ALL
        |  SELECT 'orders', count(*),
        |    coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
        |  FROM ords
        |  UNION ALL
        |  SELECT 'lineitem', count(*),
        |    coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)),
        |      0)
        |  FROM lis)
        |ORDER BY tbl""".stripMargin,

    "cdc_time_travel" ->
      s"""WITH q AS (
         |  SELECT quantile_disc(event_id, 0.25) AS q1,
         |         quantile_disc(event_id, 0.50) AS q2,
         |         quantile_disc(event_id, 0.75) AS q3
         |  FROM events),
         |snap AS (
         |  SELECT v.version,
         |    CASE v.version WHEN 1 THEN (SELECT q1 FROM q)
         |                   WHEN 2 THEN (SELECT q2 FROM q)
         |                   ELSE (SELECT q3 FROM q) END AS as_of_event,
         |    e.user_id,
         |    arg_max(e.event_id, e.event_id) AS event_id,
         |    arg_max(e.event_type, e.event_id) AS event_type,
         |    arg_max(e.value, e.event_id) AS rawv
         |  FROM events e
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS version) v
         |  WHERE e.event_id <=
         |    CASE v.version WHEN 1 THEN (SELECT q1 FROM q)
         |                   WHEN 2 THEN (SELECT q2 FROM q)
         |                   ELSE (SELECT q3 FROM q) END
         |  GROUP BY 1, 2, 3)
         |SELECT CAST(version AS INT) AS version,
         |  CAST(as_of_event AS BIGINT) AS as_of_event, user_id,
         |  event_id, event_type,
         |  ${Tables.sql.money("rawv")} AS value
         |FROM snap
         |ORDER BY version, user_id""".stripMargin,

    "cdc_snapshot_latest" ->
      s"""SELECT user_id, event_id, event_type,
         |  ${Tables.sql.money("value")} AS value
         |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
         |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "cdc_compact" ->
      s"""WITH latest AS (
         |  SELECT user_id, event_id, event_type,
         |    ${Tables.sql.money("value")} AS value
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
         |          ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         |  WHERE rn = 1),
         |cut AS (
         |  SELECT CAST(max(event_id) AS HUGEINT) * 99 // 100 AS cutoff
         |  FROM events)
         |SELECT user_id, event_id, event_type, value,
         |  CASE WHEN event_type <> 'error' THEN 'live'
         |       ELSE 'tombstone' END AS op
         |FROM latest, cut
         |WHERE event_type <> 'error' OR event_id > cutoff
         |ORDER BY user_id""".stripMargin,

    "cdc_update_pairs" ->
      s"""SELECT event_id, user_id, event_type,
         |  lead(event_id, 1) OVER w AS next_event_id,
         |  lead(event_type, 1) OVER w AS next_type,
         |  ${Tables.sql.money("lead(value, 1) OVER w - value")} AS value_delta
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
         |ORDER BY event_id""".stripMargin,

    "cdc_resume_gtid" ->
      """SELECT event_id, user_id, event_type
        |FROM events WHERE event_id >= 500
        |ORDER BY event_id""".stripMargin,

    "cdc_watermarks" ->
      """SELECT user_id % 4 AS domain, 3000 AS server_id,
        |  max(event_id) AS watermark_seq, count(*) AS n_events
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY domain""".stripMargin,

    "cdc_staleness" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS es
        |  FROM events),
        |g AS (
        |  SELECT event_type, es,
        |    es - lag(es, 1) OVER (PARTITION BY event_type
        |      ORDER BY es, event_id) AS gap
        |  FROM e),
        |a AS (
        |  SELECT event_type, count(*) AS n_events,
        |    max(es) AS last_es, CAST(max(gap) AS BIGINT) AS max_gap_s
        |  FROM g GROUP BY event_type),
        |h AS (SELECT *, max(last_es) OVER () AS head_es FROM a)
        |SELECT event_type, n_events, max_gap_s,
        |  CAST(head_es - last_es AS BIGINT) AS lag_s,
        |  (head_es - last_es > max_gap_s) AS stalled
        |FROM h ORDER BY event_type""".stripMargin,

    "cdc_scd2" ->
      s"""SELECT user_id, event_id, event_type,
         |  ${Tables.sql.money("value")} AS value,
         |  row_number() OVER w AS version,
         |  lead(event_id, 1) OVER w AS valid_to_event,
         |  lead(event_id, 1) OVER w IS NULL AS is_current
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
         |ORDER BY user_id, version""".stripMargin,

    "cdc_merge_upsert" ->
      s"""WITH ev AS (SELECT user_id, event_id, event_type,
         |              ${Tables.sql.money("value")} AS value FROM events),
         |base AS (SELECT user_id, event_id AS b_event, value AS b_value
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
         |          ORDER BY event_id DESC) AS rn
         |        FROM ev WHERE event_id < 800) WHERE rn = 1),
         |delta AS (SELECT user_id, event_id AS d_event,
         |    event_type AS d_type, value AS d_value
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
         |          ORDER BY event_id DESC) AS rn
         |        FROM ev WHERE event_id >= 800) WHERE rn = 1)
         |SELECT coalesce(base.user_id, delta.user_id) AS user_id,
         |  coalesce(d_event, b_event) AS event_id,
         |  coalesce(d_value, b_value) AS value,
         |  CASE WHEN d_event IS NULL THEN 'kept'
         |       WHEN b_event IS NULL THEN 'inserted'
         |       ELSE 'updated' END AS op
         |FROM base FULL OUTER JOIN delta ON base.user_id = delta.user_id
         |WHERE d_type IS NULL OR d_type <> 'error'
         |ORDER BY user_id""".stripMargin,

    "composite_cdc" ->
      s"""WITH snap AS (
         |  SELECT user_id, ${Tables.sql.money("value")} AS value
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
         |          ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         |  WHERE rn = 1 AND event_type <> 'error')
         |SELECT c_mktsegment, count(*) AS n_live,
         |  ${Tables.sql.moneySum("value")} AS sum_value
         |FROM snap JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,

    "cdc_incremental_agg" ->
      """SELECT user_id, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE), 2)
        |    AS sum_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // the oracle is the FULL recompute the incremental path replaces
    "cdc_ivm_join" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,2)))
        |    AS DOUBLE), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "cdc_gap_detect" ->
      """WITH e AS (
        |  SELECT user_id % 4 AS domain, event_id AS seq FROM events),
        |l AS (
        |  SELECT domain, seq,
        |    lag(seq) OVER (PARTITION BY domain ORDER BY seq) AS prev
        |  FROM e)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_events,
        |  min(seq) AS min_seq, max(seq) AS max_seq,
        |  CAST(max(seq) - min(seq) + 1 - count(*) AS BIGINT)
        |    AS n_missing,
        |  CAST(sum(CASE WHEN prev IS NOT NULL AND seq - prev > 1
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps
        |FROM l GROUP BY domain ORDER BY domain""".stripMargin,

    "cdc_ooo_audit" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    max(ts) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM events),
        |l AS (
        |  SELECT user_id,
        |    CASE WHEN ts < hwm THEN epoch_us(hwm) - epoch_us(ts)
        |         ELSE 0 END AS late_us
        |  FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ooo,
        |  CAST(max(late_us) AS BIGINT) AS max_late_us
        |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin,

    "cdc_txn_stats" ->
      """WITH e AS (
        |  SELECT event_id // 5 AS sequence,
        |    (event_id // 5) % 4 AS domain,
        |    CAST(event_id % 5 + 1 AS INT) AS event_number,
        |    event_type
        |  FROM events WHERE event_id % 97 <> 0)
        |SELECT domain, sequence,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_tables,
        |  max(event_number) AS max_event_number,
        |  max(event_number) = count(*) AS complete
        |FROM e GROUP BY domain, sequence
        |ORDER BY domain, sequence""".stripMargin,

    "composite_scd2_pit" ->
      s"""WITH ev AS (SELECT user_id, event_id, event_type,
         |    ${Tables.sql.money("value")} AS value FROM events),
         |scd AS (
         |  SELECT user_id, event_id, event_type, value,
         |    row_number() OVER w AS version,
         |    lead(event_id, 1) OVER w AS valid_to_event
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
         |), b AS (SELECT min(event_id) AS lo, max(event_id) AS hi
         |         FROM ev),
         |p AS (SELECT lo + ((hi - lo) * k) // 4 AS probe_event
         |      FROM b, (VALUES (1), (2), (3)) t(k))
         |SELECT s.user_id, p.probe_event, s.version,
         |  s.event_id AS valid_from, s.event_type, s.value
         |FROM scd s JOIN p ON s.event_id <= p.probe_event
         |  AND (s.valid_to_event IS NULL
         |       OR p.probe_event < s.valid_to_event)
         |ORDER BY user_id, probe_event""".stripMargin,

    "diff_snapshot" ->
      s"""WITH v1 AS (
         |  SELECT l_partkey, count(*) AS n_v1,
         |    ${Tables.sql.moneySum("l_extendedprice")} AS rev_v1
         |  FROM lineitem
         |  WHERE l_shipdate < TIMESTAMP '1995-07-01'
         |  GROUP BY l_partkey
         |), v2 AS (
         |  SELECT l_partkey, count(*) AS n_v2,
         |    ${Tables.sql.moneySum("l_extendedprice")} AS rev_v2
         |  FROM lineitem
         |  WHERE l_shipdate < TIMESTAMP '1995-10-01'
         |    AND l_returnflag <> 'R'
         |  GROUP BY l_partkey)
         |SELECT coalesce(v1.l_partkey, v2.l_partkey) AS l_partkey,
         |  CASE WHEN v1.l_partkey IS NULL THEN 'added'
         |       WHEN v2.l_partkey IS NULL THEN 'removed'
         |       WHEN n_v1 <> n_v2 OR rev_v1 <> rev_v2 THEN 'changed'
         |       ELSE 'unchanged' END AS status,
         |  n_v1, n_v2, rev_v1, rev_v2
         |FROM v1 FULL OUTER JOIN v2 ON v1.l_partkey = v2.l_partkey
         |ORDER BY l_partkey""".stripMargin,

    "cdc_redundancy" ->
      """WITH b AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(greatest(count(*) - 2, 0) AS BIGINT) AS n_droppable,
        |  max_by(cents, event_id) - min_by(cents, event_id)
        |    AS net_change_c
        |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin,

    "cdc_key_churn" ->
      """WITH k AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ops
        |  FROM events GROUP BY user_id),
        |b AS (
        |  SELECT CAST(length(bin(n_ops)) AS INT) AS log2_bucket,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(n_ops) AS BIGINT) AS total_ops,
        |    CAST(min(n_ops) AS BIGINT) AS min_ops,
        |    CAST(max(n_ops) AS BIGINT) AS max_ops
        |  FROM k GROUP BY log2_bucket)
        |SELECT log2_bucket, n_keys, total_ops, min_ops, max_ops,
        |  CAST((CAST(total_ops AS HUGEINT) * 1000) //
        |    CAST(sum(total_ops) OVER () AS HUGEINT) AS BIGINT)
        |    AS ops_share_pm
        |FROM b ORDER BY log2_bucket""".stripMargin
  )
}
