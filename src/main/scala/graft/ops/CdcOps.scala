package graft.ops

import graft.Tables
import graft.Tables.money
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
    })
  )

  def oracle: Map[String, String] = Map(
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

    "cdc_snapshot_latest" ->
      s"""SELECT user_id, event_id, event_type,
         |  ${Tables.sql.money("value")} AS value
         |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
         |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         |WHERE rn = 1 ORDER BY user_id""".stripMargin,

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

    "cdc_scd2" ->
      s"""SELECT user_id, event_id, event_type,
         |  ${Tables.sql.money("value")} AS value,
         |  row_number() OVER w AS version,
         |  lead(event_id, 1) OVER w AS valid_to_event,
         |  lead(event_id, 1) OVER w IS NULL AS is_current
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
         |ORDER BY user_id, version""".stripMargin
  )
}
