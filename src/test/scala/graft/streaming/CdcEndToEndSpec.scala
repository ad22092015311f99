package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, StandardOpenOption}

import graft.LocalSpark
import graft.streaming.CdcSnapshotStream.{Change, Snapshot}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's consumer loop (`client_test.go:135-166`: consume
  * CDC events from the socket, apply them to a materialized view),
  * end-to-end on our side of the fence: DSv2 `maxscale-cdc` source
  * (replay transport) → stateful snapshot operator
  * ([[CdcSnapshotStream]], the streaming form of `cdc_snapshot_latest`)
  * → `foreachBatch` sink maintaining the materialized view — ONE
  * pipeline under ONE checkpoint, stopped and restarted mid-stream.
  *
  * Pins, across the restart:
  *  - the view converges to the batch answer over the whole event
  *    history (argmax by (ts, eventId) per key, deletes applied);
  *  - every snapshot change reaches the sink exactly once — the
  *    restarted run re-emits nothing for keys the first run settled
  *    (source offsets AND operator state both resume from the
  *    checkpoint);
  *  - deletes flow through as tombstone rows and remove the key.
  */
class CdcEndToEndSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  private val ddl =
    """{"namespace": "MaxScaleChangeDataSchema.avro", "type": "record", "name": "ChangeRecord", "table": "tests", "database": "test", "version": 1, "gtid": "0-3000-6", "fields": [{"name": "domain", "type": "int"}, {"name": "server_id", "type": "int"}, {"name": "sequence", "type": "int"}, {"name": "event_number", "type": "int"}, {"name": "timestamp", "type": "int"}, {"name": "event_type", "type": {"type": "enum", "name": "EVENT_TYPES", "symbols": ["insert", "update_before", "update_after", "delete"]}}, {"name": "id", "type": ["null", "int"], "real_type": "int", "length": -1}]}"""

  private def dml(seq: Int, id: Int, eventType: String = "insert") =
    s"""{"domain": 0, "server_id": 3000, "sequence": $seq, "event_number": 1, "timestamp": 170000000$seq, "event_type": "$eventType", "table_name": "tests", "table_schema": "test", "id": $id}"""

  test("source -> stateful snapshot -> foreachBatch view: exactly-once " +
      "across checkpoint restart (client_test.go:135-166 end-to-end)") {
    val f = Files.createTempFile("cdc-e2e", ".ndjson")
    val ckpt = Files.createTempDirectory("cdc-e2e-ckpt").toString
    // run 1: id=1 inserted then updated (one batch -> ONE emission,
    // the settled seq-9 state), id=2 inserted
    Files.write(f, (Seq(ddl) ++ Seq(
      dml(7, 1), dml(8, 2), dml(9, 1, "update_after"))).mkString("\n")
      .getBytes(UTF_8))

    // materialized view + emission log, maintained by foreachBatch on
    // the driver (the test-JVM stand-in for an upsert sink)
    val view = scala.collection.mutable.Map.empty[Int, Snapshot]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val apply = (batch: Dataset[Snapshot], _: Long) => {
      batch.collect().foreach { s =>
        emitted += ((s.userId, s.eventId))
        if (s.deleted) view.remove(s.userId) else view(s.userId) = s
      }
    }

    def run(): Unit = {
      val changes = spark.readStream.format("maxscale-cdc")
        .option("replayFile", f.toString)
        .load()
        .filter(col("event_type") =!= "ddl")
        .select(
          get_json_object(col("raw"), "$.id").cast("int").as("userId"),
          col("sequence").as("eventId"),
          col("sequence").as("ts"), // monotone with the stream order
          col("event_type").as("eventType"),
          get_json_object(col("raw"), "$.id").cast("double").as("value"))
        .as[Change](org.apache.spark.sql.Encoders.product[Change])
      val q = CdcSnapshotStream.snapshots(changes)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(apply)
        .start()
      q.processAllAvailable()
      q.stop()
    }

    run()
    assert(view.keySet === Set(1, 2))
    assert(view(1).eventId === 9L) // batch-settled: seq 7 superseded
    assert(view(2).eventId === 8L)
    assert(emitted.toSet === Set((1, 9L), (2, 8L)))
    assert(emitted.size === 2, "one settled emission per changed key")

    // stream grows while the pipeline is down: id=2 deleted, id=3
    // inserted then updated
    Files.write(f, ("\n" + Seq(
      dml(10, 2, "delete"), dml(11, 3), dml(12, 3, "update_after"))
      .mkString("\n")).getBytes(UTF_8), StandardOpenOption.APPEND)

    run()
    // the view converged to the batch answer over the full history
    assert(view.keySet === Set(1, 3))
    assert(view(1).eventId === 9L) // untouched by run 2
    assert(view(3).eventId === 12L) // seq 11 superseded in-batch
    // exactly-once end to end: run 2 added only the delete tombstone
    // and the settled id=3 state; nothing from run 1 was re-emitted
    assert(emitted.toSet ===
      Set((1, 9L), (2, 8L), (2, 10L), (3, 12L)))
    assert(emitted.size === 4,
      s"sink must see each change once, got $emitted")
  }

  test("source -> snapshot -> foreachBatch MERGE into graft-manifest: " +
      "the lakehouse CDC apply loop, exactly-once and replay-idempotent") {
    import graft.sources.ManifestSink
    val f = Files.createTempFile("cdc-lake", ".ndjson")
    val ckpt = Files.createTempDirectory("cdc-lake-ckpt").toString
    val dir = Files.createTempDirectory("cdc-lake-tbl").toString
    import spark.implicits._
    // bootstrap the empty target table (schema-only commit)
    Seq.empty[(Int, Long, Long, Double)]
      .toDF("userId", "eventId", "ts", "value")
      .coalesce(1)
      .write.mode("overwrite").format("graft-manifest").save(dir)
    Files.write(f, (Seq(ddl) ++ Seq(
      dml(7, 1), dml(8, 2), dml(9, 1, "update_after"))).mkString("\n")
      .getBytes(UTF_8))

    // the apply loop: upserts MERGE (delete-vector mask + append),
    // tombstones DELETE — the real lakehouse sink, not a driver map
    val apply = (batch: Dataset[Snapshot], _: Long) => {
      val ups = batch.filter(!col("deleted"))
        .select(col("userId"), col("eventId"), col("ts"), col("value"))
      val dels = batch.filter(col("deleted")).select("userId")
        .collect().map(_.getInt(0))
      if (!ups.isEmpty)
        ManifestSink.merge(spark, dir, ups.toDF(), Seq("userId"))
      if (dels.nonEmpty)
        ManifestSink.delete(spark, dir,
          s"userId IN (${dels.mkString(",")})")
      ()
    }

    def run(): Unit = {
      val changes = spark.readStream.format("maxscale-cdc")
        .option("replayFile", f.toString)
        .load()
        .filter(col("event_type") =!= "ddl")
        .select(
          get_json_object(col("raw"), "$.id").cast("int").as("userId"),
          col("sequence").as("eventId"),
          col("sequence").as("ts"),
          col("event_type").as("eventType"),
          get_json_object(col("raw"), "$.id").cast("double").as("value"))
        .as[Change](org.apache.spark.sql.Encoders.product[Change])
      val q = CdcSnapshotStream.snapshots(changes)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(apply)
        .start()
      q.processAllAvailable()
      q.stop()
    }

    def table(): Seq[(Int, Long)] =
      spark.read.format("graft-manifest").load(dir)
        .select("userId", "eventId")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted

    run()
    assert(table() === Seq((1, 9L), (2, 8L)))
    // exactly-once metadata: COUNT(*) pushdown answers the live count
    assert(spark.read.format("graft-manifest").load(dir).count() === 2L)

    // stream grows while the pipeline is down: delete id=2, id=3
    // inserted then updated
    Files.write(f, ("\n" + Seq(
      dml(10, 2, "delete"), dml(11, 3), dml(12, 3, "update_after"))
      .mkString("\n")).getBytes(UTF_8), StandardOpenOption.APPEND)
    run()
    assert(table() === Seq((1, 9L), (3, 12L)))

    // crash-replay idempotence: re-applying an already-applied batch
    // (same keys, same values) leaves the table unchanged — MERGE
    // masks the prior versions and re-appends identical rows, DELETE
    // of an absent key masks nothing
    val settled = spark.read.format("graft-manifest").load(dir).collect()
    val replay = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(settled: _*)),
      spark.read.format("graft-manifest").load(dir).schema)
    ManifestSink.merge(spark, dir, replay, Seq("userId"))
    ManifestSink.delete(spark, dir, "userId IN (2)")
    assert(table() === Seq((1, 9L), (3, 12L)))
    assert(spark.read.format("graft-manifest").load(dir).count() === 2L)
  }
}
