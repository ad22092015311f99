package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline composition: a MaxScale-style CDC feed of a
  * documents table is ingested through the DSv2 source, payloads are
  * projected through the DDL→StructType translator, the current table
  * state is materialized (latest event per key), and the snapshot
  * flows into the training-data operators (exact dedup + token-count
  * quality gate) — the "switch to this library and run your pipeline"
  * path in one test.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  private val ddl =
    """{"namespace": "MaxScaleChangeDataSchema.avro", "type": "record", "name": "ChangeRecord", "table": "docs", "database": "corpus", "version": 1, "gtid": "0-3000-1", "fields": [{"name": "domain", "type": "int"}, {"name": "server_id", "type": "int"}, {"name": "sequence", "type": "int"}, {"name": "event_number", "type": "int"}, {"name": "timestamp", "type": "int"}, {"name": "event_type", "type": {"type": "enum", "name": "EVENT_TYPES", "symbols": ["insert", "update_before", "update_after", "delete"]}}, {"name": "id", "type": ["null", "int"], "real_type": "int", "length": -1}, {"name": "body", "type": ["null", "varchar"], "real_type": "varchar", "length": 200}]}"""

  private def dml(seq: Int, typ: String, id: Int, body: String) =
    s"""{"domain": 0, "server_id": 3000, "sequence": $seq, "event_number": 1, "timestamp": 170000$seq, "event_type": "$typ", "table_name": "docs", "table_schema": "corpus", "id": $id, "body": "$body"}"""

  test("CDC feed -> translated payload -> snapshot -> dedup + quality gate") {
    val f = Files.createTempFile("pipeline", ".ndjson")
    // doc 1 inserted then UPDATED to duplicate doc 2's text; doc 3 is
    // too short to pass the quality gate; doc 4 is a distinct keeper.
    Files.write(f, Seq(
      ddl,
      dml(10, "insert", 1, "alpha beta gamma delta"),
      dml(11, "insert", 2, "epsilon zeta eta theta"),
      dml(12, "insert", 3, "tiny"),
      dml(13, "update_before", 1, "alpha beta gamma delta"),
      dml(14, "update_after", 1, "epsilon zeta eta theta"),
      dml(15, "insert", 4, "iota kappa lambda mu")
    ).mkString("\n").getBytes(UTF_8))

    // 1. ingest the feed through the DSv2 source
    val q = spark.readStream.format("maxscale-cdc")
      .option("replayFile", f.toString)
      .load()
      .writeStream.format("memory").queryName("pipeline_feed")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val feed = spark.table("pipeline_feed")

    // 2. translate the DDL record into the payload schema
    val ddlLine = feed.filter(col("event_type") === "ddl")
      .select("raw").head.getString(0)
    val schema = graft.cdc.CdcModel.toStructType(
      graft.cdc.Protocol.decodeDdlEvent(ddlLine))
    assert(schema.fieldNames.contains("body"))

    // 3. materialize current state: latest non-before image per id
    //    (argmax by sequence — the cdc_snapshot_latest pattern)
    val rows = feed.filter(col("event_type").isin("insert", "update_after"))
      .withColumn("payload", from_json(col("raw"), schema))
      .select(col("sequence"), col("payload.id").as("id"),
        col("payload.body").as("body"))
    val snapshot = rows
      .groupBy(col("id"))
      .agg(max_by(col("body"), col("sequence")).as("body"))
    val snapMap = snapshot.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(snapMap == Map(
      1 -> "epsilon zeta eta theta", 2 -> "epsilon zeta eta theta",
      3 -> "tiny", 4 -> "iota kappa lambda mu"))

    // 4. training-data gates on the snapshot: exact dedup keeps the
    //    min id per normalized text; quality gate needs >= 3 tokens
    val kept = snapshot
      .withColumn("h", sha2(lower(trim(col("body"))), 256))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("h")).orderBy(col("id"))))
      .filter(col("rn") === 1)
      .filter(size(split(col("body"), " ")) >= 3)
      .select("id").collect().map(_.getInt(0)).sorted.toSeq
    assert(kept == Seq(1, 4),
      "doc 1 keeps its duplicated text (min id), doc 3 fails quality")
  }
}
