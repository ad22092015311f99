package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.types._

/** Unit tests for the pure CDC protocol functions (SURVEY.md §5.2-2).
  * Golden vectors follow the reference's integration fixture: database
  * `test`, table `tests(id int primary key)`, server-id 3000
  * (FIXTURES.md §A; `client_test.go:82-166`).
  */
class ProtocolSpec extends AnyFunSuite {

  /** Run a scalacheck property and assert it passes (plain scalacheck;
    * the scalatestplus bridge isn't in the offline dependency cache). */
  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed)

  test("auth command is hex(user ':' sha1(password))") {
    // sha1("") = da39a3ee5e6b4b0d3255bfef95601890afd80709;
    // hex("user:") = 757365723a
    assert(Protocol.formatAuthCommand("user", "") ==
      "757365723a" + "da39a3ee5e6b4b0d3255bfef95601890afd80709")
    // sha1("abc") = a9993e364706816aba3e25717850c26c9cd0d89d
    assert(Protocol.formatAuthCommand("max", "abc") ==
      "6d61783a" + "a9993e364706816aba3e25717850c26c9cd0d89d")
  }

  test("register command pins TYPE=JSON") {
    assert(Protocol.formatRegisterCommand("u-1") ==
      "REGISTER UUID=u-1, TYPE=JSON")
  }

  test("request-data command: db.table[.version] [gtid]") {
    assert(Protocol.formatRequestDataCommand("test", "tests") ==
      "REQUEST-DATA test.tests")
    assert(Protocol.formatRequestDataCommand("test", "tests", Some(2)) ==
      "REQUEST-DATA test.tests.2")
    assert(Protocol.formatRequestDataCommand("test", "tests", None,
      Some("0-3000-8")) == "REQUEST-DATA test.tests 0-3000-8")
    assert(Protocol.formatRequestDataCommand("test", "tests", Some(1),
      Some("0-3000-8")) == "REQUEST-DATA test.tests.1 0-3000-8")
  }

  test("error and DML classification by prefix") {
    assert(Protocol.isErrorResponse("ERR no such table"))
    assert(!Protocol.isErrorResponse("OK"))
    assert(Protocol.isDmlEvent("""{"domain":0,"server_id":3000}"""))
    assert(!Protocol.isDmlEvent("""{"namespace":"MaxScaleChangeDataSchema.avro"}"""))
  }

  test("gtid format/parse round-trip") {
    assert(Protocol.formatGtid(0, 3000, 8) == "0-3000-8")
    assert(Protocol.parseGtid("0-3000-8").contains((0, 3000, 8L)))
    assert(Protocol.parseGtid("nonsense").isEmpty)
    check(Prop.forAll(Gen.chooseNum(0, 10), Gen.chooseNum(0, 100000),
      Gen.chooseNum(0L, Long.MaxValue)) { (d: Int, s: Int, q: Long) =>
      Protocol.parseGtid(Protocol.formatGtid(d, s, q)).contains((d, s, q))
    })
  }

  // The golden DDL event for `tests(id int primary key)` —
  // FIXTURES.md §A / client_test.go:82-134.
  private val goldenDdl =
    """{"namespace": "MaxScaleChangeDataSchema.avro", "type": "record",
      |"name": "ChangeRecord", "table": "tests", "database": "test",
      |"version": 1, "gtid": "0-3000-6", "fields": [
      |{"name": "domain", "type": "int"},
      |{"name": "server_id", "type": "int"},
      |{"name": "sequence", "type": "int"},
      |{"name": "event_number", "type": "int"},
      |{"name": "timestamp", "type": "int"},
      |{"name": "event_type", "type": {"type": "enum",
      |  "name": "EVENT_TYPES",
      |  "symbols": ["insert", "update_before", "update_after", "delete"]}},
      |{"name": "id", "type": ["null", "int"], "real_type": "int",
      |  "length": -1}
      |]}""".stripMargin.replace("\n", " ")

  test("DDL decode: three wire shapes of field type") {
    val ddl = Protocol.decodeDdlEvent(goldenDdl)
    assert(ddl.namespace == "MaxScaleChangeDataSchema.avro")
    assert(ddl.table == "tests" && ddl.database == "test")
    assert(ddl.version == 1 && ddl.gtid == "0-3000-6")
    assert(ddl.fields.map(_.name) == Seq("domain", "server_id", "sequence",
      "event_number", "timestamp", "event_type", "id"))
    assert(ddl.fields.head.typeSpec == CdcModel.PlainType("int"))
    assert(ddl.fields(5).typeSpec == CdcModel.EnumType("EVENT_TYPES",
      Seq("insert", "update_before", "update_after", "delete")))
    assert(ddl.fields(6).typeSpec == CdcModel.UnionType(Seq("null", "int")))
    assert(ddl.fields(6).realType.contains("int"))
    assert(ddl.fields(6).length.isEmpty) // -1 ⇒ no length
  }

  test("DDL decode: nullable enum union and JSON-null real_type/length") {
    val ddl = Protocol.decodeDdlEvent(
      """{"fields": [
        |{"name": "status", "type": ["null", {"type": "enum",
        |  "name": "ST", "symbols": ["a", "b"]}],
        |  "real_type": null, "length": null}
        |]}""".stripMargin.replace("\n", " "))
    val f = ddl.fields.head
    // nullable enum keeps its name/symbols instead of flattening to ""
    assert(f.typeSpec ==
      CdcModel.EnumType("ST", Seq("a", "b"), nullable = true))
    // JSON null behaves like an absent key, not Some("null")/Some(0)
    assert(f.realType.isEmpty && f.length.isEmpty)
    val st = CdcModel.toStructType(ddl)
    assert(st("status").nullable)
    assert(st("status").metadata.getStringArray("enum_symbols").toSeq ==
      Seq("a", "b"))
  }

  test("DDL → StructType translation") {
    val st = Protocol.inferSchema(goldenDdl)
    assert(st.fieldNames.toSeq == Seq("domain", "server_id", "sequence",
      "event_number", "timestamp", "event_type", "id"))
    assert(st("domain").dataType == IntegerType && !st("domain").nullable)
    assert(st("event_type").dataType == StringType)
    assert(st("event_type").metadata.getStringArray("enum_symbols").toSeq ==
      Seq("insert", "update_before", "update_after", "delete"))
    assert(st("id").dataType == IntegerType && st("id").nullable)
    assert(st("id").metadata.getString("real_type") == "int")
  }

  test("type mapping: unions, decimals, real_type date/time refinement") {
    def field(ts: CdcModel.TypeSpec, rt: Option[String] = None) =
      CdcModel.DdlField("c", ts, rt, None, unsigned = false)
    def one(ts: CdcModel.TypeSpec, rt: Option[String] = None) =
      CdcModel.toStructType(CdcModel.DdlEvent("ns", "record", "ChangeRecord",
        "t", "d", 1, "0-1-1", Seq(field(ts, rt)))).head
    assert(one(CdcModel.UnionType(Seq("null", "long"))).dataType == LongType)
    assert(one(CdcModel.UnionType(Seq("null", "double"))).dataType == DoubleType)
    assert(one(CdcModel.UnionType(Seq("null", "bytes"))).dataType == BinaryType)
    assert(one(CdcModel.PlainType("decimal(12,2)")).dataType ==
      DecimalType(12, 2))
    assert(one(CdcModel.UnionType(Seq("null", "string")),
      Some("datetime(3)")).dataType == TimestampType)
    assert(one(CdcModel.UnionType(Seq("null", "string")),
      Some("date")).dataType == DateType)
    assert(one(CdcModel.UnionType(Seq("null", "string")),
      Some("decimal(10,4)")).dataType == DecimalType(10, 4))
  }

  // Golden DML insert envelope — client_test.go:152-166.
  private val goldenDml =
    """{"domain": 0, "server_id": 3000, "sequence": 7, "event_number": 1,
      |"timestamp": 1700000000, "event_type": "insert",
      |"table_name": "tests", "table_schema": "test",
      |"id": 1}""".stripMargin.replace("\n", " ")

  test("DML decode: envelope + verbatim raw + gtid") {
    val e = Protocol.decodeDmlEvent(goldenDml)
    assert(e.domain == 0 && e.serverId == 3000 && e.sequence == 7L)
    assert(e.eventNumber == 1 && e.eventType == "insert")
    assert(e.tableName == "tests" && e.tableSchema == "test")
    assert(e.raw == goldenDml)
    assert(e.gtid == "0-3000-7")
  }

  test("tableData strips exactly the 8 envelope keys") {
    assert(Protocol.tableData(goldenDml) == Map("id" -> 1))
    val multi =
      """{"domain":0,"server_id":3000,"sequence":9,"event_number":2,
        |"timestamp":1,"event_type":"update_after","table_name":"t",
        |"table_schema":"d","id":2,"name":"x","score":1.5,"ok":true,
        |"missing":null}""".stripMargin.replace("\n", "")
    assert(Protocol.tableData(multi) ==
      Map("id" -> 2, "name" -> "x", "score" -> 1.5, "ok" -> true,
        "missing" -> null))
  }
}
