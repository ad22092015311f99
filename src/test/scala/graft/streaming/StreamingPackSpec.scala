package graft.streaming

import graft.LocalSpark
import graft.operators.SequencePack
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[StreamingSequencePack]]: pack state must carry across
  * micro-batches (an open pack continues into the next batch), and a
  * single-batch stream must assign exactly what the batch operator
  * assigns.
  */
class StreamingPackSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  import StreamingSequencePack._

  test("open pack carries across micro-batches; ids continue, never reset") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DocIn]
    val q = StreamingSequencePack.assign(input.toDS(), capacity = 100)
      .writeStream.format("memory").queryName("pack_stream")
      .outputMode("append").start()
    try {
      // batch 1: 60+30 fit in pack 0 (fill 90)
      input.addData(DocIn(1, "en/0", 60), DocIn(2, "en/0", 30))
      q.processAllAvailable()
      // batch 2: 20 would overflow (90+20>100) → opens pack 1; next 70
      // continues pack 1 (fill 90); 50 overflows → pack 2
      input.addData(DocIn(3, "en/0", 20), DocIn(4, "en/0", 70),
        DocIn(5, "en/0", 50))
      q.processAllAvailable()
      val got = spark.table("pack_stream")
        .select(col("id"), col("pack_id")).as[(Long, Long)]
        .collect().toMap
      assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
    } finally q.stop()
  }

  test("independent groups keep independent open packs") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DocIn]
    val q = StreamingSequencePack.assign(input.toDS(), capacity = 100)
      .writeStream.format("memory").queryName("pack_stream_grp")
      .outputMode("append").start()
    try {
      input.addData(DocIn(1, "en/0", 90), DocIn(2, "fr/0", 10))
      q.processAllAvailable()
      // en/0 is nearly full → 20 opens en pack 1; fr/0 has room → pack 0
      input.addData(DocIn(3, "en/0", 20), DocIn(4, "fr/0", 20))
      q.processAllAvailable()
      val got = spark.table("pack_stream_grp")
        .select(col("grp"), col("id"), col("pack_id"))
        .as[(String, Long, Long)].collect()
        .map { case (g, i, p) => (g, i) -> p }.toMap
      assert(got(("en/0", 3L)) === 1L)
      assert(got(("fr/0", 4L)) === 0L)
    } finally q.stop()
  }

  test("single-batch stream matches the batch operator exactly") {
    import spark.implicits._
    val docs = Seq(DocIn(10, "en/0", 40), DocIn(11, "en/0", 70),
      DocIn(12, "en/0", 30), DocIn(20, "fr/1", 120), DocIn(21, "fr/1", 5))
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DocIn]
    val q = StreamingSequencePack.assign(input.toDS(), capacity = 100)
      .writeStream.format("memory").queryName("pack_stream_eq")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("pack_stream_eq")
        .select(col("id"), col("pack_id")).as[(Long, Long)].collect().toMap
      val batchIn = docs.map(d => (d.id, d.grp, 0L, d.tok))
        .toDF("doc_id", "grp", "shard", "tok")
      val batch = SequencePack(batchIn, "doc_id", "tok", "grp", "shard", 100)
        .select(col("doc_id"), col("pack_id")).as[(Long, Long)]
        .collect().toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
