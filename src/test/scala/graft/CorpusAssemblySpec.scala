package graft

import graft.operators.SequencePack
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus assembly over the real testdata: scrub →
  * deterministic split → stratified sample → shard → pack — the
  * "prepare a training corpus" path chained as one flow, asserting
  * the cross-stage invariants the individual oracles can't see:
  * stage composition preserves row identity, split/sample decisions
  * are pure functions of the key (stable under re-run and under
  * subsetting), and packing downstream of sampling still respects
  * capacity.
  */
class CorpusAssemblySpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def coin(c: org.apache.spark.sql.Column) = md5(c.cast("string"))

  test("scrub -> split -> stratified sample -> shard -> pack composes") {
    val docs = Tables(spark, sf, "documents")
      // 1. scrub (word-salad text has no digits; invariant: no-op here)
      .withColumn("clean", regexp_replace(col("text"), "[0-9]+", "<NUM>"))
      // 2. deterministic 90/5/5 split
      .withColumn("h", substring(coin(col("doc_id")), 1, 4))
      .withColumn("split",
        when(col("h") < "e666", "train").when(col("h") < "f333", "val")
          .otherwise("test"))
      // 3. stratified keep-decision (train docs only)
      .withColumn("keep", col("split") === "train" &&
        substring(coin(col("doc_id")), 1, 4) < "8000")
    val kept = docs.filter(col("keep"))
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(4)).cast("long").as("shard"),
        size(split(col("clean"), " ")).as("tok"))

    // scrub is a no-op on this corpus (invariant of the fixture)
    assert(docs.filter(col("clean") =!= col("text")).count() === 0)

    // split is total and decisions are stable under re-run
    val splits = docs.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum === docs.count())
    assert(splits("train") > splits.getOrElse("val", 0L))

    // 4. pack the sampled training shard
    val packed = SequencePack(kept, "doc_id", "tok", "lang", "shard", 256)
    val rows = packed.collect()
    assert(rows.length.toLong === kept.count(),
      "packing must preserve every sampled doc")

    // capacity invariant survives the upstream sampling
    val byPack = rows.groupBy(r =>
      (r.getAs[String]("lang"), r.getAs[Long]("shard"),
        r.getAs[Long]("pack_id")))
    assert(byPack.values.forall(p =>
      p.map(_.getAs[Int]("tok").toLong).sum <= 256 || p.size == 1))

    // 5. sampling decisions are SUBSET-STABLE: running the same coin
    // on half the corpus keeps exactly the intersection
    val half = Tables(spark, sf, "documents").filter(col("doc_id") % 2 === 0)
      .withColumn("h", substring(coin(col("doc_id")), 1, 4))
      .filter(col("h") < "8000")
      .select(col("doc_id"))
    val fullEven = docs
      .filter(substring(coin(col("doc_id")), 1, 4) < "8000" &&
        col("doc_id") % 2 === 0)
      .select(col("doc_id"))
    assert(half.exceptAll(fullEven).isEmpty && fullEven.exceptAll(half).isEmpty)
  }
}
