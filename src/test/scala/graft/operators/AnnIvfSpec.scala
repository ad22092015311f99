package graft.operators

import graft.{LocalSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the IVF ANN contract: results are the EXACT top-k within the
  * probed cells (the approximation is only in which cells are probed),
  * and the index is a partition of the corpus. */
class AnnIvfSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = LocalSpark.spark

  test("index assigns every vector to exactly one cell") {
    val e = Tables(spark, sf, "embeddings")
    val idx = AnnIvf.buildIndex(e, "vec_id", "embedding", numCells = 8)
    assert(idx.count() == e.count())
    assert(idx.select("vec_id").distinct().count() == e.count())
    assert(idx.agg(max("cell")).head.getInt(0) < 8)
    // seed rows stay in their own cell (sim(seed, seed) = 1)
    assert(idx.filter(col("vec_id") < 8)
      .filter(col("vec_id") =!= col("cell").cast("long")).count() == 0)
  }

  test("query returns exact top-k within probed cells") {
    val e = Tables(spark, sf, "embeddings")
    val idx = AnnIvf.buildIndex(e, "vec_id", "embedding", numCells = 8)
      .cache()
    val probe = e.filter(col("vec_id") === 0).select(col("embedding"))
    val got = AnnIvf.query(idx, probe, "vec_id", "embedding",
      k = 5, nprobe = 3).collect()
    assert(got.length == 5)
    assert(got.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4, 5))
    // brute-force the same restriction and compare exactly
    val cells = got.map(_.getAs[Int]("cell")).distinct
    val pEmb = probe.withColumnRenamed("embedding", "probe_emb")
    val brute = idx.filter(col("cell").isin(cells.toIndexedSeq: _*))
      .crossJoin(broadcast(pEmb))
      .withColumn("sim", AnnIvf.cosine(col("embedding"), col("probe_emb")))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(5).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == brute)
    // rank 1 is the probe itself (cosine 1.0 self-match)
    assert(got.head.getAs[Long]("vec_id") == 0L)
  }
}
