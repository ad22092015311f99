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

  test("index partitions the corpus; assignments reference live centroids") {
    val e = Tables(spark, sf, "embeddings")
    val idx = AnnIvf.buildIndex(e, "vec_id", "embedding", numCells = 8)
    assert(idx.assignments.count() == e.count())
    assert(idx.assignments.select("vec_id").distinct().count() == e.count())
    assert(idx.assignments.agg(max("cell")).head.getInt(0) < 8)
    // every assigned cell has a centroid of the full dimension
    val cents = idx.centroids.collect()
    assert(cents.forall(_.getSeq[Double](1).length == 64))
    val live = cents.map(_.getInt(0)).toSet
    val assigned = idx.assignments.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(assigned.subsetOf(live))
  }

  test("Lloyd refinement does not lose vectors and keeps centroids broadcast-sized") {
    val e = Tables(spark, sf, "embeddings")
    val refined = AnnIvf.buildIndex(e, "vec_id", "embedding",
      numCells = 8, refineIters = 2)
    assert(refined.assignments.count() == e.count())
    assert(refined.centroids.count() <= 8)
  }

  test("hardNegatives at nprobe=all matches brute force; labels always differ") {
    val e = Tables(spark, sf, "embeddings").limit(120).cache()
    val idx = AnnIvf.buildIndex(e, "vec_id", "embedding", numCells = 4)
    val lab = e.select(col("vec_id"), col("label"))
    val got = AnnIvf.hardNegatives(idx, "vec_id", "embedding",
      lab, "label", nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // labels always differ
    AnnIvf.hardNegatives(idx, "vec_id", "embedding", lab, "label",
      nprobe = 4).collect()
      .foreach(r => assert(r.getInt(1) != r.getInt(3),
        s"probe ${r.getLong(0)} got a same-label negative"))
    // brute force on the driver: argmax cosine among wrong-label
    val vecs = e.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for ((pid, pv, plab) <- vecs) {
      val wrong = vecs.filter { case (id, _, l) => id != pid && l != plab }
      if (wrong.nonEmpty) {
        val best = wrong.map { case (id, v, _) => (id, cos(pv, v)) }
          .sortBy { case (id, s) => (-s, id) }.head._1
        assert(got.get(pid).contains(best),
          s"probe $pid: expected hard negative $best, got ${got.get(pid)}")
      }
    }
  }

  test("knnJoin: k rows per probe, exact within that probe's cells") {
    val e = Tables(spark, sf, "embeddings")
    val built = AnnIvf.buildIndex(e, "vec_id", "embedding", numCells = 8)
    val idx = AnnIvf.IvfIndex(built.assignments.cache(),
      built.centroids.cache())
    val knn = AnnIvf.knnJoin(idx, "vec_id", "embedding", k = 3, nprobe = 2)
      .cache()
    // every probe gets exactly k neighbors with ranks 1..k (each cell
    // holds enough candidates at this corpus size)
    val badCounts = knn.groupBy("probe_id").count()
      .filter(col("count") =!= 3).count()
    assert(badCounts == 0)
    // spot-check one probe: its neighbors are the exact top-3 within
    // the cells that contain them
    val probeId = 42L
    val got = knn.filter(col("probe_id") === probeId)
      .orderBy("rank").collect().map(_.getAs[Long]("nbr_id")).toSeq
    val pEmb = idx.assignments.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe_emb"))
    val cells = idx.assignments.join(broadcast(pEmb.crossJoin(
        idx.centroids.select(col("cell").as("c2"), col("centroid")))
        .withColumn("cs", AnnIvf.cosine(col("probe_emb"), col("centroid")))
        .orderBy(desc("cs"), asc("c2")).limit(2).select(col("c2"))),
        col("cell") === col("c2"))
    val brute = cells.filter(col("vec_id") =!= probeId)
      .crossJoin(broadcast(pEmb))
      .withColumn("sim", AnnIvf.cosine(col("embedding"), col("probe_emb")))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(3).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(got == brute)
  }

  test("knnJoin recall vs brute force is substantial at nprobe=2/8") {
    val e = Tables(spark, sf, "embeddings")
    val built = AnnIvf.buildIndex(e, "vec_id", "embedding", numCells = 8)
    val idx = AnnIvf.IvfIndex(built.assignments.cache(),
      built.centroids.cache())
    val ann = AnnIvf.knnJoin(idx, "vec_id", "embedding", k = 3, nprobe = 2)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("nbr_id")))
      .toSet
    // exact kNN over the full corpus (500 vectors → cheap here)
    val l = e.select(col("vec_id"), col("embedding"))
    val r = e.select(col("vec_id").as("nbr_id"),
      col("embedding").as("emb_r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(desc("sim"), asc("nbr_id"))
    val exact = l.join(r, col("vec_id") =!= col("nbr_id"))
      .withColumn("sim", AnnIvf.cosine(col("embedding"), col("emb_r")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .collect().map(r2 => (r2.getAs[Long]("vec_id"), r2.getAs[Long]("nbr_id")))
      .toSet
    val recall = ann.intersect(exact).size.toDouble / exact.size
    info(s"recall@3 nprobe=2/8: $recall")
    // deterministic for this fixed dataset/index: measured 0.529 with
    // k-means|| seeding (0.487 with first-N seeding).
    // The synthetic embeddings are near-random, so cells carry limited
    // signal — the bound asserts the index is genuinely informative
    // (probing 2 of 8 cells ≈ 2x the 0.25 random-probe baseline), not
    // a production recall target.
    assert(recall > 0.4, s"recall@3 = $recall")
  }

  test("knnJoin recall@3 is monotone in nprobe and exact at nprobe=numCells") {
    // Guards the cell-ranking logic: probing MORE cells can only grow
    // every probe's candidate set, and with the strict (sim desc, id
    // asc) total order a true top-k neighbor that survives a small
    // candidate set survives every superset — so recall must be
    // non-decreasing in nprobe, reaching exactly 1.0 when every cell
    // is probed (candidate set = full corpus = brute force).
    val e = Tables(spark, sf, "embeddings")
    val built = AnnIvf.buildIndex(e, "vec_id", "embedding", numCells = 8)
    val idx = AnnIvf.IvfIndex(built.assignments.cache(),
      built.centroids.cache())
    val l = e.select(col("vec_id"), col("embedding"))
    val r = e.select(col("vec_id").as("nbr_id"),
      col("embedding").as("emb_r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(desc("sim"), asc("nbr_id"))
    val exact = l.join(r, col("vec_id") =!= col("nbr_id"))
      .withColumn("sim", AnnIvf.cosine(col("embedding"), col("emb_r")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .collect().map(r2 => (r2.getAs[Long]("vec_id"), r2.getAs[Long]("nbr_id")))
      .toSet
    val recalls = Seq(1, 2, 4, 8).map { nprobe =>
      val ann = AnnIvf.knnJoin(idx, "vec_id", "embedding",
          k = 3, nprobe = nprobe)
        .collect()
        .map(r2 => (r2.getAs[Long]("probe_id"), r2.getAs[Long]("nbr_id")))
        .toSet
      nprobe -> ann.intersect(exact).size.toDouble / exact.size
    }
    info(recalls.map { case (np, rc) => f"nprobe=$np: $rc%.3f" }
      .mkString(", "))
    recalls.sliding(2).foreach { case Seq((npA, a), (npB, b)) =>
      assert(a <= b, s"recall fell from $a (nprobe=$npA) to $b (nprobe=$npB)")
    }
    assert(recalls.last._2 == 1.0,
      s"nprobe=numCells must equal brute force, got ${recalls.last._2}")
  }

  test("query returns exact top-k within probed cells") {
    val e = Tables(spark, sf, "embeddings")
    val idx = AnnIvf.buildIndex(e, "vec_id", "embedding", numCells = 8)
    val assignments = idx.assignments.cache()
    val cached = AnnIvf.IvfIndex(assignments, idx.centroids.cache())
    val probe = e.filter(col("vec_id") === 0).select(col("embedding"))
    val got = AnnIvf.query(cached, probe, "vec_id", "embedding",
      k = 5, nprobe = 3).collect()
    assert(got.length == 5)
    assert(got.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4, 5))
    // brute-force the same restriction and compare exactly
    val cells = got.map(_.getAs[Int]("cell")).distinct
    val pEmb = probe.withColumnRenamed("embedding", "probe_emb")
    val brute = assignments.filter(col("cell").isin(cells.toIndexedSeq: _*))
      .crossJoin(broadcast(pEmb))
      .withColumn("sim", AnnIvf.cosine(col("embedding"), col("probe_emb")))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(5).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == brute)
    // rank 1 is the probe itself (cosine 1.0 self-match)
    assert(got.head.getAs[Long]("vec_id") == 0L)
  }

  test("semantic dedup is deterministic and exact within cells") {
    // SemDeDup contract (llm_dedup_semantic): the approximation is
    // ONLY the learned blocking — within each k-means cell, pair
    // detection is exact brute-force cosine. Model: collect unit
    // vectors + cell assignments, count all within-cell pairs with
    // sim >= 0.4 per cell, compare against the query's per-cell
    // counts; plus run-to-run determinism of the whole frame.
    val dir = sf
    val a = graft.SparkEntry.queries("llm_dedup_semantic")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val b = graft.SparkEntry.queries("llm_dedup_semantic")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(a == b, "semantic dedup not deterministic across runs")
    assert(a.map(_._2).sum ==
      Tables(spark, dir, "embeddings").count(), "cells must partition")
    // brute-force model from the same (deterministic) index build
    val built = AnnIvf.buildIndex(
      Tables(spark, dir, "embeddings"), "vec_id", "embedding",
      numCells = 16)
    val members = built.assignments.collect().map { r =>
      val emb = r.getSeq[Float](2).map(_.toDouble).toArray
      val n = math.sqrt(emb.map(x => x * x).sum)
      (r.getInt(1), r.getLong(0), emb.map(_ / n))
    }
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }
      s
    }
    val model = members.groupBy(_._1).map { case (cell, ms) =>
      val sorted = ms.sortBy(_._2)
      val pairs = for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        if dot(sorted(i)._3, sorted(j)._3) >= 0.4
      } yield (sorted(i)._2, sorted(j)._2)
      // keep-min drop rule: dropped = distinct greater-id pair members
      cell -> (pairs.size.toLong, pairs.map(_._2).distinct.size.toLong)
    }
    a.foreach { case (cell, _, nPairs, nDropped) =>
      val (mPairs, mDropped) = model.getOrElse(cell, (0L, 0L))
      assert(mPairs == nPairs,
        s"cell $cell: query $nPairs pairs vs model $mPairs")
      assert(mDropped == nDropped,
        s"cell $cell: query $nDropped dropped vs model $mDropped")
    }
  }
}
