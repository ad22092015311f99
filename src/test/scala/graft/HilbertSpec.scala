package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the defining properties of the generated Hilbert xy2d SQL
  * (ScanOps.hilbertCtes, shared verbatim with the DuckDB oracle): the
  * 32×32 mapping is a bijection onto [0, 1024) and every consecutive
  * pair of keys is GRID-ADJACENT (Manhattan distance exactly 1) — the
  * locality property that distinguishes the Hilbert curve from the
  * Morton curve (layout_zorder), which takes long diagonal jumps.
  * Any transcription slip in the unrolled reflect-and-swap state
  * machine breaks one of these.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  test("hilbert key: bijection onto 0..1023 with unit-step adjacency") {
    import spark.implicits._
    val cells = for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toDouble)
    cells.toDF("o_custkey", "o_totalprice")
      .createOrReplaceTempView("hilbert_cells")
    val rows = spark.sql(
      graft.ops.ScanOps.hilbertCtes("div", "hilbert_cells") +
        "\nSELECT x0, y0, d FROM h5")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 1024)
    assert(rows.map(_._3).toSet == (0L until 1024L).toSet, "bijection")
    val byD = rows.map { case (x, y, d) => d -> (x, y) }.toMap
    (0L until 1023L).foreach { d =>
      val (x1, y1) = byD(d)
      val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d -> ${d + 1} is not a unit grid step")
    }
  }
}
