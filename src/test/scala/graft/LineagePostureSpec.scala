package graft

import org.apache.spark.sql.execution.LogicalRDD
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r13 checkpoint posture (VERDICT r12 items 2/4): every
  * memoized/iterative lineage cut goes through [[Lineage.cut]], whose
  * storage level is gated by ONE config — local masters keep the old
  * localCheckpoint behavior, and `spark.graft.checkpoint.level`
  * overrides it (the knob a cluster deployment sets to a replicated
  * level, or `reliable`). */
class LineagePostureSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark

  private def levelOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l }
      .head.rdd.getStorageLevel

  test("cut truncates lineage to a LogicalRDD leaf") {
    import spark.implicits._
    val cut = Lineage.cut(Seq(1L, 2L, 3L).toDF("v"), eager = true)
    assert(cut.queryExecution.analyzed.isInstanceOf[LogicalRDD])
    assert(cut.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("local master default keeps single-replica localCheckpoint") {
    import spark.implicits._
    spark.conf.unset("spark.graft.checkpoint.level")
    val cut = Lineage.cut(Seq(1L).toDF("v"), eager = true)
    assert(levelOf(cut).replication == 1)
  }

  test("one config flips every site to a replicated level") {
    import spark.implicits._
    spark.conf.set("spark.graft.checkpoint.level", "MEMORY_AND_DISK_2")
    try {
      val cut = Lineage.cut(Seq(1L).toDF("v"), eager = true)
      assert(levelOf(cut).replication == 2)
      assert(cut.collect().map(_.getLong(0)).toSeq == Seq(1L))
    } finally spark.conf.unset("spark.graft.checkpoint.level")
  }
}
