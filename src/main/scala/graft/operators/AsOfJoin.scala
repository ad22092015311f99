package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (Spark has no native ASOF; reference has no
  * joins at all — this is an engine addition per SURVEY.md §2.2).
  *
  * Strategy: instead of a per-row range scan (O(n·m) broadcast-nested-
  * loop, which dies at scale), tag both sides, union them, and take a
  * running `last(..., ignoreNulls)` over a single window ordered by
  * event time. One shuffle on the key, one sort — the same cost as a
  * sort-merge join, and it holds at 100 TB because each key's timeline
  * is processed in one partition in one pass.
  *
  * Tie semantics: a right row at exactly the left row's timestamp DOES
  * match (inclusive), because right rows sort before left rows at equal
  * (ts, seq) via the union order key. `seqCol` must be a unique,
  * time-monotone tiebreaker across both sides (e.g. a CDC sequence /
  * GTID sequence, `event.go:195-200` in the reference).
  */
object AsOfJoin {

  /** @param carry right-side columns to attach to each left row
    *        (renamed as given); null when no right row precedes. */
  def apply(left: DataFrame, right: DataFrame, key: String,
            tsCol: String, seqCol: String,
            carry: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedRight = carry.foldLeft(right) { case (df, (src, dst)) =>
      df.withColumn(dst, col(src))
    }.select((Seq(col(key), col(tsCol), col(seqCol), lit(0).as("__side")) ++
      carry.values.map(col _).toSeq): _*)
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .select((Seq(col(key), col(tsCol), col(seqCol), col("__side")) ++
        carry.values.map(c => lit(null).as(c)).toSeq ++
        leftCols.filterNot(Set(key, tsCol, seqCol)).map(col _)): _*)
    val unioned = taggedRight
      .select(taggedLeft.columns.map(c =>
        if (taggedRight.columns.contains(c)) col(c)
        else lit(null).as(c)): _*)
      .unionByName(taggedLeft)
    // Right rows first at equal (ts, seq) is guaranteed by seq
    // uniqueness; __side is a belt-and-braces tiebreaker.
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col(seqCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carry.values.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }
}
