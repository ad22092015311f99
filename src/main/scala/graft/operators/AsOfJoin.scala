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
  * ALL carry columns ride in ONE struct through a single
  * `last(ignoreNulls)`: per-column lasts would mix fields from
  * different right rows whenever the latest right row holds a null in
  * one carry column (and would resurrect stale values over legitimate
  * nulls). The struct is null for left rows and whole for right rows,
  * so each left row receives exactly one right row's values — nulls
  * included.
  *
  * Tie semantics: a right row at exactly the left row's timestamp DOES
  * match (inclusive), because right rows sort before left rows at equal
  * (ts, seq) via the `__side` order key. `seqCol` must be a unique,
  * time-monotone tiebreaker across both sides (e.g. a CDC sequence /
  * GTID sequence, `event.go:195-200` in the reference).
  */
object AsOfJoin {

  /** @param carry right-side columns to attach to each left row
    *        (renamed as given); null when no right row precedes
    *        (backward) / follows (forward).
    * @param forward false (default): latest right row at-or-before
    *        each left row; true: EARLIEST right row at-or-after — the
    *        same one-shuffle construction over the reversed timeline
    *        (ties stay inclusive in both directions). */
  def apply(left: DataFrame, right: DataFrame, key: String,
            tsCol: String, seqCol: String,
            carry: Map[String, String],
            forward: Boolean = false): DataFrame = {
    val fixed = Set(key, tsCol, seqCol)
    val leftPayload = left.columns.toSeq.filterNot(fixed)
    require(carry.values.toSet.intersect(leftPayload.toSet ++ fixed).isEmpty,
      s"carry destinations ${carry.values} collide with left columns")

    // Right side: the whole carried record as one struct.
    val taggedRight = right.select(
      col(key), col(tsCol), col(seqCol), lit(0).as("__side"),
      struct(carry.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)
        .as("__carry"))
    // Left side: null struct (same type), plus its payload columns.
    val carrySchema = taggedRight.schema("__carry").dataType
    val taggedLeft = left.select(
      (Seq(col(key), col(tsCol), col(seqCol), lit(1).as("__side"),
        lit(null).cast(carrySchema).as("__carry")) ++
        leftPayload.map(col _)): _*)
    val unioned = taggedRight
      .select(taggedLeft.columns.map(c =>
        if (taggedRight.columns.contains(c)) col(c)
        else lit(null).as(c)): _*)
      .unionByName(taggedLeft)

    // Right rows first at equal (ts, seq) is guaranteed by seq
    // uniqueness; __side is a belt-and-braces tiebreaker. Forward
    // direction = the same running-last over the reversed timeline.
    val ord =
      if (forward) Seq(col(tsCol).desc, col(seqCol).desc, col("__side"))
      else Seq(col(tsCol), col(seqCol), col("__side"))
    val w = Window.partitionBy(key)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    carry.values.foldLeft(carried) { (df, dst) =>
      df.withColumn(dst, col("__carry").getField(dst))
    }.drop("__side", "__carry")
  }
}
