package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parquet table loaders for the driver testdata layout
  * (`<sfDir>/<table>.parquet`, see /root/repo/TESTDATA.md) plus the
  * shared cross-engine determinism helpers used by every query in
  * [[SparkEntry.queries]].
  *
  * Determinism policy (SURVEY.md §2.2 rules ①–⑤): any float that is
  * *computed* (not a verbatim column read) is routed through an exact
  * decimal representation before rounding, so Spark and the DuckDB
  * oracle produce bit-identical doubles regardless of their different
  * float-rounding implementations (Spark rounds via the shortest
  * decimal string repr, DuckDB via double arithmetic — they disagree
  * exactly on half-way values, which decimal arithmetic avoids).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts has shipped as two physical parquet types; both session
    * confs below make it come out of the scan as zone-aware
    * TimestampType µs with NO projection over the scan:
    *
    *  - TIMESTAMP(NANOS), which Spark 4 refuses to read natively:
    *    [[NanosKey]] reads it as long nanos (converted to µs below —
    *    the one legacy shape that still needs a Project).
    *  - plain µs with isAdjustedToUTC=false, which Spark infers as
    *    TIMESTAMP_NTZ by default: [[NtzKey]]=false restores the
    *    pre-3.4 inference (TimestampType) so the scan itself yields
    *    LTZ µs. Under the UTC session zone these are the same
    *    instants, and — unlike the earlier `withColumn(cast)`
    *    normalization — literal ts predicates still reach
    *    `PushedFilters` for row-group pruning (pinned by
    *    PlanShapeSpec / `scan_events_pushdown`).
    *
    * There is no per-reader option for either, so they must be session
    * confs: the graft entry points (Verify, Bench, TimeOne, PlanPeek,
    * the test session) set them at session build; for a foreign
    * session this sets them once on first touch of the events table
    * rather than on every load. */
  private def ensureEventsConfs(spark: SparkSession): Unit = {
    if (!spark.conf.getOption(NanosKey).contains("true"))
      spark.conf.set(NanosKey, "true")
    if (!spark.conf.getOption(NtzKey).contains("false"))
      spark.conf.set(NtzKey, "false")
  }
  val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"
  val NtzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // See ensureEventsConfs: ns parquet → long nanos → µs timestamp
      // (the DuckDB oracle keeps ns — testdata guarantees ts is
      // monotone in event_id, so every ordering/trunc agrees);
      // µs parquet → TimestampType straight from the scan.
      ensureEventsConfs(spark)
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // Only reachable if a foreign session pinned NtzKey=true
          // itself; keep the (pushdown-blocking but correct) cast as
          // the fallback rather than fighting the user's conf.
          df.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Exact sum of a 2-decimal money column: decimal(18,2) is exact for
    * the testdata magnitudes, the final double conversion is exact too. */
  def moneySum(c: Column): Column =
    round(sum(c.cast(DecimalType(28, 2))).cast("double"), 2)

  /** Exact sum of a product-of-money expression with up to 6 decimals. */
  /** Sum exactly in decimal, ROUND IN DECIMAL (half-away-from-zero in
    * both engines), THEN cast to double. Rounding after the double
    * cast looked equivalent but diverged one cent at sf1: an exact
    * ….865000 sum casts to a double a hair below the half-cent, and
    * the engines disagree on which side it falls. */
  def exprSum(c: Column): Column =
    round(sum(c.cast(DecimalType(28, 6))), 2).cast("double")

  /** Average via exact decimal sum, divided in double (bit-identical in
    * both engines), then rounded. */
  def moneyAvg(c: Column): Column =
    round(sum(c.cast(DecimalType(28, 2))).cast("double") / count(c), 2)

  /** Round a computed scalar through an exact decimal(18,6). */
  def money(c: Column): Column =
    round(c.cast(DecimalType(18, 6)), 2).cast("double")

  /** DuckDB-side SQL fragments mirroring the helpers above. */
  object sql {
    def moneySum(e: String): String =
      s"round(CAST(sum(CAST($e AS DECIMAL(28,2))) AS DOUBLE), 2)"
    def exprSum(e: String): String =
      s"CAST(round(sum(CAST($e AS DECIMAL(28,6))), 2) AS DOUBLE)"
    def moneyAvg(e: String): String =
      s"round(CAST(sum(CAST($e AS DECIMAL(28,2))) AS DOUBLE) / count($e), 2)"
    def money(e: String): String =
      s"CAST(round(CAST($e AS DECIMAL(18,6)), 2) AS DOUBLE)"
  }
}
