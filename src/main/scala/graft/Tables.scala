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

  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read natively; this legacy flag reads it as long nanos (truncated
    * to µs TimestampType below). There is no per-reader option for it,
    * so it must be a session conf: the graft entry points (Verify,
    * Bench, TimeOne, PlanPeek, the test session) set it at session
    * build; for a foreign session this sets it once on first touch of
    * the events table rather than on every load. */
  private def ensureNanosConf(spark: SparkSession): Unit =
    if (!spark.conf.getOption(NanosKey).contains("true"))
      spark.conf.set(NanosKey, "true")
  val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // See ensureNanosConf: ns parquet → long nanos → µs timestamp
      // (the DuckDB oracle keeps ns — testdata guarantees ts is
      // monotone in event_id, so every ordering/trunc agrees).
      ensureNanosConf(spark)
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // Driver testdata switched from TIMESTAMP(NANOS) to plain
          // µs parquet (isAdjustedToUTC=false ⇒ Spark reads NTZ).
          // Normalize to TimestampType under the UTC session zone so
          // unix_micros()/zone-aware functions keep working and the
          // values are the SAME instants the nanos path produced.
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
  def exprSum(c: Column): Column =
    round(sum(c.cast(DecimalType(28, 6))).cast("double"), 2)

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
      s"round(CAST(sum(CAST($e AS DECIMAL(28,6))) AS DOUBLE), 2)"
    def moneyAvg(e: String): String =
      s"round(CAST(sum(CAST($e AS DECIMAL(28,2))) AS DOUBLE) / count($e), 2)"
    def money(e: String): String =
      s"CAST(round(CAST($e AS DECIMAL(18,6)), 2) AS DOUBLE)"
  }
}
