package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all ScalaTest suites (JVM-wide;
  * building a session per suite would dominate test time). */
object LocalSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
.config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosKey, "true")
      .config(Tables.NtzKey, "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
