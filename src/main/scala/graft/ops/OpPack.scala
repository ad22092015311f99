package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One category of SURVEY.md §2.2 operators: named DataFrame builders
  * plus the DuckDB oracle SQL for those that are SQL-expressible. */
trait OpPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
