package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of all operator packs (one per SURVEY.md §2.2
  * category); `oracleSql` carries the DuckDB-dialect equivalent for
  * every SQL-expressible query. Names are asserted disjoint at object
  * init so a duplicate registration fails fast in `sbt test`.
  */
object SparkEntry {

  private val packs: Seq[OpPack] = Seq(
    ScanOps, FilterOps, AggOps, JoinOps, WindowOps, SortSetOps,
    FnOps, CdcOps, StreamOps, LlmOps, DedupOps, TextOps, MmOps,
    SubqueryOps, SampleOps, SketchOps, TsOps, TpchOps, GeoOps,
    StatOps, ReportOps, CorpusOps, HierOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries.toSeq)
    require(all.map(_._1).distinct.size == all.size,
      s"duplicate query names across packs")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] = {
    val all = packs.flatMap(_.oracle.toSeq)
    val orphans = all.map(_._1).filterNot(queries.contains)
    require(orphans.isEmpty, s"oracle without query: $orphans")
    all.toMap
  }
}
