package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Structural guard for the driver's DuckDB-oracle compare: its pandas
  * canonicalizer hashes every result cell, and an `array<...>` /
  * `map<...>` / nested-struct cell is unhashable — the whole query
  * ERRORs out of the correctness report (round 5 shipped four such
  * queries believing them green). Any oracle-registered query must
  * therefore emit only flat scalar columns; list-valued results are
  * serialized with array_join / string_agg on BOTH engine and oracle
  * sides (the agg_collect / fn_array_set convention). This spec makes
  * that class of regression impossible to reintroduce: it analyzes
  * (never executes) every oracle-registered query and fails naming
  * the offending column.
  */
class OracleShapeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = LocalSpark.spark

  test("no oracle-registered query emits array/map/struct output columns") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sf).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"complex-typed output columns break the driver's oracle hash — " +
        s"serialize with array_join: ${offenders.mkString(", ")}")
  }

  test("every oracle entry has a registered query and vice-versa coverage " +
    "is declared") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle SQL without a query: $missing")
  }
}
