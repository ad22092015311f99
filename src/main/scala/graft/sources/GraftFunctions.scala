package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalog-scoped SQL FUNCTIONS for the `graft-manifest` lakehouse
  * (the Iceberg `system.bucket` shape, on Spark's DSv2
  * `FunctionCatalog`): after registering the catalog, plain SQL can
  * call
  *
  *   SELECT g.system.bucket(8, c_custkey)    -- the ON-DISK bucket
  *   SELECT g.system.fnv64(c_name)           -- string canonicalization
  *   SELECT g.system.dot(a, b)               -- embedding dot product
  *
  * `bucket` and `fnv64` expose the format's PINNED hash contracts
  * ([[ManifestSink.bucketOf]] splitmix64 finalizer,
  * [[ManifestSink.fnv64]] FNV-1a64 over UTF-8) — the same bits the
  * write path routes on and the scan prunes on, so a SQL user can
  * pre-cluster, audit routing, or co-partition external data against
  * a manifest table without any Scala. Both carry the magic
  * `invoke` method, so Catalyst binds them as a static call inside
  * codegen (no row boxing); `dot` takes array arguments and binds
  * through `produceResult`.
  */
object GraftFunctions {
  // NOTE: the function objects below are deliberately PUBLIC — the
  // magic `invoke` call site is emitted by janino into a generated
  // class OUTSIDE this package, and janino filters inaccessible
  // candidates, so a `private object` silently demotes every call to
  // the interpreted produceResult path (observed as a per-task
  // CompileException + whole-stage codegen fallback).

  /** splitmix64-finalizer bucket routing — MUST stay byte-identical
    * to [[ManifestSink.bucketOf]] (it delegates). */
  object BucketFn extends UnboundFunction
      with ScalarFunction[Int] {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, key): the manifest format's on-disk bucket transform " +
        "(splitmix64 finalizer) — matches write-side routing exactly"
    override def bind(inputType: StructType): BoundFunction = {
      val ok = inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == LongType
      if (!ok) throw new UnsupportedOperationException(
        s"bucket(n INT, key BIGINT), got ${inputType.sql}")
      this
    }
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def canonicalName(): String = "graft.bucket"
    override def produceResult(input: InternalRow): Int =
      invoke(input.getInt(0), input.getLong(1))
    def invoke(n: Int, key: Long): Int = ManifestSink.bucketOf(key, n)
  }

  /** FNV-1a64 over UTF-8 — the string canonicalization blooms and
    * equality deletes key on ([[ManifestSink.fnv64]]). */
  object Fnv64Fn extends UnboundFunction
      with ScalarFunction[Long] {
    override def name(): String = "fnv64"
    override def description(): String =
      "fnv64(s): FNV-1a64 over UTF-8 bytes — the string key " +
        "canonicalization the format's blooms and equality deletes use"
    override def bind(inputType: StructType): BoundFunction = {
      val ok = inputType.fields.length == 1 &&
        inputType.fields(0).dataType == StringType
      if (!ok) throw new UnsupportedOperationException(
        s"fnv64(s STRING), got ${inputType.sql}")
      this
    }
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = LongType
    override def canonicalName(): String = "graft.fnv64"
    override def produceResult(input: InternalRow): Long =
      invoke(input.getUTF8String(0))
    def invoke(s: UTF8String): Long = ManifestSink.fnv64(s.getBytes)
  }

  /** Dot product over float embeddings — the FunctionCatalog route
    * to the same arithmetic as the session-extension `dot_product`
    * expression (functions/VectorExpressions.scala): one
    * left-to-right double accumulation, length mismatch ⇒ null. */
  object DotFn extends UnboundFunction
      with ScalarFunction[java.lang.Double] {
    override def name(): String = "dot"
    override def description(): String =
      "dot(a, b): dot product of two float embeddings; arrays of " +
        "different lengths yield NULL"
    override def bind(inputType: StructType): BoundFunction = {
      val ok = inputType.fields.length == 2 &&
        inputType.fields.forall(_.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
      if (!ok) throw new UnsupportedOperationException(
        s"dot(a ARRAY<FLOAT>, b ARRAY<FLOAT>), got ${inputType.sql}")
      this
    }
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(FloatType), ArrayType(FloatType))
    override def resultType(): DataType = DoubleType
    override def canonicalName(): String = "graft.dot"
    override def produceResult(input: InternalRow): java.lang.Double = {
      if (input.isNullAt(0) || input.isNullAt(1)) return null
      val x = input.getArray(0)
      val y = input.getArray(1)
      if (x.numElements() != y.numElements()) return null
      var s = 0.0
      var i = 0
      while (i < x.numElements()) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }
  }

  def load(name: String): UnboundFunction = name.toLowerCase match {
    case "bucket" => BucketFn
    case "fnv64"  => Fnv64Fn
    case "dot"    => DotFn
    case other => throw new UnsupportedOperationException(
      s"graft-manifest: unknown function '$other' — bucket / fnv64 / dot")
  }

  val names: Seq[String] = Seq("bucket", "dot", "fnv64")
}
