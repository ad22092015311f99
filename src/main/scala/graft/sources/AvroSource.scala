package graft.sources

import java.io.File
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite,
  Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-avro`: an Avro OBJECT CONTAINER FILE source/sink built
  * directly on the avro-core library Spark ships (no spark-avro
  * connector in this environment), DSv2 both ways:
  *
  *   df.write.format("graft-avro").mode("overwrite").save(dir)
  *   spark.read.format("graft-avro").load(dir)
  *
  * Read: schema INFERRED from one container header on the driver
  * (Avro files are self-describing); ONE InputPartition per file —
  * reads parallelize per file exactly like the manifest sink, no
  * driver data path. Column pruning is REAL skipped decoding, not a
  * post-read projection: the pruned Spark schema becomes the Avro
  * READER schema, and Avro's resolving decoder skips non-projected
  * fields byte-wise (the format's own schema-resolution rules).
  * Write: one container per task, unique file names (speculative
  * attempts can never collide), `mode("overwrite")` = truncate at
  * commit. Snappy-compressed blocks, the Avro ecosystem default.
  *
  * Type mapping (both directions): BIGINT↔long, INT↔int,
  * SMALLINT/TINYINT↔int (width restored by the Spark schema),
  * DOUBLE↔double, FLOAT↔float, STRING↔string, BOOLEAN↔boolean,
  * BINARY↔bytes, DATE↔int+date logical type, TIMESTAMP↔long+
  * timestamp-micros (both sides carry the same physical values Spark
  * uses internally — days and micros — so round trips are bit-exact),
  * ARRAY<scalar>↔array. Nullable fields are `union(null, T)` with a
  * null default, the canonical Avro rendering.
  *
  * At 100 TB: parallelism = file count (the writer produces one file
  * per task, so a 2,000-task write reads back 2,000-way parallel);
  * schema inference opens ONE header; pruning skips bytes inside
  * every block. Scale-sensitive work is all executor-side.
  */
final class GraftAvroProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = GraftAvro.requirePath(options.asScala.toMap)
    val files = GraftAvro.listAvro(dir)
    if (files.isEmpty) throw new IllegalArgumentException(
      s"graft-avro: no .avro container files under $dir")
    GraftAvro.toSparkSchema(GraftAvro.headerSchema(files.head))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = properties.asScala.map { case (k, v) =>
      k.toLowerCase -> v }.toMap
    new GraftAvroTable(schema, GraftAvro.requirePath(opts))
  }
}

final class GraftAvroTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var pruned: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        pruned = requiredSchema
      override def build(): Scan = new GraftAvroScan(path, pruned)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // validate the schema maps to Avro on the DRIVER, before any task
    GraftAvro.toAvroSchema(info.schema())
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftAvroBatchWrite(info.schema(), path, truncateFirst)
      }
    }
  }
}

// ---------------------------------------------------------------- read

final class GraftAvroScan(path: String, pruned: StructType) extends Scan {
  override def readSchema(): StructType = pruned
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      GraftAvro.listAvro(path)
        .map(f => GraftAvroPartition(f.getAbsolutePath): InputPartition)
        .toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftAvroReaderFactory(pruned.toDDL)
  }
}

final case class GraftAvroPartition(file: String) extends InputPartition

/** Schema travels as DDL text (StructType is not serializable-stable
  * across DSv2 task boundaries — the repo convention). */
final class GraftAvroReaderFactory(prunedDdl: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftAvroPartitionReader(
      p.asInstanceOf[GraftAvroPartition].file,
      // a COUNT-style scan prunes every column: empty DDL = empty
      // projection (rows still iterate, zero fields decode)
      if (prunedDdl.trim.isEmpty) new StructType()
      else StructType.fromDDL(prunedDdl))
}

final class GraftAvroPartitionReader(file: String, pruned: StructType)
    extends PartitionReader[InternalRow] {
  // the PRUNED Spark schema rendered as the Avro reader schema: the
  // resolving decoder skips non-projected writer fields byte-wise
  private val reader = new DataFileReader[GenericRecord](new File(file),
    new GenericDatumReader[GenericRecord](null,
      GraftAvro.toAvroSchema(pruned)))
  private var current: GenericRecord = _

  override def next(): Boolean = {
    if (!reader.hasNext) return false
    current = reader.next()
    true
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](pruned.length)
    var i = 0
    while (i < pruned.length) {
      vals(i) = GraftAvro.toCatalyst(
        current.get(pruned(i).name), pruned(i).dataType, file)
      i += 1
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}

// --------------------------------------------------------------- write

final class GraftAvroBatchWrite(schema: StructType, path: String,
    truncateFirst: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftAvroWriterFactory(schema.toDDL, path)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.collect {
      case GraftAvroCommit(names) => names }.flatten.toSet
    if (truncateFirst)
      GraftAvro.listAvro(path)
        .filterNot(f => committed(f.getName))
        .foreach(_.delete())
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case GraftAvroCommit(names) => names }.flatten
      .foreach(n => new File(path, n).delete())
}

final case class GraftAvroCommit(files: Seq[String])
    extends WriterCommitMessage

final class GraftAvroWriterFactory(schemaDdl: String, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftAvroDataWriter(StructType.fromDDL(schemaDdl), path,
      partitionId, taskId)
}

final class GraftAvroDataWriter(schema: StructType, path: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val name =
    f"part-$partitionId%05d-$taskId-${UUID.randomUUID()}.avro"
  private val avroSchema = GraftAvro.toAvroSchema(schema)
  private val out = {
    new File(path).mkdirs()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
    w.create(avroSchema, new File(path, name))
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.length) {
      rec.put(schema(i).name,
        GraftAvro.fromCatalyst(row, i, schema(i).dataType))
      i += 1
    }
    out.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftAvroCommit(Seq(name))
  }

  override def abort(): Unit = {
    out.close()
    new File(path, name).delete(): Unit
  }

  override def close(): Unit = out.close()
}

// ------------------------------------------------------------- mapping

object GraftAvro {
  def requirePath(opts: Map[String, String]): String =
    opts.getOrElse("path", throw new IllegalArgumentException(
      "graft-avro: .load(path)/.save(path) required"))

  def listAvro(dir: String): Seq[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName).toSeq

  def headerSchema(f: File): ASchema = {
    val r = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** Spark → Avro. Nullable fields become `union(null, T)` with null
    * default; date/timestamp carry their logical types over the same
    * physical ints/longs Spark uses (days / micros). */
  def toAvroSchema(schema: StructType): ASchema = {
    val fields = schema.fields.map { f =>
      val base = avroType(f.dataType, f.name)
      val t = if (f.nullable)
        ASchema.createUnion(ASchema.create(ASchema.Type.NULL), base)
      else base
      new ASchema.Field(f.name, t,
        null, if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
    }
    val rec = ASchema.createRecord("GraftRow", null, "graft.avro", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  private def avroType(dt: DataType, name: String): ASchema = dt match {
    case LongType => ASchema.create(ASchema.Type.LONG)
    case IntegerType | ShortType | ByteType =>
      ASchema.create(ASchema.Type.INT)
    case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
    case FloatType => ASchema.create(ASchema.Type.FLOAT)
    case StringType => ASchema.create(ASchema.Type.STRING)
    case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
    case BinaryType => ASchema.create(ASchema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
    case TimestampType | TimestampNTZType =>
      LogicalTypes.timestampMicros()
        .addToSchema(ASchema.create(ASchema.Type.LONG))
    case ArrayType(elem, _) => ASchema.createArray(avroType(elem, name))
    case other => throw new IllegalArgumentException(
      s"graft-avro: column '$name' has unsupported type ${other.sql} — " +
        "scalars, date/timestamp, binary and ARRAY<scalar> only")
  }

  /** Avro (container header) → Spark, inverting [[toAvroSchema]];
    * also accepts foreign-written containers using the same physical
    * shapes. */
  def toSparkSchema(schema: ASchema): StructType = {
    require(schema.getType == ASchema.Type.RECORD,
      s"graft-avro: top-level Avro type must be a record, got " +
        s"${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (t, nullable) = unwrap(f.schema())
      StructField(f.name(), sparkType(t, f.name()), nullable)
    }.toSeq)
  }

  private def unwrap(s: ASchema): (ASchema, Boolean) =
    if (s.getType == ASchema.Type.UNION) {
      val nonNull = s.getTypes.asScala
        .filter(_.getType != ASchema.Type.NULL)
      require(nonNull.size == 1,
        s"graft-avro: only union(null, T) unions are supported, got $s")
      (nonNull.head, nonNull.size != s.getTypes.size())
    } else (s, false)

  private def sparkType(s: ASchema, name: String): DataType =
    s.getType match {
      case ASchema.Type.LONG =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros])
          TimestampType
        else LongType
      case ASchema.Type.INT =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
        else IntegerType
      case ASchema.Type.DOUBLE => DoubleType
      case ASchema.Type.FLOAT => FloatType
      case ASchema.Type.STRING => StringType
      case ASchema.Type.BOOLEAN => BooleanType
      case ASchema.Type.BYTES => BinaryType
      case ASchema.Type.ARRAY =>
        val (e, en) = unwrap(s.getElementType)
        ArrayType(sparkType(e, name), containsNull = en)
      case other => throw new IllegalArgumentException(
        s"graft-avro: field '$name' has unsupported Avro type $other")
    }

  /** Decoded Avro value → Catalyst internal value per the SPARK type
    * (which fixes physical width: SMALLINT reads back as Short even
    * though Avro carried an int). */
  def toCatalyst(v: Any, dt: DataType, file: String): Any = {
    if (v == null) return null
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        v.asInstanceOf[java.lang.Long]
      case IntegerType | DateType => v.asInstanceOf[java.lang.Integer]
      case ShortType =>
        java.lang.Short.valueOf(v.asInstanceOf[java.lang.Integer].shortValue)
      case ByteType =>
        java.lang.Byte.valueOf(v.asInstanceOf[java.lang.Integer].byteValue)
      case DoubleType => v.asInstanceOf[java.lang.Double]
      case FloatType => v.asInstanceOf[java.lang.Float]
      case BooleanType => v.asInstanceOf[java.lang.Boolean]
      case StringType => UTF8String.fromString(v.toString)
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      case ArrayType(elem, _) =>
        val list = v.asInstanceOf[java.util.Collection[Any]]
        new GenericArrayData(
          list.asScala.map(toCatalyst(_, elem, file)).toArray)
      case other => throw new IllegalStateException(
        s"graft-avro: cannot decode ${other.sql} from $file")
    }
  }

  /** Catalyst internal value at row ordinal `i` → Avro generic value. */
  def fromCatalyst(row: InternalRow, i: Int, dt: DataType): Any = {
    if (row.isNullAt(i)) return null
    dt match {
      case LongType | TimestampType | TimestampNTZType => row.getLong(i)
      case IntegerType | DateType => row.getInt(i)
      case ShortType => row.getShort(i).toInt
      case ByteType => row.getByte(i).toInt
      case DoubleType => row.getDouble(i)
      case FloatType => row.getFloat(i)
      case BooleanType => row.getBoolean(i)
      case StringType => row.getUTF8String(i).toString
      case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
      case ArrayType(elem, _) =>
        val arr = row.getArray(i)
        val out = new java.util.ArrayList[Any](arr.numElements())
        var j = 0
        while (j < arr.numElements()) {
          out.add(if (arr.isNullAt(j)) null
            else fromCatalystValue(arr, j, elem))
          j += 1
        }
        out
      case other => throw new IllegalStateException(
        s"graft-avro: cannot encode ${other.sql}")
    }
  }

  private def fromCatalystValue(arr: ArrayData, j: Int, dt: DataType): Any =
    dt match {
      case LongType | TimestampType | TimestampNTZType => arr.getLong(j)
      case IntegerType | DateType => arr.getInt(j)
      case ShortType => arr.getShort(j).toInt
      case ByteType => arr.getByte(j).toInt
      case DoubleType => arr.getDouble(j)
      case FloatType => arr.getFloat(j)
      case BooleanType => arr.getBoolean(j)
      case StringType => arr.getUTF8String(j).toString
      case BinaryType => java.nio.ByteBuffer.wrap(arr.getBinary(j))
      case other => throw new IllegalStateException(
        s"graft-avro: cannot encode array element ${other.sql}")
    }
}
