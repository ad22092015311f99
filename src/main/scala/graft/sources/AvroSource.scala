package graft.sources

import java.io.File
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow,
  SpecializedGetters}
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
  * (Avro files are self-describing); scan PLANNING then verifies every
  * container's header can serve the projected columns (presence +
  * resolution-compatible type) — a mixed-schema directory fails loudly
  * at the driver naming the offending file, never mid-job with an
  * opaque decode error. ONE InputPartition per file — reads
  * parallelize per file exactly like the manifest sink, no driver
  * data path. Column pruning is REAL skipped decoding, not a
  * post-read projection: the reader schema is built by PROJECTING the
  * writer's own header schema (keeping its record name, so Avro's
  * name-matching resolution also accepts foreign-written containers),
  * and Avro's resolving decoder skips non-projected fields byte-wise
  * (the format's own schema-resolution rules).
  * Write: one container per task, unique file names (speculative
  * attempts can never collide), and a COMMIT GATE: each task writes
  * `part-….avro.inprogress` and RENAMES to `.avro` only at task
  * commit, so a crashed executor or zombie speculative attempt can
  * never leave visible phantom data — reads list `*.avro` only, and
  * failed/speculative attempts are invisible by construction (the
  * same doctrine as the manifest sink). `mode("overwrite")` =
  * truncate at job commit (which also sweeps stale `.inprogress`
  * leftovers). Snappy-compressed blocks, the Avro ecosystem default.
  *
  * Type mapping (both directions): BIGINT↔long, INT↔int,
  * SMALLINT/TINYINT↔int (width restored by the Spark schema),
  * DOUBLE↔double, FLOAT↔float, STRING↔string, BOOLEAN↔boolean,
  * BINARY↔bytes, DATE↔int+date logical type, TIMESTAMP↔long+
  * timestamp-micros (both sides carry the same physical values Spark
  * uses internally — days and micros — so round trips are bit-exact),
  * ARRAY↔array (nullable ELEMENTS become union(null, T), mirroring
  * field nullability), STRUCT↔record (nested, names derived from the
  * field path so every nested record name is unique within the
  * schema). Nullable fields are `union(null, T)` with a null default,
  * the canonical Avro rendering. MAP and DECIMAL remain a declared,
  * loud driver-side veto (SURVEY §2.2 scan_avro_roundtrip row).
  *
  * At 100 TB: parallelism = file count (the writer produces one file
  * per task, so a 2,000-task write reads back 2,000-way parallel);
  * schema inference opens ONE header; planning opens each header
  * once (metadata-only, like Parquet footer reads); pruning skips
  * bytes inside every block. Scale-sensitive work is all
  * executor-side.
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
    override def planInputPartitions(): Array[InputPartition] = {
      val files = GraftAvro.listAvro(path)
      // Schema-drift guard: a directory is NOT guaranteed homogeneous
      // (appends from evolved writers, foreign files). Every header
      // must be able to serve the projection, checked here at
      // planning — a metadata-only pass, like Parquet footer reads —
      // so a mismatched container fails the job loudly at the driver
      // with the file named, instead of mid-task with an opaque Avro
      // resolution error on whichever partition decodes it.
      files.foreach { f =>
        val have = GraftAvro.toSparkSchema(GraftAvro.headerSchema(f))
        pruned.fields.foreach { want =>
          have.fields.find(_.name == want.name) match {
            case None => throw new IllegalArgumentException(
              s"graft-avro: container ${f.getAbsolutePath} has no " +
                s"column '${want.name}' required by the projection " +
                s"(its schema: ${have.toDDL}) — mixed-schema directory")
            case Some(h) if !GraftAvro.resolvable(want.dataType, h.dataType) =>
              throw new IllegalArgumentException(
                s"graft-avro: container ${f.getAbsolutePath} column " +
                  s"'${want.name}' is ${h.dataType.sql}, projection " +
                  s"needs ${want.dataType.sql} — mixed-schema directory")
            case _ => ()
          }
        }
      }
      files.map(f => GraftAvroPartition(f.getAbsolutePath): InputPartition)
        .toArray
    }
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
  // The reader schema is the WRITER's header schema projected to the
  // pruned columns (same record name, same field schemas): Avro's
  // name-matching resolution therefore always succeeds — including on
  // foreign-written containers whose record is not named
  // graft.avro.GraftRow — and the resolving decoder skips
  // non-projected writer fields byte-wise.
  private val datumReader = new GenericDatumReader[GenericRecord]()
  private val reader =
    new DataFileReader[GenericRecord](new File(file), datumReader)
  datumReader.setExpected(
    GraftAvro.projectWriterSchema(reader.getSchema, pruned, file))
  private var current: GenericRecord = _

  // Per-column decode, resolved ONCE (optimization r13, guide §1.2
  // "per-task work"): the generic path did, per row and column, an
  // Avro field-name hash lookup plus a DataType dispatch inside
  // toCatalyst, and allocated a fresh row. The expected schema is
  // built in PRUNED field order (projectWriterSchema), so access is
  // positional; the common scalar types collapse to identity (the
  // decoder already yields the right boxed value); the output row is
  // reused (valid until next(), the DSv2 contract — the manifest
  // reader's shape).
  private val conv: Array[Any => Any] = pruned.fields.map { f =>
    f.dataType match {
      case LongType | TimestampType | TimestampNTZType | IntegerType |
           DateType | DoubleType | FloatType | BooleanType =>
        (v: Any) => v
      case ShortType => (v: Any) => java.lang.Short
        .valueOf(v.asInstanceOf[java.lang.Integer].shortValue)
      case ByteType => (v: Any) => java.lang.Byte
        .valueOf(v.asInstanceOf[java.lang.Integer].byteValue)
      case StringType => (v: Any) => UTF8String.fromString(v.toString)
      case other => (v: Any) => GraftAvro.toCatalyst(v, other, file)
    }
  }
  private val vals = new Array[Any](pruned.length)
  private val row = new GenericInternalRow(vals)

  override def next(): Boolean = {
    if (!reader.hasNext) return false
    current = reader.next()
    true
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < vals.length) {
      val v = current.get(i)
      vals(i) = if (v == null) null else conv(i)(v)
      i += 1
    }
    row
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
    if (truncateFirst) {
      GraftAvro.listAvro(path)
        .filterNot(f => committed(f.getName))
        .foreach(_.delete())
      // overwrite also sweeps stale in-progress leftovers (crashed
      // tasks of THIS or any prior job) — they are invisible to reads
      // either way, this just keeps the directory clean
      Option(new File(path).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".avro.inprogress"))
        .foreach(_.delete())
    }
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

/** Task writer with the COMMIT GATE: bytes stream to
  * `part-….avro.inprogress` (invisible to reads — listAvro matches
  * `*.avro` only) and the file becomes visible ONLY by the rename at
  * task commit. A task that dies without abort() — lost executor,
  * zombie speculative attempt — leaves an invisible `.inprogress`
  * orphan, never phantom data; a same-name rename collision is
  * impossible (UUID names). Rename-as-visibility matches the
  * manifest sink's doctrine ("failed/speculative attempts invisible
  * by construction"). */
final class GraftAvroDataWriter(schema: StructType, path: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val name =
    f"part-$partitionId%05d-$taskId-${UUID.randomUUID()}.avro"
  private val inProgress = new File(path, name + ".inprogress")
  private val avroSchema = GraftAvro.toAvroSchema(schema)
  private val out = {
    new File(path).mkdirs()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
    w.create(avroSchema, inProgress)
  }

  // Per-column encode, resolved ONCE (optimization r13): the generic
  // path did TWO Avro field-name hash lookups per row and column
  // (getField + put-by-name). Field positions in avroSchema follow
  // `schema` order by construction (toAvroSchema), so access is
  // positional with the field schemas hoisted.
  private val fieldSchemas: Array[org.apache.avro.Schema] =
    schema.fields.map(f => avroSchema.getField(f.name).schema())

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.length) {
      rec.put(i,
        GraftAvro.fromCatalyst(row, i, schema(i).dataType, fieldSchemas(i)))
      i += 1
    }
    out.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val finalFile = new File(path, name)
    if (!inProgress.renameTo(finalFile)) throw new java.io.IOException(
      s"graft-avro: task commit rename failed: $inProgress -> $finalFile")
    GraftAvroCommit(Seq(name))
  }

  override def abort(): Unit = {
    try out.close() catch { case _: java.io.IOException => }
    inProgress.delete(): Unit
  }

  override def close(): Unit = out.close()
}

// ------------------------------------------------------------- mapping

object GraftAvro {
  def requirePath(opts: Map[String, String]): String =
    opts.getOrElse("path", throw new IllegalArgumentException(
      "graft-avro: .load(path)/.save(path) required"))

  /** Visible containers only: `*.avro`. A task's `.avro.inprogress`
    * file never matches — the read side of the commit gate. */
  def listAvro(dir: String): Seq[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName).toSeq

  def headerSchema(f: File): ASchema = {
    val r = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** Reader schema for one container: the WRITER's record projected
    * to the pruned columns — record name and field schemas are the
    * writer's own, so Avro name-matching resolution cannot fail on a
    * foreign record name, and type fidelity (narrow ints, NTZ) is
    * still applied Catalyst-side from the Spark type. */
  def projectWriterSchema(writer: ASchema, pruned: StructType,
      file: String): ASchema = {
    val fields = pruned.fields.map { p =>
      val wf = writer.getField(p.name)
      if (wf == null) throw new IllegalArgumentException(
        s"graft-avro: container $file has no column '${p.name}' " +
          s"required by the projection")
      new ASchema.Field(wf, wf.schema())
    }
    val rec = ASchema.createRecord(writer.getName, null,
      writer.getNamespace, false)
    rec.setFields(java.util.Arrays.asList(fields.toIndexedSeq: _*))
    rec
  }

  /** Can a column of file type `have` serve a projection that wants
    * `want`? Equal types always; plus the deliberate widenings the
    * mapping round-trips through (narrow ints ride Avro int, NTZ
    * rides timestamp-micros), recursively inside arrays/structs. */
  def resolvable(want: DataType, have: DataType): Boolean =
    (want, have) match {
      case (a, b) if a == b => true
      case (ShortType | ByteType, IntegerType) => true
      case (TimestampNTZType, TimestampType) => true
      case (ArrayType(w, _), ArrayType(h, _)) => resolvable(w, h)
      case (w: StructType, h: StructType) =>
        w.fields.forall(wf => h.fields.find(_.name == wf.name)
          .exists(hf => resolvable(wf.dataType, hf.dataType)))
      case _ => false
    }

  /** Spark → Avro. Nullable fields (and nullable ARRAY elements)
    * become `union(null, T)` with a null default; date/timestamp
    * carry their logical types over the same physical ints/longs
    * Spark uses (days / micros); STRUCT becomes a nested record whose
    * name is derived from the field path (unique by construction —
    * Avro requires distinct record full names within one schema). */
  def toAvroSchema(schema: StructType): ASchema =
    recordOf(schema, "GraftRow", "graft.avro", "")

  private def recordOf(st: StructType, name: String, ns: String,
      path: String): ASchema = {
    val fields = st.fields.map { f =>
      val fPath = if (path.isEmpty) f.name else s"$path.${f.name}"
      val base = avroType(f.dataType, fPath)
      val t = if (f.nullable) nullableOf(base) else base
      new ASchema.Field(f.name, t,
        null, if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
    }
    val rec = ASchema.createRecord(name, null, ns, false)
    rec.setFields(java.util.Arrays.asList(fields.toIndexedSeq: _*))
    rec
  }

  private def nullableOf(s: ASchema): ASchema =
    ASchema.createUnion(ASchema.create(ASchema.Type.NULL), s)

  private def avroType(dt: DataType, path: String): ASchema = dt match {
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
    case ArrayType(elem, containsNull) =>
      val e = avroType(elem, s"$path.element")
      ASchema.createArray(if (containsNull) nullableOf(e) else e)
    case st: StructType =>
      recordOf(st, path.replaceAll("[^A-Za-z0-9_]", "_"),
        "graft.avro.nested", path)
    case other => throw new IllegalArgumentException(
      s"graft-avro: column '$path' has unsupported type ${other.sql} — " +
        "scalars, date/timestamp, binary, ARRAY and STRUCT only " +
        "(MAP/DECIMAL are a declared veto)")
  }

  /** Avro (container header) → Spark, inverting [[toAvroSchema]];
    * also accepts foreign-written containers using the same physical
    * shapes. */
  def toSparkSchema(schema: ASchema): StructType = {
    require(schema.getType == ASchema.Type.RECORD,
      s"graft-avro: top-level Avro type must be a record, got " +
        s"${schema.getType}")
    structOf(schema)
  }

  private def structOf(rec: ASchema): StructType =
    StructType(rec.getFields.asScala.map { f =>
      val (t, nullable) = unwrap(f.schema())
      StructField(f.name(), sparkType(t, f.name()), nullable)
    }.toSeq)

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
      case ASchema.Type.RECORD => structOf(s)
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
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        InternalRow.fromSeq(st.fields.toIndexedSeq.map(f =>
          toCatalyst(rec.get(f.name), f.dataType, file)))
      case other => throw new IllegalStateException(
        s"graft-avro: cannot decode ${other.sql} from $file")
    }
  }

  /** Catalyst internal value at ordinal `i` of a row OR array
    * (SpecializedGetters unifies both) → Avro generic value;
    * `fieldSchema` is the corresponding Avro field schema (possibly
    * union(null, T)), needed to build nested records. */
  def fromCatalyst(g: SpecializedGetters, i: Int, dt: DataType,
      fieldSchema: ASchema): Any = {
    if (g.isNullAt(i)) return null
    dt match {
      case LongType | TimestampType | TimestampNTZType => g.getLong(i)
      case IntegerType | DateType => g.getInt(i)
      case ShortType => g.getShort(i).toInt
      case ByteType => g.getByte(i).toInt
      case DoubleType => g.getDouble(i)
      case FloatType => g.getFloat(i)
      case BooleanType => g.getBoolean(i)
      case StringType => g.getUTF8String(i).toString
      case BinaryType => java.nio.ByteBuffer.wrap(g.getBinary(i))
      case ArrayType(elem, _) =>
        val elemSchema = nonNullOf(fieldSchema).getElementType
        val arr = g.getArray(i)
        val out = new java.util.ArrayList[Any](arr.numElements())
        var j = 0
        while (j < arr.numElements()) {
          out.add(fromCatalyst(arr, j, elem, elemSchema))
          j += 1
        }
        out
      case st: StructType =>
        val recSchema = nonNullOf(fieldSchema)
        val sub = g.getStruct(i, st.length)
        val rec = new GenericData.Record(recSchema)
        var j = 0
        while (j < st.length) {
          rec.put(st(j).name, fromCatalyst(sub, j, st(j).dataType,
            recSchema.getField(st(j).name).schema()))
          j += 1
        }
        rec
      case other => throw new IllegalStateException(
        s"graft-avro: cannot encode ${other.sql}")
    }
  }

  private def nonNullOf(s: ASchema): ASchema =
    if (s.getType == ASchema.Type.UNION)
      s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get
    else s
}
