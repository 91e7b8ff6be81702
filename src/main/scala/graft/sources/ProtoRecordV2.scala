package graft.sources

import graft.model.Point
import graft.wire.WireReader

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, StringStartsWith}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.OptionalLong
import scala.jdk.CollectionConverters._

/**
 * Splittable DataSourceV2 reader for the reference's framed protobuf
 * record files (record logs / store-file bodies; framing per
 * lib/protobuf.cc:23-27, resync per FindNextHeader at 231-253).
 *
 * Why a V2 source when [[ProtoRecordFile.read]] exists: the binaryFile
 * path is one task per FILE, so a single multi-GB record log serializes
 * onto one core. This source splits every file into byte ranges (the
 * Parquet/text input-split shape): a split owns exactly the records
 * whose 0xDEAD frame header STARTS inside [start, end), reading past
 * `end` to finish a straddling record, and a split that starts mid-file
 * re-syncs by scanning forward for the first frame candidate whose
 * CRC-16 trailer verifies. Record handout is therefore exactly-once
 * across splits, and a 1000-executor cluster reads one huge WAL with
 * even parallelism.
 *
 * Resync is CRC-validated only at split boundaries; once synced, the
 * chained parse tolerates CRC mismatches exactly like the sequential
 * reader (Go semantics, protofile.go:145-148). A payload that embeds
 * bytes that themselves look like a CRC-valid frame could fool a
 * boundary resync — the same ambiguity the reference's own
 * FindNextHeader heuristic has; with the magic + size-bounds + CRC
 * triple check the false-sync probability per boundary is ~2^-16 per
 * candidate byte, and only the one record straddling the boundary is at
 * risk.
 *
 * Scan-level pushdown, both visible in `.explain`:
 *  - filters on `name` (=, IN, prefix) are fully handled at the record
 *    level: a light wire-walk peeks the variable name and skips the
 *    whole value decode on mismatch;
 *  - column pruning: the reader materializes only the requested
 *    columns (a `select(name)` never decodes doubles into rows).
 */
class ProtoRecordSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Point.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ProtoRecordTable(properties.asScala.toMap)
}

object ProtoRecordV2 {
  val FormatName = "graft.sources.ProtoRecordSource"

  /** Convenience: splittable scan of a record-file directory. */
  def read(spark: SparkSession, path: String,
           splitBytes: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val r = spark.read.format(classOf[ProtoRecordSource].getName)
    splitBytes.fold(r)(n => r.option("splitBytes", n.toString)).load(path)
  }

  /** Convenience: distributed export of a canonical point frame as
    * reference-compatible framed record files (one per task). */
  def write(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    df.select(Point.columns.map(org.apache.spark.sql.functions.col): _*)
      .write.format(classOf[ProtoRecordSource].getName)
      .mode("append").save(path)

  /** Peek just the variable name out of a framed ValueStream payload —
    * field 2 (StreamVariable) → field 1 (name) — skipping every value
    * submessage, so name-filtered scans never pay the value decode. */
  def peekName(buf: Array[Byte], off: Int, len: Int): String = {
    var name = ""
    val r = new WireReader(buf, off, off + len)
    r.fields {
      case (2, 2) =>
        val (o, n) = r.lenDelim()
        val vr = new WireReader(buf, o, o + n)
        vr.fields {
          case (1, 2) => name = vr.string()
          case (_, wt) => vr.skip(wt)
        }
      case (_, wt) => r.skip(wt)
    }
    name
  }

  /** List the data files under a path (a file, or one directory level),
    * skipping hidden/metadata entries — the FileIndex convention. */
  def listFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory) fs.listStatus(p).toSeq.filter(_.isFile)
      else Seq(st)
    files
      .filterNot { s =>
        val n = s.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }
      .map(s => (s.getPath.toString, s.getLen))
  }
}

/**
 * Java-serializable Hadoop Configuration carrier: the session conf
 * (including `spark.hadoop.*` overrides — object-store credentials,
 * endpoints) must reach executor-side readers/writers; a bare
 * `new Configuration()` on the executor silently drops all of it.
 */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

final class ProtoRecordTable(properties: Map[String, String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String =
    s"proto-record ${properties.getOrElse("path", "")}"
  override def schema(): StructType = Point.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ProtoRecordScanBuilder(options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val path = Option(info.options.get("path")).getOrElse(
      throw new IllegalArgumentException("proto-record sink requires a path"))
    require(info.schema().fieldNames.sameElements(Point.columns),
      s"proto-record sink expects the canonical point schema " +
        s"(${Point.columns.mkString(", ")}), got " +
        info.schema().fieldNames.mkString(", "))
    new ProtoRecordWriteBuilder(path)
  }
}

final class ProtoRecordScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = Point.schema
  private var pushed: Array[Filter] = Array.empty

  /** A filter is consumable when it constrains only `name` in a shape
    * the record-level peek can evaluate exactly. */
  private def consumable(f: Filter): Boolean = f match {
    case EqualTo("name", _: String)         => true
    case In("name", vs)                     => vs.forall(_.isInstanceOf[String])
    case StringStartsWith("name", _)        => true
    case _                                  => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition(consumable)
    pushed = ours
    residual // Spark evaluates everything we did not take
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val spark = SparkSession.active
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("proto-record source requires a path"))
    val splitBytes = Option(options.get("splitBytes")).map(_.toLong)
      .getOrElse(spark.sessionState.conf.filesMaxPartitionBytes)
    require(splitBytes > 0, s"splitBytes must be positive, got $splitBytes")
    // the reader buffers one split as a byte array — a split must
    // stay JVM-array addressable (2 GB), with headroom for the one
    // straddling record the buffer may grow by
    require(splitBytes <= Int.MaxValue - (64 << 20),
      s"splitBytes must stay below ${Int.MaxValue - (64 << 20)} " +
        s"(splits buffer in one array), got $splitBytes")
    // capture the hadoop conf HERE, where the originating session is
    // provably active (mirrors ProtoRecordWriteBuilder) — deferring to
    // createReaderFactory risks picking up a different session's conf
    // when the plan materializes on another thread in a multi-session JVM
    new ProtoRecordScan(ProtoRecordV2.listFiles(spark, path), splitBytes,
      required, pushed,
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
  }
}

final case class ProtoRecordInputPartition(
    file: String, start: Long, end: Long, fileLen: Long) extends InputPartition

final class ProtoRecordScan(
    files: Seq[(String, Long)], splitBytes: Long,
    required: StructType, pushed: Array[Filter],
    conf: SerializableHadoopConf)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required

  override def description(): String =
    s"proto-record PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.fieldNames.mkString(",")}, splitBytes: $splitBytes"

  override def toBatch: Batch = this

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(files.map(_._2).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] =
    files.flatMap { case (f, len) =>
      if (len == 0) Nil
      else (0L until len by splitBytes).map { s =>
        ProtoRecordInputPartition(f, s, math.min(s + splitBytes, len), len)
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ProtoRecordReaderFactory(required, pushed, conf)
}

final class ProtoRecordReaderFactory(required: StructType,
                                     pushed: Array[Filter],
                                     conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ProtoRecordPartitionReader(
      partition.asInstanceOf[ProtoRecordInputPartition], required, pushed,
      conf.value)
}

// ------------------------------------------------------------------ write

/**
 * Distributed writer: each task emits ONE reference-compatible framed
 * record file (the export / migrate-out half of the migration story).
 * Rows buffer per series and flush as ValueStream records at
 * `flushValues` points — bounded memory per task regardless of series
 * count or skew — then the task's temp file renames into place on
 * commit (write-then-rename, the atomic publish the store layouts use).
 */
final class ProtoRecordWriteBuilder(path: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder {
  import org.apache.spark.sql.connector.write._
  override def build(): Write = new Write {
    // driver-side capture at plan time; commit/abort also run on the
    // driver and reuse it, tasks get the serialized copy
    private val conf = new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory =
        new ProtoRecordWriterFactory(path, conf)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val p = new HPath(path)
        val fs = p.getFileSystem(conf.value)
        messages.foreach {
          case ProtoRecordCommit(tmp, fin) =>
            if (!fs.rename(new HPath(tmp), new HPath(fin)))
              throw new java.io.IOException(s"commit rename failed: $tmp -> $fin")
          case _ =>
        }
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = {
        val p = new HPath(path)
        val fs = p.getFileSystem(conf.value)
        messages.foreach {
          case ProtoRecordCommit(tmp, _) =>
            fs.delete(new HPath(tmp), false)
          case _ =>
        }
      }
    }
  }
}

final case class ProtoRecordCommit(tmpFile: String, finalFile: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final class ProtoRecordWriterFactory(path: String, conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new ProtoRecordDataWriter(path, partitionId, taskId,
      hadoopConf = conf.value)
}

final class ProtoRecordDataWriter(dir: String, partitionId: Int, taskId: Long,
                                  flushValues: Int = 1024,
                                  hadoopConf: Configuration = new Configuration())
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val tmpName = f".datastore.$partitionId%05d-$taskId.rec.tmp"
  private val finalName = f"datastore.$partitionId%05d-$taskId.rec"
  private val fs = new HPath(dir).getFileSystem(hadoopConf)
  private val out = {
    fs.mkdirs(new HPath(dir))
    fs.create(new HPath(dir, tmpName), true)
  }

  private type Vals =
    scala.collection.mutable.ArrayBuffer[(Long, Option[Double], Option[String], Option[Long])]
  private val buf =
    scala.collection.mutable.LinkedHashMap.empty[(String, Map[String, String], String), Vals]
  private var buffered = 0

  private def flush(key: (String, Map[String, String], String), vs: Vals): Unit = {
    val payload = ProtoRecordFile.encodeValueStream(key._1, key._2, key._3, vs.toSeq)
    val framed = ProtoRecordFile.frame(Seq(payload))
    out.write(framed)
    buffered -= vs.length
  }

  override def write(row: InternalRow): Unit = {
    val name = row.getUTF8String(0).toString
    val labels =
      if (row.isNullAt(1)) Map.empty[String, String]
      else {
        val m = row.getMap(1)
        (0 until m.numElements()).map { i =>
          m.keyArray().getUTF8String(i).toString ->
            m.valueArray().getUTF8String(i).toString
        }.toMap
      }
    val vt = if (row.isNullAt(2)) "GAUGE" else row.getUTF8String(2).toString
    val v = (row.getLong(3),
      if (row.isNullAt(4)) None else Some(row.getDouble(4)),
      if (row.isNullAt(5)) None else Some(row.getUTF8String(5).toString),
      if (row.isNullAt(6)) None else Some(row.getLong(6)))
    val key = (name, labels, vt)
    val vs = buf.getOrElseUpdate(key, new Vals)
    vs += v
    buffered += 1
    if (vs.length >= flushValues) { flush(key, vs); buf.remove(key) }
    else if (buffered >= 16 * flushValues) {
      // global cap: flush the LARGEST buffer so skewed series counts
      // cannot grow task memory without bound
      val (k, b) = buf.maxBy(_._2.length)
      flush(k, b); buf.remove(k)
    }
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    buf.foreach { case (k, vs) => flush(k, vs) }
    buf.clear()
    out.close()
    ProtoRecordCommit(new HPath(dir, tmpName).toString,
      new HPath(dir, finalName).toString)
  }
  override def abort(): Unit = {
    out.close()
    fs.delete(new HPath(dir, tmpName), false)
  }
  override def close(): Unit = ()
}

/**
 * Reads the records whose frame header starts in [start, end): seeks to
 * `start`, CRC-resyncs if mid-file, then chain-parses — extending the
 * read window past `end` only for the one straddling record.
 */
final class ProtoRecordPartitionReader(
    part: ProtoRecordInputPartition, required: StructType,
    pushed: Array[Filter], hadoopConf: Configuration)
    extends PartitionReader[InternalRow] {

  import ProtoRecordFile.{Magic, crc16}

  // Executor-side file access through the SESSION Hadoop conf shipped
  // by the factory — spark.hadoop.* settings (object-store creds,
  // endpoints) apply on executors exactly as on the driver.
  private val in: FSDataInputStream = {
    val p = new HPath(part.file)
    p.getFileSystem(hadoopConf).open(p)
  }

  // Window of file bytes held in memory: [bufStart, bufStart+buf.length).
  // Starts as the split range; grows only for a straddling record.
  private var bufStart: Long = part.start
  private var buf: Array[Byte] = {
    val n = (part.end - part.start).toInt
    val a = new Array[Byte](n)
    in.readFully(part.start, a, 0, n)
    a
  }
  private def ensure(absEnd: Long): Boolean = {
    if (absEnd > part.fileLen) return false
    val have = bufStart + buf.length
    if (absEnd > have) {
      val extra = (absEnd - have).toInt
      val grown = java.util.Arrays.copyOf(buf, buf.length + extra)
      in.readFully(have, grown, buf.length, extra)
      buf = grown
    }
    true
  }
  private def rel(abs: Long): Int = (abs - bufStart).toInt

  private val nameEq: Set[String] = pushed.collect {
    case EqualTo("name", v: String) => Set(v)
    case In("name", vs) => vs.collect { case s: String => s }.toSet
  }.foldLeft(Option.empty[Set[String]]) {
    case (None, s) => Some(s)
    case (Some(a), s) => Some(a intersect s)
  }.getOrElse(null) // null = no equality constraint
  private val namePrefixes: Array[String] =
    pushed.collect { case StringStartsWith("name", p) => p }
  private def nameOk(n: String): Boolean =
    (nameEq == null || nameEq.contains(n)) && namePrefixes.forall(n.startsWith)

  // ---- frame walk (absolute offsets) --------------------------------
  private var pos: Long = part.start
  private var synced: Boolean = part.start == 0L

  /** Candidate frame at `pos`: returns payload length, or -1. CRC is
    * checked only when `validateCrc` (boundary resync). */
  private def candidate(validateCrc: Boolean): Int = {
    if (!ensure(pos + 6)) return -1
    val r0 = rel(pos)
    val magic = (buf(r0) & 0xFF) | ((buf(r0 + 1) & 0xFF) << 8)
    if (magic != Magic) return -1
    val size = (buf(r0 + 2) & 0xFF) | ((buf(r0 + 3) & 0xFF) << 8) |
      ((buf(r0 + 4) & 0xFF) << 16) | ((buf(r0 + 5) & 0xFF) << 24)
    if (size < 0 || pos + 6L + size + 2L > part.fileLen) return -1
    if (!ensure(pos + 6L + size + 2L)) return -1
    if (validateCrc) {
      val off = rel(pos + 6)
      val c = crc16(buf, off, size)
      val stored = (buf(off + size) & 0xFF) | ((buf(off + size + 1) & 0xFF) << 8)
      // A bad CRC alone must not reject the candidate outright — the
      // sequential reader TOLERATES bad-CRC records (Go semantics), so a
      // boundary resync that required a clean CRC would drop a record the
      // whole-file parse keeps. Fall back to chain validation: the frame
      // is believed if the position it implies for the NEXT frame is
      // end-of-file or itself carries a plausible header. False sync then
      // needs two aligned magic+size coincidences (~2^-32 per byte).
      if (c != stored && !chainsForward(pos + 6L + size + 2L)) return -1
    }
    size
  }

  /** True when `at` is a believable frame boundary: exactly EOF, or a
    * magic + in-bounds size header starts there. */
  private def chainsForward(at: Long): Boolean = {
    if (at == part.fileLen) return true
    if (!ensure(at + 6)) return false
    val r = rel(at)
    val magic = (buf(r) & 0xFF) | ((buf(r + 1) & 0xFF) << 8)
    if (magic != Magic) return false
    val size = (buf(r + 2) & 0xFF) | ((buf(r + 3) & 0xFF) << 8) |
      ((buf(r + 4) & 0xFF) << 16) | ((buf(r + 5) & 0xFF) << 24)
    size >= 0 && at + 6L + size + 2L <= part.fileLen
  }

  private var rows: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  /** Advance to the next record starting before `end`; returns its
    * (payloadOff, payloadLen) in buffer coords or null at split end. */
  private def nextRecord(): (Int, Int) = {
    while (pos < part.end) {
      val size = candidate(validateCrc = !synced)
      if (size >= 0) {
        synced = true
        val r = (rel(pos + 6), size)
        pos += 6L + size + 2L
        return r
      } else pos += 1
    }
    null
  }

  // Column materializers resolved once against the pruned schema.
  private val fieldIdx: Array[Int] = required.fieldNames.map(Point.columns.indexOf)

  private def rowsOf(off: Int, len: Int): Iterator[InternalRow] = {
    // Name-filter gate: peek before paying for the value decode. A
    // corrupt payload falls through to the full decode's Try (skip).
    if (pushed.nonEmpty &&
        scala.util.Try(nameOk(ProtoRecordV2.peekName(buf, off, len))) == scala.util.Success(false))
      return Iterator.empty
    scala.util.Try(ProtoRecordFile.decodeValueStream(buf, off, len)).toOption match {
      case None => Iterator.empty // corrupt payload: skip, like the sequential reader
      case Some(s) =>
        if (pushed.nonEmpty && !nameOk(s.name)) return Iterator.empty
        val nameU = UTF8String.fromString(s.name)
        val labelsM = {
          val ks = s.labels.keys.toArray.map(UTF8String.fromString(_): Any)
          val vs = s.labels.values.toArray.map(UTF8String.fromString(_): Any)
          new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
        }
        val vtU = UTF8String.fromString(s.valueType)
        s.values.iterator.map { case (ts, dv, sv, ets) =>
          val full: Array[Any] = Array(
            nameU, labelsM, vtU, ts,
            dv.map(d => d: Any).orNull,
            sv.map(UTF8String.fromString).orNull,
            ets.map(l => l: Any).orNull)
          InternalRow.fromSeq(fieldIdx.toSeq.map(i => full(i)))
        }
    }
  }

  override def next(): Boolean = {
    while (true) {
      if (rows.hasNext) { current = rows.next(); return true }
      val rec = nextRecord()
      if (rec == null) return false
      rows = rowsOf(rec._1, rec._2)
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
