package graft.sources

import graft.model.Point
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import scala.collection.mutable.ArrayBuffer

/**
 * Migration reader for the reference's on-disk protobuf record files —
 * record logs and store-file bodies — so existing open-instrument data
 * can be converted into the Parquet point layout.
 *
 * Framing (lib/protobuf.cc:23-27, ProtoStreamWriter::Write at 255-280):
 * `uint16 LE 0xDEAD | int32 LE size | proto bytes | uint16 LE crc16`.
 * The reader re-syncs past corruption by scanning for the next magic
 * (FindNextHeader, lib/protobuf.cc:231-253); CRC mismatches are
 * counted but the record is still parsed, matching the Go reader
 * (go/.../protofile.go:145-148 checks and ignores).
 *
 * The payload is `ValueStream` (lib/openinstrument.proto:82-89),
 * decoded with a minimal hand-rolled wire-format parser (varint /
 * fixed64 / length-delimited) — no generated proto classes needed:
 *   ValueStream{2: StreamVariable, 4: repeated Value}
 *   StreamVariable{1: name, 2: repeated Label{1: label, 2: value}, 3: type}
 *   Value{1: ts varint, 2: double fixed64, 3: string, 4: end_ts varint}
 *
 * Scale shape: one Spark task per file via the binaryFile source
 * (files are bounded by the reference's 50–100 MB log rotation), rows
 * streamed out of the decoder.
 */
object ProtoRecordFile {

  val Magic: Int = 0xDEAD

  // ------------------------------------------------------------ wire format

  /** Little-endian CRC-16/ARC (poly 0x8005 reflected = 0xA001, init 0),
    * the boost::crc_16_type the C++ writer uses. */
  def crc16(bytes: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0
    var i = off
    while (i < off + len) {
      crc ^= bytes(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 1) != 0) (crc >>> 1) ^ 0xA001 else crc >>> 1
        b += 1
      }
      i += 1
    }
    crc & 0xFFFF
  }

  private final class WireReader(buf: Array[Byte], var pos: Int, end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      var done = false
      while (!done && pos < end) {
        val b = buf(pos); pos += 1
        v |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) done = true else shift += 7
      }
      v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      v
    }
    def bytes(n: Int): (Int, Int) = { val r = (pos, n); pos += n; r }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case _ => pos = end // unknown group types: abandon record
    }
  }

  final case class DecodedStream(
      name: String, labels: Map[String, String], valueType: String,
      values: Seq[(Long, Option[Double], Option[String], Option[Long])])

  /** Decodes one ValueStream message. */
  def decodeValueStream(buf: Array[Byte], off: Int, len: Int): DecodedStream = {
    var name = ""
    var labels = Map.empty[String, String]
    var vtype = "UNKNOWN"
    val values = ArrayBuffer.empty[(Long, Option[Double], Option[String], Option[Long])]
    val r = new WireReader(buf, off, off + len)
    while (r.hasMore) {
      val tag = r.varint()
      val field = (tag >> 3).toInt
      val wt = (tag & 7).toInt
      (field, wt) match {
        case (2, 2) => // StreamVariable
          val n = r.varint().toInt
          val (vo, vl) = r.bytes(n)
          val vr = new WireReader(buf, vo, vo + vl)
          while (vr.hasMore) {
            val vtag = vr.varint()
            ((vtag >> 3).toInt, (vtag & 7).toInt) match {
              case (1, 2) =>
                val sn = vr.varint().toInt
                name = new String(buf, vr.pos, sn, "UTF-8"); vr.pos += sn
              case (2, 2) => // Label{1: label, 2: value}
                val ln = vr.varint().toInt
                val lr = new WireReader(buf, vr.pos, vr.pos + ln)
                vr.pos += ln
                var k = ""; var v = ""
                while (lr.hasMore) {
                  val lt = lr.varint()
                  ((lt >> 3).toInt, (lt & 7).toInt) match {
                    case (1, 2) =>
                      val n2 = lr.varint().toInt
                      k = new String(buf, lr.pos, n2, "UTF-8"); lr.pos += n2
                    case (2, 2) =>
                      val n2 = lr.varint().toInt
                      v = new String(buf, lr.pos, n2, "UTF-8"); lr.pos += n2
                    case (_, w) => lr.skip(w)
                  }
                }
                if (k.nonEmpty) labels += k -> v
              case (3, 0) =>
                vtype = vr.varint() match {
                  case 1 => "GAUGE"; case 2 => "RATE"; case _ => "UNKNOWN"
                }
              case (_, w) => vr.skip(w)
            }
          }
        case (4, 2) => // Value
          val n = r.varint().toInt
          val end = r.pos + n
          var ts = 0L
          var dv: Option[Double] = None
          var sv: Option[String] = None
          var ets: Option[Long] = None
          val vv = new WireReader(buf, r.pos, end)
          r.pos = end
          while (vv.hasMore) {
            val vt = vv.varint()
            ((vt >> 3).toInt, (vt & 7).toInt) match {
              case (1, 0) => ts = vv.varint()
              case (2, 1) => dv = Some(java.lang.Double.longBitsToDouble(vv.fixed64()))
              case (3, 2) =>
                val sn = vv.varint().toInt
                sv = Some(new String(buf, vv.pos, sn, "UTF-8")); vv.pos += sn
              case (4, 0) => ets = Some(vv.varint())
              case (_, w) => vv.skip(w)
            }
          }
          values += ((ts, dv, sv, ets))
        case (_, w) => r.skip(w)
      }
    }
    DecodedStream(name, labels, vtype, values.toSeq)
  }

  /** Iterates framed records in a file image, re-syncing past
    * corruption; CRC failures are tolerated (Go semantics). */
  def records(buf: Array[Byte]): Iterator[(Int, Int)] = new Iterator[(Int, Int)] {
    private var pos = 0
    private var nextRec: (Int, Int) = null
    private def advance(): Unit = {
      nextRec = null
      while (nextRec == null && pos + 8 <= buf.length) {
        val magic = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8)
        if (magic != Magic) { pos += 1 }
        else {
          val size = (buf(pos + 2) & 0xFF) | ((buf(pos + 3) & 0xFF) << 8) |
            ((buf(pos + 4) & 0xFF) << 16) | ((buf(pos + 5) & 0xFF) << 24)
          if (size < 0 || pos + 6 + size + 2 > buf.length) { pos += 1 }
          else {
            nextRec = (pos + 6, size)
            pos += 6 + size + 2
          }
        }
      }
    }
    advance()
    override def hasNext: Boolean = nextRec != null
    override def next(): (Int, Int) = { val r = nextRec; advance(); r }
  }

  /** Writer (test fixtures + export parity): frames one encoded
    * ValueStream per record exactly as ProtoStreamWriter does. */
  def frame(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    payloads.foreach { p =>
      out.write(Magic & 0xFF); out.write((Magic >> 8) & 0xFF)
      out.write(p.length & 0xFF); out.write((p.length >> 8) & 0xFF)
      out.write((p.length >> 16) & 0xFF); out.write((p.length >> 24) & 0xFF)
      out.write(p)
      val c = crc16(p, 0, p.length)
      out.write(c & 0xFF); out.write((c >> 8) & 0xFF)
    }
    out.toByteArray
  }

  /** Minimal ValueStream encoder (inverse of [[decodeValueStream]]). */
  def encodeValueStream(name: String, labels: Map[String, String],
                        valueType: String,
                        values: Seq[(Long, Option[Double], Option[String], Option[Long])]): Array[Byte] = {
    def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def lenDelim(out: java.io.ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
      varint(out, (field << 3) | 2); varint(out, b.length); out.write(b)
    }
    val sv = new java.io.ByteArrayOutputStream()
    lenDelim(sv, 1, name.getBytes("UTF-8"))
    labels.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val lb = new java.io.ByteArrayOutputStream()
      lenDelim(lb, 1, k.getBytes("UTF-8"))
      lenDelim(lb, 2, v.getBytes("UTF-8"))
      lenDelim(sv, 2, lb.toByteArray)
    }
    val t = valueType match { case "GAUGE" => 1L; case "RATE" => 2L; case _ => 0L }
    varint(sv, (3 << 3) | 0); varint(sv, t)
    val out = new java.io.ByteArrayOutputStream()
    lenDelim(out, 2, sv.toByteArray)
    values.foreach { case (ts, dv, s, ets) =>
      val vb = new java.io.ByteArrayOutputStream()
      varint(vb, (1 << 3) | 0); varint(vb, ts)
      dv.foreach { d =>
        varint(vb, (2 << 3) | 1)
        val bits = java.lang.Double.doubleToLongBits(d)
        (0 until 8).foreach(i => vb.write(((bits >>> (8 * i)) & 0xFF).toInt))
      }
      s.foreach(str => lenDelim(vb, 3, str.getBytes("UTF-8")))
      ets.foreach(e => { varint(vb, (4 << 3) | 0); varint(vb, e) })
      lenDelim(out, 4, vb.toByteArray)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- Spark path

  /**
   * Reads a directory of reference record files into the canonical
   * point DataFrame — one task per file (binaryFile source), records
   * streamed out of the decoder per partition.
   */
  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = RowEncoder.encoderFor(Point.schema)
    spark.read.format("binaryFile").load(path)
      .select("content")
      .mapPartitions { files =>
        files.flatMap { row =>
          val buf = row.getAs[Array[Byte]](0)
          records(buf).flatMap { case (off, len) =>
            val s = decodeValueStream(buf, off, len)
            s.values.iterator.map { case (ts, dv, sv, ets) =>
              Row(s.name, s.labels, s.valueType, ts,
                dv.orNull, sv.orNull, ets.orNull)
            }
          }
        }
      }(enc)
      .toDF()
  }
}
