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

  final case class DecodedStream(
      name: String, labels: Map[String, String], valueType: String,
      values: Seq[(Long, Option[Double], Option[String], Option[Long])])

  /** Decodes one ValueStream message (delegates to the shared wire codec). */
  def decodeValueStream(buf: Array[Byte], off: Int, len: Int): DecodedStream = {
    val s = graft.wire.Rpc.decodeStream(buf, off, len)
    DecodedStream(s.variable.name, s.variable.labels, s.variable.valueType, s.values)
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
          // long arithmetic: a corrupt size near Int.MaxValue would
          // overflow the bound check and crash instead of re-syncing
          if (size < 0 || pos.toLong + 6L + size + 2L > buf.length) { pos += 1 }
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
    val w = new graft.wire.WireWriter
    w.msgField(2)(vw => graft.wire.Rpc.encodeStreamVariable(vw,
      graft.model.Variable(name, labels, valueType)))
    values.foreach { case (ts, dv, sv, ets) =>
      w.msgField(4) { pw =>
        pw.intField(1, ts)
        dv.foreach(pw.doubleField(2, _))
        sv.foreach(pw.stringField(3, _))
        ets.foreach(pw.intField(4, _))
      }
    }
    w.result()
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
            // A well-framed record can still carry a corrupt payload
            // (CRC mismatches are tolerated); skip it and re-sync like
            // the reference reader rather than failing the whole file.
            scala.util.Try(decodeValueStream(buf, off, len)).toOption
              .iterator.flatMap { s =>
                s.values.iterator.map { case (ts, dv, sv, ets) =>
                  Row(s.name, s.labels, s.valueType, ts,
                    dv.orNull, sv.orNull, ets.orNull)
                }
              }
          }
        }
      }(enc)
      .toDF()
  }
}
