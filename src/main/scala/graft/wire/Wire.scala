package graft.wire

import java.io.ByteArrayOutputStream

/**
 * Minimal protobuf wire-format primitives (varint / fixed64 /
 * length-delimited) shared by the record-file reader and the RPC
 * codec. Hand-rolled: the engine carries no generated proto classes.
 */
final class WireReader(val buf: Array[Byte], var pos: Int, val end: Int) {
  def hasMore: Boolean = pos < end
  def varint(): Long = {
    var shift = 0; var v = 0L
    var done = false
    while (!done && pos < end) {
      val b = buf(pos); pos += 1
      // Wire varints are at most 10 bytes (64 bits / 7); past shift 63
      // any further payload would wrap via JVM shift-mod-64.
      if (shift > 63)
        throw new IllegalArgumentException(
          s"malformed protobuf: varint longer than 10 bytes ending at $pos")
      v |= (b & 0x7FL) << shift
      if ((b & 0x80) == 0) done = true else shift += 7
    }
    // A buffer ending mid-varint (continuation bit set on the last
    // byte) is truncated input — fail loudly like fixed64/lenDelim do.
    if (!done)
      throw new IllegalArgumentException(
        s"truncated protobuf: varint at $pos overruns buffer end $end")
    v
  }
  def fixed64(): Long = {
    if (pos + 8 > end)
      throw new IllegalArgumentException(
        s"truncated protobuf: fixed64 at $pos overruns buffer end $end")
    var v = 0L
    var i = 0
    while (i < 8) { v |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
    pos += 8
    v
  }
  def lenDelim(): (Int, Int) = {
    // A declared length past the buffer is corrupt/truncated input:
    // fail loudly rather than silently decoding a partial value (a
    // truncated /add body must NOT persist partial points as success).
    val n = varint()
    if (n < 0 || n > end - pos)
      throw new IllegalArgumentException(
        s"truncated protobuf: declared length $n at $pos overruns buffer end $end")
    val r = (pos, n.toInt); pos += n.toInt; r
  }
  def string(): String = {
    val (o, n) = lenDelim()
    new String(buf, o, n, "UTF-8")
  }
  def skip(wireType: Int): Unit = wireType match {
    case 0 => varint()
    case 1 => fixed64()
    case 2 => lenDelim()
    case 5 =>
      if (pos + 4 > end)
        throw new IllegalArgumentException(
          s"truncated protobuf: fixed32 at $pos overruns buffer end $end")
      pos += 4
    case _ =>
      throw new IllegalArgumentException(s"unknown protobuf wire type $wireType")
  }
  /** Iterate (field, wireType) pairs, calling f; f reads the payload. */
  def fields(f: (Int, Int) => Unit): Unit =
    while (hasMore) {
      val tag = varint()
      f((tag >> 3).toInt, (tag & 7).toInt)
    }
}

final class WireWriter {
  private val out = new ByteArrayOutputStream()
  def varint(v0: Long): this.type = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt); this
  }
  def tag(field: Int, wireType: Int): this.type = varint((field.toLong << 3) | wireType)
  def intField(field: Int, v: Long): this.type = { tag(field, 0); varint(v) }
  def boolField(field: Int, v: Boolean): this.type = intField(field, if (v) 1 else 0)
  def doubleField(field: Int, d: Double): this.type = {
    tag(field, 1)
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xFF).toInt))
    this
  }
  def bytesField(field: Int, b: Array[Byte]): this.type = {
    tag(field, 2); varint(b.length); out.write(b); this
  }
  def stringField(field: Int, s: String): this.type =
    bytesField(field, s.getBytes("UTF-8"))
  def msgField(field: Int)(build: WireWriter => Unit): this.type = {
    val w = new WireWriter; build(w); bytesField(field, w.result())
  }
  def result(): Array[Byte] = out.toByteArray
}
