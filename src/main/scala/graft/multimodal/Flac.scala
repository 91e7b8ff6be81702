package graft.multimodal

/**
 * Pure-JVM FLAC decoder — the r16 increment that moves lossless
 * compressed audio off the stub seam: unlike the MP3/OGG header walks
 * ([[Multimodal.CompressedAudio]], real sample counts but span-summary
 * features over compressed bytes), FLAC is decodable to true PCM with
 * no native codec at all, so the feature summary runs over the REAL
 * samples and the `decoder` provenance column reads `"flac"` as a
 * full decode, not a `-hdr` walk.
 *
 * Implements the public format (RFC 9639 / xiph.org spec; reference
 * behavior: open-instrument has no audio path — this is the
 * training-data pipeline side of the engine): STREAMINFO parse,
 * frame-header walk (UTF-8 coded frame/sample number, CRC-8-checked),
 * all four subframe types (constant, verbatim, fixed order 0–4, LPC
 * up to order 32), Rice/Rice2 residual partitions with the raw-bits
 * escape, wasted-bits shift, and all four channel assignments
 * (independent, left/side, right/side, mid/side). Bit depths 8–24,
 * any block size, up to 8 channels. Frame CRC-16 is verified; a
 * failed CRC or any structural violation aborts the decode (None →
 * the caller's next fallback), never a partial result.
 *
 * Decoding is bounded by `maxSamples` (feature extraction needs only
 * the summary window — [[Multimodal.AudioDecoder]] caps at 1 MiB of
 * PCM), so a multi-GB blob costs the prefix that fills the cap, not a
 * full decompression; the TOTAL sample count still comes exact from
 * STREAMINFO. Stateless object, partition-local use, no allocation
 * shared across rows.
 */
object Flac extends Serializable {

  /** Decoded prefix: (totalSamples from STREAMINFO, channels,
    * bitsPerSample, interleaved PCM of the decoded prefix as
    * little-endian signed bytes — the shape `spanFeature` summarizes). */
  final case class Pcm(totalSamples: Long, channels: Int, bps: Int,
                       bytes: Array[Byte])

  private final class BitReader(buf: Array[Byte], var pos: Int) {
    var bit: Int = 0
    def atEnd: Boolean = pos >= buf.length
    def bytePos: Int = pos
    /** read n (≤ 32) bits MSB-first as unsigned */
    def u(n: Int): Int = {
      var v = 0
      var left = n
      while (left > 0) {
        if (pos >= buf.length) throw Eof
        val avail = 8 - bit
        val take = math.min(avail, left)
        val cur = (buf(pos) & 0xFF) >>> (avail - take)
        v = (v << take) | (cur & ((1 << take) - 1))
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        left -= take
      }
      v
    }
    /** read n (≤ 64) bits MSB-first as unsigned long */
    def uLong(n: Int): Long =
      if (n <= 32) u(n).toLong & 0xFFFFFFFFL
      else ((u(n - 32).toLong & 0xFFFFFFFFL) << 32) | (u(32).toLong & 0xFFFFFFFFL)
    /** read n bits as two's-complement signed */
    def s(n: Int): Int = {
      val v = u(n)
      if (n > 0 && (v & (1 << (n - 1))) != 0) v - (1 << n) else v
    }
    /** unary: count 0 bits up to the terminating 1 */
    def unary(): Int = {
      var q = 0
      while (u(1) == 0) {
        q += 1
        if (q > (1 << 24)) throw Eof // corrupt stream guard
      }
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }
  private object Eof extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  /** CRC-8, poly 0x07, init 0 — the FLAC frame-header checksum. */
  private[multimodal] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — the FLAC frame footer checksum. */
  private[multimodal] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  private def isFlac(b: Array[Byte]): Boolean =
    b != null && b.length > 42 && b(0) == 'f' && b(1) == 'L' &&
      b(2) == 'a' && b(3) == 'C'

  /** STREAMINFO fields this decoder needs. */
  private final case class StreamInfo(sampleRate: Int, channels: Int,
                                      bps: Int, totalSamples: Long,
                                      framesStart: Int)

  private def streamInfo(b: Array[Byte]): Option[StreamInfo] = {
    if (!isFlac(b)) return None
    var p = 4
    var info: Option[(Int, Int, Int, Long)] = None
    var last = false
    while (!last) {
      if (p + 4 > b.length) return None
      val hdr = b(p) & 0xFF
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7F
      val len = ((b(p + 1) & 0xFF) << 16) | ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
      p += 4
      if (p + len > b.length) return None
      if (btype == 0 && len >= 34) {
        val r = new BitReader(b, p)
        r.u(16); r.u(16) // min/max block size
        r.u(24); r.u(24) // min/max frame size
        val rate = r.u(20)
        val ch = r.u(3) + 1
        val bps = r.u(5) + 1
        val total = r.uLong(36)
        info = Some((rate, ch, bps, total))
      }
      p += len
    }
    info.map { case (rate, ch, bps, total) => StreamInfo(rate, ch, bps, total, p) }
  }

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  /** Decode one subframe into `out` (blockSize samples). `bps` is the
    * effective bit depth of THIS channel (side channels carry +1). */
  private def subframe(r: BitReader, out: Array[Long], blockSize: Int,
                       bps: Int): Unit = {
    if (r.u(1) != 0) throw Eof // mandatory zero pad bit
    val t = r.u(6)
    val wasted =
      if (r.u(1) == 1) r.unary() + 1 else 0
    val eb = bps - wasted
    // 31-bit ceiling: BitReader.u/s are Int-exact only to 31 bits, and
    // this decoder caps container bps at 24 (+1 for side channels), so
    // anything wider is either corrupt or out of scope — refuse, never
    // mis-decode
    if (eb <= 0 || eb > 31) throw Eof
    t match {
      case 0 => // constant
        val v = r.s(eb).toLong
        java.util.Arrays.fill(out, 0, blockSize, v)
      case 1 => // verbatim
        var i = 0
        while (i < blockSize) { out(i) = r.s(eb).toLong; i += 1 }
      case ft if ft >= 8 && ft <= 12 => // fixed, order 0-4
        val order = ft - 8
        predicted(r, out, blockSize, eb, order,
          FixedCoefs(order).map(_.toLong), shift = 0)
      case lt if lt >= 32 => // LPC, order 1-32
        val order = lt - 31
        var i = 0
        while (i < order) { out(i) = r.s(eb).toLong; i += 1 }
        val prec = r.u(4) + 1
        if (prec == 16) throw Eof // raw 0b1111 is invalid per spec
        val shift = r.s(5)
        if (shift < 0) throw Eof
        val coefs = new Array[Long](order)
        i = 0
        while (i < order) { coefs(i) = r.s(prec).toLong; i += 1 }
        residualInto(r, out, blockSize, order)
        i = order
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
          out(i) += acc >> shift
          i += 1
        }
      case _ => throw Eof // reserved
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
  }

  /** warmups + residual + fixed-predictor reconstruction */
  private def predicted(r: BitReader, out: Array[Long], blockSize: Int,
                        eb: Int, order: Int, coefs: Array[Long],
                        shift: Int): Unit = {
    var i = 0
    while (i < order) { out(i) = r.s(eb).toLong; i += 1 }
    residualInto(r, out, blockSize, order)
    i = order
    while (i < blockSize) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
      out(i) += (if (shift > 0) acc >> shift else acc)
      i += 1
    }
  }

  /** Rice/Rice2-partitioned residual, decoded into out(order..). */
  private def residualInto(r: BitReader, out: Array[Long], blockSize: Int,
                           order: Int): Unit = {
    val method = r.u(2)
    if (method > 1) throw Eof
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = r.u(4)
    val parts = 1 << partOrder
    if (blockSize % parts != 0) throw Eof
    val perPart = blockSize >> partOrder
    if (perPart <= order && parts == 1) throw Eof
    var p = 0
    var idx = order
    while (p < parts) {
      val n = if (p == 0) perPart - order else perPart
      if (n < 0) throw Eof
      val param = r.u(pBits)
      if (param == escape) {
        val raw = r.u(5)
        var i = 0
        while (i < n) {
          out(idx) = if (raw == 0) 0L else r.s(raw).toLong
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          val q = r.unary().toLong
          val rem = if (param == 0) 0L else r.uLong(param)
          val u = (q << param) | rem
          out(idx) = (u >>> 1) ^ -(u & 1L) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  private def utf8Coded(r: BitReader): Long = {
    val b0 = r.u(8)
    if ((b0 & 0x80) == 0) return b0.toLong
    var n = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { n += 1; mask >>= 1 }
    if (n < 1 || n > 6) throw Eof
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < n) {
      val bx = r.u(8)
      if ((bx & 0xC0) != 0x80) throw Eof
      v = (v << 6) | (bx & 0x3F)
      i += 1
    }
    v
  }

  /**
   * Decode header + PCM prefix. `maxBytes` bounds the DECODED PCM
   * bytes (whole frames; the frame that crosses the cap is still
   * fully decoded) — a byte budget, not a sample count, so the
   * decode work matches what the caller's feature summary will
   * actually read regardless of channel count or bit depth. None on
   * anything that is not clean FLAC.
   */
  def decodePcm(bytes: Array[Byte],
                maxBytes: Int = 1 << 20): Option[Pcm] =
    try {
      streamInfo(bytes).flatMap { si =>
        if (si.channels < 1 || si.channels > 8 ||
            si.bps < 8 || si.bps > 24) return None
        val bytesPer = (si.bps + 7) / 8
        val outBuf = new java.io.ByteArrayOutputStream()
        val r = new BitReader(bytes, si.framesStart)
        var decoded = 0L
        var frames = 0
        // Trailing-junk tolerance (r17): real files carry bytes after
        // the last frame (an appended ID3v1 tag, padding). A failure
        // AT THE SYNC-WORD READ after >=1 CRC-verified frame — or any
        // failure once STREAMINFO's declared samples are already fully
        // decoded — ends the walk with the verified prefix instead of
        // discarding it. A failure DEEPER in a frame with samples
        // still owed keeps the refuse-corrupt posture (rethrow -> None:
        // CRC-checked frames can't vouch for the ones that follow).
        var atSync = true
        var halted = false
        def junkTail: Boolean = frames >= 1 &&
          (atSync || (si.totalSamples > 0 && decoded >= si.totalSamples))
        while (!halted && !r.atEnd && outBuf.size < maxBytes) {
          val frameStart = r.bytePos
          atSync = true
          try {
          // frame header: 14-bit sync + mandatory zero reserved bit
          if (r.u(14) != 0x3FFE) throw Eof
          atSync = false
          if (r.u(1) != 0) throw Eof
          val varBlocking = r.u(1) == 1
          val bsBits = r.u(4)
          val srBits = r.u(4)
          val chBits = r.u(4)
          val szBits = r.u(3)
          if (r.u(1) != 0) throw Eof
          utf8Coded(r) // frame (or first-sample) number
          val blockSize = bsBits match {
            case 0 => throw Eof
            case 1 => 192
            case b if b >= 2 && b <= 5 => 576 << (b - 2)
            case 6 => r.u(8) + 1
            case 7 => r.u(16) + 1
            case b => 256 << (b - 8)
          }
          srBits match { // only the inline forms consume header bits
            case 12 => r.u(8)
            case 13 | 14 => r.u(16)
            case 15 => throw Eof
            case _ => ()
          }
          val bps = szBits match {
            case 0 => si.bps
            case 1 => 8
            case 2 => 12
            case 4 => 16
            case 5 => 20
            case 6 => 24
            case _ => throw Eof
          }
          // a frame whose declared bit depth differs from STREAMINFO
          // would be emitted at the wrong byte width (bytesPer derives
          // from si.bps) — refuse the inconsistent stream instead of
          // silently skewing the span features
          if (bps != si.bps) throw Eof
          // CRC-8 covers everything from the sync byte to here
          val hdrCrc = r.u(8)
          if (crc8(bytes, frameStart, r.bytePos - 1) != hdrCrc) throw Eof
          val nCh = si.channels
          val chans = Array.ofDim[Long](nCh, blockSize)
          chBits match {
            case a if a <= 7 => // independent
              if (a + 1 != nCh) throw Eof
              var c = 0
              while (c < nCh) { subframe(r, chans(c), blockSize, bps); c += 1 }
            case 8 => // left/side
              if (nCh != 2) throw Eof
              subframe(r, chans(0), blockSize, bps)
              subframe(r, chans(1), blockSize, bps + 1)
              var i = 0
              while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
            case 9 => // right/side
              if (nCh != 2) throw Eof
              subframe(r, chans(0), blockSize, bps + 1)
              subframe(r, chans(1), blockSize, bps)
              var i = 0
              while (i < blockSize) { chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
            case 10 => // mid/side
              if (nCh != 2) throw Eof
              subframe(r, chans(0), blockSize, bps)
              subframe(r, chans(1), blockSize, bps + 1)
              var i = 0
              while (i < blockSize) {
                val side = chans(1)(i)
                var mid = chans(0)(i) << 1
                mid |= side & 1L
                chans(0)(i) = (mid + side) >> 1
                chans(1)(i) = (mid - side) >> 1
                i += 1
              }
            case _ => throw Eof
          }
          r.alignByte()
          val footCrc = r.u(16)
          if (crc16(bytes, frameStart, r.bytePos - 2) != footCrc) throw Eof
          // emit interleaved little-endian signed PCM
          var i = 0
          while (i < blockSize) {
            var c = 0
            while (c < nCh) {
              val v = chans(c)(i)
              var k = 0
              while (k < bytesPer) { outBuf.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
              c += 1
            }
            i += 1
          }
          decoded += blockSize
          frames += 1
          // a fixed-blocking stream numbers frames; nothing to act on —
          // the walk is sequential either way
          locally(varBlocking)
          } catch {
            case Eof if junkTail => halted = true
            case _: ArrayIndexOutOfBoundsException if junkTail => halted = true
          }
        }
        if (frames == 0) None
        else Some(Pcm(if (si.totalSamples > 0) si.totalSamples else decoded,
          si.channels, si.bps, outBuf.toByteArray))
      }
    } catch { case Eof => None; case _: ArrayIndexOutOfBoundsException => None }
}
