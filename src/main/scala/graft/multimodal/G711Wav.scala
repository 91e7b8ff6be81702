package graft.multimodal

/**
 * Pure-JVM G.711 µ-law / A-law decoder for WAV containers (format
 * tags 0x0007 / 0x0006) — the telephony companding codecs the
 * reference's data model would carry as opaque audio blobs. The JDK's
 * WAV reader recognizes these containers but hands back the COMPANDED
 * bytes (encoding ULAW/ALAW, not linear PCM), which would silently
 * feed log-compressed amplitudes into the span features; this decoder
 * expands them to linear 16-bit PCM with the public ITU-T G.711
 * piecewise-linear tables (the classic CCITT reference arithmetic —
 * 8 segments, 4-bit mantissa, bias 0x84 for µ-law, 0x55 toggle for
 * A-law).
 *
 * Same posture as [[Flac]] and [[AdpcmWav]]: `maxBytes` bounds the
 * DECODED PCM bytes while the total sample count stays exact (from
 * the `fact` chunk when present, else the data size — one byte is
 * one sample in G.711); anything structurally unclean returns None
 * and falls through to the next decoder in the chain.
 */
object G711Wav extends Serializable {

  /** (totalSamplesPerChannel, channels, "ulaw"|"alaw", little-endian
    * 16-bit PCM of the decoded prefix, interleaved as stored). */
  final case class Pcm(totalSamples: Long, channels: Int, law: String,
                       bytes: Array[Byte])

  /** µ-law byte → linear 16-bit sample (ITU-T G.711 expansion:
    * complement, 3-bit segment, 4-bit mantissa, bias 0x84). Exposed
    * for the spec's exhaustive table checks. */
  private[multimodal] def ulawToLinear(u: Int): Int = {
    val b = ~u & 0xFF
    val t = (((b & 0x0F) << 3) + 0x84) << ((b >> 4) & 0x7)
    if ((b & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law byte → linear 16-bit sample (ITU-T G.711 expansion: 0x55
    * toggle, 3-bit segment, 4-bit mantissa). */
  private[multimodal] def alawToLinear(a: Int): Int = {
    val b = (a ^ 0x55) & 0xFF
    val seg = (b >> 4) & 0x7
    val t = seg match {
      case 0 => ((b & 0x0F) << 4) + 8
      case 1 => ((b & 0x0F) << 4) + 0x108
      case s => (((b & 0x0F) << 4) + 0x108) << (s - 1)
    }
    if ((b & 0x80) != 0) t else -t
  }

  /** Nearest G.711 code for a linear sample — the in-test encoder's
    * seam (argmin over the 256-entry expansion table; exact inverse on
    * every expandable value, no companding arithmetic to get subtly
    * wrong in a second place). */
  private[multimodal] def nearestCode(v: Int, decode: Int => Int): Int =
    (0 until 256).minBy(c => math.abs(decode(c).toLong - v))

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (u16(b, p).toLong) | (u16(b, p + 2).toLong << 16)

  /** Decode a G.711 WAV (fmt 0x0006 A-law / 0x0007 µ-law). None for
    * any other format tag or a structurally unclean chunk walk. */
  def decodePcm(bytes: Array[Byte],
                maxBytes: Int = 1 << 20): Option[Pcm] = {
    if (bytes == null || bytes.length < 44) return None
    def cc(p: Int) = new String(bytes, p, 4, "ASCII")
    if (cc(0) != "RIFF" || cc(8) != "WAVE") return None
    var p = 12
    var fmtTag = -1; var channels = 0; var bitsPerSample = 0
    var factSamples = -1L
    var dataOff = -1; var dataLen = 0
    while (p + 8 <= bytes.length) {
      val id = cc(p); val len = u32(bytes, p + 4)
      if (len < 0 || p + 8 + len > bytes.length) return None
      val body = p + 8
      id match {
        case "fmt " if len >= 16 =>
          fmtTag = u16(bytes, body)
          channels = u16(bytes, body + 2)
          bitsPerSample = u16(bytes, body + 14)
        case "fact" if len >= 4 => factSamples = u32(bytes, body)
        case "data" => dataOff = body; dataLen = len.toInt
        case _ => ()
      }
      p = body + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    val law = fmtTag match {
      case 0x06 => "alaw"
      case 0x07 => "ulaw"
      case _ => return None
    }
    // G.711 is exactly 8 bits per sample; anything else is inconsistent
    if (channels < 1 || channels > 8 || bitsPerSample != 8 ||
        dataOff < 0 || dataLen < channels) return None
    val frames = dataLen / channels // whole interleaved frames only
    val total =
      if (factSamples >= 0) math.min(factSamples, frames.toLong)
      else frames.toLong
    if (total <= 0) return None
    val expand: Int => Int =
      if (law == "ulaw") ulawToLinear else alawToLinear
    // 2 output bytes per input byte; cap on whole frames
    val emitFrames = math.min(total, (maxBytes / (2L * channels)).max(1L)).toInt
    val out = new Array[Byte](emitFrames * channels * 2)
    var i = 0
    while (i < emitFrames * channels) {
      val v = expand(bytes(dataOff + i) & 0xFF)
      out(2 * i) = (v & 0xFF).toByte
      out(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    Some(Pcm(total, channels, law, out))
  }
}
