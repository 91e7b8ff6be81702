package graft.multimodal

/**
 * Pure-JVM IMA/DVI ADPCM decoder for WAV containers (format tag
 * 0x0011) — the compressed-audio format the JDK's `javax.sound`
 * readers recognize as a container but cannot decode to samples, so
 * it previously fell through to the span-summary fallback. The
 * algorithm and tables are public (IMA Digital Audio Pack, the
 * classic DVI/IMA spec; same tables as every open implementation):
 * per block and channel, a 4-byte state header (16-bit predictor,
 * step index), then 4-bit nibbles in 4-byte channel-interleaved
 * groups; each nibble steps the predictor by a table-driven delta.
 *
 * Like [[Flac]], decoding is bounded by `maxBytes` of decoded PCM
 * (whole blocks) while the TOTAL sample count stays exact — from the
 * `fact` chunk when present (mandatory for compressed WAV per the
 * spec), else derived from the data size and block layout.
 */
object AdpcmWav extends Serializable {

  /** (totalSamplesPerChannel, channels, little-endian 16-bit PCM of
    * the decoded prefix, interleaved). */
  final case class Pcm(totalSamples: Long, channels: Int,
                       bytes: Array[Byte])

  private val IndexTable =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private val StepTable = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  /** One nibble step: returns the new sample; mutates nothing (state
    * threads through the caller's locals). Exposed for the spec's
    * encoder, which must contain this exact decoder. */
  private[multimodal] def step(nibble: Int, pred: Int, index: Int): (Int, Int) = {
    val s = StepTable(index)
    var diff = s >> 3
    if ((nibble & 1) != 0) diff += s >> 2
    if ((nibble & 2) != 0) diff += s >> 1
    if ((nibble & 4) != 0) diff += s
    val out =
      if ((nibble & 8) != 0) math.max(-32768, pred - diff)
      else math.min(32767, pred + diff)
    val ni = math.min(88, math.max(0, index + IndexTable(nibble & 7)))
    (out, ni)
  }

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def s16(b: Array[Byte], p: Int): Int = u16(b, p).toShort.toInt
  private def u32(b: Array[Byte], p: Int): Long =
    (u16(b, p).toLong) | (u16(b, p + 2).toLong << 16)

  /** Decode an IMA-ADPCM WAV. None unless the container is RIFF/WAVE
    * with fmt tag 0x0011 and a structurally clean chunk walk. */
  def decodePcm(bytes: Array[Byte],
                maxBytes: Int = 1 << 20): Option[Pcm] = {
    if (bytes == null || bytes.length < 44) return None
    def cc(p: Int) = new String(bytes, p, 4, "ASCII")
    if (cc(0) != "RIFF" || cc(8) != "WAVE") return None
    // chunk walk: fmt / fact / data
    var p = 12
    var channels = 0; var blockAlign = 0; var samplesPerBlock = 0
    var factSamples = -1L
    var dataOff = -1; var dataLen = 0
    var fmtTag = -1
    while (p + 8 <= bytes.length) {
      val id = cc(p); val len = u32(bytes, p + 4)
      if (len < 0 || p + 8 + len > bytes.length) return None
      val body = p + 8
      id match {
        case "fmt " if len >= 16 =>
          fmtTag = u16(bytes, body)
          channels = u16(bytes, body + 2)
          blockAlign = u16(bytes, body + 12)
          // wSamplesPerBlock rides the fmt extension (cbSize >= 2)
          samplesPerBlock =
            if (len >= 20) u16(bytes, body + 18)
            else if (channels > 0)
              ((blockAlign - 4 * channels) * 2) / channels + 1
            else 0
        case "fact" if len >= 4 => factSamples = u32(bytes, body)
        case "data" => dataOff = body; dataLen = len.toInt
        case _ => ()
      }
      p = body + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (fmtTag != 0x11 || channels < 1 || channels > 8 ||
        dataOff < 0 || blockAlign < 4 * channels ||
        samplesPerBlock < 1) return None
    // the declared samples-per-block must fit the block's nibble
    // capacity: an oversized declaration would otherwise emit stale
    // buffer contents as "decoded" samples — refuse the inconsistent
    // container instead
    val nibbleCapacity = ((blockAlign - 4 * channels) / (4 * channels)) * 8 + 1
    if (samplesPerBlock > nibbleCapacity) return None
    val nBlocks = dataLen / blockAlign
    if (nBlocks == 0) return None
    val total =
      if (factSamples >= 0) factSamples
      else nBlocks.toLong * samplesPerBlock
    val out = new java.io.ByteArrayOutputStream()
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    val chanBuf = Array.ofDim[Int](channels, samplesPerBlock)
    var blk = 0
    var emitted = 0L
    while (blk < nBlocks && out.size < maxBytes) {
      val base = dataOff + blk * blockAlign
      var c = 0
      while (c < channels) {
        pred(c) = s16(bytes, base + 4 * c)
        idx(c) = bytes(base + 4 * c + 2) & 0xFF
        if (idx(c) > 88) return None
        chanBuf(c)(0) = pred(c) // header predictor IS sample 0
        c += 1
      }
      // nibble payload: per channel, 4-byte groups round-robin
      val payload = base + 4 * channels
      val groupsPerChan = (blockAlign - 4 * channels) / (4 * channels)
      var g = 0
      var sample = 1
      while (g < groupsPerChan && sample < samplesPerBlock) {
        c = 0
        while (c < channels) {
          val gp = payload + (g * channels + c) * 4
          var byteI = 0
          var sIdx = sample
          while (byteI < 4 && sIdx < samplesPerBlock) {
            val b = bytes(gp + byteI) & 0xFF
            val (v1, i1) = step(b & 0xF, pred(c), idx(c))
            pred(c) = v1; idx(c) = i1
            chanBuf(c)(sIdx) = v1; sIdx += 1
            if (sIdx < samplesPerBlock) {
              val (v2, i2) = step(b >> 4, pred(c), idx(c))
              pred(c) = v2; idx(c) = i2
              chanBuf(c)(sIdx) = v2; sIdx += 1
            }
            byteI += 1
          }
          c += 1
        }
        g += 1
        sample += 8
      }
      // the final (possibly short) block may carry fewer valid samples
      val valid = math.min(samplesPerBlock.toLong,
        total - blk.toLong * samplesPerBlock).toInt
      var i = 0
      while (i < math.max(0, valid)) {
        c = 0
        while (c < channels) {
          val v = chanBuf(c)(i)
          out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
          c += 1
        }
        i += 1
      }
      emitted += math.max(0, valid)
      blk += 1
    }
    if (emitted == 0) None else Some(Pcm(total, channels, out.toByteArray))
  }
}
