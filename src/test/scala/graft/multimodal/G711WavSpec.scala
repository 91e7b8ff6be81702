package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/**
 * Gate for the pure-JVM G.711 µ-law / A-law WAV decoder. The
 * expansion tables are pinned by the ITU-T spec's published anchor
 * values and structural laws (antisymmetry under the sign bit, strict
 * segment monotonicity); the WAV walk round-trips containers built by
 * an in-test encoder whose quantizer is the argmin over the decoder's
 * own 256-entry table — so every decoded sample must equal the
 * expansion of its code byte exactly.
 */
class G711WavSpec extends AnyFunSuite {

  private def wav(fmtTag: Int, channels: Int, data: Array[Byte],
                  fact: Long = -1L, bits: Int = 8): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    val factLen = if (fact >= 0) 12 else 0
    out.write("RIFF".getBytes("ASCII")); w32(4 + 24 + factLen + 8 + data.length)
    out.write("WAVE".getBytes("ASCII"))
    out.write("fmt ".getBytes("ASCII")); w32(16)
    w16(fmtTag); w16(channels); w32(8000); w32(8000L * channels)
    w16(channels); w16(bits)
    if (fact >= 0) { out.write("fact".getBytes("ASCII")); w32(4); w32(fact) }
    out.write("data".getBytes("ASCII")); w32(data.length)
    out.write(data)
    out.toByteArray
  }

  private def pcmLe(samples: Seq[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      out(2 * i) = (v & 0xFF).toByte
      out(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    out
  }

  test("µ-law expansion: ITU anchor values, antisymmetry, monotone segments") {
    assert(G711Wav.ulawToLinear(0x00) == -32124)
    assert(G711Wav.ulawToLinear(0x80) == 32124)
    assert(G711Wav.ulawToLinear(0xFF) == 0)
    assert(G711Wav.ulawToLinear(0x7F) == 0) // the spec's one zero tie
    for (c <- 0 until 256)
      assert(G711Wav.ulawToLinear(c ^ 0x80) == -G711Wav.ulawToLinear(c))
    // negative codes 0x00..0x7F expand strictly increasing toward zero
    for (c <- 0 until 0x7F)
      assert(G711Wav.ulawToLinear(c) < G711Wav.ulawToLinear(c + 1),
        s"not monotone at $c")
  }

  test("A-law expansion: anchor values, antisymmetry, 256 distinct codes") {
    assert(G711Wav.alawToLinear(0x55) == -8)
    assert(G711Wav.alawToLinear(0xD5) == 8)
    assert(G711Wav.alawToLinear(0xAA) == 32256)
    assert(G711Wav.alawToLinear(0x2A) == -32256)
    for (c <- 0 until 256)
      assert(G711Wav.alawToLinear(c ^ 0x80) == -G711Wav.alawToLinear(c))
    // A-law has no zero code: every code expands to a distinct nonzero
    val vals = (0 until 256).map(G711Wav.alawToLinear)
    assert(vals.toSet.size == 256 && !vals.contains(0))
    assert(vals.map(math.abs).min == 8)
  }

  test("µ-law WAV round-trips through the table (mono, deterministic tone)") {
    val samples = (0 until 400).map(i => (9000 * math.sin(i / 7.0)).toInt)
    val codes = samples.map(v =>
      G711Wav.nearestCode(v, G711Wav.ulawToLinear)).toArray
    val bytes = wav(0x07, 1, codes.map(_.toByte))
    val p = G711Wav.decodePcm(bytes).get
    assert(p.law == "ulaw" && p.channels == 1 && p.totalSamples == 400)
    assert(p.bytes.sameElements(pcmLe(codes.map(G711Wav.ulawToLinear).toSeq)))
  }

  test("A-law stereo with a fact chunk trims to the declared count") {
    val l = (0 until 300).map(i => (12000 * math.sin(i / 5.0)).toInt)
    val r = (0 until 300).map(i => (6000 * math.cos(i / 11.0)).toInt)
    val codes = l.zip(r).flatMap { case (a, b) => Seq(
      G711Wav.nearestCode(a, G711Wav.alawToLinear),
      G711Wav.nearestCode(b, G711Wav.alawToLinear)) }.toArray
    val bytes = wav(0x06, 2, codes.map(_.toByte), fact = 297)
    val p = G711Wav.decodePcm(bytes).get
    assert(p.law == "alaw" && p.channels == 2 && p.totalSamples == 297)
    assert(p.bytes.length == 297 * 2 * 2, "fact trims the emitted frames")
    val want = pcmLe(codes.take(297 * 2).map(G711Wav.alawToLinear).toSeq)
    assert(p.bytes.sameElements(want))
  }

  test("decode is bounded by the PCM byte budget; total stays exact") {
    val codes = Array.fill(1000)(0x40.toByte)
    val p = G711Wav.decodePcm(wav(0x07, 1, codes), maxBytes = 100).get
    assert(p.totalSamples == 1000, "total from the container, not the prefix")
    assert(p.bytes.length == 50 * 2, "50 whole frames under the 100B budget")
  }

  test("refusals: wrong fmt tag, wrong bit depth, truncation, junk") {
    val codes = Array.fill(64)(0x40.toByte)
    assert(G711Wav.decodePcm(wav(0x01, 1, codes)).isEmpty, "plain PCM tag")
    assert(G711Wav.decodePcm(wav(0x11, 1, codes)).isEmpty, "ADPCM tag")
    assert(G711Wav.decodePcm(wav(0x07, 1, codes, bits = 16)).isEmpty,
      "G.711 is 8-bit by definition")
    assert(G711Wav.decodePcm(wav(0x07, 0, codes)).isEmpty, "zero channels")
    val good = wav(0x07, 1, codes)
    assert(G711Wav.decodePcm(good.take(good.length - 10)).isEmpty,
      "data chunk length overruns the buffer")
    assert(G711Wav.decodePcm("not a wav".getBytes).isEmpty)
    assert(G711Wav.decodePcm(Array.empty[Byte]).isEmpty)
  }

  test("AudioDecoder.decodeTagged: wav-ulaw/wav-alaw provenance, linear " +
       "PCM features (not the companded bytes the JDK reader returns)") {
    val samples = (0 until 256).map(i => (15000 * math.sin(i / 13.0)).toInt)
    val u = samples.map(v => G711Wav.nearestCode(v, G711Wav.ulawToLinear))
    val a = samples.map(v => G711Wav.nearestCode(v, G711Wav.alawToLinear))
    val (_, _, nU, featU, tagU) = Multimodal.AudioDecoder.decodeTagged(
      wav(0x07, 1, u.map(_.toByte).toArray)).get
    assert(tagU == "wav-ulaw" && nU == 256)
    assert(featU.sameElements(Multimodal.AudioDecoder.spanFeature(
      pcmLe(u.map(G711Wav.ulawToLinear)))))
    val (_, _, nA, featA, tagA) = Multimodal.AudioDecoder.decodeTagged(
      wav(0x06, 1, a.map(_.toByte).toArray)).get
    assert(tagA == "wav-alaw" && nA == 256)
    assert(featA.sameElements(Multimodal.AudioDecoder.spanFeature(
      pcmLe(a.map(G711Wav.alawToLinear)))))
  }
}
