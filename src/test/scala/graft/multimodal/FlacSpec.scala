package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-trip gate for the pure-JVM FLAC decoder: a minimal in-test
 * ENCODER (bit-writer + STREAMINFO + frame assembly with real CRC-8 /
 * CRC-16, constant / verbatim / fixed / LPC subframes, Rice and
 * escape residual partitions, independent and mid/side stereo)
 * produces spec-conformant streams from known PCM, and [[Flac]] must
 * return that PCM bit-for-bit. Corruption (header CRC, footer CRC,
 * truncation, non-FLAC bytes) must yield None — never a partial or
 * wrong decode. The [[Multimodal.AudioDecoder]] integration is
 * checked through `decodeTagged` ("flac" provenance, STREAMINFO-exact
 * sample count, real-PCM span features).
 */
class FlacSpec extends AnyFunSuite {

  // ---- minimal encoder ----

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def u(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        nb += 1
        if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def s(v: Long, n: Int): Unit = u(v & ((1L << n) - 1), n)
    def unary(q: Long): Unit = { var i = 0L; while (i < q) { u(0, 1); i += 1 }; u(1, 1) }
    def align(): Unit = while (nb != 0) u(0, 1)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  private def streamInfo(rate: Int, ch: Int, bps: Int, total: Long): Array[Byte] = {
    val w = new BitWriter
    w.u(0, 16); w.u(0, 16)   // min/max block size (0 = not our problem)
    w.u(0, 24); w.u(0, 24)   // min/max frame size unknown
    w.u(rate, 20); w.u(ch - 1, 3); w.u(bps - 1, 5)
    w.u(total, 36)
    (0 until 16).foreach(_ => w.u(0, 8)) // md5 zeros
    w.bytes
  }

  private def container(si: Array[Byte], frames: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("ASCII"))
    out.write(0x80) // last metadata block, type 0
    out.write(0); out.write(0); out.write(si.length)
    out.write(si)
    out.write(frames)
    out.toByteArray
  }

  private def riceResidual(w: BitWriter, res: Array[Long], param: Int): Unit = {
    w.u(0, 2)        // method 0: 4-bit rice
    w.u(0, 4)        // partition order 0
    w.u(param, 4)
    res.foreach { e =>
      val u = (e << 1) ^ (e >> 63) // zigzag
      w.unary(u >>> param)
      if (param > 0) w.u(u & ((1L << param) - 1), param)
    }
  }

  /** One subframe's bits. kind: 'c' constant, 'v' verbatim,
    * 'f' fixed-order-2 rice, 'l' LPC order 2 (coefs 3,-1 shift 1),
    * 'e' verbatim-valued ESCAPE residual via fixed order 0. */
  private def subframe(w: BitWriter, kind: Char, samples: Array[Long],
                       bps: Int): Unit = {
    w.u(0, 1) // pad
    kind match {
      case 'c' =>
        w.u(0, 6); w.u(0, 1)
        w.s(samples(0), bps)
      case 'v' =>
        w.u(1, 6); w.u(0, 1)
        samples.foreach(s => w.s(s, bps))
      case 'f' =>
        w.u(8 + 2, 6); w.u(0, 1) // fixed order 2
        w.s(samples(0), bps); w.s(samples(1), bps)
        val res = (2 until samples.length).map(i =>
          samples(i) - 2 * samples(i - 1) + samples(i - 2)).toArray
        riceResidual(w, res, param = 2)
      case 'l' =>
        w.u(32 + 1, 6); w.u(0, 1) // LPC order 2 (type 100001)
        w.s(samples(0), bps); w.s(samples(1), bps)
        w.u(4 - 1, 4)  // precision 4 bits
        w.s(1, 5)      // shift 1
        w.s(3, 4); w.s(-1, 4) // coefficients
        val res = (2 until samples.length).map(i =>
          samples(i) - ((3 * samples(i - 1) - samples(i - 2)) >> 1)).toArray
        riceResidual(w, res, param = 3)
      case 'x' => // LPC with the spec-invalid precision escape (raw 0b1111)
        w.u(32 + 1, 6); w.u(0, 1)
        w.s(samples(0), bps); w.s(samples(1), bps)
        w.u(15, 4) // INVALID precision field
        w.s(1, 5); w.s(3, 16); w.s(-1, 16)
        riceResidual(w, new Array[Long](samples.length - 2), param = 3)
      case 'e' =>
        w.u(8, 6); w.u(0, 1) // fixed order 0 → residual IS the signal
        w.u(0, 2)  // rice 4-bit method
        w.u(0, 4)  // partition order 0
        w.u(15, 4) // ESCAPE
        w.u(bps, 5) // raw bits per sample
        samples.foreach(s => w.s(s, bps))
    }
  }

  /** Assemble one frame (fixed blocking). chKinds.length == channels;
    * midSide encodes stereo as mid/side from the L/R input. */
  private def frame(frameNo: Int, blockSize: Int, bps: Int,
                    chans: Array[Array[Long]], chKinds: String,
                    midSide: Boolean = false): Array[Byte] = {
    val bsBits = blockSize match {
      case 192 => 1
      case 576 => 2
      case n if n <= 256 => 6
      case n => 7
    }
    val szBits = bps match {
      case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
      case _ => 0
    }
    val chBits = if (midSide) 10 else chans.length - 1
    val h = new BitWriter
    h.u(0x3FFE, 14); h.u(0, 1); h.u(0, 1)
    h.u(bsBits, 4); h.u(0, 4) // sample rate from STREAMINFO
    h.u(chBits, 4); h.u(szBits, 3); h.u(0, 1)
    require(frameNo < 128); h.u(frameNo, 8) // utf8: 1 byte
    if (bsBits == 6) h.u(blockSize - 1, 8)
    if (bsBits == 7) h.u(blockSize - 1, 16)
    val header = h.bytes
    val body = new BitWriter
    if (midSide) {
      val (l, r) = (chans(0), chans(1))
      val mid = l.indices.map(i => (l(i) + r(i)) >> 1).toArray
      val side = l.indices.map(i => l(i) - r(i)).toArray
      subframe(body, chKinds(0), mid, bps)
      subframe(body, chKinds(1), side, bps + 1)
    } else {
      chans.zip(chKinds.toSeq).foreach { case (c, k) => subframe(body, k, c, bps) }
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    out.write(Flac.crc8(header, 0, header.length))
    out.write(body.bytes)
    val sofar = out.toByteArray
    val c16 = Flac.crc16(sofar, 0, sofar.length)
    out.write((c16 >> 8) & 0xFF); out.write(c16 & 0xFF)
    out.toByteArray
  }

  private def pcmLe(chans: Array[Array[Long]], bps: Int): Array[Byte] = {
    val bytesPer = (bps + 7) / 8
    val out = new java.io.ByteArrayOutputStream()
    for (i <- chans(0).indices; c <- chans.indices; k <- 0 until bytesPer)
      out.write(((chans(c)(i) >> (8 * k)) & 0xFF).toInt)
    out.toByteArray
  }

  // ---- round trips ----

  test("mono constant frame round-trips; total samples from STREAMINFO") {
    val xs = Array.fill(192L.toInt)(-1234L)
    val bytes = container(streamInfo(44100, 1, 16, 192),
      frame(0, 192, 16, Array(xs), "c"))
    val p = Flac.decodePcm(bytes).get
    assert(p.totalSamples == 192 && p.channels == 1 && p.bps == 16)
    assert(p.bytes.sameElements(pcmLe(Array(xs), 16)))
  }

  test("mono verbatim round-trips at 576 and at an 8-bit-coded block size") {
    val rnd = new scala.util.Random(7)
    val a = Array.fill(576)(rnd.nextInt(1 << 16) - (1 << 15)).map(_.toLong)
    val b = Array.fill(200)(rnd.nextInt(1 << 16) - (1 << 15)).map(_.toLong)
    val bytes = container(streamInfo(8000, 1, 16, 776),
      frame(0, 576, 16, Array(a), "v") ++ frame(1, 200, 16, Array(b), "v"))
    val p = Flac.decodePcm(bytes).get
    assert(p.totalSamples == 776)
    assert(p.bytes.sameElements(pcmLe(Array(a ++ b), 16)))
  }

  test("fixed-order-2 rice residuals reconstruct exactly") {
    val xs = (0 until 576).map(i =>
      (1000 * math.sin(i / 17.0)).toLong + (i % 13)).toArray
    val bytes = container(streamInfo(16000, 1, 16, 576),
      frame(0, 576, 16, Array(xs), "f"))
    val p = Flac.decodePcm(bytes).get
    assert(p.bytes.sameElements(pcmLe(Array(xs), 16)))
  }

  test("LPC subframe (order 2, shifted integer coefficients) reconstructs") {
    val rnd = new scala.util.Random(11)
    val xs = new Array[Long](192)
    for (i <- xs.indices) {
      xs(i) = if (i == 0) 90L else if (i == 1) 100L
        else ((3 * xs(i - 1) - xs(i - 2)) >> 1) + rnd.nextInt(9) - 4
    }
    val bytes = container(streamInfo(16000, 1, 16, 192),
      frame(0, 192, 16, Array(xs), "l"))
    val p = Flac.decodePcm(bytes).get
    assert(p.bytes.sameElements(pcmLe(Array(xs), 16)))
  }

  test("escape (raw-bits) residual partition round-trips") {
    val rnd = new scala.util.Random(13)
    val xs = Array.fill(192)(rnd.nextInt(1 << 12) - (1 << 11)).map(_.toLong)
    val bytes = container(streamInfo(8000, 1, 16, 192),
      frame(0, 192, 16, Array(xs), "e"))
    val p = Flac.decodePcm(bytes).get
    assert(p.bytes.sameElements(pcmLe(Array(xs), 16)))
  }

  test("independent stereo and mid/side stereo both reconstruct L/R") {
    val rnd = new scala.util.Random(17)
    val l = Array.fill(192)(rnd.nextInt(1 << 14) - (1 << 13)).map(_.toLong)
    val r = l.map(v => v + rnd.nextInt(64) - 32) // correlated channels
    val indep = container(streamInfo(44100, 2, 16, 192),
      frame(0, 192, 16, Array(l, r), "vv"))
    val ms = container(streamInfo(44100, 2, 16, 192),
      frame(0, 192, 16, Array(l, r), "vv", midSide = true))
    val want = pcmLe(Array(l, r), 16)
    assert(Flac.decodePcm(indep).get.bytes.sameElements(want))
    assert(Flac.decodePcm(ms).get.bytes.sameElements(want), "mid/side")
  }

  test("8-bit and 24-bit depths round-trip") {
    val rnd = new scala.util.Random(19)
    val a8 = Array.fill(192)(rnd.nextInt(256) - 128).map(_.toLong)
    val a24 = Array.fill(192)(rnd.nextInt(1 << 24) - (1 << 23)).map(_.toLong)
    val b8 = container(streamInfo(8000, 1, 8, 192), frame(0, 192, 8, Array(a8), "v"))
    val b24 = container(streamInfo(96000, 1, 24, 192), frame(0, 192, 24, Array(a24), "v"))
    assert(Flac.decodePcm(b8).get.bytes.sameElements(pcmLe(Array(a8), 8)))
    assert(Flac.decodePcm(b24).get.bytes.sameElements(pcmLe(Array(a24), 24)))
  }

  // ---- corruption must refuse, never mis-decode ----

  test("flipped header-CRC byte, flipped footer byte, truncation, junk: None") {
    val xs = Array.fill(192)(42L)
    val good = container(streamInfo(8000, 1, 16, 192),
      frame(0, 192, 16, Array(xs), "v"))
    assert(Flac.decodePcm(good).isDefined)
    // the container is 4 (magic) + 4 (block header) + 34 (STREAMINFO)
    // = 42 bytes; the frame header starts at 42 — flip a bit inside it
    val badHdr = good.clone
    badHdr(44) = (badHdr(44) ^ 0x01).toByte
    // any corruption inside the frame must surface through one of the
    // two CRCs (or a structural check) as None
    assert(Flac.decodePcm(badHdr).isEmpty)
    val badFoot = good.clone
    badFoot(good.length - 1) = (badFoot(good.length - 1) ^ 0x40).toByte
    assert(Flac.decodePcm(badFoot).isEmpty)
    assert(Flac.decodePcm(good.take(good.length / 2)).isEmpty)
    assert(Flac.decodePcm("not a flac stream at all".getBytes).isEmpty)
    assert(Flac.decodePcm(Array.empty[Byte]).isEmpty)
    // the spec-invalid LPC precision escape (raw 0b1111) must refuse,
    // not decode with 16-bit coefficients
    val badPrec = container(streamInfo(8000, 1, 16, 192),
      frame(0, 192, 16, Array(Array.fill(192)(5L)), "x"))
    assert(Flac.decodePcm(badPrec).isEmpty)
  }

  test("decode is bounded by the PCM byte budget; total stays STREAMINFO-exact") {
    val a = Array.fill(576)(7L)
    val b = Array.fill(576)(9L)
    val bytes = container(streamInfo(8000, 1, 16, 1152),
      frame(0, 576, 16, Array(a), "c") ++ frame(1, 576, 16, Array(b), "c"))
    val p = Flac.decodePcm(bytes, maxBytes = 1000).get // < 1152B first frame
    assert(p.totalSamples == 1152, "total from STREAMINFO, not the prefix")
    assert(p.bytes.length == 576 * 2, "whole first frame, second not decoded")
  }

  // ---- trailing-junk tolerance vs refuse-corrupt (r17) ----

  test("trailing junk after the last verified frame keeps the prefix") {
    val a = Array.fill(192)(7L); val b = Array.fill(192)(9L)
    val good = container(streamInfo(8000, 1, 16, 384),
      frame(0, 192, 16, Array(a), "c") ++ frame(1, 192, 16, Array(b), "c"))
    // an appended ID3v1-style tag (seen in the wild) must not discard
    // the already-CRC-verified frames
    val tag = "TAG" + "x" * 125
    val p = Flac.decodePcm(good ++ tag.getBytes("ASCII")).get
    assert(p.totalSamples == 384)
    assert(p.bytes.sameElements(pcmLe(Array(a ++ b), 16)))
    // sync-word failure after >=1 good frame with samples still owed:
    // the verified prefix is returned, header count preserved
    val short = container(streamInfo(8000, 1, 16, 600),
      frame(0, 192, 16, Array(a), "c")) ++ Array.fill(64)(0x55.toByte)
    val q = Flac.decodePcm(short).get
    assert(q.totalSamples == 600 && q.bytes.length == 192 * 2)
  }

  test("mid-frame corruption with samples still owed refuses (no prefix)") {
    val a = Array.fill(192)(7L); val b = Array.fill(192)(9L)
    val good = container(streamInfo(8000, 1, 16, 384),
      frame(0, 192, 16, Array(a), "c") ++ frame(1, 192, 16, Array(b), "c"))
    // flip a byte inside the SECOND frame's body: frame 1 is verified,
    // but the stream still owes samples and the failure is past the
    // sync word — refuse-corrupt, not prefix-keep
    val bad = good.clone
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 0x10).toByte
    assert(Flac.decodePcm(bad).isEmpty)
  }

  test("a frame whose declared bit depth differs from STREAMINFO refuses") {
    val xs = Array.fill(192)(5L)
    // frame header says 8-bit, STREAMINFO says 16: emitting at the
    // STREAMINFO byte width would skew every downstream feature
    val bytes = container(streamInfo(8000, 1, 16, 192),
      frame(0, 192, 8, Array(xs), "c"))
    assert(Flac.decodePcm(bytes).isEmpty)
  }

  // ---- encode∘decode identity across the parameter lattice (r17) ----

  test("property: encode-decode identity over (block size, bps, channels, " +
       "subframe type, stereo mode)") {
    import org.scalacheck.{Gen, Prop, Test => SchkTest}
    import org.scalacheck.rng.Seed
    def samplesFor(kind: Char, bs: Int, bps: Int, rnd: java.util.Random): Array[Long] = {
      val m = (1L << (bps - 1)) - 1
      kind match {
        case 'c' => val v = rnd.nextLong() % m; Array.fill(bs)(v)
        case 'v' | 'e' => Array.fill(bs)(rnd.nextLong() % m)
        case 'f' => // smooth: small order-2 residuals for the rice coder
          (0 until bs).map(i => (math.min(m / 2, 1000) *
            math.sin(i / 17.0)).toLong + rnd.nextInt(7) - 3).toArray
        case 'l' => // near-stable AR(2) matching the encoder's coefficients,
          // clamped into range (the residual absorbs the clamp exactly)
          val xs = new Array[Long](bs)
          for (i <- xs.indices) {
            val p = if (i == 0) rnd.nextInt(64).toLong
              else if (i == 1) rnd.nextInt(64).toLong
              else (3 * xs(i - 1) - xs(i - 2)) >> 1
            xs(i) = math.max(-(m - 8), math.min(m - 8,
              p + rnd.nextInt(9) - 4))
          }
          xs
      }
    }
    val gen = for {
      bs   <- Gen.oneOf(192, 200, 576)
      bps  <- Gen.oneOf(8, 12, 16, 20, 24)
      ch   <- Gen.oneOf(1, 2)
      kind <- Gen.oneOf('c', 'v', 'f', 'l', 'e')
      ms   <- Gen.oneOf(false, true)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (bs, bps, ch, kind, ms && ch == 2, seed)
    val prop = Prop.forAll(gen) { case (bs, bps, ch, kind, ms, seed) =>
      val rnd = new java.util.Random(seed)
      val chans = Array.fill(ch)(samplesFor(kind, bs, bps, rnd))
      val bytes = container(streamInfo(8000, ch, bps, bs),
        frame(0, bs, bps, chans, kind.toString * ch, midSide = ms))
      val p = Flac.decodePcm(bytes)
      p.exists(d => d.totalSamples == bs && d.channels == ch &&
        d.bps == bps && d.bytes.sameElements(pcmLe(chans, bps)))
    }
    // fixed initial seed: the lattice sample is reproducible round-over-round
    val res = SchkTest.check(SchkTest.Parameters.default
      .withMinSuccessfulTests(150)
      .withInitialSeed(Seed(20260816L)), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  // ---- AudioDecoder integration ----

  test("AudioDecoder.decodeTagged: flac provenance, exact count, " +
       "features over real PCM") {
    val xs = (0 until 576).map(i => (800 * math.sin(i / 9.0)).toLong).toArray
    val bytes = container(streamInfo(16000, 1, 16, 576),
      frame(0, 576, 16, Array(xs), "f"))
    val (w, h, n, feat, tag) = Multimodal.AudioDecoder.decodeTagged(bytes).get
    assert(tag == "flac" && w == 0 && h == 0 && n == 576)
    assert(feat.length == 8 && feat.exists(_ != 0f))
    // the features must be the span summary of the DECODED pcm, not of
    // the compressed payload: recompute from the known samples
    val pcm = pcmLe(Array(xs), 16)
    assert(feat.sameElements(Multimodal.AudioDecoder.spanFeature(pcm)))
  }
}
