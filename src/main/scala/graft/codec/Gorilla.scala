package graft.codec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Gorilla-style per-series block compression (Pelkonen et al., "Gorilla:
 * A Fast, Scalable, In-Memory Time Series Database", VLDB 2015 — public
 * paper; this is an independent implementation of its §4.1 bit format):
 * timestamps as delta-of-delta with variable-width buckets, values as
 * XOR against the previous value with leading/trailing-zero window
 * reuse. The reference engine stores runs via RLE
 * (reference: lib/protobuf.cc EncodeValueStream's run handling);
 * Gorilla is the modern columnar alternative a Spark-native store
 * would use for its hot value blocks — typical metric streams land
 * near 1.4 bytes/point vs 16 raw.
 *
 * Layout: one row per (series, `blockMs` time block) — the paper's 2 h
 * block in configurable form — carrying `(skey, block_ts, n, blob)`.
 * Divergences from the paper, for ms-resolution robustness (the paper
 * compresses second-resolution, aligned streams): the first in-block
 * delta is encoded through the ordinary dod path against an implicit
 * previous delta of 0 (not a fixed 14-bit field), and the dod overflow
 * bucket is 64-bit (ms gaps exceed the paper's 32-bit bucket).
 *
 * Encoding runs in the same one-shuffle sorted-stream shape as every
 * per-series operator (repartition by series, sort within partitions,
 * O(block) state); decoding is a flatMap over blocks — blocks are
 * independent, so both directions parallelize per series-block at any
 * scale, and a time-range scan decodes only the blocks its partition
 * pruning keeps.
 */
object Gorilla {

  // ------------------------------------------------------------ bit I/O

  private final class BitWriter {
    private var buf = new Array[Byte](64)
    private var bitPos = 0
    private def ensure(nBits: Int): Unit = {
      val need = (bitPos + nBits + 7) / 8
      if (need > buf.length) {
        val n = new Array[Byte](math.max(need, buf.length * 2))
        System.arraycopy(buf, 0, n, 0, buf.length)
        buf = n
      }
    }
    def writeBit(b: Int): Unit = {
      ensure(1)
      if (b != 0) buf(bitPos >> 3) = (buf(bitPos >> 3) | (0x80 >>> (bitPos & 7))).toByte
      bitPos += 1
    }
    /** Writes the low `n` bits of `v`, most-significant first. */
    def writeBits(v: Long, n: Int): Unit = {
      ensure(n)
      var i = n - 1
      while (i >= 0) { writeBitFast(((v >>> i) & 1L).toInt); i -= 1 }
    }
    private def writeBitFast(b: Int): Unit = {
      if (b != 0) buf(bitPos >> 3) = (buf(bitPos >> 3) | (0x80 >>> (bitPos & 7))).toByte
      bitPos += 1
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitPos + 7) / 8)
  }

  private final class BitReader(bytes: Array[Byte]) {
    private var bitPos = 0
    def readBit(): Int = {
      val b = (bytes(bitPos >> 3) >>> (7 - (bitPos & 7))) & 1
      bitPos += 1
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  // ------------------------------------------------------- block codec

  /** Encodes one ts-sorted block of points into the bit stream. */
  private[graft] def encodeBlock(ts: Array[Long], vs: Array[Double],
                                 n: Int): Array[Byte] = {
    val w = new BitWriter
    w.writeBits(ts(0), 64)
    w.writeBits(java.lang.Double.doubleToRawLongBits(vs(0)), 64)
    var prevTs = ts(0)
    var prevDelta = 0L
    var prevBits = java.lang.Double.doubleToRawLongBits(vs(0))
    var prevLead = -1 // no reusable window yet
    var prevTrail = 0
    var i = 1
    while (i < n) {
      // timestamp: delta-of-delta, variable-width buckets
      val delta = ts(i) - prevTs
      val dod = delta - prevDelta
      if (dod == 0L) w.writeBit(0)
      else if (dod >= -63 && dod <= 64) {
        w.writeBits(0x2, 2); w.writeBits(dod + 63, 7)
      } else if (dod >= -255 && dod <= 256) {
        w.writeBits(0x6, 3); w.writeBits(dod + 255, 9)
      } else if (dod >= -2047 && dod <= 2048) {
        w.writeBits(0xe, 4); w.writeBits(dod + 2047, 12)
      } else {
        w.writeBits(0xf, 4); w.writeBits(dod, 64)
      }
      prevDelta = delta; prevTs = ts(i)
      // value: XOR with leading/trailing window reuse
      val bits = java.lang.Double.doubleToRawLongBits(vs(i))
      val x = bits ^ prevBits
      if (x == 0L) w.writeBit(0)
      else {
        val lead = math.min(java.lang.Long.numberOfLeadingZeros(x), 31)
        val trail = java.lang.Long.numberOfTrailingZeros(x)
        if (prevLead >= 0 && lead >= prevLead && trail >= prevTrail) {
          w.writeBit(1); w.writeBit(0)
          w.writeBits(x >>> prevTrail, 64 - prevLead - prevTrail)
        } else {
          w.writeBit(1); w.writeBit(1)
          val sig = 64 - lead - trail
          w.writeBits(lead, 5)
          w.writeBits(sig - 1, 6) // 1..64 stored as 0..63
          w.writeBits(x >>> trail, sig)
          prevLead = lead; prevTrail = trail
        }
      }
      prevBits = bits
      i += 1
    }
    w.toBytes
  }

  /** Decodes a block produced by [[encodeBlock]]. */
  private[graft] def decodeBlock(blob: Array[Byte],
                                 n: Int): (Array[Long], Array[Double]) = {
    val r = new BitReader(blob)
    val ts = new Array[Long](n)
    val vs = new Array[Double](n)
    ts(0) = r.readBits(64)
    var prevBits = r.readBits(64)
    vs(0) = java.lang.Double.longBitsToDouble(prevBits)
    var prevDelta = 0L
    var prevLead = -1
    var prevTrail = 0
    var i = 1
    while (i < n) {
      val dod =
        if (r.readBit() == 0) 0L
        else if (r.readBit() == 0) r.readBits(7) - 63
        else if (r.readBit() == 0) r.readBits(9) - 255
        else if (r.readBit() == 0) r.readBits(12) - 2047
        else r.readBits(64)
      prevDelta += dod
      ts(i) = ts(i - 1) + prevDelta
      if (r.readBit() == 0) vs(i) = java.lang.Double.longBitsToDouble(prevBits)
      else {
        val x =
          if (r.readBit() == 0) r.readBits(64 - prevLead - prevTrail) << prevTrail
          else {
            val lead = r.readBits(5).toInt
            val sig = r.readBits(6).toInt + 1
            val v = r.readBits(sig) << (64 - lead - sig)
            prevLead = lead; prevTrail = 64 - lead - sig
            v
          }
        prevBits = prevBits ^ x
        vs(i) = java.lang.Double.longBitsToDouble(prevBits)
      }
      i += 1
    }
    (ts, vs)
  }

  // --------------------------------------------------- DataFrame surface

  /**
   * (skey, ts, dval) points → one (skey, block_ts, n, blob) row per
   * series-block. One shuffle on the series key; blocks build in a
   * streaming pass over the sorted partition (O(block) memory).
   * String-valued points (null dval) are not representable in a value
   * block and are filtered, like the mutation operators.
   */
  def encode(df: DataFrame, blockMs: Long): DataFrame = {
    require(blockMs > 0, "blockMs must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    df.select(col("skey"), col("ts"), col("dval"))
      .filter(col("dval").isNotNull)
      .repartition(parts, col("skey"))
      .sortWithinPartitions(col("skey"), col("ts"))
      .as[(String, Long, Double)]
      .mapPartitions { it =>
        new Iterator[(String, Long, Int, Array[Byte])] {
          private var curKey: String = null
          private var blockTs = 0L
          private var ts = new Array[Long](64)
          private var vs = new Array[Double](64)
          private var n = 0
          private var out: (String, Long, Int, Array[Byte]) = null
          private def flush(): Unit = {
            if (n > 0) out = (curKey, blockTs, n, encodeBlock(ts, vs, n))
            n = 0
          }
          private def push(k: String, t: Long, v: Double): Unit = {
            if (n == ts.length) {
              ts = java.util.Arrays.copyOf(ts, n * 2)
              vs = java.util.Arrays.copyOf(vs, n * 2)
            }
            curKey = k; ts(n) = t; vs(n) = v; n += 1
          }
          private def advance(): Unit = {
            while (out == null && (it.hasNext || n > 0)) {
              if (!it.hasNext) { flush(); return }
              val (k, t, v) = it.next()
              val b = Math.floorDiv(t, blockMs) * blockMs
              if (n > 0 && (k != curKey || b != blockTs)) flush()
              blockTs = b
              push(k, t, v)
            }
          }
          def hasNext: Boolean = { advance(); out != null }
          def next(): (String, Long, Int, Array[Byte]) = {
            advance(); val r = out; out = null; r
          }
        }
      }
      .toDF("skey", "block_ts", "n", "blob")
  }

  /** Inverse of [[encode]]: blocks → (skey, ts, dval) points. */
  def decode(blocks: DataFrame): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks.select(col("skey"), col("n"), col("blob"))
      .as[(String, Int, Array[Byte])]
      .flatMap { case (k, n, blob) =>
        val (ts, vs) = decodeBlock(blob, n)
        Iterator.tabulate(n)(i => (k, ts(i), vs(i)))
      }
      .toDF("skey", "ts", "dval")
  }
}
