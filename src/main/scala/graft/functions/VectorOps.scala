package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression for the embedding dot product.
 *
 * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)`
 * — runs on the interpreted higher-order-function path (one closure
 * call per element, boxed Doubles). For ANN scoring that expression
 * sits in the innermost loop of an all-pairs or bucket join, so it
 * dominates the query. This expression generates a tight primitive
 * Java loop instead (participates in whole-stage codegen).
 *
 * Accumulates left-to-right in double precision — bit-identical to
 * the interpreted form and to DuckDB's `list_inner_product` on
 * `DOUBLE[]`, which the correctness oracle relies on.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lt = elemType(left)
    val rt = elemType(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xi * yi
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Sum += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = ${ev.value}Sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

import org.apache.spark.sql.catalyst.expressions.UnaryExpression

/**
 * Native 60-bit SimHash fold over an `array<long>` of token hashes:
 * bit b of the result is set iff Σ_tokens (2·bit_b(h) − 1) > 0, i.e.
 * iff more than half the hashes have bit b set.
 *
 * The composable form (`aggregate(transform(sequence(0,59), …))`) runs
 * 60 × n interpreted lambda calls per row — ~20 s over 5 k docs at
 * sf0.1; this expression is a tight two-level primitive loop (~50 ms).
 */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ones = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 60) { ones(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (2 * ones(b) > n) sig |= 1L << b; b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val ones = ctx.freshName("ones")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $ones = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 60; $b++) {
         |    $ones[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if (2 * $ones[$b] > $n) $sig |= 1L << $b;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Native MinHash signature: for each universal-hash family j,
 * min over the input hashes of (aⱼ·(h mod P) + bⱼ) mod P, P = 2³¹−1.
 *
 * The HOF form (`array(k × array_min(transform(...)))`) costs k·n
 * interpreted lambda calls per row; this is one fused primitive loop
 * (n outer, k inner, k min-registers).
 */
case class MinHashSignature(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if a.length == b.length && a.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint> and equal-length params, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = arr.getLong(i) % P
      var j = 0
      while (j < k) {
        val v = (a(j) * hm + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val mins = ctx.freshName("mins"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |int $k = $aRef.length;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $hm = $c.getLong($i) % ${P}L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($aRef[$j] * $hm + $bRef[$j]) % ${P}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Fused shingle hasher: array<string> tokens → distinct array<long> of
 * 60-bit md5-prefix hashes of word n-gram shingles, one native loop.
 *
 * Replaces `array_distinct(transform(shingles(toks, n), h60))`, whose
 * per-shingle cost is ~10 µs (md5→hex-string alloc + NumberConverter
 * `conv` + two HOF lambda dispatches); this runs the digest directly
 * and reads the first 60 bits off the raw digest bytes (identical to
 * parsing the first 15 hex chars). First-occurrence order preserved —
 * the same order array_distinct and DuckDB's list_distinct keep, so
 * oracles stay bit-identical.
 */
case class ShingleHash60(child: Expression, n: Int)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"shingle width n must be >= 1, got $n")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hash60 requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val nToks = toks.numElements()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (nToks >= n) {
      val words = Array.tabulate(nToks)(i => toks.getUTF8String(i).toString)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= nToks - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        md.reset()
        val d = md.digest(sb.toString.getBytes("UTF-8"))
        // first 15 hex chars == first 60 bits of the digest
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
        out.add(v >>> 4)
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorOps {
  /** Σ aᵢbᵢ in element order, double precision, codegen'd. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      DotProduct(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** 60-bit simhash of an array<long> of token hashes, codegen'd. */
  def simHash60(hashes: Column): Column =
    GraftBridge.toColumn(SimHash60(GraftBridge.toExpression(hashes)))

  /** MinHash signature over an array<long> of shingle hashes. */
  def minHashSignature(hashes: Column, params: Seq[(Long, Long)]): Column =
    GraftBridge.toColumn(MinHashSignature(GraftBridge.toExpression(hashes),
      params.map(_._1).toArray, params.map(_._2).toArray))

  /** Distinct 60-bit hashes of word n-gram shingles, fused native pass. */
  def shingleHash60(tokens: Column, n: Int): Column =
    GraftBridge.toColumn(ShingleHash60(GraftBridge.toExpression(tokens), n))
}
