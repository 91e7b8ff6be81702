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

/**
 * Top-`nprobe` nearest centroids (squared L2, via argmax of
 * 2·v·c − |c|²) for an embedding against a centroid matrix.
 *
 * The matrix rides in the expression as a flat `double[]` reference
 * object (`ctx.addReferenceObj`), NOT as literal trees: the generated
 * code is two fixed loops whatever `nlist` is, each score is computed
 * exactly once, and the matrix ships with the (torrent-broadcast) task
 * binary — the round-2 verdict's fix for plan/codegen size growing
 * with nlist×dim and every score being evaluated twice.
 *
 * Ties break to the lower centroid index (first argmax wins).
 */
case class TopCentroids(child: Expression, centroids: Array[Double],
                        dim: Int, nprobe: Int) extends UnaryExpression {

  private def nlist: Int = centroids.length / dim

  override def checkInputDataTypes(): TypeCheckResult =
    if (dim < 1 || nprobe < 1 || centroids.isEmpty || centroids.length % dim != 0)
      TypeCheckResult.TypeCheckFailure(
        s"top_centroids: need dim>=1, nprobe>=1, |centroids| a multiple of dim")
    else child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_centroids requires array<float|double>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** |c|² per centroid, precomputed once per executor. */
  @transient private lazy val normSq: Array[Double] = {
    val out = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var s = 0.0; var i = 0
      while (i < dim) { val x = centroids(c * dim + i); s += x * x; i += 1 }
      out(c) = s; c += 1
    }
    out
  }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    val v = new Array[Double](n)
    var i = 0
    val f = isFloat
    while (i < n) { v(i) = if (f) vec.getFloat(i).toDouble else vec.getDouble(i); i += 1 }
    val scores = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var d = 0.0; var j = 0
      while (j < n) { d += v(j) * centroids(c * dim + j); j += 1 }
      scores(c) = d * 2.0 - normSq(c)
      c += 1
    }
    val k = math.min(nprobe, nlist)
    val out = new Array[Int](k)
    val used = new Array[Boolean](nlist)
    var r = 0
    while (r < k) {
      var best = -1; var bestS = Double.NegativeInfinity
      var c2 = 0
      while (c2 < nlist) {
        if (!used(c2) && scores(c2) > bestS) { bestS = scores(c2); best = c2 }
        c2 += 1
      }
      used(best) = true; out(r) = best; r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[]")
    val nRef = ctx.addReferenceObj("ivfNormSq", normSq, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val v = ctx.freshName("v")
      val scores = ctx.freshName("scores"); val used = ctx.freshName("used")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val r = ctx.freshName("r")
      val best = ctx.freshName("best"); val bestS = ctx.freshName("bestS")
      val k = ctx.freshName("k")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double[] $v = new double[$n];
         |for (int $i = 0; $i < $n; $i++) $v[$i] = (double) $a.$get($i);
         |int ${k}NList = $nRef.length;
         |double[] $scores = new double[${k}NList];
         |for (int $c = 0; $c < ${k}NList; $c++) {
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $n; $j++) $d += $v[$j] * $cRef[$c * $dim + $j];
         |  $scores[$c] = $d * 2.0 - $nRef[$c];
         |}
         |int $k = java.lang.Math.min($nprobe, ${k}NList);
         |int[] $out = new int[$k];
         |boolean[] $used = new boolean[${k}NList];
         |for (int $r = 0; $r < $k; $r++) {
         |  int $best = -1; double $bestS = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < ${k}NList; $c++) {
         |    if (!$used[$c] && $scores[$c] > $bestS) { $bestS = $scores[$c]; $best = $c; }
         |  }
         |  $used[$best] = true; $out[$r] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * min over centroids of Σ_j (v_j − c_j)² — the k-means assignment
 * distance, codegen'd with the centroid matrix as a flat `double[]`
 * reference object (the [[TopCentroids]] posture). Replaces the
 * higher-order-function form `aggregate(transform(array(<nlist×dim
 * literals>), c => Σ (x−y)²), MaxValue, least)` the k-means‖ training
 * passes used: that plan is ~nlist×dim literal nodes, re-analyzed and
 * re-compiled EVERY ROUND as the center set grows, and Catalyst HOF
 * lambdas evaluate interpreted, outside whole-stage codegen.
 *
 * FLOAT CONTRACT: bit-identical to the HOF form — the difference
 * accumulates per dimension in ascending order as (x−y)·(x−y), and
 * the min scans centroids in order with a strict `<` (exactly
 * `least(acc, d)` from `Double.MaxValue`). The training picks compare
 * `u < l·d²/φ`, so a single-ulp change here would train different
 * centroids; PropertySpec pins expression-vs-HOF equality on random
 * vectors at the bit level.
 *
 * Rows shorter than `dim` contribute only their present dimensions
 * (the HOF's zip_with would null-poison such rows; training corpora
 * are fixed-dim so neither path is exercised — documented, not load-
 * bearing).
 */
case class MinSqDist(child: Expression, centroids: Array[Double], dim: Int)
    extends UnaryExpression {

  private def nlist: Int = centroids.length / dim

  override def checkInputDataTypes(): TypeCheckResult =
    if (dim < 1 || centroids.isEmpty || centroids.length % dim != 0)
      TypeCheckResult.TypeCheckFailure(
        s"min_sq_dist: need dim>=1 and |centroids| a multiple of dim")
    else child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"min_sq_dist requires array<float|double>, got ${other.simpleString}")
    }

  override def dataType: DataType = DoubleType

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    val v = new Array[Double](n)
    var i = 0
    val f = isFloat
    while (i < n) { v(i) = if (f) vec.getFloat(i).toDouble else vec.getDouble(i); i += 1 }
    var acc = Double.MaxValue
    var c = 0
    while (c < nlist) {
      var d = 0.0; var j = 0
      while (j < n) { val t = v(j) - centroids(c * dim + j); d += t * t; j += 1 }
      if (d < acc) acc = d
      c += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("kmCentroids", centroids, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val v = ctx.freshName("v")
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val t = ctx.freshName("t"); val acc = ctx.freshName("acc")
      val nl = ctx.freshName("nl")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double[] $v = new double[$n];
         |for (int $i = 0; $i < $n; $i++) $v[$i] = (double) $a.$get($i);
         |int $nl = $cRef.length / $dim;
         |double $acc = Double.MAX_VALUE;
         |for (int $c = 0; $c < $nl; $c++) {
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $t = $v[$j] - $cRef[$c * $dim + $j];
         |    $d += $t * $t;
         |  }
         |  if ($d < $acc) $acc = $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Sign-random-projection signature: bit i of the result is set iff
 * vec · planes[i] ≥ 0. The plane matrix (nPlanes × dim, flat) is a
 * reference object, so codegen is one fixed nested loop instead of
 * nPlanes separate dot-product trees each evaluated per row.
 */
case class LshSignature(child: Expression, planes: Array[Double], dim: Int)
    extends UnaryExpression {

  private def nPlanes: Int = planes.length / dim

  override def checkInputDataTypes(): TypeCheckResult =
    if (dim < 1 || planes.isEmpty || planes.length % dim != 0 || nPlanes > 63)
      TypeCheckResult.TypeCheckFailure(
        s"lsh_signature: need dim>=1, |planes| a multiple of dim, <=63 planes")
    else child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lsh_signature requires array<float|double>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    val f = isFloat
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var d = 0.0; var i = 0
      while (i < n) {
        val vi = if (f) vec.getFloat(i).toDouble else vec.getDouble(i)
        d += vi * planes(p * dim + i)
        i += 1
      }
      if (d >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val np = ctx.freshName("np")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |int $np = $pRef.length / $dim;
         |long $sig = 0L;
         |for (int $p = 0; $p < $np; $p++) {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $d += ((double) $a.$get($i)) * $pRef[$p * $dim + $i];
         |  }
         |  if ($d >= 0) $sig |= 1L << $p;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
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

  /** Indices of the `nprobe` nearest (L2) centroids, best first. */
  def topCentroids(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val dim = centroids.head.length
    GraftBridge.toColumn(TopCentroids(GraftBridge.toExpression(vec),
      centroids.flatten, dim, nprobe))
  }

  /** min squared L2 distance to a centroid matrix, codegen'd;
    * bit-identical to the HOF `aggregate/transform/least` form. */
  def minSqDist(vec: Column, centroids: Array[Array[Double]]): Column = {
    val dim = centroids.head.length
    GraftBridge.toColumn(MinSqDist(GraftBridge.toExpression(vec),
      centroids.flatten, dim))
  }

  /** Sign-random-projection bit signature against a plane matrix. */
  def lshSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    val dim = planes.head.length
    GraftBridge.toColumn(LshSignature(GraftBridge.toExpression(vec),
      planes.flatten, dim))
  }
}
