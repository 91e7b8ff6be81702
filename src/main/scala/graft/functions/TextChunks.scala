package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Content-defined chunking: split a document into variable-size chunks
 * at positions where a rolling polynomial hash of the last `window`
 * code points is divisible by `divisor` (basic Rabin-style chunking).
 *
 * Chunk boundaries depend only on local content, so an insertion or
 * deletion re-chunks O(1) chunks around the edit while every other
 * chunk keeps its identity — the property that makes chunk-level
 * dedup robust to small edits, where fixed-size blocks would shift
 * every downstream block. Deliberately NO min/max chunk bounds: bounds
 * make boundaries history-dependent (sequential per document and
 * unmirrorable in set-oriented SQL); the unbounded rule keeps every
 * position's boundary decision independent — embarrassingly parallel,
 * which is the property that matters at 100 TB.
 *
 * Hash: H(i) = Σ_{j=0..w-1} cp(i−j)·31^j over code points (oldest
 * highest power), maintained as a rolling window in one pass. Overflow-
 * free for window ≤ 8 (31^7·0x10FFFF·8 < 2^63). Boundary after
 * position i (1-based, i ≥ window) iff H(i) % divisor == 0; the final
 * fragment is always emitted; empty input → empty array.
 */
case class CdcChunks(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  require(window >= 2 && window <= 8, s"window must be in [2,8], got $window")
  require(divisor > 0, s"divisor must be positive, got $divisor")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "cdc_chunks"

  private val dropPow: Long = {
    var p = 1L; var j = 1
    while (j < window) { p *= 31L; j += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    val ring = new Array[Long](window)
    var h = 0L; var seen = 0
    var chunkStart = 0; var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      h = if (seen >= window) (h - ring(seen % window) * dropPow) * 31L + cp
          else h * 31L + cp
      ring(seen % window) = cp
      seen += 1
      i += Character.charCount(cp)
      if (seen >= window && h % divisor == 0L) {
        out += UTF8String.fromString(s.substring(chunkStart, i))
        chunkStart = i
      }
    }
    if (i > chunkStart) out += UTF8String.fromString(s.substring(chunkStart, i))
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val ring = ctx.freshName("ring")
      val h = ctx.freshName("h"); val seen = ctx.freshName("seen")
      val start = ctx.freshName("start"); val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $in.toString();
         |int $n = $s.length();
         |java.util.ArrayList<Object> $out = new java.util.ArrayList<Object>();
         |long[] $ring = new long[$window];
         |long $h = 0L; int $seen = 0; int $start = 0; int $i = 0;
         |while ($i < $n) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($seen >= $window)
         |    ? ($h - $ring[$seen % $window] * ${dropPow}L) * 31L + $cp
         |    : $h * 31L + $cp;
         |  $ring[$seen % $window] = $cp;
         |  $seen++;
         |  $i += Character.charCount($cp);
         |  if ($seen >= $window && $h % $divisor == 0L) {
         |    $out.add(org.apache.spark.unsafe.types.UTF8String.fromString(
         |      $s.substring($start, $i)));
         |    $start = $i;
         |  }
         |}
         |if ($i > $start) {
         |  $out.add(org.apache.spark.unsafe.types.UTF8String.fromString(
         |    $s.substring($start, $i)));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $out.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
