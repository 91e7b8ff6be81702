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

object VectorOps {
  /** Σ aᵢbᵢ in element order, double precision, codegen'd. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      DotProduct(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
