package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native vector math over `array<float>` embedding columns. The HOF
  * formulation (`aggregate(zip_with(...))`) allocates an intermediate array
  * and boxes every element; these expressions are a single fused loop over
  * the two ArrayData buffers, emitted inside whole-stage codegen via a
  * static call. Accumulation is double-precision in index order — exactly
  * the math of the HOF version and of DuckDB's list_cosine_similarity over
  * DOUBLE[], so oracle results are bit-identical. */
object vectorExpressions {
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def l2Norm(c: Column): Column =
    ExpressionUtils.column(L2NormExpr(ExpressionUtils.expression(c)))

  def dotImpl(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def normImpl(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    vectorExpressions.dotImpl(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftext.vectorExpressions.dotImpl($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DotProductExpr = copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

case class L2NormExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    vectorExpressions.normImpl(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graftext.vectorExpressions.normImpl($a)")
  override protected def withNewChildInternal(c: Expression): L2NormExpr =
    copy(child = c)
  override def prettyName: String = "vec_l2norm"
}
