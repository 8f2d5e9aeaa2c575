package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, LongType}

/** Native random-hyperplane LSH signature: array<float> → BIGINT bucket id.
  * Plane component (p, i) is the parity of a mixed hash of (p, i) mapped to
  * ±1 — deterministic across sessions and executors with no plane matrix to
  * broadcast. One fused loop computes all `nPlanes` dot-product signs
  * (replaces nPlanes interpreted aggregate(zip_with(...)) HOFs). */
object hyperplaneExpression {
  def hyperplaneSig(c: Column, nPlanes: Int): Column =
    ExpressionUtils.column(HyperplaneSigExpr(ExpressionUtils.expression(c), nPlanes))

  private def planeSign(p: Int, i: Int): Boolean = {
    // splitmix64-style mix of the (plane, dim) index
    var z = p.toLong * 0x9e3779b97f4a7c15L + i.toLong * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    ((z ^ (z >>> 31)) & 1L) == 1L
  }

  def sigImpl(v: ArrayData, nPlanes: Int): Long = {
    val dim = v.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val x = v.getFloat(i).toDouble
        acc += (if (planeSign(p, i)) x else -x)
        i += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

case class HyperplaneSigExpr(child: Expression, nPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    hyperplaneExpression.sigImpl(v.asInstanceOf[ArrayData], nPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.hyperplaneExpression.sigImpl($c, $nPlanes)")
  override protected def withNewChildInternal(c: Expression): HyperplaneSigExpr =
    copy(child = c)
  override def prettyName: String = "hyperplane_sig"
}
