package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: array<string> shingles → array<long> of
  * `NumHashes` minima. One fused loop per row — each shingle is hashed once
  * (FNV-1a, two seeds) and combined into all 64 permutation slots with
  * xor-rotate (h_k = h1 ^ rotr(h2, k), two-hash scheme). Replaces 64
  * interpreted `array_min(transform(...))` HOF evaluations (~6× faster at
  * sf0.1) and stays inside whole-stage codegen via a static call. */
object minhashExpression {
  val NumHashes = 64

  def minhashSig(c: Column): Column =
    ExpressionUtils.column(MinHashSigExpr(ExpressionUtils.expression(c)))

  /** Signature from pre-hashed shingles (array<long>, e.g.
    * word_shingle_hashes output): skips string hashing entirely — h1/h2
    * derive from each input hash with splitmix-style finalizers. */
  def minhashSigFromHashes(c: Column): Column =
    ExpressionUtils.column(MinHashSigLongsExpr(ExpressionUtils.expression(c)))

  /** splitmix64 finalizer. Public: reused by the band-hash and scalar mix
    * expressions, and deliberately simple enough that the DuckDB oracles
    * replicate it exactly in HUGEINT arithmetic (wrap-around multiply as
    * mod 2^64) — unlike Spark's xxhash64, whose streaming structure has no
    * practical SQL replica. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Scalar splitmix64 of a long column — the oracle-replicable stand-in
    * for xxhash64 wherever a deterministic scrambling of an id is needed
    * (e.g. IVF seed sampling). */
  def mix64(c: Column): Column =
    ExpressionUtils.column(Mix64Expr(ExpressionUtils.expression(c)))

  /** LSH band hashes: array<long> signature → array<long> of
    * `len/rowsPerBand` per-band hashes, each a mix-fold of its band's
    * slots. Replaces the xxhash64(sig[i]...) band keys so the DuckDB
    * oracle can recompute them. */
  def bandHashes(c: Column, rowsPerBand: Int): Column =
    ExpressionUtils.column(BandHashesExpr(ExpressionUtils.expression(c), rowsPerBand))

  final val BandSeed = 0x3c79ac492ba7b653L

  def bandHashesImpl(sig: ArrayData, rowsPerBand: Int): ArrayData = {
    val nBands = sig.numElements() / rowsPerBand
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var h = BandSeed
      var j = 0
      while (j < rowsPerBand) {
        h = mix(h ^ sig.getLong(b * rowsPerBand + j))
        j += 1
      }
      out(b) = java.lang.Long.valueOf(h)
      b += 1
    }
    new GenericArrayData(out)
  }

  def sigFromLongsImpl(hashes: ArrayData): ArrayData = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h0 = hashes.getLong(i)
      val h1 = mix(h0)
      val h2 = mix(h0 ^ 0x5851f42d4c957f2dL)
      var k = 0
      while (k < NumHashes) {
        val h = h1 ^ java.lang.Long.rotateRight(h2, k)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def sigImpl(shingles: ArrayData): ArrayData = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i).toString
      val h1 = hashExpressions.fnv1a64(s)
      val h2 = hashExpressions.fnv1a64Seeded(s, 0x9e3779b97f4a7c15L)
      var k = 0
      while (k < NumHashes) {
        val h = h1 ^ java.lang.Long.rotateRight(h2, k)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

case class Mix64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    minhashExpression.mix(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.minhashExpression.mix($c)")
  override protected def withNewChildInternal(c: Expression): Mix64Expr =
    copy(child = c)
  override def prettyName: String = "mix64"
}

case class BandHashesExpr(child: Expression, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    minhashExpression.bandHashesImpl(v.asInstanceOf[ArrayData], rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.minhashExpression.bandHashesImpl($c, $rowsPerBand)")
  override protected def withNewChildInternal(c: Expression): BandHashesExpr =
    copy(child = c)
  override def prettyName: String = "band_hashes"
}

case class MinHashSigLongsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    minhashExpression.sigFromLongsImpl(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.minhashExpression.sigFromLongsImpl($c)")
  override protected def withNewChildInternal(c: Expression): MinHashSigLongsExpr =
    copy(child = c)
  override def prettyName: String = "minhash_sig_hashes"
}

case class MinHashSigExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    minhashExpression.sigImpl(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.minhashExpression.sigImpl($c)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}
