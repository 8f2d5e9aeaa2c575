package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for document fingerprinting (SURVEY.md §2
  * [EXT] text-analysis surface). Hosted under `org.apache.spark.sql` to
  * reach the `private[sql]` Column↔Expression bridge; the public API is
  * `graft.functions.Hashes`.
  *
  * Both expressions stay inside whole-stage codegen — `doGenCode` emits a
  * static call, so per-row cost is one JIT-friendly method invocation with
  * no UDF boxing and no codegen fallback in the hot path.
  */
object hashExpressions {
  def rollingHash(c: Column): Column =
    ExpressionUtils.column(RollingHashExpr(ExpressionUtils.expression(c)))

  def simHash(c: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(c)))

  def fnv64(c: Column): Column =
    ExpressionUtils.column(Fnv1a64Expr(ExpressionUtils.expression(c)))

  private final val P = 1000000007L

  /** Polynomial rolling hash (Karp–Rabin): h = (h*131 + codepoint) mod 1e9+7.
    * The small modulus keeps the DuckDB oracle in BIGINT range; collision-safe
    * fingerprints for production dedup are the md5/xxhash64 paths. */
  def rollingHashImpl(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 131L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  def fnv1a64(s: String): Long = fnv1a64Seeded(s, 0L)

  def fnv1a64Utf8(s: UTF8String): Long = {
    // hash the UTF8String's bytes directly — no String round-trip
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def fnv1a64Seeded(s: String, seed: Long): Long = {
    var h = FnvOffset ^ seed
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** 64-bit SimHash over whitespace tokens with FNV-1a token hashes: bit b
    * of the output is 1 iff a strict majority of token hashes set bit b
    * (ties resolve to 0). Near-duplicate documents land within small
    * Hamming distance. */
  def simHashImpl(s: UTF8String): Long = {
    val counts = new Array[Int](64)
    var nTokens = 0
    val toks = s.toString.split(' ')
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        nTokens += 1
        val h = fnv1a64(tok)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > nTokens) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class RollingHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    hashExpressions.rollingHashImpl(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.hashExpressions.rollingHashImpl($c)")
  override protected def withNewChildInternal(c: Expression): RollingHashExpr =
    copy(child = c)
  override def prettyName: String = "rolling_hash"
}

/** FNV-1a 64 of a string's UTF-8 bytes → BIGINT: the scan-side key
  * reduction that lets shuffles carry 8-byte hashes instead of strings
  * (segment dedup, arbitrary-key co-location at scale). */
case class Fnv1a64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    hashExpressions.fnv1a64Utf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.hashExpressions.fnv1a64Utf8($c)")
  override protected def withNewChildInternal(c: Expression): Fnv1a64Expr =
    copy(child = c)
  override def prettyName: String = "fnv1a64"
}

case class SimHash64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    hashExpressions.simHashImpl(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.hashExpressions.simHashImpl($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
  override def prettyName: String = "simhash64"
}
