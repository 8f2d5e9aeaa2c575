package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram generators. The HOF formulation
  * (`transform(sequence(1, length(t)-2), i -> substring(t, i, 3))`)
  * evaluates an interpreted lambda per gram — millions of boxed calls per
  * partition on a corpus. These run one fused loop per row and emit their
  * result inside whole-stage codegen. Semantics match the HOF versions
  * exactly (same grams, same order), so DuckDB oracles are unaffected. */
object ngramExpressions {

  /** Character n-grams: "hello",3 → ["hel","ell","llo"]. */
  def charNgrams(c: Column, n: Int): Column =
    ExpressionUtils.column(CharNgramsExpr(ExpressionUtils.expression(c), n))

  /** Word n-shingles joined with spaces:
    * "a b c d",3 → ["a b c","b c d"]. */
  def wordShingles(c: Column, n: Int): Column =
    ExpressionUtils.column(WordShinglesExpr(ExpressionUtils.expression(c), n))

  def charNgramsImpl(s: UTF8String, n: Int): ArrayData = {
    // index by code points, not UTF-16 units — SQL substring (and the
    // DuckDB oracle) walk code points, and surrogate pairs must not split
    val cps = s.toString.codePoints().toArray
    val count = cps.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = UTF8String.fromString(new String(cps, i, n))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Word n-shingles as 64-bit FNV-1a hashes, computed incrementally over
    * token bytes with a space separator — no shingle strings are ever
    * materialized. The dedup hot path: join/minhash on these longs. */
  def wordShingleHashes(c: Column, n: Int): Column =
    ExpressionUtils.column(WordShingleHashesExpr(ExpressionUtils.expression(c), n))

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  def wordShingleHashesImpl(s: UTF8String, n: Int): ArrayData = {
    // limit -1 keeps trailing empty tokens, matching the HOF formulation
    // (split(text, ' ') in SQL) and the DuckDB oracle's string_split —
    // Scala's default split(char) would silently drop them.
    val toks = s.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      var h = FnvOffset
      var j = 0
      while (j < n) {
        if (j > 0) { h ^= ' '.toLong; h *= FnvPrime }
        val bytes = toks(i + j).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var k = 0
        while (k < bytes.length) { h ^= (bytes(k) & 0xffL); h *= FnvPrime; k += 1 }
        j += 1
      }
      out(i) = java.lang.Long.valueOf(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  def wordShinglesImpl(s: UTF8String, n: Int): ArrayData = {
    // limit -1: see wordShingleHashesImpl — trailing empty tokens are kept
    val toks = s.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class CharNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ngramExpressions.charNgramsImpl(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.ngramExpressions.charNgramsImpl($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharNgramsExpr =
    copy(child = c)
  override def prettyName: String = "char_ngrams"
}

case class WordShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ngramExpressions.wordShingleHashesImpl(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.ngramExpressions.wordShingleHashesImpl($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShingleHashesExpr =
    copy(child = c)
  override def prettyName: String = "word_shingle_hashes"
}

case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ngramExpressions.wordShinglesImpl(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.ngramExpressions.wordShinglesImpl($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}
