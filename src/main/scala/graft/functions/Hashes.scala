package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftext.hashExpressions

/** Public fingerprinting functions backed by native Catalyst expressions
  * (see org.apache.spark.sql.graftext.hashExpressions). */
object Hashes {
  /** Polynomial rolling hash (Karp–Rabin) of a string → BIGINT. */
  def rollingHash(c: Column): Column = hashExpressions.rollingHash(c)

  /** 64-bit SimHash over whitespace tokens → BIGINT. */
  def simHash(c: Column): Column = hashExpressions.simHash(c)

  /** FNV-1a 64 of the string's UTF-8 bytes → BIGINT. */
  def fnv64(c: Column): Column = hashExpressions.fnv64(c)
}

/** Native n-gram generators (codegen'd fused loops; see
  * org.apache.spark.sql.graftext.ngramExpressions). */
object Ngrams {
  /** Character n-grams of a string → array<string>. */
  def charNgrams(c: Column, n: Int): Column =
    org.apache.spark.sql.graftext.ngramExpressions.charNgrams(c, n)
  /** Word n-shingles (space-joined) → array<string>. */
  def wordShingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graftext.ngramExpressions.wordShingles(c, n)
}

/** Native vector math over array<float> embeddings (codegen'd fused loops;
  * see org.apache.spark.sql.graftext.vectorExpressions). */
object Vectors {
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.vectorExpressions.dotProduct(a, b)
  def l2Norm(c: Column): Column =
    org.apache.spark.sql.graftext.vectorExpressions.l2Norm(c)
  /** array<double> twins — same index-ordered folds as the HOF
    * `aggregate(zip_with(...))` spellings they replace (bit-identical),
    * evaluated as fused codegen loops instead of interpreted lambdas. */
  def dotD(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.vectorExpressions.dotProductD(a, b)
  def l2NormD(c: Column): Column =
    org.apache.spark.sql.graftext.vectorExpressions.l2NormD(c)
  def sqDistD(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.vectorExpressions.sqDistD(a, b)
  def subSqDistsD(a: Column, b: Column, m: Int, dsub: Int): Column =
    org.apache.spark.sql.graftext.vectorExpressions.subSqDistsD(a, b, m, dsub)
  def adcDistD(codes: Column, dt: Column, m: Int, ksub: Int): Column =
    org.apache.spark.sql.graftext.vectorExpressions.adcDistD(codes, dt, m, ksub)
}
