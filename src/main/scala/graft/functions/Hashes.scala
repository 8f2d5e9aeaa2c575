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
}

/** Native vector math over array<float> embeddings (codegen'd fused loops;
  * see org.apache.spark.sql.graftext.vectorExpressions). */
object Vectors {
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.vectorExpressions.dotProduct(a, b)
  def l2Norm(c: Column): Column =
    org.apache.spark.sql.graftext.vectorExpressions.l2Norm(c)
}
