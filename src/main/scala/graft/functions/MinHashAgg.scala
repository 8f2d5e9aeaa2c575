package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftext.hashExpressions

/** Typed MinHash UDAF (SURVEY.md §2 UDAF surface): aggregates one shingle
  * string per input row into a `numHashes`-wide signature of elementwise
  * minima over seeded hashes. Commutative + associative merge → full
  * map-side partial aggregation; the shuffle carries one fixed-size array
  * per group regardless of document length.
  *
  * The expression-based path in ops.Dedup (array_min over transform) avoids
  * the shuffle entirely when shingles are already collected per row; this
  * Aggregator is the right shape when shingles arrive exploded (e.g. out of
  * a generator or a streaming source).
  */
final class MinHashAgg(numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    // two-hash xor-rotate scheme shared with minhashExpression.sigImpl:
    // h_k = h1 ^ rotr(h2, k) with independently seeded h1/h2 is a proper
    // pairwise-independent-style family — rotating a SINGLE hash correlates
    // the "permutations" and degrades the Jaccard estimator.
    val h1 = hashExpressions.fnv1a64(shingle)
    val h2 = hashExpressions.fnv1a64Seeded(shingle, 0x9e3779b97f4a7c15L)
    var k = 0
    while (k < numHashes) {
      val h = h1 ^ java.lang.Long.rotateRight(h2, k)
      if (h < buf(k)) buf(k) = h
      k += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
    a
  }

  def finish(r: Array[Long]): Array[Long] = r

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Estimated Jaccard similarity from two signatures: fraction of agreeing
    * components (the MinHash estimator). */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    a.indices.count(i => a(i) == b(i)).toDouble / a.length
  }
}
