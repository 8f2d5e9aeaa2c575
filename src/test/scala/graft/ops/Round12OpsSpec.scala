package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-12 work: the shared exact-truth memo's internal
  * consistency (its legs must agree with the independent per-consumer
  * computations they replaced — values are pinned by the DuckDB oracles,
  * these specs pin the cross-leg laws), the Hamming two-stage rerank
  * dominance law, and the dup-ngram reconciliation against
  * e1_shingle_profile's df mass. */
class Round12OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("hamming rerank dominates hamming top-1 per query, and shares its exact baseline") {
    val ann = Similarity.e2HammingAnn(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val rr = Similarity.e2HammingRerank(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(rr.keySet == ann.keySet, "both audits answer the same sample")
    rr.foreach { case (q, (exactNb, hit)) =>
      // same exact ground truth (both consume the memo's cos_g leg)
      assert(exactNb == ann(q)._1, s"exact_nb drifted for query $q")
      // if the rank-1 signature IS the true neighbor, it sits in the
      // 8-deep shortlist and wins the cosine rerank — so rerank can only
      // add hits, never lose one
      assert(hit >= ann(q)._2, s"rerank lost a hit the filter had at $q")
    }
    assert(rr.values.map(_._2).sum >= ann.values.map(_._2).sum)
  }

  test("e8_dup_ngrams reconciles with e1_shingle_profile's df mass") {
    // Σ n_inc over sources == Σ total_df over the profile's df buckets
    // (both are the corpus's (doc, shingle) incidence count), and the
    // duplicated mass is what's left after each distinct shingle's first
    // occurrence: Σ dup_inc == Σ_{df>1} df == total − (distinct singletons)
    val dup = Analysis.e8DupNgrams(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val prof = Dedup.e1ShingleProfile(spark, d).collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(0))) // (total_df, n_shingles, df_digits)
    val totalInc = dup.map(_._2).sum
    assert(totalInc == prof.map(_._1).sum,
      "incidence mass must equal the profile's df mass")
    // digit-1 bucket holds df in 1..9; recompute the exact dup mass from
    // the per-shingle df table directly for the cross-check
    val dfs = Dedup.shingleHashes(spark, d).groupBy("h").count()
      .collect().map(_.getLong(1))
    assert(totalInc == dfs.sum)
    assert(dup.map(_._3).sum == dfs.filter(_ > 1).sum)
    dup.foreach { case (src, ni, di, bp) =>
      assert(di <= ni && bp == di * 10000 / ni, s"bp arithmetic at $src")
    }
  }

  test("exact-truth memo: legs agree with independent recomputation on the fixture") {
    val m = Similarity.exactSampleTruth(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5), r.getString(7), r.getInt(6)))
    // driver-side recompute of the global cosine top-1 per query
    val emb = graft.Tables.embeddings(spark, d)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    def nrm(a: Array[Double]): Double = math.sqrt(a.map(x => x * x).sum)
    val byId = emb.map(e => e._1 -> e).toMap
    val qids = m.map(_._1).distinct
    assert(qids.length <= Similarity.AnnQueryK)
    val cosG1 = m.filter(r => r._7 == "cos_g" && r._8 == 1)
    assert(cosG1.length == qids.length, "one global top-1 per query")
    cosG1.foreach { case (q, _, nb, _, sim, _, _, _) =>
      val (_, qv, _) = byId(q)
      val best = emb.filter(_._1 != q)
        .map(e => (dot(qv, e._2) / (nrm(qv) * nrm(e._2)), e._1))
        .minBy { case (s2, id) => (-s2, id) }
      assert(best._2 == nb && math.abs(best._1 - sim) < 1e-12,
        s"global top-1 mismatch at query $q")
    }
    // the ip leg orders by raw inner product — spot the rank-1 rows
    m.filter(r => r._7 == "ip_g" && r._8 == 1).foreach {
      case (q, _, nb, _, _, ip, _, _) =>
        val (_, qv, _) = byId(q)
        val best = emb.filter(_._1 != q)
          .map(e => (dot(qv, e._2), e._1))
          .minBy { case (s2, id) => (-s2, id) }
        assert(best._2 == nb && math.abs(best._1 - ip) < 1e-9,
          s"ip top-1 mismatch at query $q")
    }
    // cos_l rank-1 within the same-label half is the triplet positive
    val trip = Similarity.e2TripletMiningSampled(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    m.filter(r => r._7 == "cos_l" && r._8 == 1).foreach {
      case (q, lab, nb, olab, _, _, _, _) =>
        trip.get(q).foreach { case (pos, neg) =>
          if (lab == olab) assert(pos == nb) else assert(neg == nb)
        }
    }
  }
}
