package graft.ops

import graft.TestSpark
import graft.sources.Versioned
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-13 ops. Values are pinned by the DuckDB oracles;
  * these specs pin the CROSS-OP laws — the standing-index serving path's
  * identity with the build-per-job search, and its build-once release
  * discipline (one committed version, not one per call). */
class Round13OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("ivf_serve answers exactly what the build-per-job search answers") {
    // the standing index is a pure function of the corpus, so serving
    // from the released snapshot must equal e2_ann_ivf (which rebuilds
    // per job) restricted to the query sample — restrict-after-search
    // ≡ restrict-before-search (per-query independence)
    val sample = Similarity.sampledQueryIds(spark, d).collect()
      .map(_.getLong(0)).toSet
    val servedRows = Similarity.e2IvfServe(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    val served = servedRows.toMap
    val full = Similarity.e2AnnIvf(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(servedRows.nonEmpty)
    assert(servedRows.length == served.size, "duplicate query rows")
    assert(served.keySet.subsetOf(sample))
    // every sampled query with an in-cell peer is answered, identically
    val answerable = full.keySet.intersect(sample)
    assert(served.keySet == answerable)
    answerable.foreach { q =>
      assert(served(q) == full(q), s"serve drifted from search at $q")
    }
  }

  test("ivf_serve builds once: repeat serving reuses the committed release") {
    // the PRODUCTION root (test-visible since round 14 — the advisor's
    // duplicated-path-mangling hole), wiped first so this pins a genuine
    // fresh build-and-release, not a leftover from an earlier run/suite
    val root = Similarity.ivfIndexRoot(d)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    Similarity.e2IvfServe(spark, d).count()
    val v1 = Versioned.current(spark, root)
    assert(v1.isDefined, "first serve must publish a release")
    val again = Similarity.e2IvfServe(spark, d)
    assert(Versioned.current(spark, root) == v1,
      "a second serve must NOT publish a new version")
    // the serving plan reads the released snapshot and does the top-1 as
    // an aggregate fold — no build stages (no window rank, no seed limit)
    val phys = again.queryExecution.executedPlan.toString
    assert(phys.contains("graft_ivf_index"),
      "serving plan must scan the standing index")
    val opt = again.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical
    assert(opt.collect { case w: logical.Window => w }.isEmpty,
      "serving plan must not rank via a window")
    // the only limit stage is the AnnQueryK probe sample — the ceil(√n)
    // seed-selection limit (9 at sf0.001) must not appear
    val limits = opt.collect { case l: logical.GlobalLimit =>
      l.limitExpr.asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Literal].value }
    assert(limits.forall(_ == Similarity.AnnQueryK),
      s"serving plan re-derives the seed set (limits: $limits)")
  }

  test("multi-probe serving ≡ ann_ivf2 restricted, and can only improve") {
    val sample = Similarity.sampledQueryIds(spark, d).collect()
      .map(_.getLong(0)).toSet
    val s2 = Similarity.e2IvfServe2(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val full2 = Similarity.e2AnnIvf2(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(s2.nonEmpty)
    assert(s2.keySet == full2.keySet.intersect(sample))
    s2.foreach { case (q, v) =>
      assert(v == full2(q), s"serve2 drifted from ann_ivf2 at $q") }
    // the recall dial is monotone: the top-2-cell candidate set contains
    // the top-1-cell set, so the served best sim can only rise
    val s1 = Similarity.e2IvfServe(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    s1.foreach { case (q, sim1) =>
      assert(s2(q)._2 >= sim1 - 1e-9, s"probe widening LOWERED sim at $q") }
  }

  test("KLL sketch is exact below K and ≤2pp rank error at fixture scale") {
    import graft.functions.KllSketch
    // below K nothing has compacted: quantile = the exact order statistic
    val small = (1 to 100).map(_.toDouble)
    val stS = small.foldLeft(KllSketch.empty)(KllSketch.add)
    assert(KllSketch.quantile(stS, 0.5) == 50.0)
    assert(KllSketch.quantile(stS, 0.9) == 90.0)
    // 100k values through the compactor: the estimate's TRUE rank must
    // sit within 2pp of the target (the contract e4w_kll_quantile gates
    // at 5pp); deterministic input → bit-reproducible state
    val xs = (0 until 100000).map { i =>
      val z = org.apache.spark.sql.graftext.minhashExpression.mix(i.toLong)
      (java.lang.Math.floorMod(z, 1000000L)).toDouble
    }
    val st = xs.foldLeft(KllSketch.empty)(KllSketch.add)
    assert(st.n == 100000L)
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = KllSketch.quantile(st, q)
      val rank = sorted.count(_ <= est).toDouble / sorted.size
      assert(math.abs(rank - q) <= 0.02, s"rank error at q=$q: $rank")
    }
    // state is logarithmic: items within K·(log2(n/K)+2)
    val bound = KllSketch.K *
      (math.ceil(math.log(100000.0 / KllSketch.K) / math.log(2.0)) + 2)
    assert(KllSketch.items(st) <= bound)
    // compaction is exactly weight-preserving (round-14 advisor fix):
    // the cumulative weight quantile() walks always sums to n
    assert(KllSketch.weight(st) == st.n)
  }

  test("KLL merge preserves count and the rank contract (mergeability)") {
    import graft.functions.KllSketch
    val xs = (0 until 60000).map { i =>
      val z = org.apache.spark.sql.graftext.minhashExpression
        .mix(i.toLong ^ 0x5ca1ab1eL)
      (java.lang.Math.floorMod(z, 1000000L)).toDouble
    }
    val (a, b) = xs.splitAt(17321) // deliberately not a K multiple
    val stA = a.foldLeft(KllSketch.empty)(KllSketch.add)
    val stB = b.foldLeft(KllSketch.empty)(KllSketch.add)
    val m = KllSketch.merge(stA, stB)
    assert(m.n == 60000L)
    // merge drives the ODD-length compactions (mergeSorted produces odd
    // buffers); weight must still be exactly conserved — the ±1-unit
    // drift the round-14 fix removed grew with merge depth
    assert(KllSketch.weight(m) == m.n)
    val deep = (0 until 16).map { k =>
      xs.drop(k * 3750).take(3750)
        .foldLeft(KllSketch.empty)(KllSketch.add)
    }.reduce(KllSketch.merge)
    assert(deep.n == 60000L && KllSketch.weight(deep) == deep.n)
    val sorted = xs.sorted
    for (q <- Seq(0.25, 0.5, 0.75)) {
      val est = KllSketch.quantile(m, q)
      val rank = sorted.count(_ <= est).toDouble / sorted.size
      assert(math.abs(rank - q) <= 0.02, s"merged rank error at q=$q: $rank")
    }
  }
}
