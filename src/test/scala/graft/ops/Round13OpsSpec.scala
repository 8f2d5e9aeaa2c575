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
    Similarity.e2IvfServe(spark, d).count()
    val root = "/tmp/graft_ivf_index/i1_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_")
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
}
