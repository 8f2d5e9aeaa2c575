package graft.ops

import graft.TestSpark
import graft.sources.Versioned
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-14 ops. Values are pinned by the DuckDB oracles;
  * these specs pin the CROSS-OP laws — the maintenance loop's v+1
  * pointer swap (publish once, serve the new version, keep v1 pinned),
  * its reconciliation with the ingest audit, and the standing kNN-graph
  * release discipline. */
class Round14OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("ivf_publish swaps the pointer to v2 exactly once and stays there") {
    val root = Similarity.ivfMaintRoot(d)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val out1 = Similarity.e2IvfPublish(spark, d).collect()
    assert(Versioned.versions(spark, root) == Seq(1, 2),
      "first run must release v1 and publish v2")
    assert(Versioned.current(spark, root).contains(2))
    // idempotent by pointer state: replays (bench reps, verify passes)
    // converge on the same two-version history
    val out2 = Similarity.e2IvfPublish(spark, d).collect()
    assert(Versioned.versions(spark, root) == Seq(1, 2),
      "a replay must NOT grow the version history")
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    // the audit output reads the RELEASES: pop_v2 = pop_v1 + ingested
    // row-for-row, and the totals are the released tables' counts
    out1.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) + r.getLong(2), s"count law: $r") }
    val v1n = spark.read.parquet(Versioned.path(root, 1) + "/assign").count()
    val v2n = spark.read.parquet(Versioned.path(root, 2) + "/assign").count()
    assert(out1.map(_.getLong(1)).sum == v1n)
    assert(v2n == spark.read.parquet(s"$d/embeddings.parquet").count(),
      "v2 must hold the whole corpus (v1 + the ingested batch)")
    // the frozen quantizer travels with the release, bit-identically
    val s1 = spark.read.parquet(Versioned.path(root, 1) + "/seeds")
      .orderBy("cell").collect().map(_.toString).toSeq
    val s2 = spark.read.parquet(Versioned.path(root, 2) + "/seeds")
      .orderBy("cell").collect().map(_.toString).toSeq
    assert(s1.nonEmpty && s1 == s2)
  }

  test("ivf_publish reconciles column-for-column with the ingest audit") {
    // same split, same frozen seeds, same assignments — the publish
    // table must agree with e2_ivf_ingest's per-cell reading
    val pub = Similarity.e2IvfPublish(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ing = Similarity.e2IvfIngest(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pub.keySet == ing.keySet)
    pub.foreach { case (cell, v) =>
      assert(v == ing(cell), s"publish drifted from ingest at cell $cell") }
  }

  test("graph_search serves the released kNN graph, which builds once") {
    val root = Similarity.knnGraphRoot(d)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val out = Similarity.e2GraphSearch(spark, d)
    out.count()
    val v1 = Versioned.current(spark, root)
    assert(v1.isDefined, "first walk must release the edge graph")
    val again = Similarity.e2GraphSearch(spark, d)
    again.count()
    assert(Versioned.current(spark, root) == v1,
      "a second walk must NOT publish a new version")
    // the serving plan reads the released snapshot; the n·√n build (the
    // in-cell self-join + rank window + √n seed limit) runs in NO
    // serving plan — the only limits are the query sample and the
    // 2-row entry fetch
    val phys = again.queryExecution.executedPlan.toString
    assert(phys.contains("graft_knn_graph"),
      "walk must scan the standing edge release")
    val opt = again.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical
    // the only window allowed is the 2-row entry pick, partitioned by
    // the QUERY id — a corpus-keyed (vec_id) window would be the build's
    // rank sneaking back into serving
    val badWindows = opt.collect { case w: logical.Window
      if !w.partitionSpec.forall(_.references.toSeq
        .forall(_.name.startsWith("qid"))) => w }
    assert(badWindows.isEmpty,
      s"corpus-keyed window in the serving plan: $badWindows")
    val limits = opt.collect { case l: logical.GlobalLimit =>
      l.limitExpr.asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Literal].value }
    assert(limits.forall(_ == Similarity.AnnQueryK),
      s"serving plan re-derives build stages (limits: $limits)")
  }

  test("pq_serve answers exactly what the build-per-job ADC answers") {
    val root = Similarity.pqIndexRoot(d)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val served = Similarity.e2PqServe(spark, d).collect().map(_.toString)
    val built = Similarity.e2PqSearch(spark, d).collect().map(_.toString)
    assert(served.nonEmpty && served.toSeq == built.toSeq,
      "serve drifted from the in-plan ADC search")
    // build-once: the release committed once and a replay keeps it
    val v1 = graft.sources.Versioned.current(spark, root)
    assert(v1.isDefined)
    val again = Similarity.e2PqServe(spark, d)
    again.count()
    assert(graft.sources.Versioned.current(spark, root) == v1)
    // the serving plan scans the released codes — the corpus is touched
    // exactly once (the PqNQueries query fetch for the ADC tables'
    // full-precision side); a second embeddings scan would be the
    // encode stage sneaking back in
    val phys = again.queryExecution.executedPlan.toString
    assert(phys.contains("graft_pq_index"),
      "serve must scan the standing PQ release")
    assert(phys.split("embeddings\\.parquet").length - 1 <= 1,
      "serve plan re-encodes the corpus (second embeddings scan)")
  }

  test("knn release round-trips the build exactly (graph consumers agree)") {
    // the released directed edge set must be row-identical to what the
    // consumers would have built per job — parquet round-trips longs
    val rel = Similarity.standingKnnGraph(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mut = Similarity.knnEdges(spark, d)._2
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rel.nonEmpty && mut.subsetOf(rel))
    // mutuality law: e in mut ⇔ e in rel ∧ swap(e) in rel
    val want = rel.filter { case (a, b) => rel.contains((b, a)) }
    assert(mut == want)
  }
}
