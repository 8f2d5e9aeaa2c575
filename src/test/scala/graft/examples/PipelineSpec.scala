package graft.examples

import graft.TestSpark
import graft.model.JobStatus
import graft.runner.BatchRunner
import graft.store.AdminStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("training-data curation batch runs end-to-end and curates the corpus") {
    val out = TestSpark.tmpDir("pipeline")
    val store = new AdminStore(spark, s"$out/admin")
    val status = new BatchRunner(spark, store)
      .run(TrainingDataPipeline.batch(TestSpark.sf001, out))
    assert(status.brokenJobs.isEmpty, s"broken: ${status.brokenJobs}")
    assert(status.jobResults.map(_.jobName) == Seq("dedup_documents",
      "quality_filter", "featurize", "chunk_pack", "publish_corpus",
      "profile_corpus"))
    assert(status.jobResults.forall(_.status == JobStatus.Successful))
    val corpus = spark.read.parquet(s"$out/corpus")
    val nIn = graft.Tables.documents(spark, TestSpark.sf001).count()
    val nOut = corpus.count()
    assert(nOut > 0 && nOut < nIn, s"expected curation to drop docs: $nOut of $nIn")
    // near-dup losers (jaccard >= 0.8, higher doc_id) are gone
    val losers = graft.ops.Dedup.e1NgramJaccard(spark, TestSpark.sf001)
      .filter(col("jaccard") >= 0.8).select("db").distinct()
    assert(corpus.join(losers, corpus("doc_id") === losers("db"), "left_semi")
      .count() == 0)
    // features present
    assert(corpus.columns.toSet.contains("fingerprint"))
    // chunk/pack tables: every curated doc is chunked, and the greedy
    // packing respects its overflow bound
    val chunks = spark.read.parquet(s"$out/chunks")
    assert(chunks.select("doc_id").distinct().count() == nOut)
    val worst = chunks.groupBy("source", "pack_id")
      .agg(sum(col("n_tokens")).as("t")).agg(max(col("t"))).head().getLong(0)
    assert(worst <= graft.ops.TextOps.PackBudget + graft.ops.TextOps.ChunkTokens - 1)
    // the published data-quality profile covers the corpus and agrees
    // with it (distinct doc_ids == corpus rows — the corpus is keyed)
    val prof = spark.read.parquet(s"$out/profile").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(prof("doc_id") == nOut, s"profile ${prof("doc_id")} != $nOut")
    // admin store recorded the run with passing tests
    val stored = store.latestBatch("training_data_curation").get
    assert(stored.jobResults.flatMap(_.testResults).forall(_.passed))
  }
}
