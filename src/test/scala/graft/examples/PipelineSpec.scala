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
      "profile_corpus", "split_corpus"))
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
    // the near-dup pair table was PERSISTED as a table under the output
    // dir (the cluster-durable variant of the in-process memo) and holds
    // exactly the declared LSH pair set
    val pairsOnDisk = spark.read.parquet(s"$out/pairs")
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    val declared = graft.ops.Dedup.e1MinhashPairs(spark, TestSpark.sf001)
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(pairsOnDisk == declared)
    // write-once/read-many: a second materialization round-trips through
    // the existing table without rewriting it
    val dir = new java.io.File(s"$out/pairs")
    val mtimes = dir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    val again = graft.ops.Dedup
      .materializedPairTable(spark, TestSpark.sf001, s"$out/pairs")
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(again == declared)
    assert(dir.listFiles().map(f => f.getName -> f.lastModified()).toMap == mtimes,
      "existing pair table must not be rewritten")
    // the split table covers the published corpus exactly, and the
    // no-straddle invariant holds over the FULL persisted pair set (its
    // own data test asserted it; re-check independently here)
    val splits = spark.read.parquet(s"$out/splits")
    assert(splits.count() == nOut)
    val sMap = splits.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    pairsOnDisk.foreach { case (a, b) =>
      (sMap.get(a), sMap.get(b)) match {
        case (Some(x), Some(y)) => assert(x == y, s"pair ($a,$b) straddles")
        case _ => // an endpoint was curated away — nothing to leak
      }
    }
  }

  test("a checkpointed streaming ingest runs as a control-plane job") {
    // the production front door: the E4i fingerprint-dedup ingest
    // executed THROUGH the runner, so its cadence, retries, logging, and
    // data tests live in the same admin tables as the batch jobs — and a
    // re-run (same checkpoint) is an incremental no-op, not a re-ingest.
    import graft.streaming.StreamOps
    import org.apache.spark.sql.functions._
    val out = TestSpark.tmpDir("stream_job")
    val srcDir = s"$out/incoming"
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .withColumn("ingest_ts",
        expr("timestamp'2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND"))
    docs.write.mode("overwrite").parquet(srcDir)
    docs.write.mode("append").parquet(srcDir) // redelivery: corpus arrives twice
    val ingest = graft.model.SimpleJob("stream_ingest",
      runFn = (s, log) => {
        val q = StreamOps.streamFingerprintDedupToFiles(s, srcDir,
          s.read.parquet(srcDir).schema, s"$out/admitted", s"$out/ckpt")
        if (!q.awaitTermination(120000)) {
          q.stop(); log.error("ingest stream timed out")
          graft.model.JobStatus.Failed("stream timeout")
        } else { log.info("ingest caught up"); graft.model.JobStatus.Successful }
      },
      testFn = (s, _) => {
        val admitted = s.read.parquet(s"$out/admitted")
        val dup = admitted.groupBy("fp").count().filter(col("count") > 1).count()
        Seq(
          if (admitted.count() > 0) graft.model.SimpleTestResult.passing("admitted non-empty")
          else graft.model.SimpleTestResult.failing("admitted non-empty", "0 rows"),
          if (dup == 0) graft.model.SimpleTestResult.passing("one row per fingerprint")
          else graft.model.SimpleTestResult.failing("one row per fingerprint", s"$dup dup groups"))
      })
    val store = new AdminStore(spark, s"$out/admin")
    val batch = graft.model.Batch("streaming_ingest", Seq(ingest))
    val st1 = new BatchRunner(spark, store).run(batch)
    assert(st1.brokenJobs.isEmpty, s"broken: ${st1.brokenJobs}")
    val n1 = spark.read.parquet(s"$out/admitted").count()
    assert(n1 > 0)
    // second control-plane run with the same checkpoint: offsets are
    // committed, so nothing is re-ingested — exactly-once through the
    // runner, the property a scheduled 100 TB ingest leans on
    val st2 = new BatchRunner(spark, store).run(batch)
    assert(st2.brokenJobs.isEmpty, s"broken: ${st2.brokenJobs}")
    assert(spark.read.parquet(s"$out/admitted").count() == n1,
      "re-run with committed offsets must not re-ingest")
    assert(store.latestBatch("streaming_ingest").get
      .jobResults.flatMap(_.testResults).forall(_.passed))
  }
}
