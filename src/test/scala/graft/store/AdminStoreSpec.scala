package graft.store

import java.time.Instant

import graft.TestSpark
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class AdminStoreSpec extends AnyFunSuite {
  private def t(s: String) = Instant.parse(s)
  private def newStore() = new AdminStore(TestSpark.spark, TestSpark.tmpDir("admin"))

  private def batchRow(id: String, name: String, ts: Instant,
      running: Boolean = false): BatchRow =
    BatchRow(id.padTo(32, '0'), name, if (running) None else Some(5L),
      if (running) None else Some(false), None, running, ts)

  test("append + fresh read") {
    val st = newStore()
    st.appendBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:00:00Z"))))
    st.appendBatches(Seq(batchRow("b2", "nightly", t("2024-01-02T00:00:00Z"))))
    assert(st.batches.count() == 2)
  }

  test("upsert replaces by id, keeps the rest (test_batch_repository.py:60-102)") {
    val st = newStore()
    st.appendBatches(Seq(
      batchRow("b1", "nightly", t("2024-01-01T00:00:00Z"), running = true),
      batchRow("b2", "weekly", t("2024-01-01T06:00:00Z"))))
    st.upsertBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:05:00Z"))))
    val rows = st.batches.collect().sortBy(_.id)
    assert(rows.length == 2)
    val b1 = rows.find(_.id.startsWith("b1")).get
    assert(!b1.running && b1.execution_millis.contains(5L))
    assert(rows.exists(_.name == "weekly"))
  }

  test("latest / previous by ts with OFFSET-1 semantics (sqlalchemy_batch_repository.py:47-86)") {
    val st = newStore()
    st.appendBatches(Seq(
      batchRow("b1", "nightly", t("2024-01-01T00:00:00Z")),
      batchRow("b2", "nightly", t("2024-01-02T00:00:00Z")),
      batchRow("b3", "NIGHTLY", t("2024-01-03T00:00:00Z")),
      batchRow("zz", "other", t("2024-01-09T00:00:00Z"))))
    // case-insensitive name match (ilike without wildcards)
    assert(st.latestBatch("Nightly").get.id.startsWith("b3"))
    assert(st.previousBatch("nightly").get.id.startsWith("b2"))
    assert(st.latestBatch("absent").isEmpty)
  }

  test("lastSuccessfulTs filters running/skipped/failed (sqlalchemy_job_repository.py:67-82)") {
    val st = newStore()
    def job(id: String, ts: Instant, running: Boolean = false,
        skipped: Boolean = false, failed: Boolean = false) =
      JobRow(id.padTo(32, '0'), "b".padTo(32, '0'), "etl_job",
        Some(1L), Some(failed), None, running, skipped, None, ts)
    st.appendJobs(Seq(
      job("j1", t("2024-01-01T00:00:00Z")),
      job("j2", t("2024-01-05T00:00:00Z"), failed = true),
      job("j3", t("2024-01-06T00:00:00Z"), skipped = true),
      job("j4", t("2024-01-07T00:00:00Z"), running = true)))
    assert(st.lastSuccessfulTs("ETL_JOB").contains(t("2024-01-01T00:00:00Z")))
    assert(st.lastSuccessfulTs("nope").isEmpty)
  }

  test("retention delete + earliest ts (delete_old_entries / get_earliest)") {
    val st = newStore()
    def log(id: String, ts: Instant) =
      LogRow(id.padTo(32, '0'), "b".padTo(32, '0'), "INFO", "m", ts)
    st.appendBatchLog(Seq(log("l1", t("2024-01-01T00:00:00Z")),
      log("l2", t("2024-01-05T00:00:00Z")), log("l3", t("2024-01-09T00:00:00Z"))))
    val n = st.deleteOlderThan(st.BATCH_LOG, t("2024-01-05T00:00:00Z"))
    assert(n == 1)
    assert(st.batchLog.count() == 2)
    assert(st.earliestBatchLogTs.contains(t("2024-01-05T00:00:00Z")))
    // idempotent when nothing qualifies
    assert(st.deleteOlderThan(st.BATCH_LOG, t("2024-01-05T00:00:00Z")) == 0)
  }

  test("cascade delete of batches removes child jobs and tests (sqlalchemy_batch_repository.py:31-41)") {
    val st = newStore()
    st.appendBatches(Seq(
      batchRow("b1", "nightly", t("2024-01-01T00:00:00Z")),
      batchRow("b2", "nightly", t("2024-01-05T00:00:00Z"))))
    st.appendJobs(Seq(
      JobRow("j1".padTo(32, '0'), "b1".padTo(32, '0'), "job_one", Some(1L),
        Some(false), None, running = false, skipped = false, None,
        t("2024-01-01T00:00:00Z")),
      JobRow("j2".padTo(32, '0'), "b2".padTo(32, '0'), "job_one", Some(1L),
        Some(false), None, running = false, skipped = false, None,
        t("2024-01-05T00:00:00Z"))))
    st.appendJobTests(Seq(JobTestRow("t1".padTo(32, '0'), "j1".padTo(32, '0'),
      "check", test_passed = true, None, t("2024-01-01T00:00:00Z"))))
    val n = st.deleteBatchesOlderThan(t("2024-01-02T00:00:00Z"))
    assert(n == 1)
    assert(st.batches.count() == 1)
    assert(st.jobs.collect().forall(_.batch_id.startsWith("b2")))
    assert(st.jobTestResults.count() == 0)
  }

  test("swapWrite survives a stale .old backup from a simulated crash") {
    val st = newStore()
    st.appendBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:00:00Z"))))
    // simulate a crash that left the set-aside copy behind
    val stale = new java.io.File(s"${st.root}/batches.old/junk")
    stale.getParentFile.mkdirs()
    java.nio.file.Files.writeString(stale.toPath, "leftover")
    // the next rewrite must clean it up and swap normally
    st.upsertBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:05:00Z"))))
    assert(!stale.getParentFile.exists(), "stale .old dir must be removed")
    assert(st.batches.count() == 1)
    assert(st.latestBatch("nightly").get.executionMillis.contains(5L))
  }

  test("swapWrite garbage-collects orphaned .tmp dirs from prior crashes") {
    val st = newStore()
    st.appendBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:00:00Z"))))
    // simulate crash debris: uniquely-named tmp dirs a failed/interrupted
    // swap left behind (these are never reused, so only a sweep removes them)
    val root = new java.io.File(st.root)
    val junk1 = new java.io.File(root, "batches.tmp111/part-junk")
    val junk2 = new java.io.File(root, "batches.tmp222/part-junk")
    Seq(junk1, junk2).foreach { f =>
      f.getParentFile.mkdirs()
      java.nio.file.Files.writeString(f.toPath, "dead")
    }
    st.upsertBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:05:00Z"))))
    val leftover = root.listFiles().map(_.getName).filter(_.startsWith("batches.tmp"))
    assert(leftover.isEmpty, s"orphaned tmp dirs not collected: ${leftover.mkString(",")}")
    assert(st.batches.count() == 1)
  }

  test("crash between swap renames is recovered: .old restores as the live table") {
    val st = newStore()
    st.appendBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:00:00Z"))))
    st.upsertBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:05:00Z"))))
    // simulate a crash AFTER dst -> .old but BEFORE tmp -> dst: the live
    // dir is gone and only the backup generation remains
    val live = new java.io.File(s"${st.root}/batches")
    val old = new java.io.File(s"${st.root}/batches.old")
    assert(live.renameTo(old))
    // any read must transparently restore the backup — no history lost
    assert(st.batches.count() == 1)
    assert(st.latestBatch("nightly").get.executionMillis.contains(5L))
    assert(live.exists() && !old.exists())
  }

  test("upsert rewrite cost stays ~flat as the jobs table grows to 1,000 rows") {
    // The store's upsert is an O(table) parquet rewrite (AdminStore.scala
    // swapWrite) — acceptable because admin tables are BOOKKEEPING, bounded
    // by jobs-per-day x retention, not by data volume. This quantifies the
    // claim: the per-upsert wall time at 1,000 resident rows must stay
    // within a small factor of the time at 100 rows (fixed costs dominate:
    // plan + task launch + one tiny file). Generous 5x bound to stay
    // CI-stable; measured values are printed for the record.
    val st = newStore()
    def jobRows(from: Int, n: Int): Seq[JobRow] = (from until from + n).map(i =>
      JobRow(f"j$i%030d", f"b$i%030d", s"job_$i", Some(1L), Some(false), None,
        running = false, skipped = false, None,
        t("2024-01-01T00:00:00Z").plusSeconds(i.toLong)))
    def timeUpserts(reps: Int): Double = {
      val t0 = System.nanoTime()
      (0 until reps).foreach { r =>
        st.upsertJobs(Seq(jobRows(r, 1).head.copy(execution_millis = Some(2L))))
      }
      (System.nanoTime() - t0) / 1e9 / reps
    }
    st.appendJobs(jobRows(0, 100))
    timeUpserts(2) // warm the write path before measuring
    val at100 = timeUpserts(5)
    st.appendJobs(jobRows(100, 900))
    assert(st.jobs.count() == 1000)
    val at1000 = timeUpserts(5)
    info(f"per-upsert: ${at100 * 1000}%.0f ms @100 rows, ${at1000 * 1000}%.0f ms @1000 rows")
    assert(at1000 < at100 * 5 + 0.2,
      f"upsert cost grew superlinearly: ${at100}%.3fs @100 -> ${at1000}%.3fs @1000")
    // correctness after the churn: upserted rows replaced, not duplicated
    assert(st.jobs.count() == 1000)
    assert(st.jobs.filter(_.execution_millis.contains(2L)).count() >= 5)
  }

  test("writer lock: a root locked by another process rejects writes until reclaimed") {
    val root = TestSpark.tmpDir("adminlock")
    val st = new AdminStore(TestSpark.spark, root)
    // simulate a FOREIGN process holding the root: its _LOCK with its token
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "_LOCK"), "other-process-token")
    val err = intercept[IllegalStateException] {
      st.appendBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:00:00Z"))))
    }
    assert(err.getMessage.contains("locked by another writer process"))
    assert(!st.batches.collect().exists(_.name == "nightly")) // nothing landed
    // operator reclaims the crashed writer's lock -> writes flow again
    AdminStore.forceUnlock(TestSpark.spark, root)
    st.appendBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:00:00Z"))))
    assert(st.batches.count() == 1)
    // our own lock file now exists and carries this process's hold
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_LOCK")))
    // a SECOND in-process store on the same root shares the hold: no error
    val st2 = new AdminStore(TestSpark.spark, root)
    st2.appendBatches(Seq(batchRow("b2", "nightly", t("2024-01-02T00:00:00Z"))))
    assert(st.batches.count() == 2)
    // close releases the file; the next write re-acquires cleanly
    st.close()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_LOCK")))
    st2.appendBatches(Seq(batchRow("b3", "nightly", t("2024-01-03T00:00:00Z"))))
    assert(st.batches.count() == 3)
  }

  test("writer lock diagnostics: holder token, process, and age surface to the operator") {
    val root = TestSpark.tmpDir("adminlockinfo")
    val st = new AdminStore(TestSpark.spark, root)
    // a foreign holder with the full 3-line payload, acquired 2 min ago
    val acquired = Instant.now().minusSeconds(120)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "_LOCK"),
      s"other-process-token\n$acquired\n12345@otherhost")
    val err = intercept[IllegalStateException] {
      st.appendBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:00:00Z"))))
    }
    // the message carries everything the operator needs to judge staleness
    assert(err.getMessage.contains("other-process-token"))
    assert(err.getMessage.contains("12345@otherhost"))
    assert(err.getMessage.contains("s ago"))
    // the probe API exposes the same parsed view
    val holder = AdminStore.lockHolder(TestSpark.spark, root).get
    assert(holder.token == "other-process-token")
    assert(holder.acquiredAt.contains(acquired))
    assert(holder.process.contains("12345@otherhost"))
    // legacy single-line lock files still parse (token-only)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "_LOCK"), "bare-token")
    val bare = AdminStore.lockHolder(TestSpark.spark, root).get
    assert(bare.token == "bare-token" && bare.acquiredAt.isEmpty)
    AdminStore.forceUnlock(TestSpark.spark, root)
    assert(AdminStore.lockHolder(TestSpark.spark, root).isEmpty)
  }

  test("crash-restore triggered by a reader releases the writer lock afterwards") {
    val root = TestSpark.tmpDir("adminreadrestore")
    val st = new AdminStore(TestSpark.spark, root)
    st.appendBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:00:00Z"))))
    st.close()
    // simulate a crash mid-swap: live dir missing, .old backup present
    java.nio.file.Files.move(
      java.nio.file.Paths.get(root, "batches"),
      java.nio.file.Paths.get(root, "batches.old"))
    val reader = new AdminStore(TestSpark.spark, root)
    assert(reader.batches.count() == 1) // restored through the read gate
    // the transient hold taken for the restore is gone: the legitimate
    // writer process is not locked out by a mere reader
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_LOCK")))
  }

  test("hydrate reconstructs nested status from flat tables (admin_orm.py:105-129)") {
    val st = newStore()
    st.appendBatches(Seq(batchRow("b1", "nightly", t("2024-01-02T00:00:00Z"))))
    st.appendJobs(Seq(JobRow("j1".padTo(32, '0'), "b1".padTo(32, '0'), "job_one",
      Some(3L), Some(false), None, running = false, skipped = false, None,
      t("2024-01-02T00:00:00Z"))))
    st.appendJobTests(Seq(JobTestRow("t1".padTo(32, '0'), "j1".padTo(32, '0'),
      "rowcount", test_passed = false, Some("0 rows"), t("2024-01-02T00:00:00Z"))))
    val b = st.latestBatch("nightly").get
    assert(b.jobResults.map(_.jobName) == Seq("job_one"))
    assert(b.jobResults.head.testResults.map(_.testName) == Seq("rowcount"))
    assert(b.brokenJobs == Set("job_one")) // broken via failed test
  }
}
