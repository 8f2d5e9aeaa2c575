package graft.store

import java.time.Instant

import graft.TestSpark

/** Parquet-directory backend: the shared AdminStoreContract plus the
  * durability mechanics only this backend has — swap-rename crash
  * recovery and the cross-process writer lock (an RDBMS backend gets
  * both from its database). */
class AdminStoreSpec extends AdminStoreContract {
  protected def newStore() =
    new AdminStore(TestSpark.spark, TestSpark.tmpDir("admin"))
  private def newParquetStore(): AdminStore =
    new AdminStore(TestSpark.spark, TestSpark.tmpDir("admin"))

  test("swapWrite survives a stale .old backup from a simulated crash") {
    val st = newParquetStore()
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
    val st = newParquetStore()
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
    val st = newParquetStore()
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
}
