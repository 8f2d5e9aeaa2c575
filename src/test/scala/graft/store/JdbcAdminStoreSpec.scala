package graft.store

import graft.TestSpark

/** The RDBMS backend (embedded Derby, which ships with Spark) run through
  * the same AdminStoreContract as the parquet store — reference parity
  * for the engine-URI deployment (batch_runner.py:57: SQLite in tests,
  * Postgres in production; here Derby in tests, any networked RDBMS via
  * the same URL seam). Plus the dispatch and transactional-rollback
  * checks only this backend needs. */
class JdbcAdminStoreSpec extends AdminStoreContract {
  JdbcAdminStoreSpec.init

  private def newUrl() =
    s"jdbc:derby:${TestSpark.tmpDir("adminjdbc")}/db;create=true"

  protected def newStore() = new JdbcAdminStore(TestSpark.spark, newUrl())

  test("AdminStoreApi.forUri dispatches jdbc: URIs to the RDBMS store") {
    val viaUri = AdminStoreApi.forUri(TestSpark.spark, newUrl())
    assert(viaUri.isInstanceOf[JdbcAdminStore])
    viaUri.appendBatches(Seq(batchRow("b1", "nightly", t("2024-01-01T00:00:00Z"))))
    assert(viaUri.latestBatch("nightly").isDefined)
    val viaDir = AdminStoreApi.forUri(TestSpark.spark, TestSpark.tmpDir("adminuri"))
    assert(viaDir.isInstanceOf[AdminStore])
  }

  test("a failed mutation rolls back atomically (no partial upsert)") {
    val st = newStore()
    st.appendBatches(Seq(
      batchRow("b1", "nightly", t("2024-01-01T00:00:00Z")),
      batchRow("b2", "weekly", t("2024-01-02T00:00:00Z"))))
    // upsert whose INSERT phase violates the PK (duplicate id within the
    // fresh rows): the preceding DELETE of b1 must not survive the abort
    intercept[java.sql.SQLException] {
      st.upsertBatches(Seq(
        batchRow("b1", "nightly", t("2024-01-03T00:00:00Z")),
        batchRow("b1", "nightly", t("2024-01-03T00:00:00Z"))))
    }
    val rows = st.batches.collect()
    assert(rows.length == 2, "rolled-back upsert must leave both rows")
    assert(st.latestBatch("nightly").get.ts == t("2024-01-01T00:00:00Z"))
  }
}

object JdbcAdminStoreSpec {
  /** Point Derby's engine home (derby.log) at a temp dir once, before the
    * first connection boots the engine. */
  lazy val init: Unit =
    System.setProperty("derby.system.home", TestSpark.tmpDir("derbyhome"))
}
