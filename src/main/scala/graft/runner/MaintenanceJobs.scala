package graft.runner

import graft.model._
import graft.sources.{Compaction, Versioned}
import org.apache.spark.sql.SparkSession

/** Table-maintenance jobs run through the control plane — the round-7
  * table-management primitives (compaction, versioned snapshots) wired
  * into the reference's admin-batch concept (`service/admin/
  * admin_batch.py`: storage-health work scheduled with the same cadence /
  * retry / logging / data-test machinery as ETL jobs). A 100 TB
  * deployment schedules one of these per hot table next to DeleteOldLogs.
  *
  * The rewrite publishes through [[Versioned]]'s two-phase commit: files
  * land in a staged snapshot directory, the pointer swap is the commit,
  * so readers of the table NEVER observe a half-compacted state and the
  * previous layout stays one `setCurrent` away (instant rollback if a
  * compaction proves bad). The job's data test is content conservation —
  * row count in the committed snapshot equals the source's — mirroring
  * DeleteOldLogs' verify-the-invariant test shape. */
final case class CompactTable(tableDir: String, versionRoot: String,
    targetBytes: Long, cadenceSeconds: Long = 0) extends JobSpec {
  val name = s"compact_table"
  override val minSecondsBetweenRefreshes: Long = cadenceSeconds

  def run(spark: SparkSession, logger: JobLogger): JobStatus = {
    val bins = Compaction.plan(spark, tableDir, targetBytes)
    val nFiles = bins.map(_.files.size).sum
    if (bins.length == nFiles) {
      logger.info(s"$tableDir already at $nFiles files for " +
        s"target $targetBytes bytes; nothing to compact.")
      JobStatus.Successful
    } else {
      val (v, dir) = Versioned.stage(spark, versionRoot)
      val report = Compaction.compact(spark, tableDir, dir, targetBytes)
      Versioned.setCurrent(spark, versionRoot, v)
      logger.info(s"Compacted $tableDir: ${report.filesBefore} files → " +
        s"${report.filesAfter} (v$v, ${report.rows} rows).")
      JobStatus.Successful
    }
  }

  override def test(spark: SparkSession, logger: JobLogger): Seq[SimpleTestResult] = {
    val src = spark.read.parquet(tableDir).count()
    val cur = Versioned.current(spark, versionRoot)
    val snap = cur.map(v => Versioned.read(spark, versionRoot, v).count())
    if (snap.forall(_ == src))
      Seq(SimpleTestResult.passing("Compacted snapshot conserves row count"))
    else
      Seq(SimpleTestResult.failing("Compacted snapshot conserves row count",
        s"source $src rows vs snapshot ${snap.get} (v${cur.get})"))
  }
}
