package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet table directories — the maintenance
  * pass every long-lived 100 TB table needs (streaming sinks, incremental
  * merges, and per-batch appends all accrete files far below the ideal
  * scan unit; thousands of tiny files turn a scan into a metadata storm
  * and starve the row-group-level parallelism parquet readers want).
  * Same job as Delta's OPTIMIZE / Iceberg's rewrite_data_files, expressed
  * over plain parquet directories.
  *
  * `plan` is driver-side METADATA work (a file listing, exactly what any
  * table format's planner reads): first-fit-decreasing bin packing of
  * part-files into groups of ~`targetBytes` — FFD because it is within
  * 11/9·OPT+1 of optimal bin count and, more importantly here, never
  * splits a file. `compact` then rewrites each group as ONE output file;
  * every group rewrite is a distributed job over that group's files, and
  * groups are independent (a production run fans them out across the
  * cluster or runs table partitions concurrently — the loop below is
  * per-GROUP, never per-row, and group count ≈ output file count).
  *
  * Reference analogue: the retention/cleanup admin jobs
  * (`lime_etl/admin/delete_old_logs.py`) — storage-health maintenance run
  * through the same runner cadence machinery. Compaction preserves
  * CONTENT, not row order (parquet directories carry no order contract;
  * every declared query orders explicitly). */
object Compaction {

  /** One planned output file: the input part-files it merges and their
    * total byte size. */
  final case class Bin(files: Seq[String], bytes: Long)

  /** Compaction outcome for audit logging. */
  final case class Report(filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, rows: Long)

  /** First-fit-decreasing bin packing of the directory's part-files.
    * Files at or above `targetBytes` stay as singleton bins (rewriting
    * them buys nothing); the rest pack largest-first into the first bin
    * with room. Deterministic: files sort by (size desc, name). */
  def plan(s: SparkSession, dir: String, targetBytes: Long): Seq[Bin] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.toString, f.getLen))
      .sortBy { case (name, len) => (-len, name) }
    val bins = scala.collection.mutable.ArrayBuffer.empty[(scala.collection.mutable.ArrayBuffer[String], Long)]
    parts.foreach { case (name, len) =>
      bins.indexWhere { case (_, used) => used + len <= targetBytes } match {
        case -1 => bins += ((scala.collection.mutable.ArrayBuffer(name), len))
        case i  =>
          val (fsb, used) = bins(i)
          fsb += name
          bins(i) = (fsb, used + len)
      }
    }
    bins.map { case (fsb, used) => Bin(fsb.toSeq, used) }.toSeq
  }

  /** Rewrite `dir` into `out` with ~targetBytes files: one parquet file
    * per planned bin (single-file bins copy through unchanged content).
    * Returns the audit report; row count is conserved by construction
    * (each input file lands in exactly one bin). */
  def compact(s: SparkSession, dir: String, out: String,
      targetBytes: Long): Report = {
    val bins = plan(s, dir, targetBytes)
    bins.zipWithIndex.foreach { case (bin, i) =>
      s.read.parquet(bin.files: _*).coalesce(1)
        .write.mode(if (i == 0) SaveMode.Overwrite else SaveMode.Append)
        .parquet(out)
    }
    val outP = new Path(out)
    val fs = outP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val after = fs.listStatus(outP)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    Report(
      filesBefore = bins.map(_.files.size).sum,
      filesAfter = after,
      bytesBefore = bins.map(_.bytes).sum,
      rows = s.read.parquet(out).count())
  }
}
