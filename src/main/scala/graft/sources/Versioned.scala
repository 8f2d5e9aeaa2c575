package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned-table layout: immutable snapshot directories plus an
  * atomically-swapped CURRENT pointer — the core mechanism (and the core
  * guarantee) of every table format's time travel, expressed over plain
  * parquet. Layout:
  *
  * {{{ root/v00001/part-*.parquet   — immutable snapshot
  *     root/_CURRENT               — one line: the live version number }}}
  *
  * Writers publish a NEW directory and then swap the pointer via
  * tmp+rename (the same single-object atomic-commit discipline as
  * streamMergeSink's snapshot swap); readers resolve the pointer once and
  * read an immutable directory, so a reader never observes a half-written
  * table no matter how the writer dies — crash before the swap leaves an
  * orphan directory, never a corrupt CURRENT. Old versions stay readable
  * (audit, rollback, reproducing yesterday's training run against
  * yesterday's corpus — the TESTDATA.md reproducibility story applied to
  * outputs). Everything here is METADATA-scale: version resolution is one
  * small-file read, rollback is one pointer write; no data files are
  * copied or rewritten, at any table size.
  *
  * Reference analogue: the admin store's append-only batch/job history
  * (`lime_etl/adapter/admin_session.py`) — run-over-run state with the
  * previous runs queryable — applied to published datasets. A real
  * deployment adds snapshot expiry (delete directories older than the
  * retention window — the DeleteOldLogs admin job pointed at versions). */
object Versioned {

  private def fs(s: SparkSession, root: String) =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def vdir(root: String, v: Int) = f"$root/v$v%05d"

  /** Directory of a pinned version — for multi-table snapshots whose
    * readers compose sub-paths (see [[currentPath]]). */
  def path(root: String, v: Int): String = vdir(root, v)

  /** All published versions, ascending (directories with a committed
    * pointer history; orphans from crashed writers are excluded by
    * convention of reading only ≤ current). */
  def versions(s: SparkSession, root: String): Seq[Int] = {
    val f = fs(s, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d{5}"))
      .map(_.getPath.getName.drop(1).toInt).sorted
  }

  /** The live version, if any. */
  def current(s: SparkSession, root: String): Option[Int] = {
    val f = fs(s, root)
    val cur = new Path(s"$root/_CURRENT")
    if (!f.exists(cur)) None
    else {
      val in = f.open(cur)
      try {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8"))
        Some(br.readLine().trim.toInt)
      } finally in.close()
    }
  }

  /** Publish `df` as the next version and swap the pointer. Returns the
    * new version number. */
  def write(df: DataFrame, root: String): Int = {
    val s = df.sparkSession
    val (next, dir) = stage(s, root)
    df.write.parquet(dir) // fails if the dir exists: no clobber
    setCurrent(s, root, next)
    next
  }

  /** Two-phase publish for writers that produce their own files (the
    * compaction rewrite, a streaming sink's epoch, an external tool):
    * `stage` allocates the next snapshot directory, the caller writes
    * into it, and `setCurrent(v)` is the commit — readers never see the
    * version until the pointer swaps, and a crashed writer leaves only an
    * uncommitted orphan directory. */
  def stage(s: SparkSession, root: String): (Int, String) = {
    val next = versions(s, root).lastOption.getOrElse(0) + 1
    (next, vdir(root, next))
  }

  /** Point the table at an existing version (rollback / roll-forward):
    * one atomic pointer write, no data movement. */
  def setCurrent(s: SparkSession, root: String, v: Int): Unit = {
    require(versions(s, root).contains(v), s"no such version $v")
    val f = fs(s, root)
    val tmp = new Path(s"$root/_CURRENT.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // FileContext rename-with-OVERWRITE is the atomic replace primitive
    // (plain FileSystem.rename refuses an existing destination)
    org.apache.hadoop.fs.FileContext
      .getFileContext(new Path(root).toUri,
        s.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(s"$root/_CURRENT"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Read a pinned version — immutable, so the plan is reproducible
    * forever (the "train against last Tuesday's corpus" read). */
  def read(s: SparkSession, root: String, v: Int): DataFrame =
    s.read.parquet(vdir(root, v))

  /** Directory of the live version — for MULTI-TABLE releases (an index
    * snapshot holding an assignment table AND its seed table) whose
    * readers compose their own sub-paths under the committed dir. */
  def currentPath(s: SparkSession, root: String): String = {
    val v = current(s, root).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    vdir(root, v)
  }

  /** Serialized FIRST publish of a root: exactly one caller builds, every
    * concurrent caller waits for the winner's commit. The pre-hardening
    * shape (bare `write` + catch-if-current) had two holes: (a) two
    * processes could both pass the staged-dir existence check before
    * either created it and then write INTERLEAVED part files into the
    * same snapshot via the Hadoop committer, and (b) a loser whose write
    * failed while the winner was still writing saw no _CURRENT at catch
    * time and rethrew — the exact race the catch claimed to tolerate.
    * Here the winner is chosen by an ATOMIC create-no-overwrite of
    * `_BUILD_LOCK` (the HDFS/posix single-object primitive, same class
    * as the _CURRENT tmp+rename): only the lock holder stages + writes +
    * commits, so a snapshot can never hold two writers' files; losers
    * poll for _CURRENT up to `waitMs` (sized by the caller to the build
    * cost) and then fail DESCRIPTIVELY — never steal, because a lock
    * older than the wait is indistinguishable from a winner mid-build
    * (the standing-index build is minutes at 1000×), and a stolen lock
    * re-opens hazard (a). A crashed winner leaves the lock + an orphan
    * dir and no pointer: the remedy is the printed manual unlock, the
    * same operator action every lock-file protocol bottoms out in.
    * No-op (one metadata read) when the root is already committed. */
  def publishOnce(s: SparkSession, root: String, waitMs: Long = 120000L)(
      write: String => Unit): Unit =
    publishAfter(s, root, 0, waitMs)(write)

  /** The general serialized-publish primitive behind [[publishOnce]]:
    * publish the next version IF the pointer currently reads `ifVersion`
    * (0 = uncommitted root). Concurrent callers with the same `ifVersion`
    * compute the same pure-function snapshot, so exactly one builds and
    * the rest adopt its pointer — the shape the index maintenance loop
    * (ingest → rebalance → publish v+1) shares with the first release. */
  /** Per-root in-process monitors: HDFS `create(overwrite=false)` is an
    * atomic winner-election primitive, but RawLocalFileSystem's is
    * check-then-create — two THREADS of one JVM can both win it. The
    * monitor serializes same-process callers (the common race: a query
    * map traversed concurrently); the lock file serializes processes. */
  private val publishMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def publishAfter(s: SparkSession, root: String, ifVersion: Int,
      waitMs: Long = 120000L)(write: String => Unit): Unit =
    publishMonitors.computeIfAbsent(root, _ => new Object).synchronized {
      publishAfterLocked(s, root, ifVersion, waitMs)(write)
    }

  private def publishAfterLocked(s: SparkSession, root: String, ifVersion: Int,
      waitMs: Long)(write: String => Unit): Unit = {
    def cur: Int = current(s, root).getOrElse(0)
    if (cur != ifVersion) return
    val f = fs(s, root)
    f.mkdirs(new Path(root))
    val lock = new Path(s"$root/_BUILD_LOCK")
    val won =
      try { f.create(lock, false).close(); true }
      catch { case _: Throwable => false }
    if (won) {
      try {
        if (cur == ifVersion) { // re-check under the lock
          val (v, dir) = stage(s, root)
          write(dir)
          setCurrent(s, root, v)
        }
      } finally f.delete(lock, false)
    } else {
      val deadline = System.nanoTime + waitMs * 1000000L
      while (cur == ifVersion && System.nanoTime < deadline)
        Thread.sleep(200)
      if (cur == ifVersion)
        throw new IllegalStateException(
          s"release build under $root held by another writer for >${waitMs}ms" +
            s" with no commit; if that writer crashed, delete $lock to retry")
    }
  }

  /** Read the live version. */
  def readCurrent(s: SparkSession, root: String): DataFrame = {
    val v = current(s, root).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))
    read(s, root, v)
  }
}
