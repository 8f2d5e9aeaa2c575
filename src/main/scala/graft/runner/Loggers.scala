package graft.runner

import scala.collection.mutable.ListBuffer

import graft.model._
import graft.store.{AdminStoreApi, LogRow}

/** Buffered structured loggers. The reference commits one DB row per log
  * call (sqlalchemy_job_logger.py:31-43) — durable but pathological as one
  * parquet file per message. We keep the durability *intent* by flushing at
  * job/batch boundaries and from failure paths (runner calls flush() in
  * `finally`), while writing one file per flush. */
abstract class BufferedLogger(clock: Clock, console: Boolean) extends JobLogger {
  private val buf = ListBuffer.empty[LogRow]
  protected def parentId: String

  private def log(level: LogLevel, msg: String): Unit = synchronized {
    val m = Validate.message(msg)
    buf += LogRow(Validate.newId(), parentId, level.name, m, clock.now())
    if (console) println(s"${clock.now()} [${level.name}] $m")
  }
  def debug(msg: String): Unit = log(LogLevel.Debug, msg)
  def info(msg: String): Unit = log(LogLevel.Info, msg)
  def error(msg: String): Unit = log(LogLevel.Error, msg)

  protected def write(store: AdminStoreApi, rows: Seq[LogRow]): Unit
  def flush(store: AdminStoreApi): Unit = synchronized {
    if (buf.nonEmpty) { write(store, buf.toSeq); buf.clear() }
  }
}

final class BatchLogger(val parentId: String, clock: Clock, console: Boolean)
    extends BufferedLogger(clock, console) {
  protected def write(store: AdminStoreApi, rows: Seq[LogRow]): Unit =
    store.appendBatchLog(rows)
}

final class JobSinkLogger(val parentId: String, clock: Clock, console: Boolean)
    extends BufferedLogger(clock, console) {
  protected def write(store: AdminStoreApi, rows: Seq[LogRow]): Unit =
    store.appendJobLog(rows)
}
