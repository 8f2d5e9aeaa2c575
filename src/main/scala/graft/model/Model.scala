package graft.model

import java.time.Instant

/** Domain model for the batch/job control plane. Mirrors the reference's
  * domain layer (lime_etl/domain) as idiomatic Scala ADTs:
  *   - JobStatus sealed trait ← job_status.py:17-55
  *   - Result algebra         ← value_objects.py:165-228
  *   - validated value types  ← value_objects.py:43-551
  *   - injectable Clock       ← timestamp_adapter.py:14-33
  */
object Validate {
  /** Names are 3–200 chars (value_objects.py:297-314). */
  def name(s: String, what: String): String = {
    require(s != null && s.length >= 3 && s.length <= 200,
      s"$what must be 3-200 chars, got: ${Option(s).map(_.length)}")
    s
  }

  /** Ids are 32 alphanumeric chars (value_objects.py:231-257). */
  def id32(s: String): String = {
    require(s != null && s.length == 32 && s.forall(_.isLetterOrDigit),
      s"id must be 32 alphanumeric chars, got: $s")
    s
  }

  /** Log/error messages keep the LAST 2000 chars (value_objects.py:518-533 —
    * right-truncation, matching Python s[-2000:]). */
  def message(s: String): String =
    if (s == null) "" else if (s.length <= 2000) s else s.substring(s.length - 2000)

  def newId(): String = java.util.UUID.randomUUID.toString.replace("-", "")
}

/** Success/failure algebra (value_objects.py:165-228). */
sealed trait Result { def isSuccess: Boolean }
object Result {
  case object Success extends Result { val isSuccess = true }
  final case class Failure(message: String) extends Result { val isSuccess = false }
}

/** Job outcome ADT (job_status.py:17-55). */
sealed trait JobStatus
object JobStatus {
  case object Successful extends JobStatus
  final case class Failed(message: String) extends JobStatus
  final case class Skipped(reason: String) extends JobStatus
  case object InProgress extends JobStatus
}

/** Log levels (value_objects.py:472-478). */
sealed abstract class LogLevel(val name: String)
object LogLevel {
  case object Debug extends LogLevel("DEBUG")
  case object Info extends LogLevel("INFO")
  case object Error extends LogLevel("ERROR")
}

/** Injectable clock — the determinism seam every reference test uses
  * (timestamp_adapter.py:14-33). Never call Instant.now() outside this. */
trait Clock { def now(): Instant }
object Clock {
  object System extends Clock { def now(): Instant = Instant.now() }
  final case class Fixed(at: Instant) extends Clock { def now(): Instant = at }
}

/** One data-quality test outcome (job_test_result.py / SimpleJobTestResult). */
final case class JobTestResult(
    id: String,
    jobId: String,
    testName: String,
    passed: Boolean,
    failureMessage: Option[String],
    ts: Instant)

/** Per-job outcome (job_result.py). Skipped is NOT a failure
  * (job_result.py:80-84). */
final case class JobResult(
    id: String,
    batchId: String,
    jobName: String,
    status: JobStatus,
    executionMillis: Option[Long],
    testResults: Seq[JobTestResult],
    ts: Instant) {
  def isBroken: Boolean = status match {
    case JobStatus.Failed(_) => true
    case _                   => testResults.exists(!_.passed)
  }
  def skipped: Boolean = status.isInstanceOf[JobStatus.Skipped]
}

/** Batch outcome (batch_status.py). Invariants from batch_status.py:63-85:
  * a running batch has no millis/result; a finished one has both. */
final case class BatchStatus(
    id: String,
    name: String,
    jobResults: Seq[JobResult],
    executionMillis: Option[Long],
    errorMessage: Option[String],
    running: Boolean,
    ts: Instant) {
  require(!running || (executionMillis.isEmpty && errorMessage.isEmpty),
    "a running batch must not have execution results")
  def brokenJobs: Set[String] = jobResults.filter(_.isBroken).map(_.jobName).toSet
  def jobNames: Set[String] = jobResults.map(_.jobName).toSet
}

/** Regression report between consecutive runs (batch_delta.py:8-39).
  * Documented deviation: the reference returns current.broken_jobs from
  * newly_fixed_jobs when there is no previous run (batch_delta.py:27-32) —
  * a bug (jobs cannot be "fixed" with nothing to compare against); we
  * return the empty set. */
final case class BatchDelta(current: BatchStatus, previous: Option[BatchStatus]) {
  def commonJobs: Set[String] =
    previous.map(p => current.jobNames intersect p.jobNames).getOrElse(Set.empty)
  def newlyBrokenJobs: Set[String] =
    previous.map(p => current.brokenJobs diff p.brokenJobs)
      .getOrElse(current.brokenJobs)
  def newlyFixedJobs: Set[String] =
    previous.map(p => p.brokenJobs diff current.brokenJobs).getOrElse(Set.empty)
}
