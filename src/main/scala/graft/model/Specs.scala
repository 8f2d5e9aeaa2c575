package graft.model

import org.apache.spark.sql.SparkSession

/** One data-quality assertion returned by JobSpec.test
  * (job_spec.py:56-61, simple_job_test_result.py). */
final case class SimpleTestResult(testName: String, failureMessage: Option[String]) {
  def passed: Boolean = failureMessage.isEmpty
}
object SimpleTestResult {
  def passing(name: String): SimpleTestResult = SimpleTestResult(name, None)
  def failing(name: String, msg: String): SimpleTestResult =
    SimpleTestResult(name, Some(msg))
}

/** Structured log sink passed to jobs (domain/job_logger.py:6-17). */
trait JobLogger {
  def debug(msg: String): Unit
  def info(msg: String): Unit
  def error(msg: String): Unit
  def exception(e: Throwable): Unit = error(Exceptions.render(e))
}

/** A named job: the user transformation surface (job_spec.py:18-79).
  * `run` composes DataFrame operations — that is where control crosses
  * driver → executors. Cadence/retry knobs mirror the reference defaults. */
trait JobSpec {
  def name: String
  def dependencies: Seq[String] = Nil
  def maxRetries: Int = 0
  /** Skip when seconds-since-last-success < this (strict > runs —
    * batch_runner.py:188-190). */
  def minSecondsBetweenRefreshes: Long = 0
  /** Re-test only when seconds-since-last-test >= this (>= compare —
    * batch_runner.py:423). */
  def minSecondsBetweenTests: Long = 0
  /** Enforced via job-group cancellation — a documented deviation: the
    * reference declares but never enforces it (job_spec.py:63-65). */
  def timeoutSeconds: Option[Long] = None
  def run(spark: SparkSession, logger: JobLogger): JobStatus
  def test(spark: SparkSession, logger: JobLogger): Seq[SimpleTestResult] = Nil
  /** Compensation hooks (job_spec.py:40-46; invoked batch_runner.py:294-321).
    * Returned substitute jobs re-run, recursion depth-capped by the runner
    * (the reference recurses unbounded). */
  def onExecutionError(errorMessage: String): Option[JobSpec] = None
  def onTestFailure(results: Seq[JobTestResult]): Option[JobSpec] = None
}

/** Constructor-driven JobSpec (SimpleJobSpec, job_spec.py:82-143). */
final case class SimpleJob(
    override val name: String,
    override val dependencies: Seq[String] = Nil,
    override val maxRetries: Int = 0,
    override val minSecondsBetweenRefreshes: Long = 0,
    override val minSecondsBetweenTests: Long = 0,
    override val timeoutSeconds: Option[Long] = None,
    runFn: (SparkSession, JobLogger) => JobStatus,
    testFn: (SparkSession, JobLogger) => Seq[SimpleTestResult] =
      (_, _) => Nil) extends JobSpec {
  Validate.name(name, "job name")
  def run(spark: SparkSession, logger: JobLogger): JobStatus = runFn(spark, logger)
  override def test(spark: SparkSession, logger: JobLogger): Seq[SimpleTestResult] =
    testFn(spark, logger)
}

/** A named unit of scheduling (batch_spec.py:23-77, create_batch:121-137). */
final case class Batch(
    name: String,
    jobs: Seq[JobSpec],
    skipTests: Boolean = false,
    timeoutSeconds: Option[Long] = None) {
  Validate.name(name, "batch name")
}

/** Typed runtime config (domain/cfg.py:8-20): `adminRoot` stands in for
  * the reference's admin_engine_uri — the parquet directory store IS the
  * admin database here; `adminSchema` maps to a subdirectory (the
  * reference's SchemaName("etl") default); retention default mirrors
  * DaysToKeep(3). Users extend this (the reference Config is an ABC) to
  * carry their own batch settings into BatchSpec.createUow. */
class GraftConfig(
    val adminRoot: String,
    val adminSchema: String = "etl",
    val daysLogsToKeep: Int = 3) {
  /** Directory the admin store lives in (uri + schema). */
  def adminPath: String = s"$adminRoot/$adminSchema"
}

/** Config-generic batch seam (BatchSpec[Cfg], batch_spec.py:23-77): a batch
  * parameterized by a typed per-batch config. `createUow(config)` builds
  * the user-resource handle — the reference's lime_uow UnitOfWork; here any
  * `Uow` type: connection pools, path roots, a warehouse catalog — and
  * `createJobs(uow)` builds the jobs against it, so every job closes over a
  * CONFIGURED resource instead of improvising its own. The runner
  * materializes the spec to a plain Batch and closes the uow when the run
  * finishes, successful or not (run_batch's `finally: batch_uow.close()`,
  * batch_runner.py:112). */
trait BatchSpec[Cfg] {
  /** The configured user-resource type jobs are built against
    * (create_uow's return type, batch_spec.py:38). */
  type Uow
  def name: String
  def createUow(config: Cfg): Uow
  def createJobs(uow: Uow): Seq[JobSpec]
  def skipTests: Boolean = false
  def timeoutSeconds: Option[Long] = None
  /** Resource teardown; invoked by the runner in a finally (the reference's
    * uow is a context manager — batch_runner.py:112). */
  def closeUow(uow: Uow): Unit = ()
}

/** Constructor-driven BatchSpec (BatchSpecImpl / create_batch,
  * batch_spec.py:80-137). */
final case class SimpleBatchSpec[Cfg, R](
    name: String,
    createUowFn: Cfg => R,
    createJobsFn: R => Seq[JobSpec],
    override val skipTests: Boolean = false,
    override val timeoutSeconds: Option[Long] = None,
    closeUowFn: R => Unit = (_: R) => ()) extends BatchSpec[Cfg] {
  Validate.name(name, "batch name")
  type Uow = R
  def createUow(config: Cfg): R = createUowFn(config)
  def createJobs(uow: R): Seq[JobSpec] = createJobsFn(uow)
  override def closeUow(uow: R): Unit = closeUowFn(uow)
}

object Exceptions {
  /** Exception → structured text: type, message, frames
    * (exceptions.py:98-134). */
  def render(e: Throwable): String = {
    val frames = e.getStackTrace.take(10)
      .map(f => s"  at ${f.getClassName}.${f.getMethodName}(${f.getFileName}:${f.getLineNumber})")
      .mkString("\n")
    Validate.message(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}\n$frames")
  }
}

final case class DuplicateJobNamesError(names: Map[String, Int]) extends RuntimeException(
  s"the following job names were included more than once: ${names.toSeq.sortBy(_._1).map { case (n, c) => s"$n ($c)" }.mkString(", ")}")

final case class DependencyErrors(errors: Seq[String]) extends RuntimeException(
  errors.sorted.mkString("; "))
