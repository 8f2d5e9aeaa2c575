package graft.model

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {
  private def js(name: String, broken: Boolean): JobResult =
    JobResult(Validate.newId(), "b" * 32, name,
      if (broken) JobStatus.Failed("boom") else JobStatus.Successful,
      Some(1), Nil, Instant.EPOCH)

  private def bs(name: String, jobs: Seq[JobResult]): BatchStatus =
    BatchStatus(Validate.newId(), name, jobs, Some(10), None, running = false,
      Instant.EPOCH)

  test("names must be 3-200 chars (value_objects.py:297-314)") {
    assertThrows[IllegalArgumentException](Validate.name("ab", "x"))
    assertThrows[IllegalArgumentException](Validate.name("a" * 201, "x"))
    assert(Validate.name("abc", "x") == "abc")
  }

  test("ids are 32 alphanumeric chars (value_objects.py:231-257)") {
    assert(Validate.id32(Validate.newId()).length == 32)
    assertThrows[IllegalArgumentException](Validate.id32("short"))
  }

  test("messages keep the LAST 2000 chars (value_objects.py:518-533)") {
    val m = "x" * 1999 + "TAIL"
    assert(Validate.message(m).length == 2000)
    assert(Validate.message(m).endsWith("TAIL"))
    assert(Validate.message("short") == "short")
  }

  test("running batch must not carry results (batch_status.py:63-85)") {
    assertThrows[IllegalArgumentException](
      BatchStatus("i" * 32, "b", Nil, Some(5), None, running = true, Instant.EPOCH))
  }

  test("skipped jobs are not broken (job_result.py:80-84)") {
    val r = JobResult("i" * 32, "b" * 32, "j1", JobStatus.Skipped("fresh"),
      None, Nil, Instant.EPOCH)
    assert(!r.isBroken && r.skipped)
  }

  test("test failures mark a job broken even when execution succeeded") {
    val t = JobTestResult("i" * 32, "j" * 32, "t1", passed = false,
      Some("bad"), Instant.EPOCH)
    val r = js("j1", broken = false).copy(testResults = Seq(t))
    assert(r.isBroken)
  }

  test("BatchDelta algebra (batch_delta.py:8-39)") {
    val prev = bs("nightly", Seq(js("a", true), js("b", false), js("c", true)))
    val cur = bs("nightly", Seq(js("a", false), js("b", true), js("c", true)))
    val d = BatchDelta(cur, Some(prev))
    assert(d.commonJobs == Set("a", "b", "c"))
    assert(d.newlyBrokenJobs == Set("b"))
    assert(d.newlyFixedJobs == Set("a"))
  }

  test("BatchDelta with no previous: newlyFixed is empty (documented deviation from batch_delta.py:27-32)") {
    val cur = bs("nightly", Seq(js("a", true)))
    val d = BatchDelta(cur, None)
    assert(d.newlyBrokenJobs == Set("a"))
    assert(d.newlyFixedJobs == Set.empty)
    assert(d.commonJobs == Set.empty)
  }
}
