package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Versioned tables: immutable snapshots + atomic pointer swap. The
  * contract under test: readers always see a complete committed version,
  * old versions stay readable forever, rollback moves only the pointer. */
class VersionedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("write/readCurrent/read(v)/rollback round-trip") {
    val root = TestSpark.tmpDir("versioned")
    assert(Versioned.versions(spark, root).isEmpty)
    assert(Versioned.current(spark, root).isEmpty)

    val v1 = Versioned.write(Seq((1, "a"), (2, "b")).toDF("id", "x"), root)
    val v2 = Versioned.write(Seq((1, "a2"), (3, "c")).toDF("id", "x"), root)
    assert((v1, v2) == ((1, 2)))
    assert(Versioned.versions(spark, root) == Seq(1, 2))
    assert(Versioned.current(spark, root).contains(2))

    // live read = v2; pinned read = v1, unchanged by later writes
    assert(Versioned.readCurrent(spark, root).orderBy("id")
      .collect().map(_.getString(1)).toSeq == Seq("a2", "c"))
    assert(Versioned.read(spark, root, 1).orderBy("id")
      .collect().map(_.getString(1)).toSeq == Seq("a", "b"))

    // rollback is a pointer write: current flips, v2's data still there
    Versioned.setCurrent(spark, root, 1)
    assert(Versioned.readCurrent(spark, root).count() == 2)
    assert(Versioned.read(spark, root, 2).count() == 2)
    // a new write after rollback does NOT clobber v2 — versions only grow
    val v3 = Versioned.write(Seq((9, "z")).toDF("id", "x"), root)
    assert(v3 == 3 && Versioned.versions(spark, root) == Seq(1, 2, 3))
  }

  test("setCurrent refuses an unpublished version") {
    val root = TestSpark.tmpDir("versioned2")
    Versioned.write(Seq((1, "a")).toDF("id", "x"), root)
    intercept[IllegalArgumentException] {
      Versioned.setCurrent(spark, root, 7)
    }
  }

  test("publishOnce serializes the first release across concurrent writers") {
    val root = TestSpark.tmpDir("versioned3")
    val writes = new java.util.concurrent.atomic.AtomicInteger(0)
    // 4 threads race the same first release; exactly one write callback
    // may run, the rest must adopt the winner's committed pointer
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (1 to 4).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit =
            Versioned.publishOnce(spark, root) { dir =>
              writes.incrementAndGet()
              Thread.sleep(200) // widen the race window
              Seq((1, "a")).toDF("id", "x").write.parquet(dir)
            }
        })
      }
      futs.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(writes.get() == 1, s"release built ${writes.get()} times")
    assert(Versioned.current(spark, root).contains(1))
    assert(Versioned.readCurrent(spark, root).count() == 1)
  }

  test("publishOnce loser fails descriptively if the lock never clears") {
    val root = TestSpark.tmpDir("versioned4")
    // plant a foreign lock (a winner mid-build, or crashed): the loser
    // must WAIT then fail loud — never steal, never write alongside
    val f = new java.io.File(root); f.mkdirs()
    val lock = new java.io.File(f, "_BUILD_LOCK"); lock.createNewFile()
    val ex = intercept[IllegalStateException] {
      Versioned.publishOnce(spark, root, waitMs = 500) { dir =>
        Seq((1, "a")).toDF("id", "x").write.parquet(dir)
      }
    }
    assert(ex.getMessage.contains("_BUILD_LOCK"))
    assert(Versioned.versions(spark, root).isEmpty, "loser must not write")
    // the lock clearing (winner commit) unblocks the same call
    lock.delete()
    Versioned.publishOnce(spark, root) { dir =>
      Seq((1, "a")).toDF("id", "x").write.parquet(dir)
    }
    assert(Versioned.current(spark, root).contains(1))
  }

  test("publishAfter fires only at its pointer state (maintenance v+1 swap)") {
    val root = TestSpark.tmpDir("versioned5")
    Versioned.publishOnce(spark, root) { dir =>
      Seq((1, "a")).toDF("id", "x").write.parquet(dir) }
    var ran = 0
    Versioned.publishAfter(spark, root, 1) { dir =>
      ran += 1; Seq((1, "a"), (2, "b")).toDF("id", "x").write.parquet(dir) }
    assert(ran == 1 && Versioned.current(spark, root).contains(2))
    // idempotent: the pointer moved past 1, so a replay is a no-op
    Versioned.publishAfter(spark, root, 1) { _ => ran += 1 }
    assert(ran == 1 && Versioned.versions(spark, root) == Seq(1, 2))
    // v1 stays pinned and readable after the swap
    assert(Versioned.read(spark, root, 1).count() == 1)
    assert(Versioned.readCurrent(spark, root).count() == 2)
  }
}
