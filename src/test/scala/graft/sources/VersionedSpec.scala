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
}
