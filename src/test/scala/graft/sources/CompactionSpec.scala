package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction must conserve content exactly while collapsing the file
  * count toward bytes/target; the plan must never split a file and never
  * overfill a bin with more than one file's slack. */
class CompactionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("compact: content conserved, file count collapses, bins respect target") {
    val dir = TestSpark.tmpDir("compact_in")
    val out = TestSpark.tmpDir("compact_out")
    // a streaming-sink-shaped mess: 40 small part files
    spark.range(0, 20000).select(col("id"),
        (col("id") % 97).as("k"), md5(col("id").cast("string")).as("payload"))
      .repartition(40)
      .write.mode("overwrite").parquet(dir)
    val filesBefore = new java.io.File(dir).listFiles
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(filesBefore == 40)

    val target = 256L * 1024 // ~5 input files per bin at this row size
    val bins = Compaction.plan(spark, dir, target)
    // plan covers every file exactly once
    assert(bins.flatMap(_.files).length == filesBefore)
    assert(bins.flatMap(_.files).distinct.length == filesBefore)
    // no bin over target unless it is a single oversized file
    bins.foreach(b => assert(b.bytes <= target || b.files.length == 1,
      s"overfull multi-file bin: ${b.bytes}"))

    val report = Compaction.compact(spark, dir, out, target)
    assert(report.filesBefore == filesBefore)
    assert(report.filesAfter == bins.length)
    assert(report.filesAfter < filesBefore / 3,
      s"expected real collapse, got ${report.filesAfter}")
    assert(report.rows == 20000L)
    // content equality, not just counts
    val a = spark.read.parquet(dir).orderBy("id").collect()
    val b = spark.read.parquet(out).orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("plan: an oversized file stays a singleton bin, small files pack FFD") {
    val dir = TestSpark.tmpDir("compact_big")
    // one big file + several small ones
    spark.range(0, 50000).select(col("id"), md5(col("id").cast("string")).as("p"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    spark.range(50000, 50300).select(col("id"), md5(col("id").cast("string")).as("p"))
      .repartition(6).write.mode("append").parquet(dir)
    val sizes = new java.io.File(dir).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length)
    val target = sizes.max - 1 // big file alone exceeds the target
    val bins = Compaction.plan(spark, dir, target)
    assert(bins.exists(b => b.files.length == 1 && b.bytes >= target))
    // the small files don't each get their own bin
    assert(bins.length < sizes.length)
  }
}
