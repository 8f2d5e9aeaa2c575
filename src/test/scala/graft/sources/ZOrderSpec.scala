package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: per-file min/max spans are what parquet footer pruning
  * skips on, so the test measures exactly those — a z-ordered write must
  * shrink BOTH filter columns' per-file spans simultaneously, which no
  * single-column sort can do. */
class ZOrderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def relSpans(dir: String, col1: String, col2: String,
      lo1: Long, w1: Double, w2: Double): (Double, Double, Long, Long) = {
    val per = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(col1)).as("a1"), max(col(col1)).as("b1"),
        min(col(col2)).as("a2"), max(col(col2)).as("b2"),
        count(lit(1)).as("n"))
      .collect()
    val s1 = per.map(r => (r.getAs[Long]("b1") - r.getAs[Long]("a1")) / w1)
    val s2 = per.map(r => (r.getAs[Long]("b2") - r.getAs[Long]("a2")) / w2)
    (s1.sum / s1.length, s2.sum / s2.length,
      per.map(_.getAs[Long]("n")).min, per.map(_.getAs[Long]("n")).max)
  }

  test("z-ordered files are hyper-rectangles: both key spans shrink, files stay balanced") {
    val li = graft.Tables.lineitem(spark, TestSpark.sf001)
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val (pMax, sMax) = (2000.0, 100.0)
    val bits = 8
    // pre-scale each key to the shared [0, 2^bits) grid — the recipe the
    // Scaladoc prescribes for unequal domains
    val pa = floor(col("l_partkey") * (1 << bits) / pMax)
    val sb = floor(col("l_suppkey") * (1 << bits) / sMax)

    val zDir = TestSpark.tmpDir("zorder")
    val linDir = TestSpark.tmpDir("linear")
    ZOrder.writeZOrdered(li, pa, sb, bits, 16, zDir)
    // the baseline every warehouse table starts from: clustered by a key
    // uncorrelated with the filter columns
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linDir)

    val (zp, zs, zMin, zMax) =
      relSpans(zDir, "l_partkey", "l_suppkey", 0, pMax, sMax)
    val (lp, ls, _, _) =
      relSpans(linDir, "l_partkey", "l_suppkey", 0, pMax, sMax)

    // linear layout: both spans ~ the full domain (no skipping possible)
    assert(lp > 0.8 && ls > 0.8, s"baseline should not cluster: $lp $ls")
    // 16 files = 4 z-bits = 2 splits per dimension: each file covers about
    // a quarter of EACH domain (plus curve-boundary slack)
    assert(zp < 0.45, s"partkey span must shrink: $zp vs linear $lp")
    assert(zs < 0.45, s"suppkey span must shrink: $zs vs linear $ls")
    // range partitioning on the sampled z keeps the files balanced
    assert(zMin * 3L >= zMax,
      s"file sizes unbalanced: min=$zMin max=$zMax")
  }

  test("zValue interleaves bits (locality: close points share high bits)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("a", "b")
      .withColumn("z", ZOrder.zValue(col("a"), col("b"), 8))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def morton(a: Long, b: Long): Long =
      (0 until 8).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i)))
    z.foreach { case ((a, b), got) =>
      assert(got == morton(a, b), s"z($a,$b)")
    }
    assert(z((255L, 255L)) == 65535L)
  }
}
