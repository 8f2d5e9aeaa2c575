package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 optimization pins: the native array<double> vector expressions
  * (vec_dot_d / vec_l2norm_d / vec_sqdist_d / vec_subsqdists_d / vec_adc_d)
  * must be BIT-IDENTICAL to the interpreted `aggregate(zip_with(...))` HOF
  * spellings they replaced in the hot e2/e5 paths — same index-ordered IEEE
  * fold, only the evaluation engine changes. Checked on the real fixture
  * embeddings (cast to double, the exact shape the call sites feed) so a
  * fold-order or accumulator-width mistake cannot hide behind friendly
  * values.
  */
class VectorExprSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  // corpus² double-array pairs off the fixture — every call-site shape
  private def pairs = {
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ed"))
      .limit(60)
    e.as("a").join(e.withColumnRenamed("vec_id", "oid")
      .withColumnRenamed("ed", "od").as("b"), col("vec_id") < col("oid"))
  }

  test("vec_dot_d ≡ aggregate(zip_with(a, b, *), 0.0D, +) bitwise") {
    val bad = pairs
      .withColumn("nat", Vectors.dotD(col("ed"), col("od")))
      .withColumn("hof", expr(
        "aggregate(zip_with(ed, od, (x, y) -> x * y), 0.0D, (p, q) -> p + q)"))
      .filter(expr("CAST(nat AS STRING) <> CAST(hof AS STRING)")).count()
    assert(bad == 0L)
  }

  test("vec_l2norm_d ≡ sqrt(aggregate(a, 0.0D, (acc, x) -> acc + x*x)) bitwise") {
    val bad = pairs.select(col("ed"))
      .withColumn("nat", Vectors.l2NormD(col("ed")))
      .withColumn("hof", expr(
        "sqrt(aggregate(ed, 0.0D, (a, x) -> a + x * x))"))
      .filter(expr("CAST(nat AS STRING) <> CAST(hof AS STRING)")).count()
    assert(bad == 0L)
    // and against the self-dot spelling rocchio used
    val bad2 = pairs.select(col("ed"))
      .withColumn("nat", Vectors.l2NormD(col("ed")))
      .withColumn("hof", expr(
        """sqrt(aggregate(zip_with(ed, ed, (x, y) -> x * y), 0.0D,
          |(p, q) -> p + q))""".stripMargin))
      .filter(expr("CAST(nat AS STRING) <> CAST(hof AS STRING)")).count()
    assert(bad2 == 0L)
  }

  test("vec_sqdist_d ≡ aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0D, +) bitwise") {
    val bad = pairs
      .withColumn("nat", Vectors.sqDistD(col("ed"), col("od")))
      .withColumn("hof", expr(
        """aggregate(zip_with(ed, od, (x, y) -> (x - y) * (x - y)),
          |0.0D, (p, q) -> p + q)""".stripMargin))
      .filter(expr("CAST(nat AS STRING) <> CAST(hof AS STRING)")).count()
    assert(bad == 0L)
  }

  test("vec_subsqdists_d ≡ the transform/slice HOF per-subspace distances bitwise") {
    val m = Similarity2.PqM; val dsub = Similarity2.PqDsub
    val bad = pairs
      .withColumn("nat", Vectors.subSqDistsD(col("ed"), col("od"), m, dsub))
      .withColumn("hof", expr(
        s"""transform(sequence(0, ${m - 1}), j ->
           |  aggregate(zip_with(slice(ed, j * $dsub + 1, $dsub),
           |                     slice(od, j * $dsub + 1, $dsub),
           |                     (x, y) -> (x - y) * (x - y)),
           |            0.0D, (p, q) -> p + q))""".stripMargin))
      .filter(expr("CAST(nat AS STRING) <> CAST(hof AS STRING)")).count()
    assert(bad == 0L)
  }

  test("vec_adc_d ≡ the sequence/element_at HOF lookup fold bitwise") {
    val m = Similarity2.PqM; val ksub = Similarity2.PqKsub
    // synthetic codes (deterministic from vec_id) + a lookup table built
    // from the embedding itself padded to m·ksub entries
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ed"))
      .withColumn("codes", expr(
        s"transform(sequence(0, ${m - 1}), j -> (vec_id + j) % $ksub)"))
      .withColumn("dt", expr(
        s"transform(sequence(0, ${m * ksub - 1}), i -> " +
          "element_at(ed, CAST(i % size(ed) AS INT) + 1) * (i + 1))"))
    val bad = rows
      .withColumn("nat", Vectors.adcDistD(col("codes"), col("dt"), m, ksub))
      .withColumn("hof", expr(
        s"""aggregate(sequence(0, ${m - 1}), 0.0D, (acc, j) ->
           |  acc + element_at(dt,
           |    CAST(j * $ksub + element_at(codes, j + 1) + 1 AS INT)))"""
          .stripMargin))
      .filter(expr("CAST(nat AS STRING) <> CAST(hof AS STRING)")).count()
    assert(bad == 0L)
  }
}

/** PQ geometry constants mirrored for the spec (the real ones are
  * private-package values in graft.ops.Similarity; a drift here fails the
  * subspace test rather than silently testing the wrong split). */
private object Similarity2 {
  val PqM: Int = graft.ops.Similarity.PqM
  val PqDsub: Int = graft.ops.Similarity.PqDsub
  val PqKsub: Int = graft.ops.Similarity.PqKsub
}
