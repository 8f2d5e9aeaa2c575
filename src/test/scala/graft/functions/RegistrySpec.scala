package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class RegistrySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("native expressions are callable from SQL") {
    Seq(("hello world of spark", Array(1.0f, 2.0f))).toDF("t", "v")
      .createOrReplaceTempView("reg_probe")
    val row = spark.sql(
      """SELECT rolling_hash(t) AS rh, simhash64(t) AS sh,
        |size(char_ngrams(t, 3)) AS ncg, size(word_shingles(t, 2)) AS nws,
        |vec_dot(v, v) AS dd, vec_l2norm(v) AS nn,
        |size(minhash_sig(word_shingles(t, 2))) AS nsig,
        |hyperplane_sig(v, 4) AS hp,
        |size(word_shingle_hashes(t, 2)) AS nwsh,
        |size(minhash_sig_hashes(word_shingle_hashes(t, 2))) AS nsig2,
        |mix64(42L) AS mx,
        |size(band_hashes(minhash_sig(word_shingles(t, 2)), 4)) AS nbands
        |FROM reg_probe""".stripMargin).head()
    assert(row.getAs[Long]("rh") ==
      "hello world of spark".foldLeft(0L)((h, c) => (h * 131 + c) % 1000000007L))
    assert(row.getAs[Int]("ncg") == "hello world of spark".length - 2)
    assert(row.getAs[Int]("nws") == 3)
    assert(math.abs(row.getAs[Double]("dd") - 5.0) < 1e-9)
    assert(math.abs(row.getAs[Double]("nn") - math.sqrt(5.0)) < 1e-9)
    assert(row.getAs[Int]("nsig") == 64)
    assert(row.getAs[Long]("hp") >= 0 && row.getAs[Long]("hp") < 16)
    assert(row.getAs[Int]("nwsh") == 3)
    assert(row.getAs[Int]("nsig2") == 64)
    assert(row.getAs[Long]("mx") ==
      org.apache.spark.sql.graftext.minhashExpression.mix(42L))
    assert(row.getAs[Int]("nbands") == 16)
  }

  test("SQL and Column APIs agree") {
    val df = Seq("spark native engine test string").toDF("t")
    df.createOrReplaceTempView("reg_probe2")
    val viaSql = spark.sql("SELECT simhash64(t) FROM reg_probe2").head().getLong(0)
    val viaCol = df.select(Hashes.simHash($"t")).head().getLong(0)
    assert(viaSql == viaCol)
  }
}
