package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftext._

/** Registers the native expressions with the session function registry so
  * the SQL surface can use them (`SELECT rolling_hash(text) FROM ...`),
  * mirroring the Column API in Hashes/Ngrams/Vectors. */
object Registry {
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what expects a literal int, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("rolling_hash",
      exprs => RollingHashExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64Expr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => DotProductExpr(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_l2norm",
      exprs => L2NormExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSigExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("char_ngrams",
      exprs => CharNgramsExpr(exprs(0), intArg(exprs(1), "char_ngrams(n)")),
      "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShinglesExpr(exprs(0), intArg(exprs(1), "word_shingles(n)")),
      "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_sig",
      exprs => HyperplaneSigExpr(exprs(0), intArg(exprs(1), "hyperplane_sig(n)")),
      "scala_udf")
    reg.createOrReplaceTempFunction("word_shingle_hashes",
      exprs => WordShingleHashesExpr(exprs(0),
        intArg(exprs(1), "word_shingle_hashes(n)")), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig_hashes",
      exprs => MinHashSigLongsExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("mix64",
      exprs => Mix64Expr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("band_hashes",
      exprs => BandHashesExpr(exprs(0), intArg(exprs(1), "band_hashes(n)")),
      "scala_udf")
  }
}
