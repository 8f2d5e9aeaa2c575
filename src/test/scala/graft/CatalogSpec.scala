package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL entry point: tables registered by name, ANSI oracle SQL runs on
  * Spark and matches the declared DataFrame queries. */
class CatalogSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("registered views serve spark.sql by oracle table names") {
    Catalog.registerAll(spark, TestSpark.sf001)
    // the q19_agg oracle is plain ANSI — the SAME string the DuckDB gate
    // runs must produce the DataFrame query's result through spark.sql
    val viaSql = spark.sql(SparkEntry.oracleSql("q19_agg"))
      .collect().map(_.toSeq)
    val viaDf = ops.Relational.q19Agg(spark, TestSpark.sf001)
      .collect().map(_.toSeq)
    assert(viaSql.nonEmpty && viaSql.toSeq == viaDf.toSeq)
    // events view carries the normalized timestamp column
    val tsType = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts")
    assert(tsType.dataType.typeName == "timestamp")
  }
}
