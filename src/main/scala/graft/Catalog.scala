package graft

import org.apache.spark.sql.SparkSession

/** Registers the fixture tables as temp views so the SQL entry point works
  * by table name (`spark.sql("SELECT ... FROM lineitem ...")`) — the same
  * names the DuckDB oracle uses, so ANSI-compatible oracle SQL runs on
  * BOTH engines. Events get the nanos→timestamp normalization from
  * Tables.events so SQL users see a plain timestamp column. */
object Catalog {
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "documents", "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach(t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }
}
