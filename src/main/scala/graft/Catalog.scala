package graft

import org.apache.spark.sql.SparkSession

/** Registers the fixture tables as temp views so the SQL entry point works
  * by table name (`spark.sql("SELECT ... FROM lineitem ...")`) — the same
  * names the DuckDB oracle uses, so ANSI-compatible oracle SQL runs on
  * BOTH engines. Events get the nanos→timestamp normalization from
  * Tables.events so SQL users see a plain timestamp column. */
object Catalog {
  /** The complete registered-view list (same names as the oracle gate's
    * table set — keep in sync with tools/check_oracle.py TABLES). */
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir)
               else Tables.table(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
}
