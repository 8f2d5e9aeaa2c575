package graft

/** Local smoke driver: runs SparkEntry.entry the way the driver harness does
  * and prints the row count (must be > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"entry rows=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
