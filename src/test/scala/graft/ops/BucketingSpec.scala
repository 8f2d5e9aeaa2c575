package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-location: the storage-level answer to REPEATED large
  * joins/aggregations on the same key. Writing both sides bucketed (and
  * sorted) on the join key lets every later join consume the on-disk
  * hash-distribution directly — zero shuffle, zero sort at read time. At
  * 100 TB this converts the recurring fact⋈dim or fact⋈fact join from a
  * full-corpus exchange per run into a pure partition-local merge; the
  * write-side cost is paid once. (The declared queries keep explicit
  * shuffles because the driver fixtures are plain parquet; this spec pins
  * the bucketed path end-to-end so the library's co-location story is
  * tested, not just documented.) */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("bucketed tables join and pre-aggregate with zero exchanges") {
    val wh = TestSpark.tmpDir("bucketed")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // repartition on the bucket key first: shuffle hash and bucket hash
    // are both Murmur3, so each writer task holds exactly one bucket and
    // each bucket lands in ONE file — the precondition for Spark to trust
    // the sortBy order at read time (multi-file buckets re-sort)
    graft.Tables.orders(spark, TestSpark.sf001)
      .repartition(8, col("o_custkey"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    graft.Tables.customer(spark, TestSpark.sf001)
      .repartition(8, col("c_custkey"))
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").saveAsTable("b_customer")
    try {
      // broadcast off: with it on, the dim side would broadcast and the
      // exchange question this spec pins would never arise
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val j = spark.table("b_orders").join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        val n = j.collect().length
        val plan = j.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        // same bucket count on the same key on both sides: the sort-merge
        // join reads each bucket pair directly — no exchange. (A
        // partition-local Sort remains: since SPARK-28595 bucketed scans
        // don't propagate their sortBy order unless the legacy flag below
        // opts in; the EXCHANGE is the 100 TB cost, the local sort of
        // pre-sorted runs is a cheap streaming pass.)
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed join still shuffled:\n$plan")
        // with one file per bucket and the opt-in flag, the read order is
        // trusted and even the local sorts disappear
        withConf("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") {
          val j2 = spark.table("b_orders").join(spark.table("b_customer"),
            col("o_custkey") === col("c_custkey"))
          j2.collect()
          val plan2 = j2.queryExecution.executedPlan.toString
            .split("== Initial Plan ==")(0)
          assert(!plan2.contains("Exchange") && !plan2.contains("Sort "),
            s"bucketed+sorted join still sorted/shuffled at read:\n$plan2")
        }
        // and the result is the same join, not a different one
        val expect = graft.Tables.orders(spark, TestSpark.sf001)
          .join(graft.Tables.customer(spark, TestSpark.sf001),
            col("o_custkey") === col("c_custkey")).count()
        assert(n.toLong == expect)

        // aggregation on the bucket key consumes the same distribution:
        // partial+final hash agg collapse into one exchange-free pass
        val agg = spark.table("b_orders").groupBy("o_custkey")
          .agg(round(sum("o_totalprice"), 2).as("total"))
        val aggN = agg.collect().length
        val aggPlan = agg.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        assert(!aggPlan.contains("Exchange"),
          s"bucket-key aggregation still shuffled:\n$aggPlan")
        assert(aggN.toLong ==
          graft.Tables.orders(spark, TestSpark.sf001)
            .select("o_custkey").distinct().count())
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
