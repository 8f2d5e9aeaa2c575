package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bucketed join plans without an exchange on either side") {
    val orders = graft.Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.Tables.lineitem(spark, TestSpark.sf0001)
      .select(org.apache.spark.sql.functions.col("l_orderkey").as("o_orderkey"),
        org.apache.spark.sql.functions.col("l_quantity"))
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", buckets = 8)
    // disable auto-broadcast so the shuffle-vs-bucketing effect is visible
    // (at real scale neither side broadcasts anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"), physical)
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$physical")
      // and it is still correct
      val expect = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("single-file buckets skip read-time sorts; bucket-key agg is exchange-free") {
    val orders = graft.Tables.orders(spark, TestSpark.sf001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = graft.Tables.customer(spark, TestSpark.sf001)
      .select(org.apache.spark.sql.functions.col("c_custkey").as("o_custkey"),
        org.apache.spark.sql.functions.col("c_mktsegment"))
    Seq("bs_orders", "bs_customer").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Bucketing.writeBucketed(orders, "bs_orders", "o_custkey", buckets = 8,
      singleFilePerBucket = true)
    Bucketing.writeBucketed(customer, "bs_customer", "o_custkey", buckets = 8,
      singleFilePerBucket = true)
    def withConf[A](key: String, value: String)(body: => A): A = {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, value)
      try body
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
    try withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      // aggregation on the bucket key consumes the on-disk distribution:
      // partial+final hash agg collapse into one exchange-free pass
      val agg = spark.table("bs_orders").groupBy("o_custkey")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!aggPlan.contains("Exchange"),
        s"bucket-key aggregation still shuffled:\n$aggPlan")
      // one file per bucket + the ordering opt-in (off by default since
      // SPARK-28595): the scan's sortBy order is trusted and the merge
      // join runs with no exchange AND no per-task sort
      withConf("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") {
        val j = Bucketing.bucketedJoin(spark, "bs_orders", "bs_customer",
          "o_custkey")
        val n = j.collect().length
        val plan = j.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Exchange") && !plan.contains("Sort "),
          s"single-file bucketed join still sorted/shuffled:\n$plan")
        assert(n.toLong == orders.join(customer, "o_custkey").count())
      }
    } finally
      Seq("bs_orders", "bs_customer").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("partitioned parquet layout prunes partitions on the filter") {
    import org.apache.spark.sql.functions._
    val dir = graft.TestSpark.tmpDir("partitioned") + "/events"
    val ev = graft.Tables.events(spark, TestSpark.sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Formats.writePartitioned(ev, dir, Seq("day"))
    val read = spark.read.parquet(dir).filter(col("day") === "2024-01-02")
    val scan = read.queryExecution.executedPlan.toString
    // the day predicate must appear INSIDE the scan's PartitionFilters list
    // (the key itself is always printed, even empty, so check the content)
    assert(!scan.contains("PartitionFilters: []"), scan)
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(scan).isDefined, scan)
    val expect = ev.filter(col("day") === "2024-01-02").count()
    assert(read.count() == expect && expect > 0)
  }

  test("IVF ANN: deterministic, one row per covered vector, sims are true cosines") {
    import spark.implicits._
    val run1 = graft.ops.Similarity.e2AnnIvf(spark, TestSpark.sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val run2 = graft.ops.Similarity.e2AnnIvf(spark, TestSpark.sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(run1.nonEmpty && run1.sameElements(run2))
    assert(run1.map(_._1).distinct.length == run1.length)
    val emb = spark.read.parquet(s"${TestSpark.sf001}/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    run1.take(50).foreach { case (v, n, sim) =>
      assert(math.abs(cos(emb(v), emb(n)) - sim) < 1e-3)
    }
  }

  test("schema-evolved parquet reads union file schemas with nulls for missing columns") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("evolve")
    // v1 files: (doc_id, text); v2 adds a quality column — years of
    // ingest in two files
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    Seq((3L, "gamma", 0.9)).toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(dir)
    val merged = Formats.readParquetEvolved(spark, dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "quality"))
    val rows = merged.orderBy("doc_id").collect()
    assert(rows.length == 3)
    // pre-evolution rows surface the new column as null, not an error
    assert(rows.take(2).forall(_.isNullAt(rows.head.fieldIndex("quality"))))
    assert(rows(2).getDouble(rows(2).fieldIndex("quality")) == 0.9)
    // and the pinned-schema read still works over the mixed directory
    val pinned = spark.read.schema(merged.schema).parquet(dir)
    assert(pinned.count() == 3)
  }
}
