package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic samples from a ScalaCheck generator. */
  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("saltedJoin equals the plain join on a skewed dataset") {
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = (1 to 200).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", nSalts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("saltedCount equals plain groupBy count") {
    val df = (1 to 5000).map(i => (if (i % 100 == 0) i.toLong else 1L))
      .toDF("k")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Skew.saltedCount(df, "k", nSalts = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("saltsFor sizes the salt count to the cluster and stays correct at that size") {
    // local[32] → defaultParallelism 32: the derived count must track the
    // actual core count (the property that spreads one hot key over the
    // whole cluster), with the floor at 2
    val n = Skew.saltsFor(spark)
    assert(n == math.max(2, spark.sparkContext.defaultParallelism))
    assert(n >= 2)
    // and both utilities stay exact at the derived (non-default) size —
    // 32 here, vs the 8/16 the declared queries pin
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = (1 to 200).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")
    val plainJ = big.join(small, "k").select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    assert(Skew.saltedJoin(big, small, "k", n).select("k", "v", "name")
      .collect().map(_.toSeq).toSet == plainJ)
    val plainC = big.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Skew.saltedCount(big, "k", n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == plainC)
  }

  test("q40: the declared salted aggregation keeps the two-Aggregate salted shape") {
    val df = Relational.q40SkewAgg(spark, TestSpark.sf001)
    val plan = df.queryExecution.optimizedPlan.toString
    // the salt must survive optimization as a grouping key of the inner
    // aggregate — that's what spreads a hot key over nSalts reducers
    assert(plan.contains("__salt"), s"salt column optimized away:\n$plan")
    val nAgg = "Aggregate".r.findAllIn(plan).length
    assert(nAgg >= 2, s"expected partial+final Aggregate pair, got $nAgg:\n$plan")
  }

  test("q41: the declared salted join keeps __salt among the equi-join keys") {
    val df = Relational.q41SkewJoin(spark, TestSpark.sf001)
    val plan = df.queryExecution.optimizedPlan.toString
    val joinLine = plan.linesIterator.find(_.contains("Join Inner"))
    assert(joinLine.isDefined, s"expected an inner join:\n$plan")
    assert(joinLine.get.contains("__salt"),
      s"join keys lost the salt: ${joinLine.get}")
  }

  test("q41: with broadcast gated off, the physical shuffle join keys carry the salt") {
    // at fixture scale AQE broadcasts the replicated dim (fine — salting
    // is then free); this pins the plan the query produces in the regime
    // it exists for: a dim too large to broadcast, where the fact side
    // must shuffle on (key, salt) to split a hot key across tasks
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Relational.q41SkewJoin(spark, TestSpark.sf001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val joinLine = plan.linesIterator.find(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
      assert(joinLine.isDefined, s"expected a shuffled join:\n$plan")
      assert(joinLine.get.contains("__salt"),
        s"physical join keys lost the salt: ${joinLine.get}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("property: message truncation keeps exactly the last 2000 chars") {
    val gen = for {
      n <- Gen.chooseNum(0, 5000)
      c <- Gen.alphaNumChar
    } yield c.toString * n
    samples(gen, 50, seed = 7L).foreach { s =>
      val t = graft.model.Validate.message(s)
      assert(t.length == math.min(s.length, 2000))
      assert(s.endsWith(t))
    }
  }

  test("property: MinHash estimate tracks true Jaccard on random token sets") {
    val agg = new graft.functions.MinHashAgg(256).toColumn
    val gen = Gen.listOfN(40, Gen.oneOf((1 to 60).map(i => s"tok$i")))
    samples(Gen.zip(gen, gen), 8, seed = 11L).foreach { case (la, lb) =>
      val sa = la.distinct
      val sb = lb.distinct
      val sigA = sa.toDS().select(agg).as[Array[Long]].head()
      val sigB = sb.toDS().select(agg).as[Array[Long]].head()
      val trueJ = sa.intersect(sb).size.toDouble / (sa ++ sb).distinct.size
      val estJ = graft.functions.MinHashAgg.estimateJaccard(sigA, sigB)
      assert(math.abs(trueJ - estJ) < 0.25, s"true=$trueJ est=$estJ")
    }
  }
}
