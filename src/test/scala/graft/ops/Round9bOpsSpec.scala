package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-9 continuation operators: e2_mips' plan shape and
  * the norm-augmentation lemma its documented 100 TB serving path rests
  * on (Bachrach et al., RecSys'14: MIPS order == cosine order of
  * norm-augmented vectors, because every augmented corpus vector has the
  * SAME norm M and the query's augmented coordinate is 0). */
class Round9bOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("e2_mips: norm-augmentation rank equivalence — IP order == augmented-cosine order, and the operator returns it") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val m2 = emb.values.map(v => dot(v, v)).max
    def aug(v: Array[Double]): Array[Double] =
      v :+ math.sqrt(math.max(m2 - dot(v, v), 0.0))
    val res = Similarity.e2Mips(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val queries = res.map(_._1).distinct
    assert(queries.length > 0 && queries.length <= Similarity.AnnQueryK)
    for (q <- queries) {
      val qv = emb(q)
      val byIp = emb.toSeq.filter(_._1 != q)
        .sortBy { case (id, v) => (-dot(qv, v), id) }.take(3).map(_._1)
      val qa = qv :+ 0.0
      val byAug = emb.toSeq.filter(_._1 != q)
        .sortBy { case (id, v) =>
          val av = aug(v)
          (-(dot(qa, av) / (math.sqrt(dot(qa, qa)) * math.sqrt(dot(av, av)))), id)
        }.take(3).map(_._1)
      assert(byIp == byAug, s"augmentation lemma broke for query $q")
      val got = res.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      assert(got == byIp, s"operator top-3 disagrees with exact MIPS for $q")
    }
  }

  test("e2_mips: the 64-query sample rides a broadcast nested-loop; pairs are rank-pruned before the exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = finalPlan(Similarity.e2Mips(spark, TestSpark.sf0001))
      // with auto-broadcast OFF, the nested-loop broadcast is OURS: the
      // corpus side streams, only the fixed-size sample is replicated
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"sample side should broadcast into a nested loop:\n${plan.take(2000)}")
      // the top-3 window prunes each input partition to <= 3 rows per
      // query BEFORE the rank exchange (WindowGroupLimit), so the shuffle
      // carries O(sample * partitions) rows, never sample x corpus
      assert(plan.contains("WindowGroupLimit"),
        s"rank limit should prune pairs pre-exchange:\n${plan.take(2000)}")
      // and the fixed-size sample itself is a TakeOrdered, not a full sort
      assert(plan.contains("TakeOrderedAndProject"),
        "fixed-size sample should be TakeOrdered")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
