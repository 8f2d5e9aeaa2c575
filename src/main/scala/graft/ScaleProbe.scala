package graft

import org.apache.spark.sql.functions._

/** Scale probe: synthesizes a corpus N× the size of sf0.1 (doc_ids offset
  * per replica) into /tmp and times the dedup/text operators on it. Used to
  * validate that the pairwise paths scale sub-quadratically (near-dup pairs
  * multiply by N because every replica duplicates the planted pairs — the
  * interesting number is wall-clock growth vs N).
  * Run: sbt "runMain graft.ScaleProbe [N]". */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val out = s"/tmp/graft_scale_${n}x"
    val big = (0 until n).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
      .reduce(_.unionByName(_))
    big.write.mode("overwrite").parquet(s"$out/documents.parquet")
    // reuse the other tables so the query functions resolve paths
    Seq("embeddings", "events").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.1/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"corpus: ${spark.read.parquet(s"$out/documents.parquet").count()} docs")
    Seq("e1_exact_dedup", "e1_ngram_jaccard", "e1_minhash_pairs",
      "e3_langid", "e3_tokens").foreach { q =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(q)(spark, out).count()
      println(f"$q%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s   $rows%9d rows")
    }
    spark.stop()
  }
}
