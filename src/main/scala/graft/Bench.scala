package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Optional comma-separated filter: measure just these queries in an
    // otherwise-identical harness (fresh JVM, same warmup discipline) —
    // the isolation probe for regressions the full round-robin run can't
    // attribute (shared-cache eviction vs a real plan change).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    // JMH-style warmup: run every query once at the smallest scale factor.
    // Best-effort — it heats the JVM, classloading, and the plan shapes the
    // small scale produces (AQE may still pick different join strategies at
    // the measured scale and compile those inside the measurement). Falls
    // back to the measured dir if the warm dir is absent.
    val warmDir0 = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val warmDir =
      if (new java.io.File(warmDir0).isDirectory) warmDir0
      else { System.err.println(s"[bench] warm dir $warmDir0 missing; warming on $sfDir"); sfDir }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    // Median-of-3 per query: single-shot numbers vary ±30% run to run
    // (JIT, first-plan codegen, GC) — the round-1 q04a "5.7s outlier" was
    // exactly this (a warm re-run measures ~0.4s). The median is robust to
    // one bad draw while staying cheap; reported totals are sums of
    // per-query medians, so cross-round comparisons are judgeable.
    //
    // Protocol (round 9): QUERY-MAJOR with a per-query UNMEASURED warm rep
    // at the measured scale — warm, then 3 consecutive measured reps, take
    // the median. Two earlier protocols each failed one way:
    //   - 3-consecutive with NO warm rep hands the first rep the
    //     first-plan codegen + memo build (BENCH_r06 read q04a_json_null
    //     at 7.26 s where a warm JVM measures 0.56 s);
    //   - round-robin INTERLEAVE (rep r of every query before rep r+1 of
    //     any) fixed that but broke at 205 queries: the shared
    //     localCheckpoint memos (the dedup pair table and friends) are
    //     evicted by 200+ intervening queries' storage churn, so every
    //     rep of a memo-dependent query re-pays the MinHash chain —
    //     BENCH_r08's per-query mean rose 29% over r07 with ZERO plan
    //     changes, and isolation probes measured the "regressed" queries
    //     BELOW their previous numbers (e3_lm_score 0.99 s isolated vs
    //     2.35 s full-run).
    // The warm rep absorbs BOTH artifacts: it rebuilds any evicted memo
    // and compiles the measured-scale plan, so the 3 measured reps see
    // the same warm state the isolation probe (SPARK_GRAFT_ONLY, fresh
    // JVM) sees — full-run and isolated medians agree by construction,
    // making cross-round deltas attributable to plan changes again.
    // Session aging (JIT/GC drift) is second-order once each query's
    // reps are adjacent: all three draws see the SAME session age.
    val Reps = 3
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = named.map { case (name, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () } // warm
      val ts = (0 until Reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> ts(Reps / 2)
    }
    // One JSON line, summary fields LAST and per-query entries sorted by
    // ASCENDING time: the artifact viewer tails the output, so if the line
    // is truncated it loses the FRONT — i.e. the cheapest queries, which
    // carry the least cross-round signal — while the expensive queries and
    // the totals survive. Times are rounded to 1 ms (measurement noise is
    // ±20-30%, so sub-ms digits are pure line length); key order and
    // trailing digits are free to a JSON parser.
    val qs = results.sortBy { case (n, t) => (t, n) }
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Machine-state caveat (round 9, seven full samples in SURVEY §8):
    // full-run totals vary up to ~30% with BETWEEN-JVM machine state
    // (59.6-83.3 s on identical plans; the slow draws were diffuse
    // across every query and clustered in one wall-clock window —
    // transient host contention, not run order: consecutive samples
    // usually agree within ~4%). Read totals against a same-window
    // sample; per-query medians inside one run remain mutually
    // comparable either way.
    val line = s"""{"queries":$qs,"n_queries":${results.size},"method":"per-query warm rep + median-of-3 consecutive (query-major); totals vary up to ~30% with machine state, see SURVEY bench notes","metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}"""
    println(line)
    // The driver's artifact viewer tails stdout, truncating the per-query
    // dict (~70 of 254 parsed from BENCH_r10) — also write the full line
    // to a file in the repo so every median survives for round-over-round
    // comparison. Env-overridable so probe runs don't clobber the record.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: ${e.getMessage}") }
    spark.stop()
  }
}
