package graft

import org.apache.spark.sql.functions._

/** Streaming throughput soak: the E4i checkpointed fingerprint-dedup
  * ingest (streamFingerprintDedupToFiles — parquet source, parquet sink,
  * checkpointed offsets + watermark + dedup state) driven at bench volume,
  * so the streaming surface has a perf row like the batch surface
  * (StreamingSpec pins its SEMANTICS — exactly-once restart, watermark
  * purge — on micro-fixtures; this measures the pipe).
  *
  * Corpus: sf0.1 documents replicated N× (default 20 → 100k docs) with
  * doc_id offsets but UNCHANGED text, so every replica beyond the first is
  * an exact duplicate the dedup state must recognize — the state store
  * does real work (distinct-fingerprint-sized state, ~95% of arrivals
  * dropped as dups), not pass-through. ingest_ts spreads arrivals over
  * 600 s, inside the 10-minute watermark horizon, so no row is dropped as
  * late while the watermark still advances batch to batch (state purge
  * exercised). AvailableNow drains the 16-file source as a sequence of
  * micro-batches. Prints ONE JSON line for SCALE.md's STREAM row.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.StreamSoak [replicas]". */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val root = "/tmp/graft_stream_soak"
    val (src, out, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    // "kc" as any arg: soak the E4s streaming k-center sketch instead —
    // sf0.1 embeddings replicated N× with vec_id offsets but UNCHANGED
    // vectors, so after the sketch stabilizes every further arrival is a
    // pure coverage test against the ≤K-center state (distance 0 to some
    // center) — the steady-state regime an ingest coreset runs in.
    // Reports vector throughput plus the state bound (final centers ≤ K
    // and a single radius scalar). Dispatched BEFORE the documents corpus
    // build: this branch consumes only embeddings, and at high replica
    // counts materializing the unused documents corpus roughly doubled
    // soak setup time.
    if (args.contains("kc")) {
      val K = 8
      val vsrc = s"$root/vsrc"
      val ebase = spark.read.parquet(s"$sf/embeddings.parquet")
      (0 until n).map(i => ebase.withColumn("vec_id",
          col("vec_id") + lit(i.toLong * 10000000L)))
        .reduce(_.unionByName(_))
        .repartition(16).write.parquet(vsrc)
      val vRows = spark.read.parquet(vsrc).count()
      val vSchema = spark.read.parquet(vsrc).schema
      val t0 = System.nanoTime()
      val q = streaming.Stateful.streamKcenter(
        spark, vsrc, vSchema, "soak_kc", K)
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val snaps = spark.table("soak_kc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val lastVer = snaps.map(_._1).max
      val fin = snaps.filter(_._1 == lastVer)
      require(fin.length <= K, "state bound violated")
      require(fin.map(_._4).distinct.length == 1, "radius not a single scalar")
      println(f"""{"soak":"e4s_kcenter_ingest","input_rows":$vRows,"sec":$secs%.1f,"vecs_per_sec":${(vRows / secs).toLong},"final_centers":${fin.length},"r_micro":${fin.head._4},"versions":$lastVer,"sf":"$sf","replicas":$n}""")
      spark.stop()
      return
    }

    // "kll" as any arg: soak the E4w KLL quantile ingest — sf0.1 EVENTS
    // replicated N× with event_id offsets but UNCHANGED values, through
    // the per-shard logarithmic compactor state. Checks (a) count
    // conservation (Σ batch_n per shard == final n), (b) the state bound
    // items ≤ K·(log₂(n/K)+2), and (c) the accuracy law: the final
    // median estimate per shard lies inside the exact [p45, p55] of
    // everything that shard ever saw (a batch recount over the same
    // replica corpus). Dispatched before the documents corpus build —
    // this branch consumes only events.
    if (args.contains("kll")) {
      import streaming.Stateful.KllShards
      val esrc = s"$root/esrc"
      val ebase = spark.read.parquet(s"$sf/events.parquet")
      val chunkE = 100
      var e0 = 0
      while (e0 < n) {
        val hi = math.min(e0 + chunkE, n)
        (e0 until hi).map(i => ebase.withColumn("event_id",
            col("event_id") + lit(i.toLong * 1000000000L)))
          .reduce(_.unionByName(_))
          .repartition(16)
          .write.mode(if (e0 == 0) "overwrite" else "append").parquet(esrc)
        e0 = hi
      }
      val eRows = spark.read.parquet(esrc).count()
      val eSchema = spark.read.parquet(esrc).schema
      val t0 = System.nanoTime()
      val q = streaming.Stateful.streamKllQuantile(
        spark, esrc, eSchema, "soak_kll")
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      // the ledger is shards × versions rows — driver-sized
      val led = spark.table("soak_kll").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))
      val byShard = led.groupBy(_._1)
      val k = graft.functions.KllSketch.K
      // exact per-shard rank windows from a batch recount
      val exact = spark.read.parquet(esrc)
        .select(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.lit(KllShards.toLong)).cast("int")
          .as("shard"), col("value"))
        .groupBy("shard")
        .agg(expr("percentile(value, 0.45)").as("lo"),
          expr("percentile(value, 0.55)").as("hi"),
          count(org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2),
          r.getLong(3))).toMap
      var maxItems = 0L
      byShard.foreach { case (shard, rows) =>
        val fin = rows.maxBy(_._2)
        require(rows.map(_._3).sum == fin._4,
          s"count conservation violated at shard $shard")
        val (lo, hi0, nEx) = exact(shard)
        require(fin._4 == nEx, s"shard $shard n mismatch vs batch recount")
        val bound = k.toLong *
          (math.ceil(math.log(math.max(fin._4, k).toDouble / k) /
            math.log(2.0)).toLong + 2L)
        require(fin._5 <= bound,
          s"state bound violated at shard $shard: ${fin._5} > $bound")
        require(fin._6 >= lo && fin._6 <= hi0,
          s"median estimate outside exact [p45,p55] at shard $shard")
        if (fin._5 > maxItems) maxItems = fin._5
      }
      val total = led.map(_._3).sum
      println(f"""{"soak":"e4w_kll_ingest","input_rows":$eRows,"arrivals":$total,"sec":$secs%.1f,"arrivals_per_sec":${(total / secs).toLong},"shards":$KllShards,"k":$k,"max_items":$maxItems,"sf":"$sf","replicas":$n}""")
      spark.stop()
      return
    }

    val base = spark.read.parquet(s"$sf/documents.parquet")
    // Chunked replication (round 12, for the 1000x soak): a single
    // 1000-branch union blows up plan analysis (the ScaleProbe two-level
    // lesson), so replicas land in <=100-branch appends. Same rows, same
    // id offsets; the source just has 16 files per chunk.
    val chunk = 100
    var i0 = 0
    while (i0 < n) {
      val hi = math.min(i0 + chunk, n)
      (i0 until hi).map(i => base.withColumn("doc_id",
          col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_.unionByName(_))
        .withColumn("ingest_ts",
          expr("timestamp_micros(1706745600000000 + doc_id % 600 * 1000000)"))
        .repartition(16)
        .write.mode(if (i0 == 0) "overwrite" else "append").parquet(src)
      i0 = hi
    }
    val inputRows = spark.read.parquet(src).count()
    val schema = spark.read.parquet(src).schema

    // "bl" as any arg: soak the E4t bloom-dedup ingest — the same
    // replicated corpus through the BOUNDED bloom state (NShards × m
    // bits forever, vs E4i's per-distinct-fingerprint entries): every
    // replica beyond the first is an exact duplicate the filter must
    // drop, so steady state is k bit-probes per arrival that mutate
    // nothing — the regime the operator is designed for. Reports arrival
    // throughput, admitted count, and the bits-set state bound.
    if (args.contains("bl")) {
      val t0 = System.nanoTime()
      val q = streaming.Stateful.streamBloomDedup(
        spark, src, schema, "soak_bl")
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val led = spark.table("soak_bl")
        .agg(count(lit(1)), sum(when(col("admitted"), 1L).otherwise(0L)),
          max(col("bits_set")))
        .collect().head
      val (arrivals, admitted, maxBits) =
        (led.getLong(0), led.getLong(1), led.getLong(2))
      require(maxBits <= graft.ops.Dedup.BloomBits, "state bound violated")
      println(f"""{"soak":"e4t_bloom_dedup_ingest","input_rows":$inputRows,"arrivals":$arrivals,"admitted":$admitted,"sec":$secs%.1f,"rows_per_sec":${(arrivals / secs).toLong},"max_bits_set":$maxBits,"m_bits":${graft.ops.Dedup.BloomBits},"shards":${streaming.Stateful.BloomShards},"sf":"$sf","replicas":$n}""")
      spark.stop()
      return
    }

    // "ss" as any arg: soak the E4r Space-Saving ingest instead — same
    // replicated corpus, per-source M-entry global heavy-hitter state.
    // Replication multiplies every token count by N but adds NO new
    // tokens, so state stays far below capacity while the counting path
    // does N× the work — the pure-throughput regime. Reports token
    // throughput plus the state-bound check (final snapshot rows per
    // source ≤ M).
    if (args.contains("ss")) {
      val M = 64
      val tokens = spark.read.parquet(src)
        .select(explode(split(col("text"), " "))).count()
      val t0 = System.nanoTime()
      val q = streaming.Stateful.streamSpaceSaving(
        spark, src, schema, "soak_ss", M)
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      // the memory sink is |sources|·M·versions rows — driver-sized
      val snaps = spark.table("soak_ss").select("source", "ver").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val lastVer = snaps.groupBy(_._1).map { case (s0, rs) =>
        s0 -> rs.map(_._2).max }
      val finalRows = snaps.groupBy(identity).collect {
        case ((s0, v), rs) if lastVer(s0) == v => s0 -> rs.length
      }
      require(finalRows.values.forall(_ <= M), "state bound violated")
      println(f"""{"soak":"e4r_space_saving_ingest","input_rows":$inputRows,"tokens":$tokens,"sec":$secs%.1f,"tokens_per_sec":${(tokens / secs).toLong},"sources":${finalRows.size},"state_cap":$M,"sf":"$sf","replicas":$n}""")
      spark.stop()
      return
    }

    // "cm" as any arg: soak the E4v count-min sketch ingest — token-
    // granularity arrivals (the heaviest per-row regime in the stateful
    // family: every document fans out to ~56 token rows) through the
    // CmShards × d×w counter state. Replication multiplies every
    // counter by N but the STATE SIZE is geometry-pinned forever.
    // Checks the mass-conservation law (Σ row-0 cells == arrivals per
    // shard) and reports token throughput.
    if (args.contains("cm")) {
      val t0 = System.nanoTime()
      val q = streaming.Stateful.streamCmSketch(spark, src, schema, "soak_cm")
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      // the ledger is shards × versions rows — driver-sized
      val led = spark.table("soak_cm").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      val byShard = led.groupBy(_._1)
      byShard.foreach { case (shard, rows) =>
        val fin = rows.maxBy(_._2)
        require(rows.map(_._3).sum == fin._4,
          s"mass law violated at shard $shard")
      }
      val total = led.map(_._3).sum
      val maxCell = byShard.values.map(_.maxBy(_._2)._5).max
      println(f"""{"soak":"e4v_cmsketch_ingest","input_rows":$inputRows,"tokens":$total,"sec":$secs%.1f,"tokens_per_sec":${(total / secs).toLong},"shards":${streaming.Stateful.CmShards},"w":${streaming.StreamOps.CmW},"d":${graft.ops.Dedup.BloomSeeds.length},"max_cell":$maxCell,"sf":"$sf","replicas":$n}""")
      spark.stop()
      return
    }

    // "sh" as any arg: soak the E4u simhash near-dup filter — the same
    // replicated corpus (exact clones, so every replica beyond the first
    // shares its original's signature AND prefix shard) through the
    // prefix-sharded bounded ring state. Steady state is one ring scan
    // per arrival at min_ham 0 that mutates nothing. Reports arrival
    // throughput, admitted count, and the ring-size state bound.
    if (args.contains("sh")) {
      val t0 = System.nanoTime()
      val q = streaming.Stateful.streamSimhashDedup(
        spark, src, schema, "soak_sh")
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val led = spark.table("soak_sh")
        .agg(count(lit(1)), sum(when(col("admitted"), 1L).otherwise(0L)),
          max(col("ring_size")))
        .collect().head
      val (arrivals, admitted, maxRing) =
        (led.getLong(0), led.getLong(1), led.getLong(2))
      require(maxRing <= streaming.Stateful.SimRingCap.toLong,
        "state bound violated")
      println(f"""{"soak":"e4u_simhash_neardup_ingest","input_rows":$inputRows,"arrivals":$arrivals,"admitted":$admitted,"sec":$secs%.1f,"rows_per_sec":${(arrivals / secs).toLong},"max_ring":$maxRing,"ring_cap":${streaming.Stateful.SimRingCap},"ham_max":${streaming.Stateful.SimHamMax},"sf":"$sf","replicas":$n}""")
      spark.stop()
      return
    }

    val t0 = System.nanoTime()
    val q = streaming.StreamOps
      .streamFingerprintDedupToFiles(spark, src, schema, out, ckpt)
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val emitted = spark.read.parquet(out).count()
    println(f"""{"soak":"e4i_fingerprint_dedup_ingest","input_rows":$inputRows,"emitted":$emitted,"sec":$secs%.1f,"rows_per_sec":${(inputRows / secs).toLong},"sf":"$sf","replicas":$n}""")
    spark.stop()
  }
}
