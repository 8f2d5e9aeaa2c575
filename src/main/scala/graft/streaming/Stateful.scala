package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** [EXT] Custom streaming state (SURVEY.md §2 streaming surface):
  * KeyValueGroupedDataset.flatMapGroupsWithState for logic that windows and
  * watermarks cannot express. The example keeps one running accumulator per
  * user (count, total value, last-seen event id) and emits an updated
  * snapshot per micro-batch — the state shape of a per-entity feature
  * stream in a training-data pipeline. State is partitioned by key across
  * executors and checkpointed by the engine; at scale the concern is state
  * size per key (constant here) and key cardinality (bounded by users). */
object Stateful {

  final case class EventIn(user_id: Long, event_id: Long, value: Double)
  final case class UserState(n: Long, total: Double, lastEventId: Long)
  final case class UserSnapshot(user_id: Long, n: Long, total: Double,
      last_event_id: Long)

  def updateUser(userId: Long, events: Iterator[EventIn],
      state: GroupState[UserState]): Iterator[UserSnapshot] = {
    var st = state.getOption.getOrElse(UserState(0L, 0.0, -1L))
    var changed = false
    events.foreach { e =>
      st = UserState(st.n + 1, st.total + e.value,
        math.max(st.lastEventId, e.event_id))
      changed = true
    }
    if (changed) {
      state.update(st)
      Iterator.single(UserSnapshot(userId, st.n, st.total, st.lastEventId))
    } else Iterator.empty
  }

  final case class EventTs(user_id: Long, event_id: Long, value: Double,
      ts: java.sql.Timestamp)
  final case class UserTtlState(n: Long, total: Double, lastEventId: Long,
      lastActivityMs: Long)
  final case class UserClosable(user_id: Long, n: Long, total: Double,
      last_event_id: Long, closed: Boolean)

  /** TTL-evicted per-user state (EventTimeTimeout): a user silent for
    * `ttl` of EVENT time past the watermark has its state REMOVED after
    * emitting one final closed=true snapshot. This is what keeps
    * flatMapGroupsWithState runnable forever at 100 TB: with NoTimeout
    * (streamUserState above) the key space grows monotonically with every
    * user ever seen; with the timeout, resident state tracks only the
    * ACTIVE key set inside the watermark + ttl horizon, and the closed
    * snapshot is the downstream signal that the accumulator is final. */
  def updateUserTtl(ttlMs: Long)(userId: Long, events: Iterator[EventTs],
      state: GroupState[UserTtlState]): Iterator[UserClosable] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      Iterator.single(UserClosable(userId, st.n, st.total, st.lastEventId,
        closed = true))
    } else {
      var st = state.getOption.getOrElse(UserTtlState(0L, 0.0, -1L, Long.MinValue))
      var changed = false
      events.foreach { e =>
        st = UserTtlState(st.n + 1, st.total + e.value,
          math.max(st.lastEventId, e.event_id),
          // keep the MAX activity time ever seen: a late but
          // still-admitted out-of-order event must not REWIND the
          // eviction deadline below last-activity + ttl (that would
          // evict early and split the accumulator across a second,
          // post-close state)
          math.max(st.lastActivityMs, e.ts.getTime))
        changed = true
      }
      if (changed) {
        state.update(st)
        // fires once the event-time watermark passes last activity + ttl
        state.setTimeoutTimestamp(st.lastActivityMs + ttlMs)
        Iterator.single(UserClosable(userId, st.n, st.total, st.lastEventId,
          closed = false))
      } else Iterator.empty
    }
  }

  /** File-source stream (one file per micro-batch, so the watermark
    * advances between files) → TTL-evicted per-user state → memory sink. */
  def streamUserStateTtl(s: SparkSession, dir: String, schema: StructType,
      sinkName: String, ttlMs: Long): StreamingQuery = {
    import s.implicits._
    val events: Dataset[EventTs] = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .as[EventTs]
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateUserTtl(ttlMs))
      .writeStream.outputMode("append").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** File-source stream → per-user stateful accumulator → memory sink. */
  def streamUserState(s: SparkSession, dir: String, schema: StructType,
      sinkName: String): StreamingQuery = {
    import s.implicits._
    val events: Dataset[EventIn] = s.readStream.schema(schema).parquet(dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .as[EventIn]
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateUser)
      .writeStream.outputMode("append").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  final case class DocIn(doc_id: Long, source: String, lang: String)
  final case class QuotaWinner(prio: Long, doc_id: Long, lang: String)
  final case class QuotaState(ver: Long, winners: List[QuotaWinner])
  final case class QuotaUpdate(source: String, ver: Long, rk: Long,
      doc_id: Long, lang: String)

  /** Incremental per-source quota maintenance — the streaming form of the
    * batch e6_quota_sample (ops/Sampling.scala): keep the K documents with
    * the smallest splitmix64(doc_id ^ QuotaSalt) per source as documents
    * ARRIVE. Because the priority is a pure function of the id, a new doc
    * displaces the current max-priority winner exactly when its hash is
    * smaller, so the maintained set CONVERGES to the batch query's answer
    * regardless of arrival order or micro-batching — the claim in the
    * batch operator's Scaladoc, asserted by StreamingSpec against the
    * batch result over the same corpus. State per source is K fixed-size
    * winners (bounded, no TTL needed); each update emits the current
    * winner set stamped with a per-source version so the sink's latest
    * version is the final quota. */
  def updateQuota(k: Int)(source: String, docs: Iterator[DocIn],
      state: GroupState[QuotaState]): Iterator[QuotaUpdate] = {
    val prev = state.getOption.getOrElse(QuotaState(0L, Nil))
    var w = prev.winners
    docs.foreach { d =>
      val prio = org.apache.spark.sql.graftext.minhashExpression
        .mix(d.doc_id ^ graft.ops.Sampling.QuotaSalt)
      w = (QuotaWinner(prio, d.doc_id, d.lang) :: w)
        .distinctBy(_.doc_id)
        .sortBy(x => (x.prio, x.doc_id)).take(k)
    }
    val st = QuotaState(prev.ver + 1, w)
    state.update(st)
    w.zipWithIndex.iterator.map { case (x, i) =>
      QuotaUpdate(source, st.ver, i + 1L, x.doc_id, x.lang)
    }
  }

  final case class ShingleIn(source: String, h: Long)
  final case class KmvSnapshot(source: String, ver: Long, m: Long,
      kth: Long, est: Double)

  /** E4p — streaming KMV cardinality sketch at ingest: per source, keep
    * the KmvK smallest (unsigned) shingle hashes as documents ARRIVE —
    * the streaming form of the batch e1_kmv_union/e1_kmv_global sketch
    * builders. The mergeability law those batch planners rest on
    * (k-smallest of a union ≡ k-smallest of the merged top-k sets,
    * Round9OpsSpec) is exactly what makes the STREAMING maintenance
    * correct: folding each micro-batch into the retained top-K converges
    * to the batch sketch regardless of arrival order or batching —
    * asserted sketch-for-sketch against the batch computation in
    * StreamingSpec. State per source is K longs (fixed), so resident
    * state is |sources|·K at ANY corpus size — the sketch discipline is
    * what lets a 100 TB ingest keep a live "distinct content per source"
    * scoreboard without a distinct aggregation's unbounded state. Emits
    * a versioned snapshot per update; est uses the same (K−1)·2⁶⁴/h_K
    * estimator as the batch planners (m < K means the set is exact). */
  final case class KmvState(ver: Long, hs: Array[Long])

  def updateKmv(k: Int)(source: String, rows: Iterator[ShingleIn],
      state: GroupState[KmvState]): Iterator[KmvSnapshot] = {
    val unsignedOrd: Ordering[Long] = Ordering.by((h: Long) => h ^ Long.MinValue)
    val tk = scala.collection.mutable.TreeSet.empty[Long](unsignedOrd)
    val prev = state.getOption.getOrElse(KmvState(0L, Array.empty[Long]))
    prev.hs.foreach(tk += _)
    rows.foreach { r =>
      tk += r.h
      if (tk.size > k) tk -= tk.last
    }
    val arr = tk.toArray
    state.update(KmvState(prev.ver + 1, arr))
    val m = arr.length
    val kth = if (m == 0) 0L else arr.last
    // unsigned long -> double, the batch planners' `ud` formulation
    val ud =
      if (kth < 0) kth.toDouble + math.pow(2, 64) else kth.toDouble
    val est =
      if (m < k) m.toDouble
      else (k - 1).toDouble * math.pow(2, 64) / ud
    Iterator.single(KmvSnapshot(source, prev.ver + 1, m.toLong, kth, est))
  }

  final case class BudgetDocIn(source: String, doc_id: Long, nt: Long)
  final case class BudgetState(ver: Long, used: Long)
  final case class BudgetDecision(source: String, ver: Long, doc_id: Long,
      n_tokens: Long, admitted: Boolean, used_after: Long)

  /** E4q — streaming per-source TOKEN-BUDGET admission at ingest: the
    * arrival-ordered hard-cap twin of the batch e7_source_caps policy
    * table (that query states the cap as a ppm keep-rate for a sampler;
    * this enforces an absolute per-source budget doc-by-doc as the crawl
    * lands, first-come-first-served — how an ingest gate actually turns
    * crawlers off). A doc is ADMITTED iff the source's running token
    * total plus its own count stays within the budget; an oversized doc
    * is rejected but ingest continues (greedy admission — later smaller
    * docs may still fit). Within a micro-batch docs fold in doc_id order
    * so each batch's decisions are deterministic; across batches the
    * ledger law (admitted ⇔ used_before + nt ≤ B, used_after telescopes
    * monotonically, budget never exceeded) holds under ANY arrival
    * order and is what StreamingSpec replays from the emitted decisions
    * themselves. State per source is ONE (ver, used) pair — |sources|
    * longs at any corpus size, the same bounded-state discipline as the
    * E4p sketch. */
  def updateBudget(b: Long)(source: String, docs: Iterator[BudgetDocIn],
      state: GroupState[BudgetState]): Iterator[BudgetDecision] = {
    val prev = state.getOption.getOrElse(BudgetState(0L, 0L))
    var used = prev.used
    val out = docs.toSeq.sortBy(_.doc_id).map { d =>
      val ok = used + d.nt <= b
      if (ok) used += d.nt
      BudgetDecision(source, prev.ver + 1, d.doc_id, d.nt, ok, used)
    }
    state.update(BudgetState(prev.ver + 1, used))
    out.iterator
  }

  final case class TokenIn(source: String, tok: String)
  final case class HhEntry(tok: String, cnt: Long, err: Long)
  final case class HhState(ver: Long, entries: List[HhEntry])
  final case class HhSnapshot(source: String, ver: Long, tok: String,
      cnt: Long, err: Long)

  /** E4r — streaming GLOBAL heavy hitters via SPACE-SAVING (Metwally,
    * Agrawal & El Abbadi, ICDT'05): per source, an M-entry capped
    * (token → count, error) summary maintained as tokens ARRIVE — the
    * bounded-state answer to exactly the limitation e4l's Scaladoc
    * records ("global all-time top-K over unbounded keys is not
    * expressible with bounded state"): per-window top-K bounds state by
    * eviction, Space-Saving bounds it by APPROXIMATION, and the two are
    * the standard complementary deployments. On a miss with a full
    * summary, the minimum-count entry is evicted and the newcomer
    * inherits its count as `err` — giving the classic guarantees
    * (independent of arrival order, asserted in StreamingSpec): any
    * token with true count > n/M is present, and every entry's true
    * count lies in [cnt − err, cnt]. Per-source state is M fixed-size
    * entries at ANY corpus size; on the fixture vocabulary (< M) no
    * eviction fires and the summary is EXACT — equal to the batch
    * groupBy counts, which is the spec's convergence pin. Min-eviction
    * ties break by token so a replay is deterministic. */
  def updateSpaceSaving(m: Int)(source: String, rows: Iterator[TokenIn],
      state: GroupState[HhState]): Iterator[HhSnapshot] = {
    val mp = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    state.getOption.foreach(_.entries.foreach(e => mp(e.tok) = (e.cnt, e.err)))
    rows.foreach { r =>
      mp.get(r.tok) match {
        case Some((c, e)) => mp(r.tok) = (c + 1, e)
        case None if mp.size < m => mp(r.tok) = (1L, 0L)
        case None =>
          val (mt, (mc, _)) = mp.minBy { case (t, (c, _)) => (c, t) }
          mp.remove(mt)
          mp(r.tok) = (mc + 1, mc)
      }
    }
    val ver = state.getOption.map(_.ver).getOrElse(0L) + 1
    val entries = mp.toList.map { case (t, (c, e)) => HhEntry(t, c, e) }
      .sortBy(x => (-x.cnt, x.tok))
    state.update(HhState(ver, entries))
    entries.iterator.map(e => HhSnapshot(source, ver, e.tok, e.cnt, e.err))
  }

  final case class VecIn(vec_id: Long, embedding: Seq[Double])
  final case class KcCenter(id: Long, v: Seq[Double])
  final case class KcState(ver: Long, r: Double, centers: List[KcCenter])
  final case class KcSnapshot(ver: Long, center_id: Long, n_centers: Long,
      r_micro: Long)

  /** E4s — STREAMING K-CENTER maintenance via the DOUBLING algorithm
    * (Charikar, Chekuri, Feder & Motwani, STOC'97): the one-pass twin of
    * the batch e2_kcenter coreset — an ingest pipeline that wants "K
    * maximally-spread representatives of everything ever seen" cannot
    * re-run greedy selection per arrival, so it maintains the classic
    * bounded-state sketch instead: ≤K centers plus ONE radius scalar r.
    * An arriving vector within 2r of a center is absorbed (covered);
    * otherwise it becomes a center; when centers overflow K, r doubles
    * (first overflow: half the minimum pairwise center distance) and
    * centers are greedily re-merged in insertion order until ≤K survive,
    * all pairwise > 2r apart. The classic invariants — centers pairwise
    * > r, r only ever doubles, every ingested point within O(r) of a
    * surviving center (the 8-approximation) — are asserted from the
    * emitted snapshots in StreamingSpec, replayed against the stream's
    * own arrival order. Within a micro-batch, vectors fold in vec_id
    * order so every snapshot is deterministic. State is K vectors + one
    * double at ANY corpus size — the E4p/E4q/E4r bounded-state
    * discipline applied to coverage geometry. */
  def updateKcenterStream(k: Int)(key: Int, rows: Iterator[VecIn],
      state: GroupState[KcState]): Iterator[KcSnapshot] = {
    def d2(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val prev = state.getOption.getOrElse(KcState(0L, 0.0, Nil))
    var r = prev.r
    var centers = prev.centers
    rows.toSeq.sortBy(_.vec_id).foreach { p =>
      val covered = r > 0.0 &&
        centers.exists(c => d2(c.v, p.embedding) <= 4.0 * r * r)
      if (!covered && !centers.exists(_.id == p.vec_id)) {
        centers = centers :+ KcCenter(p.vec_id, p.embedding)
        while (centers.length > k) {
          r =
            if (r == 0.0)
              math.sqrt(centers.combinations(2).map {
                case Seq(a, b) => d2(a.v, b.v)
              }.min) / 2.0
            else 2.0 * r
          val kept = scala.collection.mutable.ListBuffer.empty[KcCenter]
          centers.foreach { c =>
            if (!kept.exists(kc => d2(kc.v, c.v) <= 4.0 * r * r)) kept += c
          }
          centers = kept.toList
        }
      }
    }
    val ver = prev.ver + 1
    state.update(KcState(ver, r, centers))
    val n = centers.length.toLong
    val rm = math.floor(r * 1e6 + 0.5).toLong
    centers.iterator.map(c => KcSnapshot(ver, c.id, n, rm))
  }

  /** File-source embedding stream (one file per micro-batch) → the
    * single-group doubling-algorithm state → memory sink in update mode;
    * the latest version is the live K-center sketch. */
  def streamKcenter(s: SparkSession, dir: String, schema: StructType,
      sinkName: String, k: Int): StreamingQuery = {
    import s.implicits._
    val rows: Dataset[VecIn] = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[VecIn]
    rows
      .groupByKey(_ => 1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateKcenterStream(k))
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  final case class FpIn(shard: Int, doc_id: Long, h: Long)
  final case class BloomShardState(ver: Long, bits: Array[Byte])
  final case class BloomDecision(shard: Int, ver: Long, doc_id: Long,
      admitted: Boolean, bits_set: Long)

  /** E4t — STREAMING APPROXIMATE DEDUP behind a bloom filter: the
    * deployment whose geometry e1_bloom_audit prices. E4i's exact
    * fingerprint dedup keeps one state entry PER DISTINCT FINGERPRINT —
    * bounded only by the watermark horizon; this is the TRULY
    * bounded-state form an unbounded-horizon ingest runs: state is m
    * BITS per shard FOREVER, the price is the audit's false-positive
    * rate (a first-seen document whose k positions are already set is
    * silently dropped — bloom dedup never re-admits a duplicate, it can
    * only over-drop). Fingerprints are SHARDED by h mod NShards, so
    * dedup stays exact-global (a fingerprint's every occurrence lands on
    * the same shard's filter) while shards update in parallel — the
    * production layout for a filter too hot for one task. Same geometry
    * constants (m, k, seeds) as the batch audit, so the audit's
    * predicted/measured FP columns price EXACTLY this operator. Within a
    * micro-batch, docs fold in doc_id order — every decision ledger is
    * deterministic (the E4q discipline). */
  def updateBloomDedup(mBits: Long, seeds: Seq[Long])(shard: Int,
      rows: Iterator[FpIn],
      state: GroupState[BloomShardState]): Iterator[BloomDecision] = {
    import org.apache.spark.sql.graftext.minhashExpression.mix
    val prev = state.getOption
      .getOrElse(BloomShardState(0L, new Array[Byte]((mBits / 8).toInt)))
    val bits = prev.bits.clone()
    def isSet(p: Long): Boolean =
      (bits((p / 8).toInt) & (1 << (p % 8).toInt)) != 0
    def setBit(p: Long): Unit =
      bits((p / 8).toInt) = (bits((p / 8).toInt) | (1 << (p % 8).toInt)).toByte
    val ver = prev.ver + 1
    val decisions = rows.toSeq.sortBy(_.doc_id).map { r =>
      val pos = seeds.map(sd => java.lang.Math.floorMod(mix(r.h ^ sd), mBits))
      val dup = pos.forall(isSet)
      if (!dup) pos.foreach(setBit)
      BloomDecision(shard, ver, r.doc_id, admitted = !dup, 0L)
    }
    state.update(BloomShardState(ver, bits))
    val set = bits.map(b => java.lang.Integer.bitCount(b & 0xff)).sum.toLong
    decisions.iterator.map(_.copy(bits_set = set))
  }

  /** Shard count for the streaming bloom dedup — the filter partitions
    * by fingerprint so each shard owns a disjoint slice exactly. */
  val BloomShards = 8

  /** File-source document stream (one file per micro-batch) → scan-side
    * md5-fold fingerprint (the e1_bloom_audit expression) → per-shard
    * bloom state → memory sink in update mode; the emitted rows are the
    * admission ledger. */
  def streamBloomDedup(s: SparkSession, dir: String, schema: StructType,
      sinkName: String): StreamingQuery = {
    import s.implicits._
    val rows: Dataset[FpIn] = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(
        pmod(conv(substring(graft.ops.Dedup.contentFingerprint(col("text")),
          1, 15), 16, 10).cast("long"), lit(BloomShards)).cast("int")
          .as("shard"),
        col("doc_id"),
        conv(substring(graft.ops.Dedup.contentFingerprint(col("text")),
          1, 15), 16, 10).cast("long").as("h"))
      .as[FpIn]
    rows
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        updateBloomDedup(graft.ops.Dedup.BloomBits, graft.ops.Dedup.BloomSeeds))
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  final case class CmIn(shard: Int, h: Long, cnt: Long)
  final case class CmState(ver: Long, cells: Array[Long])
  final case class CmBatch(shard: Int, ver: Long, batch_tokens: Long,
      l1_mass: Long, max_cell: Long)

  /** Shard count for the streaming count-min sketch — tokens partition
    * by hash, so each shard owns a disjoint token slice exactly and the
    * global estimate for a token is read from ITS shard alone. */
  val CmShards = 8

  /** E4v — STREAMING COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005):
    * the frequency-estimation member of the bounded-state ingest family
    * (E4r Space-Saving = top-k membership, E4t bloom = exact-duplicate
    * membership, E4u simhash = near-dup membership; this one answers
    * point frequency queries). State per shard is a d×w exact long
    * counter grid — CmShards × d × CmW × 8 bytes FOREVER (32 KiB/shard
    * at d=4, w=512), mutated by pure increments, so arrival order never
    * matters and no per-batch sort is needed (contrast the decision
    * ledgers, whose admit bits are order-sensitive). The per-batch
    * emission is the mass-conservation ledger: row-0 L1 mass must equal
    * every arrival ever routed to the shard — the invariant the soak
    * checks at volume. Geometry (w a power of two, the bloom seeds) is
    * shared with the batch twin e4v_cmsketch, which prices the
    * overcount before a stream commits to w. */
  def updateCmSketch(w: Long, seeds: Seq[Long])(shard: Int,
      rows: Iterator[CmIn],
      state: GroupState[CmState]): Iterator[CmBatch] = {
    import org.apache.spark.sql.graftext.minhashExpression.mix
    val d = seeds.length
    val wi = w.toInt
    val prev = state.getOption.getOrElse(CmState(0L, new Array[Long](d * wi)))
    val cells = prev.cells.clone()
    var batch = 0L
    rows.foreach { r =>
      batch += r.cnt
      var i = 0
      while (i < d) {
        val p = java.lang.Math.floorMod(mix(r.h ^ seeds(i)), w).toInt
        cells(i * wi + p) += r.cnt
        i += 1
      }
    }
    state.update(CmState(prev.ver + 1, cells))
    var l1 = 0L
    var mx = 0L
    var j = 0
    while (j < cells.length) {
      if (j < wi) l1 += cells(j)
      if (cells(j) > mx) mx = cells(j)
      j += 1
    }
    Iterator.single(CmBatch(shard, prev.ver + 1, batch, l1, mx))
  }

  /** File-source document stream → scan-side token explode + md5-fold
    * hash (the e4v_cmsketch expression) → per-shard CM counter state →
    * memory sink; the emitted rows are the mass ledger. */
  def streamCmSketch(s: SparkSession, dir: String, schema: StructType,
      sinkName: String): StreamingQuery = {
    import s.implicits._
    val rows: Dataset[CmIn] = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .select(expr("CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)")
        .as("h"))
      .select(pmod(col("h"), lit(CmShards.toLong)).cast("int").as("shard"),
        col("h"), lit(1L).as("cnt"))
      .as[CmIn]
    rows
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        updateCmSketch(graft.streaming.StreamOps.CmW,
          graft.ops.Dedup.BloomSeeds))
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  final case class SimIn(pfx: Int, doc_id: Long, sig: Long)
  final case class SimRingState(ver: Long, sigs: List[Long])
  final case class SimDecision(pfx: Int, ver: Long, doc_id: Long,
      admitted: Boolean, min_ham: Long, ring_size: Long)

  /** Ring capacity per prefix shard and the Hamming radius — the state
    * bound is SimShardsTotal prefixes × SimRingCap 8-byte signatures
    * FOREVER (16 KiB/prefix at 2048). */
  val SimRingCap = 2048
  val SimHamMax = 3L

  /** E4u — STREAMING SIMHASH NEAR-DUP FILTER: the bounded-state
    * NEAR-duplicate twin of E4t (whose bloom state catches only EXACT
    * fingerprints): arrivals carry their 64-bit SimHash (the same
    * native expression as batch e1_simhash), shard on the signature's
    * HIGH BYTE, and are dropped when any signature in the shard's
    * bounded recency ring lies within SimHamMax Hamming bits. The
    * contract is explicit and two-sided: EXACT duplicates always share
    * the prefix (Hamming 0), so while the original's signature is in
    * the ring an exact re-arrival is always caught; a near-dup whose
    * differing bits straddle the prefix lands on another shard and is
    * missed — the recall price of sharding, priced in batch by
    * e1_simhash_pairs' band analysis — and ring eviction (FIFO at
    * SimRingCap) makes it a RECENT-HORIZON dedup, the trade every
    * unbounded news/CDC ingest actually runs. Within a micro-batch,
    * docs fold in doc_id order (the E4q determinism discipline);
    * min_ham is emitted per decision so the ledger doubles as the
    * radius-calibration sample. */
  def updateSimhashDedup(cap: Int, hamMax: Long)(pfx: Int,
      rows: Iterator[SimIn],
      state: GroupState[SimRingState]): Iterator[SimDecision] = {
    val prev = state.getOption.getOrElse(SimRingState(0L, Nil))
    var ring = prev.sigs.toVector
    val ver = prev.ver + 1
    val decisions = rows.toSeq.sortBy(_.doc_id).map { r =>
      val minHam =
        if (ring.isEmpty) 64L
        else ring.map(s0 => java.lang.Long.bitCount(s0 ^ r.sig)).min.toLong
      val dup = minHam <= hamMax
      if (!dup) ring = (ring :+ r.sig).takeRight(cap)
      SimDecision(pfx, ver, r.doc_id, admitted = !dup, minHam,
        ring.size.toLong)
    }
    state.update(SimRingState(ver, ring.toList))
    decisions.iterator
  }

  /** File-source document stream (one file per micro-batch) → scan-side
    * native SimHash → high-byte prefix shard → bounded ring state →
    * memory sink in update mode; the emitted rows are the admission
    * ledger. */
  def streamSimhashDedup(s: SparkSession, dir: String, schema: StructType,
      sinkName: String): StreamingQuery = {
    import s.implicits._
    val rows: Dataset[SimIn] = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(graft.functions.Hashes.simHash(col("text")).as("sig"),
        col("doc_id"))
      .select(expr("CAST(shiftrightunsigned(sig, 56) AS INT)").as("pfx"),
        col("doc_id"), col("sig"))
      .as[SimIn]
    rows
      .groupByKey(_.pfx)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        updateSimhashDedup(SimRingCap, SimHamMax))
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** File-source document stream (one file per micro-batch) → scan-side
    * tokenization → per-source Space-Saving summary → memory sink in
    * update mode; the latest version per source is the live global
    * heavy-hitter scoreboard. */
  def streamSpaceSaving(s: SparkSession, dir: String, schema: StructType,
      sinkName: String, m: Int): StreamingQuery = {
    import s.implicits._
    val rows: Dataset[TokenIn] = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .as[TokenIn]
    rows
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateSpaceSaving(m))
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** File-source document stream (one file per micro-batch) → scan-side
    * token counting → per-source budget state → memory sink in update
    * mode; the decision rows ARE the admission ledger. */
  def streamBudget(s: SparkSession, dir: String, schema: StructType,
      sinkName: String, budget: Long): StreamingQuery = {
    import s.implicits._
    val docs: Dataset[BudgetDocIn] = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .as[BudgetDocIn]
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateBudget(budget))
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** File-source document stream (one file per micro-batch) → scan-side
    * shingle hashing (the same native expression as the batch chain) →
    * per-source KMV state → memory sink in update mode; the latest row
    * per source is the live sketch. */
  def streamKmv(s: SparkSession, dir: String, schema: StructType,
      sinkName: String, k: Int): StreamingQuery = {
    import s.implicits._
    val rows: Dataset[ShingleIn] = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(col("source"), explode(array_distinct(
        org.apache.spark.sql.graftext.ngramExpressions
          .wordShingleHashes(col("text"), 3))).as("h"))
      .as[ShingleIn]
    rows
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateKmv(k))
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  final case class KllIn(shard: Int, id: Long, v: Double)
  final case class KllShardState(ver: Long, st: graft.functions.KllState)
  final case class KllLedger(shard: Int, ver: Long, batch_n: Long, n: Long,
      items: Long, est_p50: Double)

  /** Shard fan-out for the KLL ingest (hash of the arrival id). */
  val KllShards = 8

  /** E4w — STREAMING KLL QUANTILE INGEST (the q43/e4w_kll_quantile rank
    * sketch as per-shard state): every arrival's value folds into the
    * shard's [[graft.functions.KllState]] compactor — the MERGEABLE
    * sketch, so the per-shard states can later union into one corpus
    * summary exactly like the batch UDAF's map-side partials. Completes
    * the bounded-state family's answer matrix: E4r answers which values
    * are frequent, E4v how often THIS value occurred, q42/HLL how many
    * distinct — this answers WHERE IN THE DISTRIBUTION a value sits
    * (quantiles/rank), the ingest-side monitor a drifting feature
    * pipeline alarms on. State per shard is ≤ K·(log₂(n/K)+2) doubles —
    * logarithmic FOREVER (≈5 KB at a billion arrivals), the only
    * sub-linear-but-not-constant state in the family, with the bound
    * soaked at volume. Within a micro-batch, arrivals fold in id order
    * (the E4q determinism discipline); the per-batch emission is the
    * count-conservation + state-bound ledger with the running median
    * estimate — the accuracy law (est within the exact [p45, p55] of
    * everything the shard ever saw) is checked by the soak against a
    * batch recount. */
  def updateKll(shard: Int, rows: Iterator[KllIn],
      state: GroupState[KllShardState]): Iterator[KllLedger] = {
    import graft.functions.KllSketch
    val prev = state.getOption.getOrElse(
      KllShardState(0L, KllSketch.empty))
    var st = prev.st
    var batch = 0L
    rows.toSeq.sortBy(_.id).foreach { r =>
      st = KllSketch.add(st, r.v); batch += 1
    }
    val ver = prev.ver + 1
    state.update(KllShardState(ver, st))
    Iterator.single(KllLedger(shard, ver, batch, st.n,
      KllSketch.items(st).toLong, KllSketch.quantile(st, 0.5)))
  }

  /** File-source event stream → id-hash shard → per-shard KLL compactor
    * state → memory sink; the emitted rows are the conservation/bound
    * ledger. */
  def streamKllQuantile(s: SparkSession, dir: String, schema: StructType,
      sinkName: String): StreamingQuery = {
    import s.implicits._
    val rows: Dataset[KllIn] = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(pmod(col("event_id"), lit(KllShards.toLong)).cast("int")
        .as("shard"),
        col("event_id").as("id"), col("value").cast("double").as("v"))
      .as[KllIn]
    rows
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateKll)
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** File-source stream (one file per micro-batch, so winners are
    * maintained incrementally across arrivals) → per-source quota state →
    * memory sink in update mode. */
  def streamQuota(s: SparkSession, dir: String, schema: StructType,
      sinkName: String, k: Int): StreamingQuery = {
    import s.implicits._
    val docs: Dataset[DocIn] = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(col("doc_id"), col("source"), col("lang"))
      .as[DocIn]
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateQuota(k))
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }
}
