package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Deterministic sampling for corpus curation (SURVEY.md §2 E6).
  * At 100 TB you cannot re-draw a random sample and get the same corpus
  * twice — sampling must be a PURE FUNCTION of the record key so it is
  * reproducible across runs, engines, and backfills, and composable with
  * incremental processing (a record's membership never changes). The
  * standard trick: hash the key, keep the record iff the hash lands under
  * the rate. No shuffle, no state, scan-side filter.
  *
  * Each PURPOSE gets its own salt: slot(id, SampleSalt) for sampling and
  * slot(id, SplitSalt) for the train/val/test split are independent hash
  * streams, so composing sample-then-split keeps ~90/5/5 proportions
  * inside the sample. With a shared stream the sampled slots (< 20) would
  * be a subset of the train slots (< 90) and the sample would contain
  * zero val/test docs. */
object Sampling {

  /** Purpose salts for the slot stream. Distinct per use so derived
    * memberships are pairwise independent; mirrored in the oracles. */
  val SampleSalt = 0x5a3c1e9f7b2d4865L
  val SplitSalt  = 0x26f0b5e3d891a74cL
  val WeightSalt = 0x31c9d2ab34e8f516L

  /** slot in [0,100) as a pure function of (key, purpose-salt):
    * splitmix64(key ^ salt) with the sign bit cleared, mod 100. */
  def slot(key: Column, salt: Long): Column =
    pmod(org.apache.spark.sql.graftext.minhashExpression
      .mix64(key.bitwiseXOR(lit(salt)))
      .bitwiseAND(lit(Long.MaxValue)), lit(100L))

  /** E6 — 20% per-language stratified sample: membership is
    * slot(doc_id, SampleSalt) < 20, evaluated per stratum so every
    * language keeps ~20% regardless of corpus skew. The mix64 expression
    * is the oracle-replicable scrambler (see OracleSql). Plan: a narrow
    * scan-side filter — no shuffle, no sampling state, same sample at any
    * scale. */
  def e6StratifiedSample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(slot(col("doc_id"), SampleSalt) < 20)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("lang")

  /** E6 — the sampled doc ids themselves (scan-shaped variant: what a
    * pipeline actually materializes). */
  def e6SampleIds(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(slot(col("doc_id"), SampleSalt) < 20)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** E6 — deterministic train/val/test split (90/5/5): the split a doc
    * lands in is a pure function of its id — a SplitSalt-keyed slot
    * stream independent of the sampler's — so the assignment is stable
    * across runs, engines, and incremental backfills, and sample∘split
    * compositions keep all three splits populated. Scan-side, no shuffle
    * beyond the final aggregate. */
  def e6TrainValTest(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("slot", slot(col("doc_id"), SplitSalt))
      .withColumn("split",
        when(col("slot") < 90, "train")
          .when(col("slot") < 95, "val")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
      .orderBy("split", "lang")

  /** E6 — near-dup-CLUSTER-aware train/val/test split: the split key is
    * the document's cluster label (min doc_id of its near-dup component),
    * not the document id — so a document and its near-duplicates can
    * NEVER straddle splits. A doc-level split leaks: a test document
    * whose near-copy sits in train is memorization dressed as
    * generalization (exactly what e1_contamination measures after the
    * fact; this op prevents it by construction). Singleton documents get
    * cluster = their own id, so their assignment is IDENTICAL to
    * e6_train_val_test — the cluster-aware split only moves documents
    * that have near-duplicates, and the spec proves both the invariance
    * and the no-straddle property against the pair table. Plan: the
    * cluster labels come from the shared pair-table propagation
    * (pair-sized, not corpus-sized), then one doc_id join and the same
    * scan-side splitmix slot gate as every e6 sampler; the summary
    * aggregate is 3 rows. */
  def e6ClusterSplit(s: SparkSession, d: String): DataFrame =
    Dedup.dedupClusterTable(s, d)
      .join(documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt")), Seq("doc_id"))
      .withColumn("slot", slot(col("cluster"), SplitSalt))
      .withColumn("split",
        when(col("slot") < 90, "train")
          .when(col("slot") < 95, "val")
          .otherwise("test"))
      .groupBy("split")
      .agg(countDistinct(col("cluster")).as("n_clusters"),
        count(lit(1)).as("n_docs"), sum(col("nt")).as("tot_tokens"))
      .orderBy("split")

  /** Percent of the event-time span that lands in the train split. */
  val TimeSplitPct = 80L

  /** E6 — TEMPORAL train/eval split over the event stream: train on the
    * first TimeSplitPct% of the time span, evaluate on the rest — the
    * split forecasting / recommendation / anomaly models require, where
    * a hash split would leak the future into training (the temporal
    * analogue of e6_cluster_split's near-dup leakage). The cutoff is
    * exact integer arithmetic on epoch micros (min + span·pct div 100),
    * so the boundary is bit-stable across engines and backfills — a
    * re-run of the split against the same snapshot reproduces it
    * exactly. Emits per split: event/user/type counts and the actual
    * time range, whose non-overlap IS the no-leakage property (asserted
    * in spec). Plan: one broadcast 1-row bounds aggregate, a scan-side
    * integer gate, and a 2-key aggregate — the stream is read once,
    * never shuffled beyond the final 2-row exchange. */
  def e6TimeSplit(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("ts"), col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("us"))
    val bounds = broadcast(ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx")))
    ev.crossJoin(bounds)
      .withColumn("cutoff", expr(s"mn + (mx - mn) * $TimeSplitPct div 100"))
      .withColumn("split",
        when(col("us") < col("cutoff"), "train").otherwise("eval"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("from_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("to_ts"))
      .orderBy("split")
  }

  /** E6 — quality-weighted deterministic sampling: a document is kept
    * with probability proportional to its quality score (the up-weighting
    * a curation pipeline applies so high-quality text is over-represented
    * without dropping the tail entirely). Membership stays a pure function
    * of the id: keep iff slot(doc_id, WeightSalt) < floor(score·100),
    * where score is the declared quality query's ROUNDED score — integer
    * threshold against an independent salted stream, so the draw is
    * reproducible, engine-portable, and composable with the other
    * samplers. Scan-side filter; no shuffle. */
  def e6WeightedSample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("nt", size(split(col("text"), " ")))
      .withColumn("nsw", size(expr(TextOps.stopwordFilterSql)))
      .withColumn("score", round(TextOps.qualityScore(col("nt"), col("nsw")), 4))
      .filter(slot(col("doc_id"), WeightSalt) < floor(col("score") * 100))
      .select(col("doc_id"), col("lang"), col("score"))
      .orderBy("doc_id")

  /** Quota-sample parameters — interpolated into BOTH engines. */
  val QuotaSalt = 0x5be6a92c14d87e3bL
  val QuotaK = 16

  /** E6 — per-source quota sampling (the fixed-size-per-stratum draw a
    * curation pipeline uses when it needs exactly K exemplars from every
    * source regardless of source size — audits, eval sets, prompt-mix
    * pinning): keep the K documents with the smallest splitmix64(doc_id ^
    * salt) per source. This is deterministic reservoir sampling — the
    * priority is a pure function of the id, so the K winners are stable
    * across runs, engines, and incremental arrivals (a new doc displaces
    * the current max-priority winner exactly when its hash is smaller,
    * which is how a streaming ingest maintains the same quota
    * incrementally). Plan: the rank-filter window triggers Spark's
    * WindowGroupLimit pushdown (plan-asserted), so every input partition
    * pre-prunes to its own top-K per source BEFORE the shuffle — the
    * exchange carries O(K × sources × partitions) rows, not the corpus,
    * which is what makes a per-stratum top-K runnable at 100 TB where a
    * naive full window sort per source would serialize each source
    * through one task. */
  def e6QuotaSample(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("prio"), col("doc_id"))
    documents(s, d)
      .withColumn("prio", org.apache.spark.sql.graftext.minhashExpression
        .mix64(col("doc_id").bitwiseXOR(lit(QuotaSalt))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= QuotaK)
      .select(col("source"), asLong(col("rk")).as("rk"), col("doc_id"), col("lang"))
      .orderBy("source", "rk")
  }

  /** Global-shuffle parameters — interpolated into BOTH engines. The
    * shard count is the parallelism knob: at 100 TB pick O(cluster cores ×
    * files-per-task); 8 keeps the fixture output readable. */
  val ShuffleSalt = 0x7d4f3a58e1b96c27L
  val ShuffleShards = 8L

  /** E6 — deterministic global shuffle into training shards: the
    * shuffle-before-training step every pipeline runs so batches are not
    * correlated with crawl/source order. Each document's (shard, pos) is a
    * pure function of its id — shard = splitmix64(doc_id ^ salt) mod K,
    * pos = rank of that same hash within the shard — so the shuffled
    * order is reproducible across runs, engines, and backfills (the e6
    * sampling discipline applied to ordering), and a resumed training job
    * reads byte-identical shards. Plan: ONE hash exchange on shard, then
    * a per-shard sort. Unlike e3_pack's source key (data-determined, can
    * be 1 hot source), the shard key is CHOSEN: parallelism = K scales
    * with the cluster, per-shard sort is n/K rows, and the hash spreads
    * documents uniformly regardless of corpus skew — a global sort-by-
    * random-key expressed as K independent local sorts. */
  /** Curriculum salt — independent of the shuffle/sample/split salts so
    * the curriculum order is uncorrelated with every other gate. */
  val CurriculumSalt = 0x48d1c7a92e5b6f33L

  /** E6 — CURRICULUM schedule: the full training reading order for
    * easy-to-hard curriculum training — documents staged into quality
    * DECILES (tier 1 = lowest-score tenth ... 10 = highest; the
    * e3_quality_tiers integer-ceil histogram arithmetic, so equal scores
    * never split across a phase boundary) and deterministically shuffled
    * WITHIN each tier (the e6_global_shuffle discipline: prio =
    * splitmix64(doc_id ^ salt), shard = prio mod K, seq = rank within
    * (tier, shard)), with a running token total per (tier, shard) so the
    * loader can cut token-budgeted phase boundaries without a second
    * pass. Plan: score and prio are scan-side; the tier map is the tiny
    * score histogram (≤10⁴ rows — bounded by the 4-dp score domain)
    * broadcast back onto the scan, so the corpus crosses exactly ONE
    * (tier, shard) exchange and both windows (rank + running sum) ride
    * it; per-shard work is n/(10·K) rows, and K is the cluster-width
    * knob exactly as in e6_global_shuffle. */
  def e6Curriculum(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = documents(s, d)
      .withColumn("nt", size(split(col("text"), " ")))
      .withColumn("nsw", size(expr(TextOps.stopwordFilterSql)))
      .select(col("doc_id"), asLong(col("nt")).as("n_tokens"),
        round(TextOps.qualityScore(col("nt"), col("nsw")), 4).as("score"))
    val wCum = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // single-partition windows, but over the bounded score histogram
    val tierMap = q.groupBy("score").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wTot))
      .select(col("score"), expr("(cum * 10 + tot - 1) div tot").as("tier"))
    val w = Window.partitionBy("tier", "shard")
      .orderBy(col("prio"), col("doc_id"))
    q.join(broadcast(tierMap), "score")
      .withColumn("prio", org.apache.spark.sql.graftext.minhashExpression
        .mix64(col("doc_id").bitwiseXOR(lit(CurriculumSalt))))
      .withColumn("shard",
        pmod(col("prio").bitwiseAND(lit(Long.MaxValue)), lit(ShuffleShards)))
      .withColumn("seq", row_number().over(w))
      // unique (prio, doc_id) ordering → default RANGE frame ≡ ROWS in
      // both engines, and both windows share the one exchange
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col("tier"), col("shard"), asLong(col("seq")).as("seq"),
        col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy("tier", "shard", "seq")
  }

  def e6GlobalShuffle(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(col("prio"), col("doc_id"))
    documents(s, d)
      .withColumn("prio", org.apache.spark.sql.graftext.minhashExpression
        .mix64(col("doc_id").bitwiseXOR(lit(ShuffleSalt))))
      .withColumn("shard",
        pmod(col("prio").bitwiseAND(lit(Long.MaxValue)), lit(ShuffleShards)))
      // narrow before the shard exchange: the shuffled ORDER is ids-only
      // (a consumer joins text back by doc_id at read time), so the text
      // column must not ride the window (the pre-window projection rule)
      .select(col("doc_id"), col("source"), col("prio"), col("shard"))
      .withColumn("pos", row_number().over(w))
      .select(col("shard"), asLong(col("pos")).as("pos"), col("doc_id"),
        col("source"))
      .orderBy("shard", "pos")
  }

  /** E6 — training-shard export MANIFEST: per shard, the doc count, token
    * total, and an order-independent content checksum. The dataset-card
    * artifact an export writes next to its shards: a backfill re-run must
    * reproduce it exactly (same deterministic shard assignment as
    * e6_global_shuffle), and an auditor verifies a shard against it
    * without rescanning text. Checksum = XOR of splitmix64(doc-hash ⊕
    * content-fingerprint) terms: XOR is commutative (stable under any
    * intra-shard execution order, like the sum it replaces) but each term
    * now folds the DOC IDENTITY into the mix — a plain fp sum was linear,
    * so moving duplicated content between docs of the same shard left it
    * unchanged, and its 30-bit range meant ~2^-30 collision odds, weaker
    * than an audit artifact should be. Mixed-term XOR detects
    * moved/attributed content and carries full 64-bit avalanche
    * (~2^-64). Plan: fingerprint + token count + term are scan-side; the
    * |shards|-key aggregate partial-combines map-side, so the corpus
    * crosses ONE exchange of |shards| pre-aggregated rows — the
    * per-shard sort of the shuffle itself isn't needed for the
    * manifest. */
  def e6Manifest(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("prio", org.apache.spark.sql.graftext.minhashExpression
        .mix64(col("doc_id").bitwiseXOR(lit(ShuffleSalt))))
      .withColumn("shard",
        pmod(col("prio").bitwiseAND(lit(Long.MaxValue)), lit(ShuffleShards)))
      .withColumn("term", org.apache.spark.sql.graftext.minhashExpression
        .mix64(col("prio").bitwiseXOR(
          graft.functions.Hashes.rollingHash(col("text")))))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        asLong(sum(size(split(col("text"), " ")))).as("n_tokens"),
        expr("bit_xor(term)").as("checksum"))
      .orderBy("shard")

  /** DSIR feature-space size — interpolated into BOTH engines. 64 keeps
    * the fixture oracle readable; production uses 10k–100k buckets. */
  val DsirBuckets = 64L
  /** The target-corpus predicate: which documents define the distribution
    * we resample TOWARD (here: the English slice). */
  val DsirTargetLang = "en"

  /** E6 — DSIR-style data selection via hashed-n-gram importance weights
    * (Xie et al. 2023, arXiv:2302.03169): score every raw document by how
    * much more likely its tokens are under a TARGET distribution (the
    * high-quality / in-domain slice — here the `en` documents) than under
    * the RAW distribution, and keep the documents the target up-weights.
    * The feature space is hashed unigrams (FNV-1a mod 64 buckets); the
    * per-bucket weight is the hits-per-million difference hpm_target −
    * hpm_raw computed in exact INTEGER division (the e3_lm_score log-free
    * treatment: a float log-ratio sum is accumulation-order-dependent,
    * an integer hpm-difference sum is exact and order-independent), and a
    * document's score is the sum of its tokens' bucket weights — positive
    * means "more target-like than raw-like", the keep decision. A
    * production DSIR samples ∝ exp(score); the deterministic sign gate
    * keeps the e6 reproducibility contract (membership is a pure function
    * of the corpus, never a random draw).
    *
    * Plan: pass 1 builds the 64-bucket feature table in ONE corpus scan
    * (cr and ct from the same aggregate — the raw and target counts share
    * the scan), partial-combined map-side to 64 keys; totals fold those 64
    * rows; the weight table rides a broadcast back over pass 2's token
    * stream, whose per-doc sum partial-aggregates WITHIN each input
    * partition (a doc's tokens are colocated by construction) so the only
    * corpus-sized exchange carries one row per document. Nothing is
    * collected; the model is 64 rows at any corpus size. */
  def e6Dsir(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(filter(split(col("text"), " "), t => t =!= lit(""))).as("tok"))
      .withColumn("b", pmod(graft.functions.Hashes.fnv64(col("tok")),
        lit(DsirBuckets)))
    val bc = toks.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("ct"))
    val w = bc.crossJoin(broadcast(bc.agg(
        sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))))
      .select(col("b"),
        (expr("1000000 * ct div nt") - expr("1000000 * cr div nr")).as("w"))
    toks.join(broadcast(w), "b")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score"))
      .withColumn("keep", col("score") > 0)
      .orderBy("doc_id")
  }

  /** Salt for the within-source shuffle rank of the interleave. */
  val InterleaveSalt = 0x4c8e2f17a9d35b6eL

  /** E6 — deterministic proportional source INTERLEAVE: the training-order
    * assignment that follows the mixture decision. Reading sources
    * back-to-back trains on correlated batches; a global random shuffle
    * fixes that but loses the mixture's per-source pacing when sources are
    * later re-weighted. Stride scheduling gives both: shuffle WITHIN each
    * source (splitmix64 rank, like e6_global_shuffle), then place source
    * s's r-th document at fractional position (2r−1)/(2n_s) — the classic
    * low-discrepancy stride — so every prefix of the training order holds
    * each source in proportion to its share, within ±1 document (the spec
    * asserts this for every prefix). Position is integer micro-units
    * ((10⁶·(2r−1)) div (2n) — exact cross-engine; overflow only beyond
    * ~4.6·10¹² docs in ONE source), ties broken by (source, doc_id).
    * Plan: per-source window rank (distributed by source), per-source
    * counts broadcast back, key computed scan-side; the final order is a
    * range-partitioned sort — no single-task stage anywhere. */
  def e6Interleave(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("prio"), col("doc_id"))
    val ranked = documents(s, d)
      .withColumn("prio", org.apache.spark.sql.graftext.minhashExpression
        .mix64(col("doc_id").bitwiseXOR(lit(InterleaveSalt))))
      .withColumn("r", asLong(row_number().over(w)))
    val counts = ranked.groupBy("source").agg(count(lit(1)).as("n"))
    ranked.join(broadcast(counts), "source")
      .withColumn("pos_ppm", expr("(1000000 * (2*r - 1)) div (2*n)"))
      .select(col("doc_id"), col("source"), col("r").as("src_rank"),
        col("pos_ppm"))
      .orderBy("pos_ppm", "source", "doc_id")
  }

  /** Purpose salt for the k-fold assignment — independent of every other
    * sampling salt so fold ∘ sample ∘ split stay uncorrelated. */
  val KfoldSalt = 0x6f1d8c3b25a4e970L

  /** Fold count for e6Kfold — interpolated into BOTH engines. 100 is
    * divisible by it, so the slot-mod assignment is exactly uniform over
    * the hash slots. */
  val Kfolds = 5

  /** E6 — deterministic K-FOLD cross-validation assignment summary: every
    * document lands in fold splitmix64(doc_id ^ salt) mod K — a pure
    * function of the id, so fold f's train set (the complement) is
    * reproducible on any engine, any run, any scale, with no sampling
    * state (the e6_train_val_test discipline extended to the K-round
    * evaluation protocol; an independent salt keeps folds uncorrelated
    * with the sample/split gates). Emits the per-fold audit row a CV
    * harness checks before training: doc/token mass plus an id checksum
    * (order-independent integer sum) that a backfill must reproduce
    * exactly — ALL-INTEGER. Partition-law properties (disjoint, total,
    * balanced) are spec-asserted. Plan: scan-side hash gate, one K-key
    * map-side-combined aggregate; the corpus never shuffles. */
  def e6Kfold(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        (slot(col("doc_id"), KfoldSalt) % lit(Kfolds.toLong)).as("fold"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        sum(col("doc_id")).as("id_sum"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("fold")

  /** E6 — SPLIT-LEAKAGE audit: near-duplicate pairs classified by which
    * train/val/test splits their endpoints land in — the "is my eval set
    * contaminated by training near-duplicates" check every benchmark
    * pipeline runs before trusting a score (hash-random splits
    * deliberately ignore content, so a duplicated document routinely
    * puts one copy in train and one in val — this table COUNTS those;
    * the remedy is e6_cluster_split, which splits by dedup-cluster key
    * so near-dup families travel together, and this audit is exactly
    * the evidence for deploying it). One row per unordered split pair
    * (train↔val and train↔test rows are the leakage; within-split rows
    * are benign duplication), ALL-INTEGER. Plan: the shared memoized
    * LSH pair table joined twice to the scan-side split gate —
    * pair-table-sized work, the corpus never shuffles. */
  def e6SplitLeakage(s: SparkSession, d: String): DataFrame = {
    val sp = documents(s, d).select(col("doc_id"),
      when(slot(col("doc_id"), SplitSalt) < 90, "train")
        .when(slot(col("doc_id"), SplitSalt) < 95, "val")
        .otherwise("test").as("split"))
    Dedup.minhashPairTable(s, d).select(col("da"), col("db"))
      .join(sp.select(col("doc_id").as("da"), col("split").as("sa")), "da")
      .join(sp.select(col("doc_id").as("db"), col("split").as("sb")), "db")
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy("split_a", "split_b")
  }

  val GroupKfoldSalt = 0x7be41f20c6a83d59L

  /** E6 — GROUPED K-fold assignment: every document of a source lands in
    * the SAME fold — fold(source) = slot(min(doc_id) per source,
    * GroupKfoldSalt) mod K. This is the leakage-safe CV protocol when
    * groups correlate with content (sklearn's GroupKFold): plain
    * e6_kfold splits WITHIN a source, so near-identical same-source docs
    * straddle train/eval and inflate scores (exactly what
    * e6_split_leakage counts); grouping by source moves whole templates
    * together. The group key is the source's MINIMUM doc id — a pure
    * function of the data usable for ANY group type without a
    * cross-engine string hash — so the assignment stays reproducible on
    * any engine with no sampling state. Emits the per-fold audit row
    * (source/doc/token mass + the order-independent id checksum, the
    * e6_kfold contract; empty folds are simply absent). ALL-INTEGER.
    * Plan at 100 TB: the source→fold table is one bounded-domain
    * aggregate (|sources| rows) that BROADCASTS back onto the corpus
    * scan; the fold aggregate partial-combines map-side — the corpus
    * never shuffles. */
  def e6GroupKfold(s: SparkSession, d: String): DataFrame = {
    val sf = documents(s, d)
      .groupBy("source").agg(min(col("doc_id")).as("gkey"))
      .select(col("source"),
        (slot(col("gkey"), GroupKfoldSalt) % lit(Kfolds.toLong)).as("fold"))
    documents(s, d)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .join(broadcast(sf), "source")
      .groupBy("fold")
      .agg(countDistinct(col("source")).as("n_sources"),
        count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy("fold")
  }

  val AbSalt = 0x2c86f1a95d3e7b04L

  /** 95% critical value of χ² with 1 dof, on the 4-dp grid both engines
    * emit — interpolated into BOTH. */
  val SrmCrit4 = 3.8415

  /** E6 — A/B ASSIGNMENT with the SAMPLE-RATIO-MISMATCH guardrail: a
    * deterministic 50/50 hash split (slot < 50 → 'a') plus the one-dof
    * χ² against the declared ratio — for a 50/50 split the statistic
    * collapses exactly to (n_a − n_b)²/n — and the srm verdict at the
    * 95% critical value. SRM is the first gate every experimentation
    * platform runs before reading ANY metric: a biased assignment hash,
    * a variant-specific drop, or a filter applied after assignment all
    * surface here first, and a triggered SRM invalidates the experiment
    * regardless of its p-values. The salt is independent of the
    * sample/split/fold gates, so assignment is uncorrelated with every
    * other declared membership. Exactness: counts are exact, the
    * statistic is one double division from exact longs, 4-dp rounded;
    * the verdict compares the ROUNDED value to the 4-dp critical
    * constant (the rounded-grid discipline). At the 10¹²-doc domain
    * (n_a − n_b)² can exceed 2⁶³ only in the all-one-side failure case
    * the flag exists to catch — the division then lifts to
    * DECIMAL(38,0) per the e8_gini rule. Plan at 100 TB: scan-side hash
    * gate + one 2-key map-side-combined aggregate. */
  def e6AbSrm(s: SparkSession, d: String): DataFrame = {
    documents(s, d)
      .select(when(slot(col("doc_id"), AbSalt) < 50L, 1L).otherwise(0L)
        .as("isa"))
      .agg(sum(col("isa")).as("n_a"),
        sum(lit(1L) - col("isa")).as("n_b"))
      .select(col("n_a"), col("n_b"), (col("n_a") - col("n_b")).as("delta"),
        round(pow((col("n_a") - col("n_b")).cast("double"), 2) /
          (col("n_a") + col("n_b")).cast("double"), 4).as("chi2"))
      .withColumn("srm", col("chi2") > SrmCrit4)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e6_ab_srm" -> (e6AbSrm _),
    "e6_group_kfold" -> (e6GroupKfold _),
    "e6_split_leakage" -> (e6SplitLeakage _),
    "e6_kfold" -> (e6Kfold _),
    "e6_interleave" -> (e6Interleave _),
    "e6_dsir" -> (e6Dsir _),
    "e6_cluster_split" -> (e6ClusterSplit _),
    "e6_time_split" -> (e6TimeSplit _),
    "e6_manifest" -> (e6Manifest _),
    "e6_stratified_sample" -> (e6StratifiedSample _),
    "e6_sample_ids" -> (e6SampleIds _),
    "e6_train_val_test" -> (e6TrainValTest _),
    "e6_weighted_sample" -> (e6WeightedSample _),
    "e6_quota_sample" -> (e6QuotaSample _),
    "e6_global_shuffle" -> (e6GlobalShuffle _),
    "e6_curriculum" -> (e6Curriculum _),
  )

  /** CTE chain computing mix64(doc_id ^ salt) & Long.MaxValue mod 100 as
    * `slot` (doc_id and both salts are positive longs, so the xor stays
    * below 2^63 and the unsigned HUGEINT carry matches Spark exactly).
    * Shared with the Dedup contamination oracle. */
  private[ops] def slotCtes(salt: Long): String = {
    import OracleSql._
    s"""mx0 AS (SELECT doc_id, lang,
       |  (xor(CAST(doc_id AS HUGEINT), CAST('$salt' AS HUGEINT)) + $A) % $M AS z0 FROM documents),
       |mx1 AS (SELECT doc_id, lang, ${mulmod("xor(z0, z0 >> 30)", C1)} AS z1 FROM mx0),
       |mx2 AS (SELECT doc_id, lang, ${mulmod("xor(z1, z1 >> 27)", C2)} AS z2 FROM mx1),
       |slots AS (SELECT doc_id, lang,
       |  (xor(z2, z2 >> 31) % CAST(power(2, 63) AS HUGEINT)) % 100 AS slot FROM mx2)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // split chain under an lsx prefix: Sampling.slotCtes' CTE names
    // (slots, mx0..) collide with the MinHash chain's, so the split
    // gate gets its own prefixed mix (the e8_drift treatment)
    "e6_split_leakage" -> {
      import OracleSql._
      s"""WITH ${Dedup.minhashCtes},
         |mhp2 AS MATERIALIZED (SELECT da, db FROM mhp),
         |lsx_in AS (SELECT doc_id,
         |  xor(CAST(doc_id AS HUGEINT), CAST('$SplitSalt' AS HUGEINT)) AS h0
         |  FROM documents),
         |${mixCtes("lsx", "h0", "h1", Seq("doc_id"))},
         |spl AS (SELECT doc_id,
         |  CASE WHEN (h1 % CAST(power(2, 63) AS HUGEINT)) % 100 < 90
         |         THEN 'train'
         |       WHEN (h1 % CAST(power(2, 63) AS HUGEINT)) % 100 < 95
         |         THEN 'val'
         |       ELSE 'test' END AS split FROM lsx)
         |SELECT least(a.split, b.split) AS split_a,
         |  greatest(a.split, b.split) AS split_b,
         |  count(*) AS n_pairs
         |FROM mhp2 JOIN spl a ON mhp2.da = a.doc_id
         |JOIN spl b ON mhp2.db = b.doc_id
         |GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin
    },
    // 50/50 slot gate off the ab-prefixed splitmix chain; the 1-dof
    // SRM statistic collapses to (n_a - n_b)^2 / n (see e6AbSrm)
    "e6_ab_srm" -> {
      import OracleSql._
      val saltU = java.lang.Long.toUnsignedString(AbSalt)
      s"""WITH asr_in AS (SELECT doc_id,
         |    xor(CAST(doc_id AS HUGEINT), CAST('$saltU' AS HUGEINT)) AS b0
         |  FROM documents),
         |${mixCtes("asr", "b0", "b1", Seq("doc_id"))},
         |srm_v AS (SELECT CASE WHEN (b1 % CAST(power(2, 63) AS HUGEINT))
         |    % 100 < 50 THEN 1 ELSE 0 END AS isa FROM asr),
         |srm_counts AS (SELECT CAST(sum(isa) AS BIGINT) AS n_a,
         |    CAST(sum(1 - isa) AS BIGINT) AS n_b FROM srm_v)
         |SELECT n_a, n_b, n_a - n_b AS delta,
         |  round(pow(CAST(n_a - n_b AS DOUBLE), 2)
         |    / CAST(n_a + n_b AS DOUBLE), 4) AS chi2,
         |  round(pow(CAST(n_a - n_b AS DOUBLE), 2)
         |    / CAST(n_a + n_b AS DOUBLE), 4) > $SrmCrit4 AS srm
         |FROM srm_counts""".stripMargin
    },
    // per-source min-doc-id group key through the gkf-prefixed splitmix
    // chain (the e6_split_leakage prefixing treatment); fold = slot mod K
    "e6_group_kfold" -> {
      import OracleSql._
      val saltU = java.lang.Long.toUnsignedString(GroupKfoldSalt)
      s"""WITH gkf_in AS (SELECT source,
         |    xor(CAST(gkey AS HUGEINT), CAST('$saltU' AS HUGEINT)) AS g0
         |  FROM (SELECT source, min(doc_id) AS gkey FROM documents
         |    GROUP BY 1)),
         |${mixCtes("gkf", "g0", "g1", Seq("source"))},
         |gfold AS (SELECT source,
         |  CAST((g1 % CAST(power(2, 63) AS HUGEINT)) % 100 % $Kfolds
         |    AS BIGINT) AS fold FROM gkf)
         |SELECT fold, count(DISTINCT d.source) AS n_sources,
         |  count(*) AS n_docs,
         |  CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(sum(d.doc_id) AS BIGINT) AS id_sum
         |FROM documents d JOIN gfold USING (source)
         |GROUP BY fold ORDER BY fold""".stripMargin
    },
    "e6_kfold" ->
      s"""WITH ${slotCtes(KfoldSalt)},
         |f AS (SELECT s.doc_id, CAST(s.slot % $Kfolds AS BIGINT) AS fold,
         |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nt
         |  FROM slots s JOIN documents d USING (doc_id))
         |SELECT fold, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(min(doc_id) AS BIGINT) AS first_doc,
         |  CAST(max(doc_id) AS BIGINT) AS last_doc
         |FROM f GROUP BY fold ORDER BY fold""".stripMargin,
    "e6_time_split" ->
      s"""WITH e AS (SELECT ts, user_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |b AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
         |g AS (SELECT ts, user_id, event_type,
         |    CASE WHEN us < mn + ((mx - mn) * $TimeSplitPct) // 100
         |         THEN 'train' ELSE 'eval' END AS split
         |  FROM e CROSS JOIN b)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS from_ts,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS to_ts
         |FROM g GROUP BY split ORDER BY split""".stripMargin,
    // cluster labels from the recursive-CTE replica of the LSH pair
    // pipeline; the slot gate is the shared splitmix chain applied to the
    // CLUSTER id (unsigned m mod 2^63 = Spark's & Long.MaxValue)
    "e6_cluster_split" -> {
      import OracleSql._
      s"""WITH RECURSIVE ${Dedup.minhashCtes},
         |edges AS (SELECT da AS a, db AS b FROM mhp
         |  UNION SELECT db, da FROM mhp),
         |reach(v, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.v = e.b),
         |cl AS (SELECT v AS doc_id, min(lab) AS cluster FROM reach GROUP BY v),
         |ntt AS (SELECT doc_id, len(string_split(text, ' ')) AS nt
         |  FROM documents),
         |sp_in AS (SELECT cluster, cl.doc_id, nt,
         |  xor(CAST(cluster AS HUGEINT),
         |      CAST('${Sampling.SplitSalt}' AS HUGEINT)) AS v
         |  FROM cl JOIN ntt USING (doc_id)),
         |${mixCtes("sp", "v", "m", Seq("cluster", "doc_id", "nt"))},
         |lab AS (SELECT cluster, nt,
         |  CASE WHEN (m % CAST(power(2, 63) AS HUGEINT)) % 100 < 90
         |         THEN 'train'
         |       WHEN (m % CAST(power(2, 63) AS HUGEINT)) % 100 < 95
         |         THEN 'val'
         |       ELSE 'test' END AS split FROM sp)
         |SELECT split, CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS tot_tokens
         |FROM lab GROUP BY split ORDER BY split""".stripMargin
    },
    // per-token FNV-1a 64 replicated in HUGEINT (the simhash oracle's
    // fold), bucket = unsigned h mod 64 — equal to Spark's pmod(signed,
    // 64) because 64 divides 2^64 so the signed fold leaves the low six
    // bits unchanged. All weight arithmetic is integer division (//), so
    // no float ever enters the score.
    "e6_dsir" -> {
      import OracleSql._
      s"""WITH tk AS (
         |  SELECT doc_id, lang,
         |    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
         |  FROM documents),
         |bk AS (
         |  SELECT doc_id, lang,
         |    CAST(list_reduce(
         |      list_prepend(CAST('14695981039346656037' AS HUGEINT),
         |        list_transform(range(1, length(tok) + 1),
         |          i -> CAST(unicode(substring(tok, CAST(i AS INT), 1)) AS HUGEINT))),
         |      (h, b) -> ((h - h % 256 + CAST(xor(CAST(h % 256 AS BIGINT),
         |                    CAST(b AS BIGINT)) AS HUGEINT))
         |                 * 1099511628211) % $M) % $DsirBuckets AS BIGINT) AS b
         |  FROM tk),
         |bc AS (SELECT b, count(*) AS cr,
         |    sum(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS ct
         |  FROM bk GROUP BY b),
         |tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM bc),
         |w AS (SELECT b,
         |    (1000000 * ct) // nt - (1000000 * cr) // nr AS w
         |  FROM bc, tot)
         |SELECT bk.doc_id AS doc_id, bk.lang AS lang,
         |  count(*) AS n_tokens, CAST(sum(w.w) AS BIGINT) AS score,
         |  sum(w.w) > 0 AS keep
         |FROM bk JOIN w ON bk.b = w.b
         |GROUP BY bk.doc_id, bk.lang ORDER BY doc_id""".stripMargin
    },
    "e6_quota_sample" -> {
      import OracleSql._
      s"""WITH mx_in AS (SELECT doc_id, source, lang,
         |  xor(CAST(doc_id AS HUGEINT), CAST('$QuotaSalt' AS HUGEINT)) AS h0
         |  FROM documents),
         |${mixCtes("mx", "h0", "h1", Seq("doc_id", "source", "lang"))},
         |pr AS (SELECT doc_id, source, lang, ${toSigned("h1")} AS prio FROM mx)
         |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, lang FROM (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY prio, doc_id) AS rk FROM pr)
         |WHERE rk <= $QuotaK ORDER BY source, rk""".stripMargin
    },
    "e6_manifest" -> {
      import OracleSql._
      s"""WITH mx_in AS (SELECT doc_id, text,
         |  xor(CAST(doc_id AS HUGEINT), CAST('$ShuffleSalt' AS HUGEINT)) AS h0
         |  FROM documents),
         |${mixCtes("mx", "h0", "h1", Seq("doc_id", "text"))},
         |sh AS (SELECT doc_id, text, h1,
         |  CAST((h1 % CAST(power(2, 63) AS HUGEINT)) % $ShuffleShards AS BIGINT)
         |    AS shard FROM mx),
         |fp AS (SELECT shard, h1, len(string_split(text, ' ')) AS nt,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(1, length(text) + 1),
         |      i -> CAST(unicode(substring(text, CAST(i AS INT), 1)) AS BIGINT))),
         |    (a, b) -> (a * 131 + b) % 1000000007) AS fp FROM sh),
         |tm_in AS (SELECT shard, nt, xor(h1, CAST(fp AS HUGEINT)) AS t0 FROM fp),
         |${mixCtes("tm", "t0", "t1", Seq("shard", "nt"))}
         |SELECT shard, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  bit_xor(${toSigned("t1")}) AS checksum
         |FROM tm GROUP BY shard ORDER BY shard""".stripMargin
    },
    "e6_interleave" -> {
      import OracleSql._
      s"""WITH mx_in AS (SELECT doc_id, source,
         |  xor(CAST(doc_id AS HUGEINT), CAST('$InterleaveSalt' AS HUGEINT)) AS h0
         |  FROM documents),
         |${mixCtes("mx", "h0", "h1", Seq("doc_id", "source"))},
         |rk AS (SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY ${toSigned("h1")}, doc_id) AS BIGINT) AS r FROM mx),
         |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n
         |  FROM documents GROUP BY 1)
         |SELECT doc_id, rk.source AS source, r AS src_rank,
         |  CAST((1000000 * (2 * r - 1)) // (2 * n.n) AS BIGINT) AS pos_ppm
         |FROM rk JOIN n ON rk.source = n.source
         |ORDER BY pos_ppm, source, doc_id""".stripMargin
    },
    // curriculum schedule: the e3_quality_tiers tier arithmetic joined
    // back per doc + the global-shuffle prio/shard mix under a cx prefix
    "e6_curriculum" -> {
      import OracleSql._
      s"""WITH q AS (SELECT doc_id, len(string_split(text, ' ')) AS nt,
         |  len(list_filter(string_split(text, ' '),
         |    t -> t IN ('the','a','of','and','to'))) AS nsw FROM documents),
         |s AS (SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
         |  round(least(1.0, CAST(nt AS DOUBLE) / 100.0)
         |    * (1.0 - CAST(nsw AS DOUBLE) / nt), 4) AS score FROM q),
         |h AS (SELECT score, count(*) AS c FROM s GROUP BY score),
         |t AS (SELECT score, sum(c) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  sum(c) OVER () AS tot FROM h),
         |tm AS (SELECT score,
         |  CAST((cum * 10 + tot - 1) // tot AS BIGINT) AS tier FROM t),
         |cx_in AS (SELECT doc_id,
         |  xor(CAST(doc_id AS HUGEINT), CAST('$CurriculumSalt' AS HUGEINT)) AS h0
         |  FROM documents),
         |${mixCtes("cx", "h0", "h1", Seq("doc_id"))},
         |pr AS (SELECT doc_id, ${toSigned("h1")} AS prio,
         |  CAST((h1 % CAST(power(2, 63) AS HUGEINT)) % $ShuffleShards AS BIGINT)
         |    AS shard FROM cx)
         |SELECT tm.tier, pr.shard,
         |  CAST(row_number() OVER (PARTITION BY tm.tier, pr.shard
         |    ORDER BY pr.prio, s.doc_id) AS BIGINT) AS seq,
         |  s.doc_id, s.n_tokens,
         |  CAST(sum(s.n_tokens) OVER (PARTITION BY tm.tier, pr.shard
         |    ORDER BY pr.prio, s.doc_id) AS BIGINT) AS cum_tokens
         |FROM s JOIN tm USING (score) JOIN pr USING (doc_id)
         |ORDER BY tier, shard, seq""".stripMargin
    },
    "e6_global_shuffle" -> {
      import OracleSql._
      s"""WITH mx_in AS (SELECT doc_id, source,
         |  xor(CAST(doc_id AS HUGEINT), CAST('$ShuffleSalt' AS HUGEINT)) AS h0
         |  FROM documents),
         |${mixCtes("mx", "h0", "h1", Seq("doc_id", "source"))},
         |pr AS (SELECT doc_id, source, ${toSigned("h1")} AS prio,
         |  CAST((h1 % CAST(power(2, 63) AS HUGEINT)) % $ShuffleShards AS BIGINT)
         |    AS shard FROM mx)
         |SELECT shard, CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY prio, doc_id) AS BIGINT) AS pos, doc_id, source
         |FROM pr ORDER BY shard, pos""".stripMargin
    },
    "e6_stratified_sample" ->
      s"""WITH ${slotCtes(SampleSalt)}
         |SELECT lang, count(*) AS n_sampled,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM slots WHERE slot < 20 GROUP BY lang ORDER BY lang""".stripMargin,
    "e6_sample_ids" ->
      s"""WITH ${slotCtes(SampleSalt)}
         |SELECT doc_id, lang FROM slots WHERE slot < 20 ORDER BY doc_id""".stripMargin,
    "e6_train_val_test" ->
      s"""WITH ${slotCtes(SplitSalt)}
         |SELECT CASE WHEN slot < 90 THEN 'train'
         |  WHEN slot < 95 THEN 'val' ELSE 'test' END AS split,
         |lang, count(*) AS n, min(doc_id) AS first_doc
         |FROM slots GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
    "e6_weighted_sample" ->
      s"""WITH ${slotCtes(WeightSalt)},
         |q AS (SELECT doc_id,
         |  round(least(1.0, CAST(nt AS DOUBLE) / 100.0)
         |    * (1.0 - CAST(nsw AS DOUBLE) / nt), 4) AS score
         |  FROM (SELECT doc_id, len(string_split(text, ' ')) AS nt,
         |    len(list_filter(string_split(text, ' '),
         |      t -> t IN ('the','a','of','and','to'))) AS nsw FROM documents))
         |SELECT s.doc_id AS doc_id, s.lang, q.score
         |FROM slots s JOIN q USING (doc_id)
         |WHERE s.slot < floor(q.score * 100) ORDER BY doc_id""".stripMargin,
  )
}
