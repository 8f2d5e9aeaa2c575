package graft.streaming

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** [EXT] Structured Streaming surface over `events` (SURVEY.md §2 E4).
  * The reference is batch-only; these are the streaming extensions a
  * training-data pipeline needs. Design rule: every aggregation that can
  * run identically in batch mode is ALSO exposed as a declared batch query
  * (e4a tumbling windows, e4c session windows) so the DuckDB oracle can
  * verify the same expression the stream runs; watermark/late-data and
  * stateful dedup behavior are streaming-only and covered by ScalaTest
  * against file-source streams. */
object StreamOps {

  /** E4a — tumbling 1-hour counts, batch mode (same window() expression a
    * stream would run; verified vs DuckDB time_bucket). */
  def e4aTumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"), col("total"))
      .orderBy("bucket", "event_type")

  /** E4n — per-window TOP-K "trending" table: the top-3 event types of
    * every tumbling 6-hour window by count (ties → event_type order) —
    * the live leaderboard a monitoring stream publishes per window
    * (e4a gives every bucket×type cell; this is the ranked digest a
    * dashboard actually renders, and in streaming form it is the
    * append-mode rank-over-finalized-window pattern: rank AFTER the
    * watermark closes the window). ALL-INTEGER counts, total order
    * (count DESC, event_type). Plan at scale: the bucket×type aggregate
    * partial-combines map-side to a BOUNDED table (windows × types);
    * the rank window runs on that digest, never on events. */
  def e4nWindowTopk(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("n").desc, col("event_type"))
    events(s, d)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .orderBy("bucket", "rk")
  }

  /** E4a — sliding windows: 1-hour windows every 30 minutes, batch mode.
    * Each event lands in exactly two windows; the oracle materializes both
    * bucket starts per row. */
  def e4bSliding(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"))
      .orderBy("bucket", "event_type")

  /** E4c — sessionization: session_window with a 30-minute gap, batch mode.
    * The oracle reproduces it with gaps-and-islands SQL. */
  def e4cSessions(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        col("n_events"), col("total"))
      .orderBy("user_id", "session_start")

  /** Heavy hitters reported per window (ties broken by event_type). */
  val HhK = 3

  /** E4l — per-window HEAVY HITTERS: top-K event types by count inside each
    * tumbling hour. The deployable streaming shape: global all-time top-K
    * over unbounded keys is not expressible with bounded state, but
    * per-window top-K is — the stream runs ONLY the windowed count (fixed
    * state per window, evicted by watermark) and the rank runs sink-side
    * over the window's closed aggregate, which is exactly how this query
    * pairs its two stages (the same split StreamingSpec asserts
    * stream==batch on). In batch the rank window partitions by bucket —
    * per-partition rows are |event_type| (25), so the sort is trivially
    * bounded at any corpus size. */
  def e4lHeavyHitters(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val rk = org.apache.spark.sql.functions.row_number()
      .over(Window.partitionBy("w").orderBy(col("n").desc, col("event_type")))
    counts.withColumn("rk", rk)
      .filter(col("rk") <= HhK)
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"), col("rk"))
      .orderBy("bucket", "rk")
  }

  /** E4j — per-day distinct users, exact AND sketched: the windowed form
    * of the q42 HLL contract. In batch, exact countDistinct sits next to
    * approx_count_distinct and the driver-checkable output carries the
    * portable accuracy contract (`err_ok` — each engine's own sketch
    * within 5% of its own exact). In STREAMING, exact distinct is not
    * executable at all (distinct aggregation over an unbounded stream
    * would hold every user id in state), so the sketch is the only form
    * that runs — the same approx_count_distinct expression is asserted
    * stream-equals-batch in StreamingSpec over a file-source stream. At
    * 100 TB the per-window state is one fixed-size HLL per day instead of
    * the day's user-id set. */
  def e4jWindowSketch(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05).as("err_ok"))
      .orderBy("day")

  /** The streaming form of e4j: only the sketch column (exact distinct is
    * unbounded state — Spark rejects it on a stream), watermarked for
    * window eviction. StreamingSpec asserts its AvailableNow output equals
    * the batch sketch bit-for-bit. */
  def e4jStream(s: SparkSession, eventsStream: DataFrame): DataFrame =
    eventsStream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("approx_users"))

  /** Funnel step window (24 h in µs; fixture events are hours apart).
    * Interpolated into BOTH the Spark query and the oracle SQL — one
    * constant, no silent divergence on retuning. */
  private val FunnelWindowUs = 86400000000L

  /** E4f — funnel analysis over an ARBITRARY ordered step chain: per user,
    * final-step events completing steps(0) → steps(1) → … with each step
    * strictly later than and within `stepWindowUs` of the previous.
    * Implemented with CASCADING windows over a STRICTLY-EARLIER range
    * frame: reach_0 = max time of a step-0 event among strictly-earlier
    * rows; reach_i = max time of a step-i event that itself had reach_(i-1)
    * within window — so reach_i is the latest strictly-earlier completion
    * of the chain prefix 0..i. ONE shuffle on user_id and a single sorted
    * pass per partition (the cascade stacks Window nodes over the same
    * Exchange+Sort), where the naive k-way self-join explodes
    * combinatorially per active user. The range frame (RANGE ... 1
    * PRECEDING on integer micros) excludes same-timestamp rows, so tied
    * events can never qualify each other and the latest strictly-earlier
    * qualified predecessor is always the best witness (monotone). Integer
    * epoch-micro comparisons keep the DuckDB oracle exact. */
  /** The shared cascade frame: every event row annotated with reach_k =
    * the latest time the step-(k+1) prefix completed strictly before it,
    * within stepWindowUs per hop. ONE user_id shuffle at any chain
    * length; shared by the funnel and the rates report. */
  private def funnelCascade(s: SparkSession, d: String, steps: Seq[String],
      stepWindowUs: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("tu"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val base = events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("tu"))
      .withColumn("reach_0",
        max(when(col("event_type") === steps.head, col("tu"))).over(w))
    steps.drop(1).dropRight(1).zipWithIndex.foldLeft(base) {
      case (df, (step, i)) =>
        df.withColumn(s"reach_${i + 1}",
          max(when(col("event_type") === step && col(s"reach_$i").isNotNull &&
            col("tu") <= col(s"reach_$i") + stepWindowUs, col("tu"))).over(w))
    }
  }

  def funnel(s: SparkSession, d: String, steps: Seq[String],
      stepWindowUs: Long, finalCol: String): DataFrame = {
    val cascaded = funnelCascade(s, d, steps, stepWindowUs)
    val k = steps.size - 2
    cascaded
      .filter(col("event_type") === steps.last && col(s"reach_$k").isNotNull &&
        col("tu") <= col(s"reach_$k") + stepWindowUs)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_funnels"), min(col("tu")).as(finalCol))
      .orderBy("user_id")
  }

  /** E4 — funnel conversion RATES: per step, how many users completed the
    * prefix up to it (within the same per-hop window the funnel uses) and
    * the step-over-step conversion — the percentages product teams
    * actually publish, where the per-user funnel table is the drill-down.
    * Derived from the SAME cascade frame as `funnel` (one user_id
    * shuffle), then a per-user flag aggregate, a 1-row total, and a
    * |steps|-row stack. */
  def funnelRates(s: SparkSession, d: String, steps: Seq[String],
      stepWindowUs: Long): DataFrame = {
    val cascaded = funnelCascade(s, d, steps, stepWindowUs)
    val flagAggs = steps.indices.map { k =>
      if (k == 0)
        max(when(col("event_type") === steps.head, 1L).otherwise(0L)).as("c0")
      else
        max(when(col("event_type") === steps(k) &&
          col(s"reach_${k - 1}").isNotNull &&
          col("tu") <= col(s"reach_${k - 1}") + stepWindowUs, 1L)
          .otherwise(0L)).as(s"c$k")
    }
    val perUser = cascaded.groupBy("user_id")
      .agg(flagAggs.head, flagAggs.tail: _*)
    val totAggs = steps.indices.map(k => sum(col(s"c$k")).as(s"n$k"))
    val stackArgs = steps.zipWithIndex.map { case (st, k) =>
      val conv = if (k == 0) "CAST(1.0 AS DOUBLE)"
                 else s"round(n$k / CAST(n${k - 1} AS DOUBLE), 4)"
      s"${k}L, '$st', n$k, $conv"
    }.mkString(", ")
    perUser.agg(totAggs.head, totAggs.tail: _*)
      .selectExpr(s"stack(${steps.size}, $stackArgs) AS " +
        "(step, step_name, n_users, conversion)")
      .orderBy("step")
  }

  /** Mirror of `funnel` in DuckDB SQL, generated from the same step list
    * and window constant so the Spark query and its oracle can never
    * diverge on retuning. */
  private def funnelOracle(steps: Seq[String], stepWindowUs: Long,
      finalCol: String): String = {
    val frame = "PARTITION BY user_id ORDER BY tu RANGE BETWEEN " +
      "UNBOUNDED PRECEDING AND 1 PRECEDING"
    val ctes = Seq(
      s"ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tu FROM events)",
      s"s0 AS (SELECT *, max(CASE WHEN event_type = '${steps.head}' THEN tu END) " +
        s"OVER ($frame) AS reach_0 FROM ev)") ++
      steps.drop(1).dropRight(1).zipWithIndex.map { case (step, i) =>
        s"s${i + 1} AS (SELECT *, max(CASE WHEN event_type = '$step' " +
          s"AND reach_$i IS NOT NULL AND tu <= reach_$i + $stepWindowUs " +
          s"THEN tu END) OVER ($frame) AS reach_${i + 1} FROM s$i)"
      }
    val k = steps.size - 2
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT user_id, count(*) AS n_funnels, min(tu) AS $finalCol
       |FROM s$k WHERE event_type = '${steps.last}' AND reach_$k IS NOT NULL
       |  AND tu <= reach_$k + $stepWindowUs
       |GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** DuckDB mirror of `funnelRates`, generated from the same step list
    * and window constant (the funnelOracle discipline). */
  private def funnelRatesOracle(steps: Seq[String], stepWindowUs: Long): String = {
    val frame = "PARTITION BY user_id ORDER BY tu RANGE BETWEEN " +
      "UNBOUNDED PRECEDING AND 1 PRECEDING"
    val ctes = Seq(
      s"ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tu FROM events)",
      s"s0 AS (SELECT *, max(CASE WHEN event_type = '${steps.head}' THEN tu END) " +
        s"OVER ($frame) AS reach_0 FROM ev)") ++
      steps.drop(1).dropRight(1).zipWithIndex.map { case (step, i) =>
        s"s${i + 1} AS (SELECT *, max(CASE WHEN event_type = '$step' " +
          s"AND reach_$i IS NOT NULL AND tu <= reach_$i + $stepWindowUs " +
          s"THEN tu END) OVER ($frame) AS reach_${i + 1} FROM s$i)"
      }
    val last = steps.size - 2
    val flags = steps.indices.map { k =>
      if (k == 0)
        s"max(CASE WHEN event_type = '${steps.head}' THEN 1 ELSE 0 END) AS c0"
      else
        s"max(CASE WHEN event_type = '${steps(k)}' AND reach_${k - 1} IS NOT NULL " +
          s"AND tu <= reach_${k - 1} + $stepWindowUs THEN 1 ELSE 0 END) AS c$k"
    }.mkString(",\n  ")
    val tot = steps.indices.map(k => s"CAST(sum(c$k) AS BIGINT) AS n$k").mkString(", ")
    val rows = steps.zipWithIndex.map { case (st, k) =>
      val conv = if (k == 0) "CAST(1.0 AS DOUBLE)"
                 else s"round(n$k / CAST(n${k - 1} AS DOUBLE), 4)"
      s"SELECT CAST($k AS BIGINT) AS step, '$st' AS step_name, " +
        s"n$k AS n_users, $conv AS conversion FROM t"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${ctes.mkString(",\n")},
       |pu AS (SELECT user_id,
       |  $flags
       |  FROM s$last GROUP BY user_id),
       |t AS (SELECT $tot FROM pu)
       |$rows
       |ORDER BY step""".stripMargin
  }

  /** The rates report over the 4-step funnel chain. */
  def e4f3FunnelRates(s: SparkSession, d: String): DataFrame =
    funnelRates(s, d, Seq("signup", "view", "click", "purchase"), FunnelWindowUs)

  /** The classic 3-step view → click → purchase funnel. */
  def e4fFunnel(s: SparkSession, d: String): DataFrame =
    funnel(s, d, Seq("view", "click", "purchase"), FunnelWindowUs,
      "first_purchase_us")

  /** 4-step variant exercising the generalized cascade:
    * signup → view → click → purchase. */
  def e4f2Funnel4(s: SparkSession, d: String): DataFrame =
    funnel(s, d, Seq("signup", "view", "click", "purchase"), FunnelWindowUs,
      "first_purchase_us")

  /** E4g — weekly cohort retention: users grouped by their first-activity
    * week (the cohort), counted in each later week they were active —
    * the standard retention triangle every event pipeline reports. Plan:
    * per-user min (map-side combined) + per-(user, week) distinct, both
    * shuffling on user_id, then a co-partitioned join (no third shuffle —
    * both sides already hash on user_id) and one final small aggregate on
    * (cohort, offset). Integer week offsets and counts keep the oracle
    * exact at any scale. */
  def e4gCohort(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val firstWk = ev.groupBy("user_id").agg(min(col("wk")).as("cohort"))
    ev.distinct().join(firstWk, "user_id")
      .withColumn("week_offset", expr("CAST(datediff(wk, cohort) DIV 7 AS BIGINT)"))
      .groupBy("cohort", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(fmtDate(col("cohort")).as("cohort"), col("week_offset"), col("n_users"))
      .orderBy("cohort", "week_offset")
  }

  /** Streaming form of e4a: file-source stream → watermarked tumbling agg.
    * Returns the started query writing to an in-memory sink `sinkName`. */
  def streamTumbling(s: SparkSession, dir: String, schema: StructType,
      sinkName: String): StreamingQuery =
    s.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"))
      // update mode: the watermark actually purges window state (in
      // complete mode it would be a no-op and state would grow unbounded)
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()

  /** File-source runner for e4jStream (StreamingSpec asserts its output
    * equals the batch sketch). */
  def streamWindowSketch(s: SparkSession, dir: String, schema: StructType,
      sinkName: String): StreamingQuery =
    e4jStream(s, s.readStream.schema(schema).parquet(dir)
        .withColumn("ts", col("ts").cast("timestamp")))
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()

  /** E4e — stream-stream interval join: the streaming form of q27 (views
    * by the same user within 5 minutes after each click). Both sides carry
    * watermarks and the join condition bounds the event-time gap, so Spark
    * derives state-retention windows for BOTH buffers — each side keeps
    * ~watermark+interval of history per key and purges the rest, which is
    * what makes the join runnable forever at 100 TB/day. Inner join: a
    * pair is emitted once both events have arrived. */
  def streamClickViewJoin(s: SparkSession, dir: String, schema: StructType,
      sinkName: String): StreamingQuery = {
    val ev = s.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_event"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    clicks.join(views,
        expr("""user_id = v_user AND
                v_ts > c_ts AND v_ts <= c_ts + INTERVAL 5 MINUTES"""))
      .select(col("event_id"), col("v_event"))
      .writeStream.outputMode("append").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** E4n — stream-stream LEFT OUTER interval join: every click emits,
    * paired with a view inside its 5-minute window when one exists and
    * with NULL otherwise — the "did this action convert?" feed. The
    * semantics Structured Streaming gives this are the point: a matched
    * pair emits as soon as both rows meet, but an UNMATCHED click can
    * only emit once the watermark proves no matching view can still
    * arrive (c_ts + interval falls behind the watermark and the state
    * row evicts) — so null results are DELAYED by watermark progress,
    * not emitted eagerly, and a batch run of the same join is the
    * ground truth the stream must converge to (StreamingSpec stages an
    * epilogue to push the watermark past all real data and asserts
    * exactly that). Operational subtlety the spec pins empirically: the
    * query holds TWO watermark operators and the GLOBAL watermark is
    * their MIN (default multipleWatermarkPolicy), so outer-null flushing
    * needs BOTH input streams to keep moving — a stalled click feed
    * pins the watermark and holds every unmatched click in state even
    * while views pour in (a real on-call page: "left join stopped
    * emitting nulls" = one upstream went quiet; the fixes are a
    * heartbeat event on the quiet feed or the `max` policy with its
    * late-drop tradeoff). Parquet sink + checkpoint so the flush can
    * span restarts (the E4i discipline); state is bounded by the
    * watermark horizon like the inner E4e join. */
  def streamClickViewLeftJoin(s: SparkSession, dir: String,
      schema: StructType, outDir: String, checkpoint: String): StreamingQuery = {
    val ev = s.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_event"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    clicks.join(views,
        expr("""user_id = v_user AND
                v_ts > c_ts AND v_ts <= c_ts + INTERVAL 5 MINUTES"""),
        "leftOuter")
      .select(col("event_id"), col("v_event"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** E4h — stream-static enrichment join: each micro-batch of the event
    * stream is joined to a STATIC dimension (no watermark, no join state —
    * the static side is simply re-scanned/broadcast per micro-batch, and
    * picks up no streaming semantics). This is how a pipeline enriches an
    * event stream with a user/segment table at any scale; state cost is
    * zero because only stream-stream joins buffer rows. */
  def streamStaticEnrich(s: SparkSession, dir: String, schema: StructType,
      dim: org.apache.spark.sql.DataFrame, sinkName: String): StreamingQuery =
    s.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .join(dim, "user_id")
      .groupBy(col("segment")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()

  /** E4x — STREAMING ANN SERVING against the standing IVF index: the
    * serving tier as a stream. Arriving query ids join the STATIC
    * released index twice — once by id to fetch the query's vector and
    * standing cell (an id-pushdown probe at scale), once by cell for the
    * in-cell candidates — and the per-query top-1 is ONE streaming
    * min(struct) aggregation (update mode): no windows, no custom state,
    * state = one (ns, nb) pair per in-flight query. This is the
    * deployment shape e2_ivf_serve prices in batch: the index is built
    * and RELEASED elsewhere (Versioned pointer swap), the serving job
    * never scans the corpus, and a new release is picked up by restarting
    * against the new snapshot path. Equality with the batch serve is
    * asserted in StreamingSpec. */
  def streamIvfServe(s: SparkSession, dir: String, schema: StructType,
      idx: org.apache.spark.sql.DataFrame, sinkName: String): StreamingQuery = {
    val q = s.readStream.schema(schema).parquet(dir)
      .select(col("vec_id").as("qid"))
      .join(idx.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("cell").as("qcell")), "qid")
    q.join(idx, col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"),
        (-(graft.functions.Vectors.dot(col("embedding"), col("qe")) /
          (col("nrm") * col("qn")))).as("ns"),
        col("vec_id").as("nb"))
      .groupBy("qid")
      .agg(min(struct(col("ns"), col("nb"))).as("m"))
      .select(col("qid"), col("m.ns").as("ns"), col("m.nb").as("neighbor_id"))
      .writeStream.outputMode("update").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** E4k — streaming anomaly scoring: the e8_outliers monitoring pass run
    * on the ingest stream. The (mean, sd) stats table is computed BATCH-
    * side (the deployed pattern: stats refresh nightly over the corpus,
    * scoring runs per arriving event) and broadcast into every
    * micro-batch as a stream-static join — no streaming state at all, so
    * the scorer's cost per event is two arithmetic ops and a 5-row hash
    * probe at any stream rate. Output is row-identical to the batch
    * e8_outliers over the same events (asserted in StreamingSpec). */
  def streamOutliers(s: SparkSession, dir: String, schema: StructType,
      stats: org.apache.spark.sql.DataFrame, sinkName: String): StreamingQuery =
    s.readStream.schema(schema).parquet(dir)
      .join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("m")) / col("sd"))
      .filter(abs(col("z")) > graft.ops.Analysis.OutlierZ)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("z"), 4).as("z"))
      .writeStream.outputMode("append").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()

  /** E4k-robust — the e8_mad_outliers fence run on the ingest stream:
    * the (med2, mad4) robust stats table is computed batch-side
    * (Analysis.madStats, the nightly refresh) and broadcast into every
    * micro-batch; the flag decision 20000·dev2 > MadK·mad4 is the same
    * all-integer rule as batch, so streamed output is row-identical to
    * e8_mad_outliers (asserted in StreamingSpec). Like the z-score
    * scorer it carries ZERO streaming state — per-event cost is integer
    * arithmetic plus a |types|-row hash probe. */
  def streamMadOutliers(s: SparkSession, dir: String, schema: StructType,
      stats: org.apache.spark.sql.DataFrame, sinkName: String): StreamingQuery =
    s.readStream.schema(schema).parquet(dir)
      .withColumn("vm", expr("CAST(round(value * 10000) AS BIGINT)"))
      .join(broadcast(stats), "event_type")
      .withColumn("dev2", abs(col("vm") * 2 - col("med2")))
      .filter(col("dev2") * lit(20000L) >
        col("mad4") * lit(graft.ops.Analysis.MadK))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("dev2") / 20000.0, 4).as("dev"))
      .writeStream.outputMode("append").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()

  /** E4d — stateful dedup on event_id within the watermark. */
  def streamDedup(s: SparkSession, dir: String, schema: StructType,
      sinkName: String): StreamingQuery =
    s.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()

  /** E4i — streaming near-dup ingest: the e1_exact_dedup fingerprint pass
    * run incrementally. Each arriving document is fingerprinted scan-side
    * (md5 of normalized text — the same 128-bit key the batch pass
    * shuffles) and `dropDuplicatesWithinWatermark` admits only the first
    * arrival per fingerprint, purging state as the watermark advances — a
    * re-delivered or identical-content document inside the redelivery
    * horizon is dropped AT INGEST, and dedup state is bounded by distinct
    * fingerprints per horizon, not corpus size. This is how a 100 TB
    * pipeline actually ingests: the batch dedup passes (e1_*) then run
    * over what this stage admitted. */
  /** The E4i transform (fingerprint + watermark-bounded dedup state),
    * shared by the memory-sink test form and the checkpointed file-sink
    * production form. */
  private def fingerprintDeduped(s: SparkSession, dir: String,
      schema: StructType): DataFrame =
    s.readStream.schema(schema).parquet(dir)
      .withColumn("ingest_ts", col("ingest_ts").cast("timestamp"))
      .withWatermark("ingest_ts", "10 minutes")
      .withColumn("fp", graft.ops.Dedup.contentFingerprint(col("text")))
      .dropDuplicatesWithinWatermark("fp")
      .select(col("fp"), col("doc_id"), col("source"))

  def streamFingerprintDedup(s: SparkSession, dir: String, schema: StructType,
      sinkName: String): StreamingQuery =
    fingerprintDeduped(s, dir, schema)
      .writeStream.outputMode("append").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()

  /** E4i in its production shape: parquet sink + checkpoint. The
    * checkpoint persists source offsets, the watermark, AND the dedup
    * state store, so a stopped/killed ingest restarted with the same
    * (source, sink, checkpoint) triple resumes exactly-once: already-
    * committed files are not re-emitted, and a document whose fingerprint
    * was admitted BEFORE the stop is still recognized as a duplicate
    * after the restart — the recovery property a 100 TB ingest leans on
    * (exercised in StreamingSpec). */
  def streamFingerprintDedupToFiles(s: SparkSession, dir: String,
      schema: StructType, outDir: String, checkpointDir: String): StreamingQuery =
    fingerprintDeduped(s, dir, schema)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow()).start()

  /** E4o — streaming DECONTAMINATION gate: the e1_contamination13
    * discipline applied AT INGEST. Every arriving document's word-13-gram
    * hashes are computed scan-side (the same codegen'd native expression
    * the batch pass uses); a document sharing ANY 13-gram with the eval
    * benchmark set is dropped before it can enter the training corpus —
    * decontaminating at the ingest boundary instead of auditing after
    * the fact. The eval set's n-gram hashes ride in as a BROADCAST
    * LITERAL ARRAY (eval benchmarks are tiny by definition — MBs against
    * a 100 TB corpus; at larger eval volumes the same shape is a Bloom
    * filter), so the gate is a STATELESS scan-side filter: zero state
    * store, zero shuffle, restart-safe for free because there is nothing
    * to recover — the strongest possible streaming-operator shape.
    * Emits the admitted documents with their gram count. */
  def streamDecontamGate(s: SparkSession, dir: String, schema: StructType,
      evalDocs: DataFrame, sinkName: String): StreamingQuery = {
    import graft.ops.Dedup.ContamN
    val evalGrams = evalDocs
      .select(explode(array_distinct(
        org.apache.spark.sql.graftext.ngramExpressions
          .wordShingleHashes(col("text"), ContamN))).as("h"))
      .distinct().collect().map(_.getLong(0))
    val evalLit = lit(evalGrams)
    s.readStream.schema(schema).parquet(dir)
      .withColumn("hs", array_distinct(
        org.apache.spark.sql.graftext.ngramExpressions
          .wordShingleHashes(col("text"), ContamN)))
      .filter(!arrays_overlap(col("hs"), evalLit))
      .select(col("doc_id"), col("source"), size(col("hs")).as("n_grams"))
      .writeStream.outputMode("append").format("memory").queryName(sinkName)
      .trigger(Trigger.AvailableNow()).start()
  }

  /** E4m — foreachBatch MERGE sink: the streaming form of
    * q48_merge_upsert. Structured Streaming's file sink is append-only;
    * keyed upserts need `foreachBatch`, which hands each micro-batch to
    * BATCH code — here the same latest-wins merge plan the declared q48
    * query runs (union + one row_number window per key; batch rows
    * outrank equal-keyed snapshot rows via a generation column, so a
    * redelivered row converges instead of flapping). The snapshot is
    * swapped via write-to-tmp + rename — never overwritten in place
    * while a reader may be scanning it (AdminStore.swapWrite is the
    * hardened production form with backup-and-restore; this is the
    * minimal correct shape). The checkpoint makes restart exactly-once:
    * committed micro-batches are not re-applied, and re-applying one
    * would be a no-op anyway (latest-wins is idempotent) — the
    * at-least-once-tolerant design every streaming MERGE should have.
    * At scale the per-batch merge cost is |snapshot ∪ batch| through one
    * hash exchange; a real deployment bounds it by partitioning the
    * snapshot on the key and rewriting only touched partitions. */
  def streamMergeSink(s: SparkSession, dir: String, schema: StructType,
      snapDir: String, checkpointDir: String): StreamingQuery =
    s.readStream.schema(schema)
      // bound each micro-batch (and exercise multi-batch convergence):
      // AvailableNow drains the source as a SEQUENCE of per-file batches
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val ss = b.sparkSession
        val fs = org.apache.hadoop.fs.FileSystem
          .get(ss.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(snapDir)
        val existing =
          if (fs.exists(dst)) ss.read.parquet(snapDir)
          else b.limit(0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc,
            col("gen").desc)
        val merged = existing.withColumn("gen", lit(0L))
          .unionByName(b.withColumn("gen", lit(1L)))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn", "gen")
        val tmp = new org.apache.hadoop.fs.Path(s"$snapDir.tmp$batchId")
        merged.write.mode("overwrite").parquet(tmp.toString)
        if (fs.exists(dst)) fs.delete(dst, true)
        if (!fs.rename(tmp, dst))
          throw new IllegalStateException(s"failed to swap $tmp -> $dst")
        ss.catalog.refreshByPath(snapDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow()).start()

  /** Count-min geometry: CmW cells per hash row (a power of two, so the
    * unsigned-HUGEINT `% CmW` oracle fold equals Spark's signed pmod —
    * the BloomBits invariant), one row per Dedup.BloomSeeds seed; TopK
    * is the audited probe set. */
  val CmW = 512L
  val CmTopK = 16

  /** E4v (batch twin) — COUNT-MIN SKETCH frequency estimation (Cormode &
    * Muthukrishnan, J. Algorithms 2005): token counts folded into a
    * d×w counter grid (d = the four bloom seeds, w = CmW), point
    * estimates read back as the min over rows — the sketch that answers
    * "how often did THIS token occur" in constant memory, where
    * e4l/e4r's Space-Saving answers "which tokens are frequent" and
    * q42's HLL answers "how many distinct". The audit probes the top-K
    * true-count tokens and reports the (always ≥ 0) overcount — CM's
    * one-sided error — in exact integers and bp, the table that sizes w
    * before a stream commits to it (the e1_bloom_audit discipline for
    * the counting sketch). Exactness: token hashes are the md5-fold
    * longs both engines share, positions are splitmix64 mod the
    * power-of-two width, every counter is an exact long sum. Plan at
    * 100 TB: the token explode partial-combines to the vocab-bounded
    * count table; the 4-seed fan-out and d×w cell fold are
    * sketch-sized; the top-K probe set is an orderBy+limit
    * (TakeOrderedAndProject — per-partition heaps, K-row merge, no
    * global sort). */
  def e4vCmSketch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val mixE = org.apache.spark.sql.graftext.minhashExpression
    val th = documents(s, d)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("true_c"))
      .withColumn("h",
        expr("CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)"))
    val sd = graft.ops.Dedup.BloomSeeds.toDF("sd")
    val pos = th.crossJoin(broadcast(sd))
      .withColumn("pos", pmod(mixE.mix64(col("h").bitwiseXOR(col("sd"))),
        lit(CmW)))
    val cells = pos.groupBy("sd", "pos").agg(sum(col("true_c")).as("cell_c"))
    val est = pos.select("t", "true_c", "sd", "pos")
      .join(cells, Seq("sd", "pos"))
      .groupBy("t", "true_c").agg(min(col("cell_c")).as("est_c"))
    // top-K as orderBy+limit → TakeOrderedAndProject: per-partition
    // heaps + a K-row merge, no single-partition global sort window
    est.orderBy(col("true_c").desc, col("t")).limit(CmTopK)
      .select(col("t").as("token"), col("true_c"), col("est_c"),
        (col("est_c") - col("true_c")).as("overcount"),
        expr("(est_c - true_c) * 10000 div true_c").as("err_bp"))
      .orderBy(col("true_c").desc, col("token"))
  }

  /** E4w (batch twin) — KLL QUANTILE SKETCH accuracy audit: the
    * house-built mergeable rank sketch ([[graft.functions.KllAgg]] —
    * Karnin, Lang & Liberty, FOCS 2016) estimating p50/p90 of the event
    * value per type, judged by the q43 err_ok CONTRACT: each engine's
    * own sketch estimate must land inside its own exact [p45, p55] /
    * [p85, p95] rank window (±5 percentile points — the natural bound
    * for a RANK sketch; a value-relative bound would break at medians
    * near 0). Estimates never cross engines — DuckDB audits its t-digest
    * approx_quantile under the same window — so rows/schema/hash match
    * end-to-end while each engine is judged against itself; the sketch's
    * numeric rank error is pinned tighter in ScalaTest (Round13OpsSpec,
    * < 2pp on the fixtures). This is the audit that sizes K before the
    * E4w streaming ingest (streaming.Stateful.streamKllQuantile) commits
    * to it — the e4v_cmsketch/e1_bloom_audit discipline for the rank
    * sketch. Plan at 100 TB: the UDAF partial-aggregates map-side to one
    * ≤5 KB sketch per (partition, type) — constant shuffle bytes like
    * percentile_approx; the exact percentiles exist only to close the
    * contract and are the audit's documented cost, not the sketch's. */
  def e4wKllQuantile(s: SparkSession, d: String): DataFrame = {
    val kll = udaf(new graft.functions.KllAgg(Seq(0.5, 0.9)),
      org.apache.spark.sql.Encoders.scalaDouble)
    events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, 0.45)").as("lo50"),
        expr("percentile(value, 0.55)").as("hi50"),
        expr("percentile(value, 0.85)").as("lo90"),
        expr("percentile(value, 0.95)").as("hi90"),
        kll(col("value")).as("est"))
      .select(col("event_type"), col("n"),
        (col("est")(0) >= col("lo50") && col("est")(0) <= col("hi50"))
          .as("p50_ok"),
        (col("est")(1) >= col("lo90") && col("est")(1) <= col("hi90"))
          .as("p90_ok"))
      .orderBy("event_type")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e4w_kll_quantile" -> (e4wKllQuantile _),
    "e4v_cmsketch" -> (e4vCmSketch _),
    "e4n_window_topk" -> (e4nWindowTopk _),
    "e4a_tumbling" -> (e4aTumbling _),
    "e4b_sliding" -> (e4bSliding _),
    "e4c_sessions" -> (e4cSessions _),
    "e4f_funnel" -> (e4fFunnel _),
    "e4f2_funnel4" -> (e4f2Funnel4 _),
    "e4f3_funnel_rates" -> (e4f3FunnelRates _),
    "e4g_cohort" -> (e4gCohort _),
    "e4j_window_sketch" -> (e4jWindowSketch _),
    "e4l_heavy_hitters" -> (e4lHeavyHitters _),
  )

  val oracles: Map[String, String] = Map(
    // each engine's own rank sketch judged against its own exact rank
    // window (the q43 err_ok contract): DuckDB audits approx_quantile
    // (t-digest) where Spark audits the house KLL — ±5pp is satisfied
    // by both at any fixture scale
    "e4w_kll_quantile" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  approx_quantile(value, 0.5)
        |    BETWEEN quantile_cont(value, 0.45) AND quantile_cont(value, 0.55)
        |    AS p50_ok,
        |  approx_quantile(value, 0.9)
        |    BETWEEN quantile_cont(value, 0.85) AND quantile_cont(value, 0.95)
        |    AS p90_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the e1_bloom_audit machinery for the counting sketch: md5-fold
    // token hashes, splitmix positions mod the power-of-two width,
    // exact long counters; overcount is CM's one-sided error
    "e4v_cmsketch" -> {
      import graft.ops.OracleSql._
      val seeds = graft.ops.Dedup.BloomSeeds
        .map(s0 => s"(CAST('${java.lang.Long.toUnsignedString(s0)}' AS HUGEINT))")
        .mkString(", ")
      s"""WITH cm_t AS (SELECT unnest(string_split(text, ' ')) AS t
         |  FROM documents),
         |cm_c AS (SELECT t, CAST(count(*) AS BIGINT) AS true_c FROM cm_t
         |  GROUP BY t),
         |cm_h AS (SELECT t, true_c,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(1, 16), i -> CAST(strpos('0123456789abcdef',
         |      substring(md5(t), CAST(i AS INT), 1)) - 1 AS BIGINT))),
         |    (h, dg) -> h * 16 + dg) AS BIGINT) AS h FROM cm_c),
         |cm_sd AS (SELECT * FROM (VALUES $seeds) AS x(sd)),
         |cm_in AS (SELECT t, true_c, sd, xor(CAST(h AS HUGEINT), sd) AS q0
         |  FROM cm_h, cm_sd),
         |${mixCtes("cm", "q0", "qm", Seq("t", "true_c", "sd"))},
         |cm_pos AS (SELECT t, true_c, sd, CAST(qm % $CmW AS BIGINT) AS pos
         |  FROM cm),
         |cm_cell AS (SELECT sd, pos, CAST(sum(true_c) AS BIGINT) AS cell_c
         |  FROM cm_pos GROUP BY sd, pos),
         |cm_est AS (SELECT p.t, p.true_c, min(c.cell_c) AS est_c
         |  FROM cm_pos p JOIN cm_cell c ON p.sd = c.sd AND p.pos = c.pos
         |  GROUP BY p.t, p.true_c),
         |cm_top AS (SELECT t, true_c, est_c FROM (SELECT t, true_c, est_c,
         |    row_number() OVER (ORDER BY true_c DESC, t) AS rk FROM cm_est)
         |  WHERE rk <= $CmTopK)
         |SELECT t AS token, true_c, CAST(est_c AS BIGINT) AS est_c,
         |  CAST(est_c - true_c AS BIGINT) AS overcount,
         |  CAST(est_c - true_c AS BIGINT) * 10000 // true_c AS err_bp
         |FROM cm_top ORDER BY true_c DESC, token""".stripMargin
    },
    "e4j_window_sketch" ->
      // each engine's own per-day HLL vs its own exact distinct — the
      // q42 portable-contract pattern, windowed
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |count(DISTINCT user_id) AS exact_users,
        |abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |  <= count(DISTINCT user_id) * 0.05 AS err_ok
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "e4g_cohort" ->
      """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |fw AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, wk FROM ev)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
        |  CAST(datediff('day', cohort, wk) // 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM act JOIN fw USING (user_id)
        |GROUP BY act.wk, fw.cohort ORDER BY cohort, week_offset""".stripMargin,
    "e4f_funnel" -> funnelOracle(Seq("view", "click", "purchase"),
      FunnelWindowUs, "first_purchase_us"),
    "e4f3_funnel_rates" -> funnelRatesOracle(
      Seq("signup", "view", "click", "purchase"), FunnelWindowUs),
    "e4f2_funnel4" -> funnelOracle(Seq("signup", "view", "click", "purchase"),
      FunnelWindowUs, "first_purchase_us"),
    // 6-hour buckets align epoch/2000-01-01 identically (offset is a
    // multiple of the bucket width); rank over the bounded digest
    "e4n_window_topk" ->
      """WITH wt AS (SELECT strftime(time_bucket(INTERVAL '6 hours', ts),
        |    '%Y-%m-%d %H:%M:%S') AS bucket, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket, event_type, n, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT bucket, event_type, n, row_number() OVER (
        |    PARTITION BY bucket ORDER BY n DESC, event_type) AS rk
        |  FROM wt)
        |WHERE rk <= 3 ORDER BY bucket, rk""".stripMargin,
    "e4a_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
        |  '%Y-%m-%d %H:%M:%S') AS bucket, event_type,
        |count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "e4l_heavy_hitters" ->
      s"""WITH c AS (SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
        |    '%Y-%m-%d %H:%M:%S') AS bucket, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT bucket, event_type, n, row_number() OVER (
        |    PARTITION BY bucket ORDER BY n DESC, event_type) AS rk FROM c)
        |SELECT bucket, event_type, n, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= $HhK ORDER BY bucket, rk""".stripMargin,
    "e4b_sliding" ->
      """WITH b AS (SELECT event_type,
        |  unnest([time_bucket(INTERVAL '30 minutes', ts),
        |          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
        |    AS wstart FROM events)
        |SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS bucket, event_type,
        |count(*) AS n FROM b GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "e4c_sessions" ->
      // gap >= (not >): Spark's session_window merges only on strict window
      // overlap, so an exactly-gap-sized silence starts a NEW session
      """WITH ordered AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      >= INTERVAL '30 minutes' OR
        |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |numbered AS (
        |  SELECT user_id, ts, value, sum(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM ordered)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS total
        |FROM numbered GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
  )
}
