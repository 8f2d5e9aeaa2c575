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

  /** Funnel step window (24 h in µs; fixture events are hours apart).
    * Interpolated into BOTH the Spark query and the oracle SQL — one
    * constant, no silent divergence on retuning. */
  private val FunnelWindowUs = 86400000000L

  /** E4f — funnel analysis: per user, purchases completing the ordered
    * chain view → click → purchase with each step strictly later than and
    * within 24 hours of the previous. Implemented with CASCADING windows
    * over a STRICTLY-EARLIER range frame (max view time among rows with
    * smaller epoch-micros; mark clicks within window of it as qualified;
    * max qualified click, same frame; test purchases against it) — ONE
    * shuffle on user_id and a single sorted pass per partition, where the
    * naive 3-way self-join explodes quadratically per active user. The
    * range frame (RANGE ... 1 PRECEDING on integer micros) excludes
    * same-timestamp rows, so tied events can never qualify each other and
    * the latest strictly-earlier qualified predecessor is always the best
    * witness (monotone). Integer epoch-micro comparisons keep the DuckDB
    * oracle exact. */
  def e4fFunnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("tu"))
      .rangeBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("tu"))
      .withColumn("view_tu",
        max(when(col("event_type") === "view", col("tu"))).over(w))
      .withColumn("qc",
        when(col("event_type") === "click" && col("view_tu").isNotNull &&
          col("tu") <= col("view_tu") + FunnelWindowUs, col("tu")))
      .withColumn("qclick_tu", max(col("qc")).over(w))
      .filter(col("event_type") === "purchase" && col("qclick_tu").isNotNull &&
        col("tu") <= col("qclick_tu") + FunnelWindowUs)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_funnels"), min(col("tu")).as("first_purchase_us"))
      .orderBy("user_id")
  }

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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e4a_tumbling" -> (e4aTumbling _),
    "e4b_sliding" -> (e4bSliding _),
    "e4c_sessions" -> (e4cSessions _),
    "e4f_funnel" -> (e4fFunnel _),
    "e4g_cohort" -> (e4gCohort _),
  )

  val oracles: Map[String, String] = Map(
    "e4g_cohort" ->
      """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |fw AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, wk FROM ev)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
        |  CAST(datediff('day', cohort, wk) // 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM act JOIN fw USING (user_id)
        |GROUP BY act.wk, fw.cohort ORDER BY cohort, week_offset""".stripMargin,
    "e4f_funnel" ->
      s"""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tu
         |  FROM events),
         |s1 AS (SELECT *, max(CASE WHEN event_type = 'view' THEN tu END)
         |    OVER (PARTITION BY user_id ORDER BY tu
         |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_tu
         |  FROM ev),
         |s2 AS (SELECT *, CASE WHEN event_type = 'click' AND view_tu IS NOT NULL
         |    AND tu <= view_tu + $FunnelWindowUs THEN tu END AS qc
         |  FROM s1),
         |s3 AS (SELECT *, max(qc) OVER (
         |    PARTITION BY user_id ORDER BY tu
         |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS qclick_tu
         |  FROM s2)
         |SELECT user_id, count(*) AS n_funnels, min(tu) AS first_purchase_us
         |FROM s3 WHERE event_type = 'purchase' AND qclick_tu IS NOT NULL
         |  AND tu <= qclick_tu + $FunnelWindowUs
         |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "e4a_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
        |  '%Y-%m-%d %H:%M:%S') AS bucket, event_type,
        |count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
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
