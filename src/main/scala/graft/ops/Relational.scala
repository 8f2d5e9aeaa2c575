package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The declared relational operator surface (SURVEY.md §2.B, Q01–Q22).
  *
  * Each query generalizes an operation the reference performs against its
  * admin tables (citations in each Scaladoc are reference `file:line`) into a
  * deterministic, DuckDB-verifiable query over the driver fixtures. All
  * queries are pure logical-plan builders — Catalyst handles pushdown,
  * pruning, and join strategy; broadcast hints are applied only where a
  * dimension side is known-small at every scale factor (region/nation/
  * customer/part are dimensions of the fixture star schema).
  */
object Relational {

  /** Q01 — full-scan projection.
    * Ref: session.query(DTO) full scans, sqlalchemy_batch_repository.py:34-38.
    * Column pruning reaches the parquet scan (ReadSchema shows 4 cols). */
  def q01ScanProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), asLong(col("l_linenumber")).as("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q02 — timestamp range predicate (retention scan shape).
    * Ref: ts < cutoff scans, sqlalchemy_batch_log_repository.py:32-35. */
  def q02FilterTs(s: SparkSession, d: String): DataFrame =
    eventsBefore(s, d, "2024-01-08 00:00:00")
      .select(col("event_id"), col("event_type"), col("value"),
        tsMicros(col("ts")).as("ts_us"))
      .orderBy("event_id")

  /** Q03a — equality predicate on a key column.
    * Ref: filter name == value, sqlalchemy_batch_repository.py:53. */
  def q03EqFilter(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_custkey") === 42L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        fmtDate(col("o_orderdate")).as("o_orderdate_s"))
      .orderBy("o_orderkey")

  /** Q03 — latest-by-timestamp (ORDER BY ts DESC LIMIT 1).
    * Ref: get_latest, sqlalchemy_batch_repository.py:47-56. */
  def q03Latest(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_custkey") === 42L)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .limit(1)
      .select(col("o_orderkey"), col("o_totalprice"),
        fmtDate(col("o_orderdate")).as("o_orderdate_s"))

  /** Q04 — previous-by-timestamp (ORDER BY ts DESC OFFSET 1 LIMIT 1).
    * Ref: get_previous, sqlalchemy_batch_repository.py:76-86 — OFFSET 1
    * because the in-progress row is already inserted (batch_runner.py:199-208). */
  def q04Previous(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders(s, d)
      .filter(col("o_custkey") === 42L)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 2)
      .select(col("o_orderkey"), col("o_totalprice"),
        fmtDate(col("o_orderdate")).as("o_orderdate_s"))
  }

  /** Q04a — null-semantics predicate + JSON extraction over events.props.
    * Ref: nullable error fields, admin_orm.py:40-41; JSON is [EXT].
    * Perf note: the 5.7s BENCH_r01 entry was measurement noise (the very
    * first Jackson parse + codegen compile after JVM start), not plan
    * structure — warm runs measure ~0.4s at sf0.1, in line with sibling
    * scans once the per-row JSON parse is priced in. Bench now reports
    * median-of-3, which pins this. */
  def q04aJsonNull(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("props").isNotNull)
      .select(get_json_object(col("props"), "$.k").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k")

  /** Q05 — case-insensitive equality (ILIKE with no wildcards).
    * Ref: name ilike, sqlalchemy_job_repository.py:35 — pure case folding,
    * so lower(a)=lower(b), not a pattern match. */
  def q05CaseInsensitive(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(lower(col("p_brand")) === lower(lit("bRaNd#4")))
      .select(col("p_partkey"), col("p_brand"))
      .orderBy("p_partkey")

  /** Q06 — retention split count (rows expiring vs surviving a cutoff).
    * Ref: delete_old_entries, sqlalchemy_batch_log_repository.py:29-36. */
  def q06Retention(s: SparkSession, d: String): DataFrame = {
    val cutoff = tsLit("2024-01-15 00:00:00")
    events(s, d).agg(
      asLong(sum(when(col("ts") < cutoff, 1).otherwise(0))).as("n_expired"),
      asLong(sum(when(col("ts") >= cutoff, 1).otherwise(0))).as("n_kept"))
  }

  /** Q07 — earliest-by-timestamp as min aggregate.
    * Ref: get_earliest, sqlalchemy_batch_log_repository.py:42-51. */
  def q07MinTs(s: SparkSession, d: String): DataFrame =
    events(s, d).agg(fmtTs(min(col("ts"))).as("min_ts_s"))

  /** Q08 — last-successful-ts per group: filtered groupBy + max.
    * Ref: get_last_successful_ts, sqlalchemy_job_repository.py:67-82. */
  def q08GroupMaxTs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("value") > 0)
      .groupBy("event_type")
      .agg(fmtTs(max(col("ts"))).as("max_ts_s"))
      .orderBy("event_type")

  /** Q09 — duplicate detection by grouped count > 1.
    * Ref: check_for_duplicate_job_names, batch_runner.py:542-548. */
  def q09Duplicates(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_custkey"), fmtDate(col("o_orderdate")).as("o_orderdate_s"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy("o_custkey", "o_orderdate_s")

  /** Q10 — parent–child FK join + per-parent aggregate (flattened form of
    * the batches→jobs→test_results nesting, admin_orm.py:105-129).
    * orders⋈lineitem is the fixture's fact-fact join: at scale both sides
    * shuffle on orderkey (sort-merge); no broadcast. */
  def q10JoinNest(s: SparkSession, d: String): DataFrame =
    orders(s, d).join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy("o_orderkey")

  private def ordersInRange(s: SparkSession, d: String, lo: String, hi: String) =
    orders(s, d)
      .filter(col("o_orderdate") >= tsLit(lo) && col("o_orderdate") < tsLit(hi))
      .select("o_custkey").distinct()

  /** Q11 — set intersection via left-semi join.
    * Ref: BatchDelta.common_jobs, batch_delta.py:13-18. */
  def q11Semi(s: SparkSession, d: String): DataFrame =
    ordersInRange(s, d, "1995-01-01 00:00:00", "1995-07-01 00:00:00")
      .join(ordersInRange(s, d, "1996-01-01 00:00:00", "1996-07-01 00:00:00"),
        Seq("o_custkey"), "left_semi")
      .orderBy("o_custkey")

  /** Q12 — set difference via left-anti join.
    * Ref: BatchDelta.newly_broken_jobs, batch_delta.py:20-25. */
  def q12Anti(s: SparkSession, d: String): DataFrame =
    ordersInRange(s, d, "1995-01-01 00:00:00", "1995-07-01 00:00:00")
      .join(ordersInRange(s, d, "1996-01-01 00:00:00", "1996-07-01 00:00:00"),
        Seq("o_custkey"), "left_anti")
      .orderBy("o_custkey")

  /** Q13 — conditional pass/fail counting.
    * Ref: sum(1 for r if r.test_passed), batch_runner.py:453-459. */
  def q13CondAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        asLong(sum(when(col("l_discount") > 0.05, 1).otherwise(0))).as("n_high"),
        asLong(sum(when(col("l_discount") <= 0.05, 1).otherwise(0))).as("n_low"))
      .orderBy("l_returnflag")

  /** Q15 — timestamp arithmetic: day deltas between order date and first/last
    * shipment. Ref: ExecutionMillis.calculate, value_objects.py:397-400. */
  def q15DateArith(s: SparkSession, d: String): DataFrame =
    orders(s, d).join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
      .select(col("o_orderkey"),
        asLong(datediff(to_date(col("first_ship")), to_date(col("o_orderdate"))))
          .as("d_first"),
        asLong(datediff(to_date(col("last_ship")), to_date(col("o_orderdate"))))
          .as("d_last"))
      .orderBy("o_orderkey")

  /** Q16 — right-truncation to the last N chars (Python s[-n:] semantics:
    * short strings pass through whole).
    * Ref: message truncation to last 2000 chars, value_objects.py:526-531. */
  def q16SubstrTail(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        when(length(col("text")) <= 80, col("text"))
          .otherwise(substring(col("text"), -80, 80)).as("tail"))
      .orderBy("doc_id")

  /** Q16a — union of disjoint slices.
    * Ref: concat of parallel BatchStatus lists, batch_runner.py:42-46. */
  def q16aUnion(s: SparkSession, d: String): DataFrame = {
    def slice(lo: String, hi: String) =
      orders(s, d)
        .filter(col("o_orderdate") >= tsLit(lo) && col("o_orderdate") < tsLit(hi))
        .select(col("o_orderkey"), fmtDate(col("o_orderdate")).as("o_orderdate_s"))
    slice("1995-01-01 00:00:00", "1995-04-01 00:00:00")
      .unionByName(slice("2001-06-01 00:00:00", "2002-01-01 00:00:00"))
      .orderBy("o_orderkey")
  }

  /** Q17 — ranking window: latest-2-per-key (window form of Q03/Q04).
    * Ref: latest/previous per name, sqlalchemy_batch_repository.py:47-86. */
  def q17WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), asLong(col("rn")).as("rn"), col("o_orderkey"))
      .orderBy("o_custkey", "rn")
  }

  /** Q18 — top-k by measure with deterministic tie-break.
    * Ref: ORDER BY ts DESC listings, tests/e2e/test_runner.py:412-416.
    * TakeOrderedAndProject: no full sort, no shuffle of the full table. */
  def q18TopK(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Q19 — grouped multi-aggregate (TPC-H Q1 shape); generalizes the
    * reference's single-measure aggregates (batch_runner.py:453-459). */
  def q19Agg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        round(avg(col("l_discount")), 2).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q19a — star-schema join chain: region⋈nation⋈customer⋈orders⋈lineitem,
    * revenue per region. Only the FIXED-SIZE dimensions (region: 5 rows,
    * nation: 25 rows at every SF) carry a broadcast hint. Customer grows
    * linearly with scale factor (~15M rows at sf100; far beyond any
    * broadcast budget at 100 TB), so its join is deliberately unhinted —
    * AQE broadcasts it while it fits under autoBroadcastJoinThreshold and
    * falls back to a shuffled hash join when it doesn't, which a forced
    * hint would override. Plan-asserted in RelationalPlanSpec. */
  def q19aRegionRevenue(s: SparkSession, d: String): DataFrame = {
    val dim = broadcast(
      region(s, d)
        .join(nation(s, d), col("r_regionkey") === col("n_regionkey"))
        .select(col("n_nationkey"), col("r_name")))
    val cust =
      customer(s, d).join(dim, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("r_name"))
    orders(s, d).join(cust, col("o_custkey") === col("c_custkey"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy("r_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")
  }

  /** Q20 — rollup (grouping sets) over the geography dimension [EXT].
    * Declared through the SQL surface (the engine exposes both DataFrame and
    * `spark.sql` entry points; Catalyst plans them identically). */
  def q20Rollup(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT coalesce(r_name, '(all)') AS r, coalesce(n_name, '(all)') AS n,
         |round(sum(c_acctbal), 2) AS bal
         |FROM parquet.`$d/region.parquet` JOIN parquet.`$d/nation.parquet`
         |  ON r_regionkey = n_regionkey
         |JOIN parquet.`$d/customer.parquet` ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP (r_name, n_name) ORDER BY r, n""".stripMargin)

  /** Q21 — analytic frame: per-user running sum + lag over event time [EXT]. */
  def q21RunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running"),
        round(lag(col("value"), 1).over(w), 2).as("prev_value"))
      .orderBy("user_id", "event_id")
  }

  /** Q22 — date parts + formatting over data.
    * Ref: strftime formatting, batch_log_entry.py:49-51. */
  def q22DateParts(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(asLong(year(col("o_orderdate"))).as("yr"),
        date_format(col("o_orderdate"), "yyyy").as("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("yr")

  /** Q10b — nested-array form of the parent–child join: children collected
    * into a per-parent array of structs sorted by line number (the
    * collect_list(struct) pattern the admin store uses to materialize
    * nested BatchStatus), then re-flattened to scalars for the oracle. */
  def q10bNested(s: SparkSession, d: String): DataFrame =
    orders(s, d).join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity"))))
        .as("items"))
      .select(col("o_orderkey"),
        asLong(size(col("items"))).as("n_items"),
        asLong(col("items")(0)("l_linenumber")).as("first_line"),
        col("items")(size(col("items")) - 1)("l_quantity").as("last_qty"))
      .orderBy("o_orderkey")

  /** Q04b — JSON object keys as a map: parse props into map<string,string>,
    * explode the keys, count. Exercises from_json + map + generator. */
  def q04bJsonKeys(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(explode(map_keys(from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k")

  /** Q23 — exact decimal aggregation: sums in DECIMAL(18,2) are exact, so
    * no rounding contract is needed; output cast to double at the end. */
  def q23Decimal(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("dec_sum"))
      .select(col("l_returnflag"), col("dec_sum").cast("double").as("total"))
      .orderBy("l_returnflag")

  /** Q24 — exact distinct counting per group (the exact form; the engine
    * also exposes approx_count_distinct/HLL for the 100 TB path where a
    * 2% error is a fair trade for no distinct shuffle). */
  def q24Distinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  /** Q25 — exact continuous percentiles with EXPLICIT rank interpolation
    * in INTEGER CENTS: idx = (n−1)·f, p = lo + (hi − lo)·(idx − ⌊idx⌋)
    * over cent-valued longs, rounded with floor(p + 0.5). Builtin
    * `percentile` vs `quantile_cont` interpolate with different FP
    * expressions, and even a token-identical double formula dies at the
    * boundary: the true p50 midpoint 52724.245 is stored as …2449999…95,
    * which Spark's round (BigDecimal of the exact binary value) sends
    * DOWN and DuckDB's double round sends UP (observed at sf0.001). In
    * cents the midpoint is a binary-EXACT .5 (odd/2), so floor(p + 0.5)
    * is deterministic and both engines compute the same double — the
    * q36 integer-cents pattern.
    *
    * Plan: exact quantiles do NOT require sorting the table inside a
    * 3-partition window (the round-3 shape: row_number over a 3-value
    * partition key serializes the whole sort onto 3 tasks at any scale).
    * The values are integer cents, so the distributed form is a
    * HISTOGRAM: groupBy (flag, cents) count — map-side combined, shuffle
    * bounded by the VALUE DOMAIN (distinct cent values, like q37_mode),
    * not the row count — then a cumulative window over the tiny grouped
    * domain assigns each distinct value its covered rank range
    * [cum−cnt, cum−1], and the interpolation ranks ⌊idx⌋/⌈idx⌉ are looked
    * up in that range. The only window runs over the aggregated table.
    * approx_percentile remains the sketch alternative when even the
    * value domain is unbounded. */
  def q25Percentile(s: SparkSession, d: String): DataFrame = {
    val hist = lineitem(s, d)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
      .groupBy("l_returnflag", "c")
      .agg(count(lit(1)).as("cnt"))
    val flagW = Window.partitionBy("l_returnflag")
    val ranked = hist
      // inclusive cumulative count: this value covers 0-based ranks
      // [cum - cnt, cum - 1] of the within-flag sort order
      .withColumn("cum", sum(col("cnt")).over(flagW.orderBy("c")))
      .withColumn("n", sum(col("cnt")).over(flagW))
    def interp(f: Double): org.apache.spark.sql.Column = {
      val idx = (max(col("n")) - 1) * lit(f)
      def at(rank: org.apache.spark.sql.Column) =
        max(when(rank.between(col("cum") - col("cnt"), col("cum") - 1), col("c")))
      val lo = at(floor((col("n") - 1) * lit(f)))
      val hi = at(ceil((col("n") - 1) * lit(f)))
      floor(lo + (hi - lo) * (idx - floor(idx)) + lit(0.5)).cast("double") / 100.0
    }
    ranked.groupBy("l_returnflag")
      .agg(interp(0.5).as("p50"), interp(0.95).as("p95"))
      .orderBy("l_returnflag")
  }

  /** Q26 — as-of join (point-in-time): for every click event, the latest
    * error event of the same user at or before it. Spark has no native
    * as-of join; the scalable formulation is union both sides, sort within
    * the user partition, and carry the last error id forward with an
    * ignore-nulls last_value window — one shuffle on user_id, no range
    * explosion, works at any history length. Errors sort before clicks at
    * equal timestamps to preserve the >= (at-or-before) semantics. Oracle:
    * DuckDB's native ASOF LEFT JOIN. */
  def q26AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("side"), lit(null).cast("bigint").as("err_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("side"), col("event_id").as("err_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(errors)
      .withColumn("prev_error_id", last(col("err_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("prev_error_id"))
      .orderBy("event_id")
  }

  /** Q27 — range (interval) join: per click, how many views by the same
    * user within the following 5 minutes. Implemented as a TIME-BUCKETED
    * equi-join: both sides are keyed by (user_id, 5-minute bucket), views
    * are replicated into their own bucket and the previous one, and the
    * exact range predicate is applied inside the join. A click in bucket b
    * can only match views in buckets {b, b+1} (the window span equals the
    * bucket width), so the two-way replication makes every valid pair meet
    * on EXACTLY one bucket equality — no duplicates, no missed pairs.
    * Scale rationale: a bare user_id join is quadratic per key for a power
    * user with years of history; with the bucket in the join key each click
    * only meets the views of its own two buckets, so work stays linear in
    * events per (user, 5-minute window) at any history length. Shuffle key
    * cardinality (user × bucket) also spreads hot users across partitions.
    * Probe-verified near-linear under 10× replication (SCALE.md). */
  def q27RangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val bucketUs = 300000000L // 5 minutes in microseconds = window span
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"),
        expr(s"unix_micros(ts) div $bucketUs").as("cb"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        expr(s"unix_micros(ts) div $bucketUs").as("vb0"))
      .withColumn("vb", explode(array(col("vb0"), col("vb0") - 1)))
    clicks
      .join(views,
        col("user_id") === col("v_user") && col("cb") === col("vb") &&
          col("v_ts") > col("ts") &&
          col("v_ts") <= col("ts") + expr("INTERVAL 5 MINUTES"),
        "left")
      .groupBy("event_id")
      .agg(asLong(sum(when(col("v_ts").isNotNull, 1).otherwise(0))).as("n_views"))
      .orderBy("event_id")
  }

  /** Q28 — PIVOT: order counts per year pivoted by order status. The
    * status values are passed EXPLICITLY — `pivot(col)` without values
    * runs an extra distinct job to discover them, a full scan you never
    * want at 100 TB; with values the pivot is a single pass of
    * conditional aggregates. Oracle: portable FILTER aggregation. */
  def q28Pivot(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(asLong(year(col("o_orderdate"))).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("yr"), col("F").as("n_f"), col("O").as("n_o"),
        col("P").as("n_p"))
      .orderBy("yr")

  /** Q20b — CUBE over the geography dimension (all grouping-set
    * combinations, completing q20's rollup). SQL surface like q20. */
  def q20bCube(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT coalesce(r_name, '(all)') AS r, coalesce(n_name, '(all)') AS n,
         |round(sum(c_acctbal), 2) AS bal
         |FROM parquet.`$d/region.parquet` JOIN parquet.`$d/nation.parquet`
         |  ON r_regionkey = n_regionkey
         |JOIN parquet.`$d/customer.parquet` ON c_nationkey = n_nationkey
         |GROUP BY CUBE (r_name, n_name) ORDER BY r, n""".stripMargin)

  /** Q21b — TIME-RANGE window frame: per user, the rolling sum of event
    * values over the trailing 10 minutes (RANGE frame over epoch seconds,
    * complementing q21's ROWS frame). One shuffle on user_id; the frame
    * is evaluated with a sliding pointer inside each sorted partition —
    * no self-join, no per-row rescans, history-length-independent. */
  def q21bTimeWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_s"))
      .rangeBetween(-600L, Window.currentRow)
    events(s, d)
      .withColumn("ts_s", expr("unix_micros(ts) div 1000000"))
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(w), 2).as("rolling_10m"))
      .orderBy("user_id", "event_id")
  }

  /** Q29 — FULL OUTER join: per-nation customer counts vs (filtered)
    * supplier counts, preserving nations that appear on either side only.
    * Completes the join matrix (inner/left/semi/anti/asof/range/full).
    * Both inputs are pre-aggregated so the outer join runs on ~25-row
    * sides regardless of scale — aggregate-then-join, not join-then-
    * aggregate. */
  def q29FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val p = supplier(s, d).filter(col("s_acctbal") > 5000)
      .groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(p, col("ck") === col("sk"), "full_outer")
      .select(asLong(coalesce(col("ck"), col("sk"))).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** Q16b — INTERSECT / EXCEPT (distinct set semantics): brands carried by
    * both even- and odd-keyed parts vs brands exclusive to even-keyed
    * parts, labeled and unioned. Set ops plan as aggregates + joins —
    * no special operator needed at scale. */
  def q16bSetOps(s: SparkSession, d: String): DataFrame = {
    val even = part(s, d).filter(col("p_partkey") % 2 === 0).select("p_brand")
    val odd = part(s, d).filter(col("p_partkey") % 2 === 1).select("p_brand")
    even.intersect(odd).withColumn("which", lit("both"))
      .unionByName(even.except(odd).withColumn("which", lit("even_only")))
      .orderBy("which", "p_brand")
  }

  /** Q30 — histogram / binning: event values bucketed into 10 fixed-width
    * [0,1000) bins — a single map-side computation feeding one tiny-key
    * aggregate; the binning operator class for dashboards and distribution
    * checks at any scale. The bucket formula is written out explicitly
    * (floor(v/width)+1 with under/overflow bins 0 and 11, width_bucket
    * semantics) so the oracle runs the IDENTICAL double arithmetic —
    * DuckDB 1.0 has no width_bucket, and matching an engine-internal
    * formula bit-for-bit is a worse bet than sharing one. Bounds are
    * fixed constants (data-independent binning; a data-dependent version
    * would first compute min/max as its own tiny aggregate). */
  def q30Histogram(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(
        when(col("value") < 0.0, 0L)
          .when(col("value") >= 1000.0, 11L)
          .otherwise(floor(col("value") / 100.0).cast("long") + 1L)
          .as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 2).as("lo"),
        round(max(col("value")), 2).as("hi"))
      .orderBy("bucket")

  /** Q31 — correlated EXISTS: customers holding at least one big 1996
    * order. EXISTS is declared as a LEFT SEMI join on the key — the
    * optimizer's own decorrelation target — so the probe side is scanned
    * once, the candidate set is aggregate-free, and AQE can broadcast it
    * when the predicate is selective. No count(*)>0 subquery per row,
    * which is the quadratic trap a correlated EXISTS invites. */
  def q31Exists(s: SparkSession, d: String): DataFrame = {
    val big = orders(s, d)
      .filter(col("o_totalprice") > 400000 && year(col("o_orderdate")) === 1996)
      .select(col("o_custkey"))
    customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("c_acctbal"))
      .orderBy("c_custkey")
  }

  /** Q32 — GROUPING SETS: order counts/totals by status, by priority, and
    * overall in ONE pass (the general form behind q20 rollup / q20b cube).
    * Spark plans this as a single Expand + aggregate — one scan, one
    * shuffle regardless of how many sets are listed. SQL surface like q20. */
  def q32GroupingSets(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT coalesce(o_orderstatus, '(all)') AS st,
         |coalesce(o_orderpriority, '(all)') AS pri,
         |count(*) AS n, round(sum(o_totalprice), 2) AS total
         |FROM parquet.`$d/orders.parquet`
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY st, pri""".stripMargin)

  /** Q33 — distribution ranks: quartile (ntile), percent_rank and
    * cume_dist of customer balances WITHIN each market segment. The
    * partition keeps the sort distributed (a global ORDER BY window would
    * serialize to one partition — the q04_previous warning, fatal at
    * scale); percent_rank/cume_dist are exact integer rationals, so the
    * oracle stays bit-clean at round(4). */
  def q33Ntile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"),
        asLong(ntile(4).over(w)).as("quartile"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** Q34 — collection aggregate: per customer, the sorted distinct order
    * years as a count + joined string. collect_set is bounded here by the
    * year domain (single-digit cardinality per customer), which is the
    * contract that makes a collect aggregate scale-safe — unbounded
    * collect_list of raw rows is the anti-pattern. String output keeps
    * the array comparable across engines. */
  def q34ArrayAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_set(year(col("o_orderdate")).cast("string"))).as("ys"))
      .select(col("o_custkey"), asLong(size(col("ys"))).as("n_years"),
        array_join(col("ys"), ",").as("years"))
      .orderBy("o_custkey")

  /** Q35 — scalar string-function surface (upper/replace/locate/substr/
    * reverse/length) in one scan-side projection: zero shuffles, fully
    * codegen'd, the reference's row-level string toolkit re-expressed as
    * native columnar expressions. */
  def q35StringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        expr("replace(p_name, ' ', '_')").as("snake"),
        asLong(instr(col("p_name"), "widget")).as("pos_widget"),
        substring(col("p_name"), 1, 4).as("head4"),
        reverse(col("p_name")).as("rev"),
        asLong(length(col("p_name"))).as("len"))
      .orderBy("p_partkey")

  /** Q36 — correlated scalar subquery ("orders above their customer's
    * average"), decorrelated as one aggregate + equi-join — the optimizer-
    * friendly form of the per-row subquery (which would rescan orders per
    * row). The comparison runs in INTEGER cents (price_cents * n > sum_
    * cents) so the boundary predicate is exact — a double avg's value
    * depends on partial-sum order, which is the kind of engine-dependent
    * bit drift that poisons cross-engine comparisons. The displayed
    * average is ALSO rounded in integer cents ((2·sum+n) div 2n =
    * half-up) before the one exact /100 display division — round(double)
    * differs between engines on a half-way double (Spark rounds the
    * decimal string, DuckDB the binary value). */
  def q36ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val c = orders(s, d)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    val agg = c.groupBy(col("o_custkey").as("k"))
      .agg(sum(col("cents")).as("sc"), count(lit(1)).as("cnt"))
    c.join(agg, col("o_custkey") === col("k"))
      .filter(col("cents") * col("cnt") > col("sc"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        (expr("(2 * sc + cnt) div (2 * cnt)").cast("double") / 100.0)
          .as("cust_avg"))
      .orderBy("o_orderkey")
  }

  /** Q37 — deterministic mode: the most frequent l_quantity per return
    * flag (ties → smallest value), as a count + row_number pipeline — the
    * exact, engine-portable form of MODE() (whose tie-breaking is
    * implementation-defined). Plan: one (flag, qty) aggregate that
    * partial-reduces map-side to the tiny value domain, then a window over
    * the grouped table — the window never sees raw rows, so the sort is
    * bounded by |flags|×|quantities| at any corpus size. */
  def q37Mode(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("n").desc, col("l_quantity"))
    lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
      .orderBy("l_returnflag")
  }

  /** Q38 — statistical aggregates: sample stddev/variance of quantity and
    * the quantity↔extended-price correlation per return flag. All three are
    * single-pass merge-able aggregates (central-moment accumulators), so
    * they partial-reduce map-side like sum/count — one small shuffle.
    * Rounded at 4dp: both engines use numerically-stable accumulation and
    * agree far past the rounding digit. */
  def q38Stats(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"))
      .orderBy("l_returnflag")

  /** Q39 — bag-semantics set ops (INTERSECT ALL / EXCEPT ALL), completing
    * the set-op matrix next to q16b's DISTINCT forms: per nation key, the
    * multiset intersection (min of the two multiplicities) and difference
    * (excess of A over B) of two market segments' customer nation keys.
    * Catalyst rewrites both to count-aggregate + replicate — shuffles on
    * the key, no row-by-row matching — so the plan partial-reduces
    * map-side like any aggregate. */
  def q39SetAll(s: SparkSession, d: String): DataFrame = {
    val a = customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey"))
    val b = customer(s, d)
      .filter(col("c_mktsegment") === "MACHINERY").select(col("c_nationkey"))
    val ia = a.intersectAll(b)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_ia"))
    val ea = a.exceptAll(b)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_ea"))
    ia.join(ea, Seq("c_nationkey"), "full_outer")
      .select(col("c_nationkey"),
        coalesce(col("n_ia"), lit(0L)).as("n_intersect_all"),
        coalesce(col("n_ea"), lit(0L)).as("n_except_all"))
      .orderBy("c_nationkey")
  }

  /** Q40 — salted two-phase aggregation over a HOT group key
    * (Skew.saltedCount): events counted by event_type, a 5-value key, so a
    * plain groupBy sends every row of a key to ONE reducer — the textbook
    * hot-key aggregation. The salt stage spreads each key over 16 subkeys
    * (first shuffle ≤ 5×16 groups spread across tasks), then the final
    * aggregate reduces 80 partial rows. For count/sum Spark's map-side
    * partial aggregation already compacts and salting is belt-and-braces;
    * the declared query pins the utility's end-to-end correctness and its
    * two-Aggregate plan shape (asserted in SkewSpec) for the
    * collect_list-style payloads where the partial CANNOT compact. */
  def q40SkewAgg(s: SparkSession, d: String): DataFrame =
    Skew.saltedCount(events(s, d), "event_type", 16)
      .orderBy("event_type")

  /** Q41 — salted join on a skewed key (Skew.saltedJoin): events (fact,
    * every row carries one of 5 event_type values — total key skew) joined
    * to a computed per-type average, reporting each type's count and summed
    * absolute deviation. The salted form shuffles the fact side on
    * (event_type, __salt) — 8 subkeys per hot key, so one hot key spreads
    * over 8 tasks — and replicates the 5-row dim ×8. At fixture scale AQE
    * happily broadcasts the replicated dim (making the salt free); the
    * declared query pins the logical shape used when the dim is too large
    * to broadcast and one key floods a reducer. Oracle-exact: the dim is
    * rounded to 6dp before the deviation sum, and the sum is rounded at
    * 2dp. */
  def q41SkewJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_type"), col("value"))
    val dim = ev.groupBy("event_type")
      .agg(round(avg(col("value")), 6).as("type_avg"))
    Skew.saltedJoin(ev, dim, "event_type", 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(abs(col("value") - col("type_avg"))), 2).as("sum_absdev"))
      .orderBy("event_type")
  }

  /** Q42 — sketch-based distinct counting: approx_count_distinct (HLL++,
    * 2% target rsd) next to the exact countDistinct. At 100 TB the sketch
    * is the only practical distinct-count: it partial-aggregates to a
    * FIXED-SIZE sketch map-side (constant shuffle bytes per partition
    * regardless of key cardinality) where exact distinct must move every
    * distinct value through the exchange. The raw sketch estimate is
    * engine-specific hashing, so the DRIVER-CHECKABLE output carries the
    * accuracy CONTRACT instead of the estimate: `err_ok` = the engine's
    * own sketch landed within 5% of exact — DuckDB's
    * approx_count_distinct satisfies the same bound on its side, so rows,
    * schema, and hash match end-to-end while each engine is judged
    * against its own sketch. The plan property (map-side partial sketch)
    * and the numeric 5% bound on the raw estimate stay pinned in
    * ScalaTest (OpsSpec). */
  def q42ApproxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("approx_orders") - col("exact_orders")) <=
          col("exact_orders") * 0.05).as("err_ok"))
      .orderBy("l_returnflag")

  /** Q43 — sketch-based quantiles: percentile_approx (Greenwald-Khanna /
    * KLL-style rank sketch) next to the exact interpolated percentile,
    * judged by the same portable-contract pattern as q42: `err_ok` = the
    * engine's own sketch median lands within 5% of its own exact median.
    * At 100 TB the rank sketch is the only practical quantile — it
    * partial-aggregates to a FIXED-SIZE summary map-side where the exact
    * percentile must sort (or histogram, as q25 does when the value
    * domain is small) the full column. DuckDB's t-digest
    * approx_quantile satisfies the same 5% bound on its side, so rows,
    * schema, and hash match end-to-end; the numeric bound on the raw
    * estimate is pinned in ScalaTest (OpsSpec). */
  def q43ApproxQuantile(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_med"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx_med"))
      .select(col("l_returnflag"), col("n"),
        (abs(col("approx_med") - col("exact_med")) <=
          col("exact_med") * 0.05).as("err_ok"))
      .orderBy("l_returnflag")

  /** Q44 — distribution window functions: percent_rank and cume_dist over
    * account balance within each nation (where does this customer sit in
    * its nation's balance distribution). The ORDER BY carries c_custkey as
    * a tie-break so ranks are total and both engines agree bit-for-bit.
    * Output is in integer MICRO-UNITS via floor(x·10⁶ + 0.5): cume_dist =
    * rank/n yields EXACT decimal ties (a 640-customer nation puts
    * 333/640 = 0.5203125 on the .5 boundary — sf0.1 hit this), where
    * Spark's HALF_UP BigDecimal round and DuckDB's tie handling disagree;
    * floor(+0.5) is pure IEEE arithmetic on identical doubles, so no tie
    * semantics exist to diverge. One hash exchange on the partition key,
    * per-partition sort — the standard window plan, parallel across
    * nations. */
  def q44WindowDist(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    customer(s, d)
      .select(col("c_custkey"), col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_acctbal"),
        floor(percent_rank().over(w) * 1000000 + 0.5).as("pct_rank_u"),
        floor(cume_dist().over(w) * 1000000 + 0.5).as("cdist_u"))
      .orderBy("c_custkey")
  }

  /** Q46 — UNPIVOT/melt (the inverse of q28's pivot): a wide per-priority
    * metrics row melts into tidy (key, metric, value) triples — the shape
    * every metrics store and plotting layer ingests. Spark's native
    * `unpivot` is a scan-side Expand (each input row fans out to one row
    * per value column IN PLACE, like the multi-DISTINCT aggregate's
    * Expand) — no shuffle beyond the tiny upstream aggregate, no UDF, and
    * output rows = input rows × metrics at any scale. Metrics are all
    * exactly representable doubles (a count, a DECIMAL sum rounded
    * BEFORE the cast, a DECIMAL max) — deliberately no avg, whose
    * DOUBLE return type in the oracle engine would re-round on a
    * different boundary. */
  /** Q45 [EXT] — first/last/nth_value navigation over a FULL window frame
    * (ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING): per order, its
    * customer's chronologically first, last, and second order key — the
    * "attach lifecycle anchors to every fact row" idiom (first-touch /
    * latest-state columns on a fact table). Fills the q45 numbering gap
    * (q44 window distributions, q46 unpivot). Deterministic: the frame
    * orders by (o_orderdate, o_orderkey), so ties can't reorder; all
    * outputs are BIGINT keys (nth_value is NULL for single-order
    * customers — same default null handling both engines). Plan: ONE
    * hash-partitioned sort-window over o_custkey — a single exchange at
    * any scale, scan pruned to the three columns the frame needs. */
  def q45FirstLast(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(w).as("last_key"),
        expr("nth_value(o_orderkey, 2)").over(w).as("second_key"))
      .orderBy("o_orderkey")
  }
  def q46Unpivot(s: SparkSession, d: String): DataFrame = {
    val wide = orders(s, d)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("double").as("n_orders"),
        round(sum(col("o_totalprice")), 2).cast("double").as("total_price"),
        max(col("o_totalprice")).cast("double").as("max_price"))
    wide.unpivot(
        Array(col("o_orderpriority")),
        Array(col("n_orders"), col("total_price"), col("max_price")),
        "metric", "value")
      .orderBy("o_orderpriority", "metric")
  }

  /** Q47 — SCD type-2 dimension build (Kimball slowly-changing dimension,
    * the core warehouse-ETL op a lime-etl-style batch framework exists to
    * schedule): the versioned history of each customer's order PRIORITY.
    * A version row opens where the attribute CHANGES vs the customer's
    * previous order (lag ≠ current, or first order) and closes when the
    * next change opens (lead over the change rows; NULL = current
    * version). Both windows share one (o_custkey) partitioning and one
    * (date, orderkey) sort, so the corpus crosses ONE exchange and the
    * change filter runs between the two window ops on the already-sorted
    * partitions — the standard distributed SCD2 plan, parallel across
    * keys at any scale. The orderkey tie-break makes same-day orders a
    * total order, so version boundaries are engine-independent. */
  def q47Scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders(s, d)
      .withColumn("prev", lag(col("o_orderpriority"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
      .withColumn("valid_to", lead(fmtDate(col("o_orderdate")), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        fmtDate(col("o_orderdate")).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("o_custkey", "valid_from", "o_orderkey")
  }

  /** Merge cutoff — rows before it form the snapshot, rows at/after it are
    * the incremental batch. Interpolated into BOTH engines; chosen so the
    * fixture exercises keep AND update AND insert at every scale factor. */
  val MergeCutoff = "1998-04-01"

  /** Q48 — latest-wins MERGE/upsert of an incremental batch into a keyed
    * snapshot (the reference's `repo.update` merge-by-PK, SURVEY §2.A,
    * expressed as a data-plane operator — and the batch form of the
    * AdminStore parquet upsert). Snapshot = each customer's latest order
    * before the cutoff (in production a materialized table — recomputed
    * here because fixtures are immutable, the e1_incremental discipline);
    * batch = the raw post-cutoff change stream, possibly many rows per
    * key. MERGE semantics: per key, the newest row wins (date, orderkey
    * tie-break); every output row is classified `keep` (snapshot row
    * survived), `update` (batch row replaced a snapshot row), or `insert`
    * (batch row for a key the snapshot lacked) — the audit column a
    * warehouse MERGE reports. Plan: union + ONE row_number window and a
    * same-window max for existence — a single exchange on the key, no
    * join; at 100 TB this beats the join-based MERGE whenever the batch
    * touches a nontrivial key fraction, and AQE handles the skewed-key
    * case. */
  def q48MergeUpsert(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val snapW = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val snap = o.filter(col("o_orderdate") < tsLit(MergeCutoff))
      .withColumn("rn", row_number().over(snapW)).filter(col("rn") === 1)
      .drop("rn").withColumn("src", lit("snap"))
    val batch = o.filter(col("o_orderdate") >= tsLit(MergeCutoff))
      .withColumn("src", lit("batch"))
    val mw = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val ew = Window.partitionBy("o_custkey")
    snap.unionByName(batch)
      .withColumn("rn", row_number().over(mw))
      .withColumn("has_snap",
        max(when(col("src") === "snap", 1).otherwise(0)).over(ew))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), fmtDate(col("o_orderdate")).as("o_date"),
        when(col("src") === "snap", "keep")
          .when(col("has_snap") === 1, "update")
          .otherwise("insert").as("action"))
      .orderBy("o_custkey")
  }

  /** Q49 — declarative data-quality check suite: the reference's per-job
    * "data tests" (test results stored beside run logs, SURVEY §2.A)
    * scaled up to a constraint REPORT over whole tables — the
    * expectations gate a warehouse load runs before publishing. One row
    * per check: (check_name, n_checked, n_violations, pass). Checks
    * cover the four standard families: key uniqueness, referential
    * integrity, value domain, and range expectations (the qty ≤ 40 rule
    * is deliberately tighter than the data — an expectation that
    * drifted — so the report exercises the failing path too).
    *
    * Plan discipline: checks against the SAME table share ONE scan —
    * each table aggregates to a single row of violation counters
    * (map-side combined), and stack() fans that row into per-check rows
    * (the e7_funnel treatment), so the whole suite costs one scan per
    * table plus one key-projected join per FK check, never a scan per
    * check. The FK joins carry only the key columns; nothing corpus-
    * sized shuffles. */
  def q49DqChecks(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_orderkey")).as("nd"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("sviol"))
      .select(expr(
        """stack(2,
          |  'orders_pk_unique', n, n - nd,
          |  'orders_status_domain', n, sviol)
          |  AS (check_name, n_checked, n_violations)""".stripMargin))
    val li = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("fkviol"),
        sum(when(col("l_quantity") > 40, 1L).otherwise(0L)).as("qviol"))
      .select(expr(
        """stack(2,
          |  'lineitem_fk_orders', n, fkviol,
          |  'lineitem_qty_le_40', n, qviol)
          |  AS (check_name, n_checked, n_violations)""".stripMargin))
    val cu = customer(s, d)
      .join(broadcast(nation(s, d).select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("n_nationkey").isNull, 1L).otherwise(0L)).as("fkviol"))
      .select(lit("customer_fk_nation").as("check_name"),
        col("n").as("n_checked"), col("fkviol").as("n_violations"))
    val ev = events(s, d).agg(count(lit(1)).as("n"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("vviol"))
      .select(lit("events_value_nonneg").as("check_name"),
        col("n").as("n_checked"), col("vviol").as("n_violations"))
    o.unionByName(li).unionByName(cu).unionByName(ev)
      .withColumn("pass", col("n_violations") === 0)
      .orderBy("check_name")
  }

  /** Incremental-aggregate cutoff (l_shipdate) — interpolated into BOTH
    * engines. */
  val IncrCutoff = "1998-01-01"

  /** Q50 — incremental aggregate maintenance: the e1_incremental
    * discipline applied to a METRIC table. A 100 TB pipeline never
    * recomputes its corpus-wide aggregates from scratch each load; it
    * keeps the aggregate STATE (per-group partial sums/counts) and folds
    * each new batch in, which is sound exactly when the aggregate is
    * algebraic (sum/count here — the same property that lets Spark
    * partial-aggregate map-side). The query materializes the state from
    * the pre-cutoff slice, the delta from the post-cutoff batch, and
    * merges them with a re-aggregation over the union — two group-sized
    * inputs, never the corpus; quantities are summed in DECIMAL so state
    * + delta equals the from-scratch aggregate EXACTLY, not just
    * approximately (a double sum would drift by fold order and the
    * incremental path would diverge from a backfill — the property the
    * spec asserts). n_delta exposes how much of each group the batch
    * touched — the audit column an incremental load logs. */
  def q50IncrAgg(s: SparkSession, d: String): DataFrame = {
    def slice(pred: Column): DataFrame =
      lineitem(s, d).filter(pred)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
    val state = slice(col("l_shipdate") < tsLit(IncrCutoff))
      .withColumn("n_delta", lit(0L))
    val delta = slice(col("l_shipdate") >= tsLit(IncrCutoff))
      .withColumn("n_delta", col("n_rows"))
    state.unionByName(delta)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("sum_qty")).as("sum_qty"), sum(col("n_rows")).as("n_rows"),
        sum(col("n_delta")).as("n_delta"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("n_rows"), col("n_delta"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q51 — LATERAL correlated subquery [EXT]: top-2 customers by balance
    * per nation through the SQL lateral-join surface (the "for each row of
    * the outer table, run this parameterized subquery" shape analysts
    * write; Postgres/DuckDB LATERAL, Spark 3.2+). Declared through
    * `spark.sql` deliberately: Catalyst decorrelates the LIMIT-per-group
    * subquery into a window/rank plan over ONE join — the same physical
    * shape as q18_topk — rather than executing the subquery per outer row
    * (the 100 TB difference between a plan and a loop). The DataFrame
    * twin of this query is q18; this entry pins the SQL surface. */
  def q51Lateral(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT n_name, c_name, round(c_acctbal, 2) AS bal
         |FROM parquet.`$d/nation.parquet` n,
         |LATERAL (SELECT c_name, c_acctbal
         |  FROM parquet.`$d/customer.parquet`
         |  WHERE c_nationkey = n.n_nationkey
         |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
         |ORDER BY n_name, bal DESC, c_name""".stripMargin)

  /** Q52 — calendar-spine gap filling [EXT]: daily order revenue joined
    * onto a COMPLETE generated date spine, missing days zero-filled, with
    * a 7-day trailing average — the report-table pattern every warehouse
    * runs (a groupBy alone silently drops zero-activity days, which
    * corrupts moving averages and day-over-day deltas; the reference's
    * per-run log tables have the same every-period-present need). Plan at
    * scale: the fact table reduces to a DAY-DOMAIN-sized aggregate (one
    * map-side-combined exchange); the spine is generated from a 1-row
    * broadcast bounds aggregate (never a stored calendar scan); join and
    * window then run over day-domain rows (thousands, at ANY fact
    * volume), so the deliberate single-partition window is bounded by the
    * calendar, not the data. Revenue rides as exact integer cents; the
    * only doubles are the final two display divisions. */
  def q52DateSpine(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val bounds = broadcast(
      daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi")))
    val spine = bounds
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("cents"), lit(0L)).as("cents"))
      .withColumn("avg7",
        round(sum(col("cents")).over(w) / (count(lit(1)).over(w) * 100.0), 2))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_orders"), round(col("cents") / 100.0, 2).as("revenue"),
        col("avg7"))
      .orderBy("day")
  }

  /** Session gap for q53 — 12 h in epoch micros, interpolated into BOTH
    * engines. Chosen against the fixture's inter-event profile (median
    * per-user gap ≈ 7.3 h) so users split into multi-event sessions. */
  val SessionGapUs: Long = 12L * 3600L * 1000000L

  /** Q53 — batch sessionization (gaps-and-islands) [EXT]: assign every
    * event to a per-user session whose boundary is an inter-event gap
    * > SessionGapUs, then aggregate per session — the batch analogue of
    * the e4c streaming session window, expressed in the classic
    * lag → boundary-flag → running-sum idiom every warehouse uses for
    * clickstream/telemetry sessionization (the reference's batch/job
    * history is exactly such an event stream). All arithmetic is exact
    * integer epoch micros, so the boundary decision is bit-stable across
    * engines. Plan at scale: ONE hash exchange on user_id; both windows
    * (lag and running sum) and the session aggregate run inside that
    * partitioning — no second shuffle (the groupBy keys are a superset
    * of the partition key), per-user history is bounded, and no state
    * beyond the sort, so the same plan runs on 10^11 events. */
  /** Per-event session assignment (user_id, event_id, event_type, us,
    * session_no) — the shared builder of q53_sessionize and
    * q56_attribution, extracted so the reported sessions and the
    * attributed sessions cannot drift (the e3_pack_stats rule). */
  private[ops] def sessionized(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsMicros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("boundary",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > lit(SessionGapUs), 1L).otherwise(0L))
      .withColumn("session_no", sum(col("boundary")).over(run))
      .select("user_id", "event_id", "event_type", "us", "session_no")
  }

  def q53Sessionize(s: SparkSession, d: String): DataFrame = {
    sessionized(s, d)
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        expr("(max(us) - min(us)) div 1000000").as("dur_s"),
        min(col("event_id")).as("first_event"))
      .orderBy("user_id", "session_no")
  }

  /** Q56 [EXT] — FIRST-TOUCH CONVERSION ATTRIBUTION over the q53
    * sessions: each session's entry channel is its first event_type (by
    * time, event_id tie-break), a conversion is any 'purchase' inside
    * the session, and the output is the per-channel funnel row
    * (sessions, converted sessions, total purchases, conversion rate in
    * integer basis points) — the standard marketing/product-analytics
    * question "which entry point produces buyers", composed VERBATIM on
    * the shared session builder so the attribution can never disagree
    * with q53's session boundaries. ALL-INTEGER (counts + one bp
    * division). Plan at scale: the session builder's single user_id
    * exchange is reused by the first-event rank window AND the
    * per-session aggregate (both key on a superset of user_id); the
    * channel fold is a bounded |event_types|-key aggregate that
    * partial-combines map-side. */
  def q56Attribution(s: SparkSession, d: String): DataFrame = {
    val se = sessionized(s, d)
    val w = Window.partitionBy("user_id", "session_no")
      .orderBy(col("us"), col("event_id"))
    val first = se.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("session_no"),
        col("event_type").as("channel"))
    val conv = se.groupBy("user_id", "session_no")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("purchases"))
    first.join(conv, Seq("user_id", "session_no"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("purchases") > 0L, 1L).otherwise(0L)).as("n_converted"),
        sum(col("purchases")).as("n_purchases"))
      .withColumn("conv_bp", expr("n_converted * 10000 div n_sessions"))
      .orderBy("channel")
  }

  /** Funnel horizon (µs from the step-1 event) — interpolated into BOTH
    * engines. */
  val FunnelWindowUs: Long = 24L * 3600L * 1000000L

  /** Q57 [EXT] — ORDERED WINDOW FUNNEL (the ClickHouse `windowFunnel`
    * shape): per user, the deepest view → click → purchase prefix
    * reachable in STRICT time order within FunnelWindowUs of the view,
    * folded to the per-level user histogram — the conversion-depth
    * companion to q56 (that attributes sessions to entry channels; this
    * measures how far users get through an ordered step sequence,
    * whatever session they straddle). Semantics are exactly "next step
    * strictly later in time": step k+1 is the MINIMUM step-(k+1)
    * timestamp > step k's — same-instant events do NOT advance the
    * funnel (documented; makes the chain a pure function of (user, us)
    * sets, so ties need no id arbitration and both engines agree
    * bit-for-bit on integer micros). Users emit their MAX level over
    * all views; users with no view are absent. Plan at scale: ONE hash
    * exchange on user_id feeds both conditional range-frame windows
    * (min next-click / next-purchase over `RANGE 1 FOLLOWING ..`); the
    * view→click hop is an equi-join on (user, next-click-us) against
    * the DISTINCT click rows (next-purchase is a function of (user,
    * click-us) under strict-order semantics, so the dedup is lossless);
    * the level fold partial-combines to ≤ 3 rows. */
  def q57WindowFunnel(s: SparkSession, d: String): DataFrame = {
    val wf = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(1L, Window.unboundedFollowing)
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      tsMicros(col("ts")).as("us"))
    val base = ev
      .withColumn("nc",
        min(when(col("event_type") === "click", col("us"))).over(wf))
      .withColumn("np",
        min(when(col("event_type") === "purchase", col("us"))).over(wf))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("c_us"), col("np")).distinct()
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id"), col("us").as("v_us"), col("nc"))
    views
      .join(clicks,
        views("user_id") === clicks("user_id") &&
          views("nc") === clicks("c_us"), "left")
      .select(views("user_id"), col("v_us"), col("nc"), col("np"))
      .withColumn("lvl",
        when(col("np").isNotNull &&
          col("np") - col("v_us") <= FunnelWindowUs, 3L)
          .when(col("nc").isNotNull &&
            col("nc") - col("v_us") <= FunnelWindowUs, 2L)
          .otherwise(1L))
      .groupBy("user_id").agg(max(col("lvl")).as("funnel_level"))
      .groupBy("funnel_level").agg(count(lit(1)).as("n_users"))
      .orderBy("funnel_level")
  }

  /** Q58 [EXT] — CUMULATIVE DISTINCT USERS by day (the audience-growth
    * curve): running count of users whose FIRST event is on or before
    * each day, plus that day's new-user count — the classic "running
    * distinct" that a naive per-day COUNT(DISTINCT) over a growing
    * prefix makes quadratic: the first-touch identity (a user counts
    * exactly once, on their first day) turns it into one user-keyed
    * min-aggregate plus a cumulative sum over the BOUNDED day digest.
    * ALL-INTEGER. Plan at scale: the per-user min(first day) partial-
    * combines map-side (the corpus's event mass folds to |users| rows),
    * the day fold to |days| rows, and the running sum's single-partition
    * window runs on that digest only — never on events. */
  def q58RunningDistinct(s: SparkSession, d: String): DataFrame = {
    val run = Window.orderBy("first_day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("dt"))
      .groupBy("user_id").agg(min(col("dt")).as("first_day"))
      .groupBy("first_day").agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(run))
      .select(fmtDate(col("first_day")).as("day"), col("new_users"),
        col("cum_users"))
      .orderBy("day")
  }

  /** Q59 [EXT] — relative-standing windows (percent_rank / cume_dist)
    * folded to a decile profile: where each order's total price sits
    * WITHIN its priority class, summarized as a 10-bucket histogram with
    * the bucket's percent_rank floor and cume_dist ceiling — the "is
    * this class price-skewed vs the others" table, and the two ranking
    * functions the window surface (q17 rank, q33 ntile, q44
    * distribution) didn't yet declare. Exactness: the bucket is computed
    * in INTEGER space from rank() over exact cents — (rk−1)·10 div
    * (n−1) — so no double ever picks a bucket; the reported
    * percent_rank/cume_dist doubles divide identical integers in both
    * engines (the e8_autocorr discipline) and round at 4 dp. Ties take
    * the same rank, hence the same bucket, in both engines. Plan at
    * 100 TB: one exchange on the 5-key priority column (skew-safe: the
    * classes are uniform) serves rank, both distribution functions, and
    * the partition count; the decile fold partial-combines to ≤ 50
    * rows. */
  def q59PercentRank(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy("o_orderpriority").orderBy("cents")
    val wAll = Window.partitionBy("o_orderpriority")
    orders(s, d)
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .withColumn("rk", rank().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("pr", percent_rank().over(wOrd))
      .withColumn("cd", cume_dist().over(wOrd))
      .withColumn("pr_bucket",
        least(lit(9L), expr("(rk - 1) * 10 div greatest(n - 1, 1)")))
      .groupBy("o_orderpriority", "pr_bucket")
      .agg(count(lit(1)).as("n_orders"),
        round(min(col("pr")), 4).as("pr_lo"),
        round(max(col("cd")), 4).as("cd_hi"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .orderBy("o_orderpriority", "pr_bucket")
  }

  /** Q54 [EXT] — trailing-7-day revenue per customer via a true RANGE
    * window frame over the integer order-day key: each order row sees
    * the sum/count of its customer's orders in the preceding 7 calendar
    * DAYS, correct across date GAPS and same-day ties (peers share the
    * frame) — semantics a ROWS frame cannot express on a sparse series
    * and the q21b day-spine trick only recovers globally (densifying
    * PER CUSTOMER would explode customers × days rows at scale). The
    * rolling-spend / velocity-check shape fraud and billing pipelines
    * run. Exactness: the day key is integer days-since-epoch (both
    * engines truncate the naive timestamp to a date identically),
    * revenue in integer cents — ALL-INTEGER output. Plan: ONE
    * o_custkey exchange; both windows share the (custkey, day) sort;
    * per-customer frame work is bounded by order density, independent
    * of table size. */
  def q54RangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("day"))
      .rangeBetween(-6, Window.currentRow)
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .withColumn("rev7_cents", sum(col("cents")).over(w))
      .withColumn("n7", count(lit(1)).over(w))
      .orderBy("o_custkey", "day", "o_orderkey")
  }

  /** All declared queries keyed by the SparkEntry / oracle name. */
  /** Q55 [EXT] — GAPS-AND-ISLANDS over per-user activity dates: collapse
    * each user's distinct active days into maximal CONSECUTIVE runs via
    * the classic date − row_number() constant-group trick, then emit the
    * per-user streak profile (active days, island count, longest streak,
    * first/last day) — the retention/streak shape (DAU streaks, billing
    * continuity, sensor uptime) that q53_sessionize's gap-threshold
    * windows can't express because islands are defined on the DATE grid,
    * not on event spacing. Deterministic: dates are exact, the
    * row_number order (user_id, dt) is total after the DISTINCT, and
    * every output is an integer count or a formatted date. Plan at
    * 100 TB: the DISTINCT (user, date) pre-aggregate partial-combines
    * map-side (the corpus's event mass folds to ≤ users×days rows
    * before any window); the island window runs partition-parallel per
    * user on that compacted table; both downstream aggregates are
    * map-side-combinable. One shuffle on user_id total — the window and
    * both groupBys reuse the same hash partitioning. */
  def q55GapsIslands(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("dt")).distinct()
      .withColumn("grp", expr("date_sub(dt, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY dt))"))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min(col("dt")).as("mn"),
        max(col("dt")).as("mx"))
      .groupBy("user_id")
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_islands"),
        max(col("len")).as("max_island_len"),
        fmtDate(min(col("mn"))).as("first_day"),
        fmtDate(max(col("mx"))).as("last_day"))
      .orderBy("user_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_running_distinct" -> (q58RunningDistinct _),
    "q57_window_funnel" -> (q57WindowFunnel _),
    "q56_attribution" -> (q56Attribution _),
    "q55_gaps_islands" -> (q55GapsIslands _),
    "q54_range_frame" -> (q54RangeFrame _),
    "q59_percent_rank" -> (q59PercentRank _),
    "q53_sessionize" -> (q53Sessionize _),
    "q51_lateral" -> (q51Lateral _),
    "q52_date_spine" -> (q52DateSpine _),
    "q49_dq_checks" -> (q49DqChecks _),
    "q50_incr_agg" -> (q50IncrAgg _),
    "q47_scd2" -> (q47Scd2 _),
    "q48_merge_upsert" -> (q48MergeUpsert _),
    "q46_unpivot" -> (q46Unpivot _),
    "q45_first_last" -> (q45FirstLast _),
    "q44_window_dist" -> (q44WindowDist _),
    "q43_approx_quantile" -> (q43ApproxQuantile _),
    "q01_scan_project" -> (q01ScanProject _),
    "q02_filter_ts" -> (q02FilterTs _),
    "q03_eq_filter" -> (q03EqFilter _),
    "q03_latest" -> (q03Latest _),
    "q04_previous" -> (q04Previous _),
    "q04a_json_null" -> (q04aJsonNull _),
    "q05_case_insensitive" -> (q05CaseInsensitive _),
    "q06_retention" -> (q06Retention _),
    "q07_min_ts" -> (q07MinTs _),
    "q08_group_max_ts" -> (q08GroupMaxTs _),
    "q09_duplicates" -> (q09Duplicates _),
    "q10_join_nest" -> (q10JoinNest _),
    "q10b_nested" -> (q10bNested _),
    "q04b_json_keys" -> (q04bJsonKeys _),
    "q23_decimal" -> (q23Decimal _),
    "q24_distinct" -> (q24Distinct _),
    "q25_percentile" -> (q25Percentile _),
    "q26_asof_join" -> (q26AsofJoin _),
    "q27_range_join" -> (q27RangeJoin _),
    "q11_semi" -> (q11Semi _),
    "q12_anti" -> (q12Anti _),
    "q13_cond_agg" -> (q13CondAgg _),
    "q15_date_arith" -> (q15DateArith _),
    "q16_substr_tail" -> (q16SubstrTail _),
    "q16a_union" -> (q16aUnion _),
    "q17_window_rank" -> (q17WindowRank _),
    "q18_topk" -> (q18TopK _),
    "q19_agg" -> (q19Agg _),
    "q19a_region_revenue" -> (q19aRegionRevenue _),
    "q20_rollup" -> (q20Rollup _),
    "q20b_cube" -> (q20bCube _),
    "q21_running_sum" -> (q21RunningSum _),
    "q21b_time_window" -> (q21bTimeWindow _),
    "q22_date_parts" -> (q22DateParts _),
    "q28_pivot" -> (q28Pivot _),
    "q29_full_outer" -> (q29FullOuter _),
    "q16b_set_ops" -> (q16bSetOps _),
    "q30_histogram" -> (q30Histogram _),
    "q31_exists" -> (q31Exists _),
    "q32_grouping_sets" -> (q32GroupingSets _),
    "q33_ntile" -> (q33Ntile _),
    "q34_array_agg" -> (q34ArrayAgg _),
    "q35_string_funcs" -> (q35StringFuncs _),
    "q36_scalar_subquery" -> (q36ScalarSubquery _),
    "q37_mode" -> (q37Mode _),
    "q38_stats" -> (q38Stats _),
    "q39_set_all" -> (q39SetAll _),
    "q40_skew_agg" -> (q40SkewAgg _),
    "q41_skew_join" -> (q41SkewJoin _),
    "q42_approx_distinct" -> (q42ApproxDistinct _),
  )

  /** Session-assignment CTE chain ending in `sess` (user_id, event_id,
    * event_type, us, session_no) — shared verbatim by the q53 and q56
    * oracles so they can't drift (mirrors `sessionized`). */
  private lazy val sessionCtes: String =
    s"""e AS (SELECT user_id, event_id, event_type,
       |    epoch_us(ts) AS us FROM events),
       |l AS (SELECT *, lag(us) OVER
       |    (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM e),
       |b AS (SELECT *, CASE WHEN prev_us IS NULL
       |      OR us - prev_us > $SessionGapUs THEN 1 ELSE 0 END AS bd FROM l),
       |sess AS (SELECT *, CAST(sum(bd) OVER (PARTITION BY user_id
       |    ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
       |    CURRENT ROW) AS BIGINT) AS session_no FROM b)""".stripMargin

  /** DuckDB oracle SQL for each query (driver runs these over the same
    * parquet files; column names/aliases must match the Spark output). */
  val oracles: Map[String, String] = Map(
    // first-touch identity: per-user min day, then a cumulative sum over
    // the bounded day digest (see q58RunningDistinct)
    // bucket picked in integer rank space ((rk-1)*10 // (n-1)); the
    // reported percent_rank/cume_dist doubles divide identical integers
    "q59_percent_rank" ->
      """WITH po AS (SELECT o_orderpriority,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |pw AS (SELECT o_orderpriority, cents,
        |    rank() OVER w AS rk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n,
        |    percent_rank() OVER w AS pr,
        |    cume_dist() OVER w AS cd
        |  FROM po WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents)),
        |pb AS (SELECT pw.*, least(9, (rk - 1) * 10 // greatest(n - 1, 1))
        |    AS pr_bucket FROM pw)
        |SELECT o_orderpriority, CAST(pr_bucket AS BIGINT) AS pr_bucket,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(min(pr), 4) AS pr_lo, round(max(cd), 4) AS cd_hi,
        |  min(cents) AS min_cents, max(cents) AS max_cents
        |FROM pb GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q58_running_distinct" ->
      """WITH fu AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day
        |  FROM events GROUP BY user_id),
        |dd AS (SELECT first_day, count(*) AS new_users FROM fu
        |  GROUP BY first_day)
        |SELECT strftime(first_day, '%Y-%m-%d') AS day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY first_day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM dd ORDER BY day""".stripMargin,
    // strict-time-order funnel: conditional range-frame next-step mins,
    // view -> click hop via the (user, next-click-us) equi-join against
    // DISTINCT clicks (see q57WindowFunnel)
    "q57_window_funnel" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |base AS (SELECT user_id, event_type, us,
         |    min(CASE WHEN event_type = 'click' THEN us END) OVER (
         |      PARTITION BY user_id ORDER BY us
         |      RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nc,
         |    min(CASE WHEN event_type = 'purchase' THEN us END) OVER (
         |      PARTITION BY user_id ORDER BY us
         |      RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
         |  FROM ev),
         |ck AS (SELECT DISTINCT user_id, us AS c_us, np FROM base
         |  WHERE event_type = 'click'),
         |vw AS (SELECT user_id, us AS v_us, nc FROM base
         |  WHERE event_type = 'view'),
         |lv AS (SELECT vw.user_id,
         |    CASE WHEN ck.np IS NOT NULL
         |        AND ck.np - vw.v_us <= $FunnelWindowUs THEN 3
         |      WHEN vw.nc IS NOT NULL
         |        AND vw.nc - vw.v_us <= $FunnelWindowUs THEN 2
         |      ELSE 1 END AS lvl
         |  FROM vw LEFT JOIN ck ON vw.user_id = ck.user_id
         |    AND vw.nc = ck.c_us),
         |ul AS (SELECT user_id, CAST(max(lvl) AS BIGINT) AS funnel_level
         |  FROM lv GROUP BY user_id)
         |SELECT funnel_level, count(*) AS n_users
         |FROM ul GROUP BY funnel_level ORDER BY funnel_level""".stripMargin,
    // first event_type per session (us, event_id order) joined to the
    // per-session purchase count, folded per channel (see q56Attribution)
    "q56_attribution" ->
      s"""WITH $sessionCtes,
         |fs AS (SELECT user_id, session_no, event_type AS channel
         |  FROM (SELECT user_id, session_no, event_type,
         |      row_number() OVER (PARTITION BY user_id, session_no
         |        ORDER BY us, event_id) AS rn FROM sess)
         |  WHERE rn = 1),
         |cv AS (SELECT user_id, session_no,
         |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS purchases
         |  FROM sess GROUP BY 1, 2)
         |SELECT channel, count(*) AS n_sessions,
         |  CAST(sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_converted,
         |  CAST(sum(purchases) AS BIGINT) AS n_purchases,
         |  CAST(sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END) * 10000
         |    // count(*) AS BIGINT) AS conv_bp
         |FROM fs JOIN cv USING (user_id, session_no)
         |GROUP BY channel ORDER BY channel""".stripMargin,
    // date - row_number() constant-group islands over distinct active
    // days (see q55GapsIslands)
    "q55_gaps_islands" ->
      """WITH ad AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt
        |  FROM events),
        |g AS (SELECT user_id, dt,
        |    dt - CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY dt) AS INT) AS grp
        |  FROM ad),
        |isl AS (SELECT user_id, grp, count(*) AS len,
        |    min(dt) AS mn, max(dt) AS mx
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  count(*) AS n_islands,
        |  CAST(max(len) AS BIGINT) AS max_island_len,
        |  strftime(min(mn), '%Y-%m-%d') AS first_day,
        |  strftime(max(mx), '%Y-%m-%d') AS last_day
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,
    // integer day key + RANGE frame: DuckDB's numeric RANGE matches
    // Spark's rangeBetween(-6, currentRow) including same-day peers
    "q54_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(date_diff('day', DATE '1970-01-01',
        |    CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rev7_cents,
        |  CAST(count(*) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7
        |FROM orders ORDER BY o_custkey, day, o_orderkey""".stripMargin,
    "q53_sessionize" ->
      s"""WITH $sessionCtes
         |SELECT user_id, session_no, count(*) AS n_events,
         |  count(DISTINCT event_type) AS n_types,
         |  (max(us) - min(us)) // 1000000 AS dur_s,
         |  min(event_id) AS first_event
         |FROM sess GROUP BY user_id, session_no
         |ORDER BY user_id, session_no""".stripMargin,
    "q52_date_spine" ->
      """WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))
        |  AS day FROM b),
        |j AS (SELECT spine.day, coalesce(n_orders, 0) AS n_orders,
        |    coalesce(cents, 0) AS cents
        |  FROM spine LEFT JOIN daily USING (day)),
        |w AS (SELECT day, n_orders, cents,
        |    sum(cents) OVER (ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7,
        |    count(*) OVER (ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n7
        |  FROM j)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(n_orders AS BIGINT) AS n_orders,
        |  round(cents / 100.0, 2) AS revenue,
        |  round(s7 / (n7 * 100.0), 2) AS avg7
        |FROM w ORDER BY day""".stripMargin,
    "q51_lateral" ->
      """SELECT n_name, c_name, round(c_acctbal, 2) AS bal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n_name, bal DESC, c_name""".stripMargin,
    "q49_dq_checks" ->
      """WITH o AS (SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nd,
        |    sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
        |      AS sviol FROM orders),
        |li AS (SELECT count(*) AS n,
        |    sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS fkviol,
        |    sum(CASE WHEN l.l_quantity > 40 THEN 1 ELSE 0 END) AS qviol
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |cu AS (SELECT count(*) AS n,
        |    sum(CASE WHEN nn.n_nationkey IS NULL THEN 1 ELSE 0 END) AS fkviol
        |  FROM customer c LEFT JOIN nation nn ON c.c_nationkey = nn.n_nationkey),
        |ev AS (SELECT count(*) AS n,
        |    sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS vviol FROM events),
        |rep AS (
        |  SELECT 'orders_pk_unique' AS check_name, n AS n_checked,
        |    n - nd AS n_violations FROM o
        |  UNION ALL SELECT 'orders_status_domain', n, sviol FROM o
        |  UNION ALL SELECT 'lineitem_fk_orders', n, fkviol FROM li
        |  UNION ALL SELECT 'lineitem_qty_le_40', n, qviol FROM li
        |  UNION ALL SELECT 'customer_fk_nation', n, fkviol FROM cu
        |  UNION ALL SELECT 'events_value_nonneg', n, vviol FROM ev)
        |SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
        |  CAST(n_violations AS BIGINT) AS n_violations,
        |  n_violations = 0 AS pass
        |FROM rep ORDER BY check_name""".stripMargin,
    "q50_incr_agg" ->
      s"""WITH st AS (SELECT l_returnflag, l_linestatus,
         |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         |    count(*) AS n_rows, 0 AS n_delta
         |  FROM lineitem WHERE l_shipdate < TIMESTAMP '$IncrCutoff'
         |  GROUP BY 1, 2),
         |dl AS (SELECT l_returnflag, l_linestatus,
         |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         |    count(*) AS n_rows, count(*) AS n_delta
         |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '$IncrCutoff'
         |  GROUP BY 1, 2)
         |SELECT l_returnflag, l_linestatus,
         |  CAST(sum(sum_qty) AS DOUBLE) AS sum_qty,
         |  CAST(sum(n_rows) AS BIGINT) AS n_rows,
         |  CAST(sum(n_delta) AS BIGINT) AS n_delta
         |FROM (SELECT * FROM st UNION ALL SELECT * FROM dl)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q47_scd2" ->
      """WITH ch AS (
        |  SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |f AS (SELECT o_custkey, o_orderkey, o_orderpriority,
        |    strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |    lead(strftime(o_orderdate, '%Y-%m-%d')) OVER (
        |      PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM ch WHERE prev IS NULL OR prev <> o_orderpriority)
        |SELECT o_custkey, o_orderkey, o_orderpriority, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM f ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
    "q48_merge_upsert" ->
      s"""WITH snap AS (
         |  SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
         |    o_orderdate, 'snap' AS src FROM (
         |    SELECT *, row_number() OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         |    FROM orders WHERE o_orderdate < TIMESTAMP '$MergeCutoff')
         |  WHERE rn = 1),
         |btch AS (SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
         |    o_orderdate, 'batch' AS src
         |  FROM orders WHERE o_orderdate >= TIMESTAMP '$MergeCutoff'),
         |u AS (SELECT * FROM snap UNION ALL SELECT * FROM btch),
         |m AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
         |    max(CASE WHEN src = 'snap' THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY o_custkey) AS has_snap
         |  FROM u)
         |SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
         |  strftime(o_orderdate, '%Y-%m-%d') AS o_date,
         |  CASE WHEN src = 'snap' THEN 'keep'
         |       WHEN has_snap = 1 THEN 'update'
         |       ELSE 'insert' END AS action
         |FROM m WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q46_unpivot" ->
      // metrics rounded in DECIMAL then cast, so both engines melt the
      // same doubles; UNPIVOT column order doesn't matter — the driver
      // compare sorts rows and columns by name
      """WITH wide AS (SELECT o_orderpriority,
        |  CAST(count(*) AS DOUBLE) AS n_orders,
        |  CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total_price,
        |  CAST(max(o_totalprice) AS DOUBLE) AS max_price
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, metric, value FROM wide
        |UNPIVOT (value FOR metric IN (n_orders, total_price, max_price))
        |ORDER BY o_orderpriority, metric""".stripMargin,
    "q45_first_last" ->
      """SELECT o_orderkey, o_custkey,
        |first_value(o_orderkey) OVER w AS first_key,
        |last_value(o_orderkey) OVER w AS last_key,
        |nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q44_window_dist" ->
      // micro-units via floor(x*1e6 + 0.5): round() tie semantics differ
      // cross-engine exactly where rank/n lands on a .5 boundary
      """SELECT c_custkey, CAST(c_nationkey AS INT) AS c_nationkey, c_acctbal,
        |CAST(floor(percent_rank() OVER (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal, c_custkey) * 1000000 + 0.5) AS BIGINT)
        |  AS pct_rank_u,
        |CAST(floor(cume_dist() OVER (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal, c_custkey) * 1000000 + 0.5) AS BIGINT)
        |  AS cdist_u
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q43_approx_quantile" ->
      // each engine's own quantile sketch vs its own exact median — the
      // ≤5% contract is engine-portable, the estimates are not
      """SELECT l_returnflag, count(*) AS n,
        |abs(approx_quantile(l_extendedprice, 0.5)
        |  - quantile_cont(l_extendedprice, 0.5))
        |  <= quantile_cont(l_extendedprice, 0.5) * 0.05 AS err_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q42_approx_distinct" ->
      // each engine's own HLL sketch, judged against its own exact count:
      // the ≤5% contract is engine-portable even though the estimates
      // themselves are not
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
        |abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
        |  <= count(DISTINCT l_orderkey) * 0.05 AS err_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q40_skew_agg" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q41_skew_join" ->
      """WITH dim AS (SELECT event_type, round(avg(value), 6) AS type_avg
        |  FROM events GROUP BY 1)
        |SELECT event_type, count(*) AS n,
        |  round(sum(abs(value - type_avg)), 2) AS sum_absdev
        |FROM events JOIN dim USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q37_mode" ->
      """SELECT l_returnflag, l_quantity AS mode_qty, n FROM (
        |  SELECT l_returnflag, l_quantity, count(*) AS n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY count(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY 1, 2)
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "q38_stats" ->
      """SELECT l_returnflag, count(*) AS n,
        |round(stddev_samp(l_quantity), 4) AS sd_qty,
        |round(var_samp(l_quantity), 4) AS var_qty,
        |round(corr(l_quantity, l_extendedprice), 4) AS corr_qp
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q39_set_all" ->
      """WITH a AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |b AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'),
        |ia AS (SELECT c_nationkey, count(*) AS n_ia FROM
        |  (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1),
        |ea AS (SELECT c_nationkey, count(*) AS n_ea FROM
        |  (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1)
        |SELECT coalesce(ia.c_nationkey, ea.c_nationkey) AS c_nationkey,
        |  CAST(coalesce(n_ia, 0) AS BIGINT) AS n_intersect_all,
        |  CAST(coalesce(n_ea, 0) AS BIGINT) AS n_except_all
        |FROM ia FULL OUTER JOIN ea ON ia.c_nationkey = ea.c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q01_scan_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |l_quantity, l_extendedprice FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_filter_ts" ->
      """SELECT event_id, event_type, value, epoch_us(ts) AS ts_us FROM events
        |WHERE ts < TIMESTAMP '2024-01-08 00:00:00' ORDER BY event_id""".stripMargin,
    "q03_eq_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
        |FROM orders WHERE o_custkey = 42 ORDER BY o_orderkey""".stripMargin,
    "q03_latest" ->
      """SELECT o_orderkey, o_totalprice,
        |strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
        |FROM orders WHERE o_custkey = 42
        |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""".stripMargin,
    "q04_previous" ->
      """SELECT o_orderkey, o_totalprice,
        |strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
        |FROM orders WHERE o_custkey = 42
        |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1 OFFSET 1""".stripMargin,
    "q04a_json_null" ->
      """SELECT json_extract_string(props, '$.k') AS k, count(*) AS n
        |FROM events WHERE props IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_case_insensitive" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE lower(p_brand) = lower('bRaNd#4') ORDER BY p_partkey""".stripMargin,
    "q06_retention" ->
      """SELECT count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-15 00:00:00')
        |AS n_expired,
        |count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-15 00:00:00') AS n_kept
        |FROM events""".stripMargin,
    "q07_min_ts" ->
      """SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS min_ts_s
        |FROM events""".stripMargin,
    "q08_group_max_ts" ->
      """SELECT event_type, strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts_s
        |FROM events WHERE value > 0 GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q09_duplicates" ->
      """SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
        |count(*) AS n FROM orders GROUP BY 1, 2 HAVING count(*) > 1
        |ORDER BY o_custkey, o_orderdate_s""".stripMargin,
    "q10_join_nest" ->
      """SELECT o_orderkey, count(*) AS n_items,
        |round(sum(l_quantity), 2) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q10b_nested" ->
      """WITH items AS (SELECT o_orderkey,
        |  array_agg(struct_pack(l_linenumber := l_linenumber,
        |      l_quantity := l_quantity)
        |    ORDER BY l_linenumber, l_quantity) AS arr
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY o_orderkey)
        |SELECT o_orderkey, CAST(len(arr) AS BIGINT) AS n_items,
        |CAST(arr[1].l_linenumber AS BIGINT) AS first_line,
        |arr[len(arr)].l_quantity AS last_qty
        |FROM items ORDER BY o_orderkey""".stripMargin,
    "q04b_json_keys" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT unnest(json_keys(props)) AS k FROM events)
        |GROUP BY k ORDER BY k""".stripMargin,
    "q23_decimal" ->
      """SELECT l_returnflag,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q24_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q25_percentile" -> {
      // mirrors the Spark plan token for token in integer CENTS
      // (floor(lo + (hi-lo)*(idx-floor(idx)) + 0.5) / 100); fractions are
      // CAST to DOUBLE because a bare 0.5 literal is DECIMAL in DuckDB
      // and would change the arithmetic — see q25Percentile
      def interp(f: String, name: String) =
        s"""floor(max(CASE WHEN rn = floor((n - 1) * CAST($f AS DOUBLE)) THEN c END)
           |  + (max(CASE WHEN rn = ceil((n - 1) * CAST($f AS DOUBLE)) THEN c END)
           |     - max(CASE WHEN rn = floor((n - 1) * CAST($f AS DOUBLE)) THEN c END))
           |    * ((max(n) - 1) * CAST($f AS DOUBLE)
           |       - floor((max(n) - 1) * CAST($f AS DOUBLE))) + 0.5) / 100.0 AS $name""".stripMargin
      s"""WITH ranked AS (SELECT l_returnflag,
         |  CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
         |  row_number() OVER (PARTITION BY l_returnflag ORDER BY round(l_extendedprice * 100)) - 1 AS rn,
         |  count(*) OVER (PARTITION BY l_returnflag) AS n FROM lineitem)
         |SELECT l_returnflag,
         |${interp("0.5", "p50")},
         |${interp("0.95", "p95")}
         |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q26_asof_join" ->
      """SELECT c.event_id, e.event_id AS prev_error_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.event_id""".stripMargin,
    "q27_range_join" ->
      """SELECT c.event_id,
        |count(v.v_ts) AS n_views
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'click') c
        |LEFT JOIN (SELECT user_id AS v_user, ts AS v_ts FROM events
        |      WHERE event_type = 'view') v
        |  ON c.user_id = v.v_user AND v.v_ts > c.ts
        |  AND v.v_ts <= c.ts + INTERVAL '5 minutes'
        |GROUP BY c.event_id ORDER BY c.event_id""".stripMargin,
    "q30_histogram" ->
      """SELECT CASE WHEN value < 0.0 THEN 0
        |  WHEN value >= 1000.0 THEN 11
        |  ELSE CAST(floor(value / 100.0) AS BIGINT) + 1 END AS bucket,
        |count(*) AS n, round(min(value), 2) AS lo, round(max(value), 2) AS hi
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q29_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS ck, count(*) AS n_cust
        |  FROM customer GROUP BY 1),
        |p AS (SELECT s_nationkey AS sk, count(*) AS n_supp
        |  FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
        |SELECT CAST(coalesce(ck, sk) AS BIGINT) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN p ON ck = sk ORDER BY nationkey""".stripMargin,
    "q16b_set_ops" ->
      """SELECT p_brand, 'both' AS which FROM (
        |  SELECT p_brand FROM part WHERE p_partkey % 2 = 0
        |  INTERSECT
        |  SELECT p_brand FROM part WHERE p_partkey % 2 = 1)
        |UNION ALL
        |SELECT p_brand, 'even_only' AS which FROM (
        |  SELECT p_brand FROM part WHERE p_partkey % 2 = 0
        |  EXCEPT
        |  SELECT p_brand FROM part WHERE p_partkey % 2 = 1)
        |ORDER BY which, p_brand""".stripMargin,
    "q28_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |count(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
    "q20b_cube" ->
      """SELECT coalesce(r_name, '(all)') AS r, coalesce(n_name, '(all)') AS n,
        |round(sum(c_acctbal), 2) AS bal
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY CUBE (r_name, n_name) ORDER BY r, n""".stripMargin,
    "q21b_time_window" ->
      """SELECT user_id, event_id,
        |round(sum(value) OVER (PARTITION BY user_id
        |  ORDER BY epoch_us(ts) // 1000000
        |  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 2) AS rolling_10m
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q11_semi" ->
      """SELECT DISTINCT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
        |AND o_custkey IN (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01')
        |ORDER BY o_custkey""".stripMargin,
    "q12_anti" ->
      """SELECT DISTINCT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
        |AND o_custkey NOT IN (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01')
        |ORDER BY o_custkey""".stripMargin,
    "q13_cond_agg" ->
      """SELECT l_returnflag,
        |count(*) FILTER (WHERE l_discount > 0.05) AS n_high,
        |count(*) FILTER (WHERE l_discount <= 0.05) AS n_low
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_date_arith" ->
      """SELECT o_orderkey,
        |CAST(datediff('day', o_orderdate, min(l_shipdate)) AS BIGINT) AS d_first,
        |CAST(datediff('day', o_orderdate, max(l_shipdate)) AS BIGINT) AS d_last
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_orderdate ORDER BY o_orderkey""".stripMargin,
    "q16_substr_tail" ->
      """SELECT doc_id, CASE WHEN length(text) <= 80 THEN text
        |ELSE substring(text, length(text) - 79, 80) END AS tail
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q16a_union" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-04-01'
        |UNION ALL
        |SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
        |FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01'
        |  AND o_orderdate < TIMESTAMP '2002-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    "q17_window_rank" ->
      """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
    "q18_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q19_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |round(avg(l_discount), 2) AS avg_disc, count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q19a_region_revenue" ->
      """SELECT r_name,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |count(*) AS n_items
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q20_rollup" ->
      """SELECT coalesce(r_name, '(all)') AS r, coalesce(n_name, '(all)') AS n,
        |round(sum(c_acctbal), 2) AS bal
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (r_name, n_name) ORDER BY r, n""".stripMargin,
    "q21_running_sum" ->
      """SELECT user_id, event_id,
        |round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
        |round(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
        |  AS prev_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q22_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |strftime(o_orderdate, '%Y') AS label, count(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY yr""".stripMargin,
    "q31_exists" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        |  AND year(o.o_orderdate) = 1996)
        |ORDER BY c_custkey""".stripMargin,
    "q32_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS st,
        |coalesce(o_orderpriority, '(all)') AS pri,
        |count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY st, pri""".stripMargin,
    "q33_ntile" ->
      """SELECT c_mktsegment, c_custkey,
        |CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |round(percent_rank() OVER w, 4) AS pr,
        |round(cume_dist() OVER w, 4) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q34_array_agg" ->
      """WITH ys AS (SELECT o_custkey,
        |  list_sort(list_distinct(list(CAST(year(o_orderdate) AS VARCHAR)))) AS ys
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, CAST(len(ys) AS BIGINT) AS n_years,
        |array_to_string(ys, ',') AS years
        |FROM ys ORDER BY o_custkey""".stripMargin,
    "q36_scalar_subquery" ->
      """WITH c AS (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |agg AS (SELECT o_custkey AS k, CAST(sum(cents) AS BIGINT) AS sc,
        |  count(*) AS cnt FROM c GROUP BY o_custkey)
        |SELECT o_orderkey, o_custkey, o_totalprice,
        |CAST((2 * sc + cnt) // (2 * cnt) AS DOUBLE) / 100.0 AS cust_avg
        |FROM c JOIN agg ON o_custkey = k
        |WHERE cents * cnt > sc ORDER BY o_orderkey""".stripMargin,
    "q35_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        |replace(p_name, ' ', '_') AS snake,
        |CAST(strpos(p_name, 'widget') AS BIGINT) AS pos_widget,
        |substring(p_name, 1, 4) AS head4,
        |reverse(p_name) AS rev,
        |CAST(length(p_name) AS BIGINT) AS len
        |FROM part ORDER BY p_partkey""".stripMargin,
  )
}
