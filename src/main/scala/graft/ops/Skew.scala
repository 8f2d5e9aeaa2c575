package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities. AQE's skew-join split
  * (spark.sql.adaptive.skewJoin) is the first line of defense and is on in
  * every session we build; explicit salting is for the cases AQE cannot
  * fix — a single hot key whose post-split partitions still concentrate on
  * one task, or aggregations upstream of the join.
  *
  * Sizing `nSalts`: the salt count is the DEGREE OF PARALLELISM a hot key
  * is spread over, so the right value scales with the cluster, not with
  * the data — `defaultParallelism` (total executor cores) is the natural
  * ceiling, because more salts than cores buys no extra concurrency while
  * it keeps multiplying the small side's replication (saltedJoin) or the
  * partial-row count (saltedCount). Fewer salts are right only when the
  * hot key's row count is small enough that one core's share is already
  * acceptable. `saltsFor(spark)` derives this default; the declared
  * queries pin small constants (8/16) so their oracle-checked output and
  * plan shape are scale-independent, and a caller deploying on a real
  * cluster passes `saltsFor(spark)` instead. */
object Skew {

  /** nSalts matched to the cluster: one salt per executor core (floor 2 —
    * a single salt would be a no-op rename), so a single hot key can
    * occupy the whole cluster and no core idles while the hot partition
    * drains. On local[32] this is 32; on a 1000-executor × 8-core cluster
    * it is 8000 — the value that turns a one-task hot key into a
    * cluster-wide one without over-replicating the small side. */
  def saltsFor(spark: SparkSession): Int =
    math.max(2, spark.sparkContext.defaultParallelism)

  /** Salted inner equi-join on `key`: the big (skewed) side spreads each
    * key over `nSalts` subkeys via a deterministic hash of its whole row;
    * the small side is replicated `nSalts` times. The join then shuffles on
    * (key, salt), splitting a hot key across nSalts tasks. Replication
    * multiplies the small side — use only when smallDf is shuffle-joined
    * (if it fits a broadcast, broadcast() already avoids the skew). */
  def saltedJoin(bigDf: DataFrame, smallDf: DataFrame, key: String,
      nSalts: Int): DataFrame = {
    val saltSrc: Column = xxhash64(struct(bigDf.columns.map(bigDf(_)): _*))
    val salted = bigDf.withColumn("__salt", pmod(saltSrc, lit(nSalts)))
    val replicated = smallDf
      .withColumn("__salt", explode(sequence(lit(0L), lit(nSalts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial + final) aggregation with an explicit salt stage for
    * count/sum-style aggregates on a heavily skewed group key. Spark's
    * hash-aggregate already partial-aggregates map-side; this form is for
    * high-cardinality-payload aggs (e.g. collect_list) where the partial agg
    * cannot compact and one reducer would receive the whole hot group. */
  def saltedCount(df: DataFrame, key: String, nSalts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(key), monotonically_increasing_id()),
        lit(nSalts)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("n"))
}
