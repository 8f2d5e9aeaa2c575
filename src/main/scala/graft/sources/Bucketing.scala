package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffling a fact table once at write time so
  * every later equi-join/aggregation on the bucket key is exchange-free.
  * This is the 100 TB play for repeatedly-joined tables (orders ⋈ lineitem
  * on orderkey): pay the shuffle once at ingest, never again. Bucketed
  * writes go through saveAsTable (bucket metadata lives in the catalog). */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. Bucket count should
    * target HDFS-block-sized buckets at the expected table size (e.g.
    * ~2000 buckets for a 1 TB table), NOT the cluster core count.
    *
    * `singleFilePerBucket` pre-shuffles on the bucket key (shuffle hash
    * and bucket hash are both Murmur3, so each writer task holds exactly
    * one bucket) — the layout precondition for Spark to trust the sortBy
    * order at read time and skip the join's per-task sorts (with
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`;
    * multi-file buckets always re-sort). Costs one extra exchange at
    * write time; worth it for tables whose consumers are merge joins. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite,
      singleFilePerBucket: Boolean = false): Unit = {
    val staged =
      if (singleFilePerBucket)
        df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      else df
    staged.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two tables bucketed on `key` with matching bucket counts — plans
    * as a sort-merge join with NO exchange on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
