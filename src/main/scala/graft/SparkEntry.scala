package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q19aRegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.all ++ ops.TextOps.all ++ ops.Dedup.all ++
      ops.Similarity.all ++ ops.Multimodal.all ++ ops.Sampling.all ++
      ops.Curation.all ++ ops.Analysis.all ++ streaming.StreamOps.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.TextOps.oracles ++ ops.Dedup.oracles ++
      ops.Similarity.oracles ++ ops.Multimodal.oracles ++
      ops.Sampling.oracles ++ ops.Curation.oracles ++
      ops.Analysis.oracles ++ streaming.StreamOps.oracles
}
