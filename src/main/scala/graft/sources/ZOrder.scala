package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout for multi-dimensional data skipping —
  * the complement to Bucketing: bucketing makes one JOIN key exchange-free,
  * z-ordering makes several FILTER columns simultaneously skippable.
  *
  * Parquet scans prune row groups and files from footer min/max statistics,
  * but those statistics only help if the layout CLUSTERS each filter column:
  * a table range-partitioned on column A has useless B statistics (every
  * file spans B's whole domain). Sorting by the interleaved-bit Morton value
  * of (A, B) instead makes every file a small hyper-rectangle: with F files,
  * each covers roughly F^(-1/2) of A's range AND F^(-1/2) of B's range, so a
  * selective predicate on EITHER column (or both) skips most files. This is
  * the layout pass warehouse engines run as OPTIMIZE ... ZORDER BY; here it
  * is a plain Spark write: one range exchange on the z-value (range
  * partitioning samples the z distribution, so files are balanced even for
  * skewed inputs), a per-partition sort, no UDFs — everything codegen'd
  * column arithmetic, linear in the corpus at any scale.
  *
  * The z-value interleaves the low `bits` bits of the two keys, so inputs
  * must be non-negative and pre-scaled to [0, 2^bits) — for non-uniform or
  * unbounded domains, map values to their range-bucket ids first (ntile or
  * width_bucket); for the uniform integer keys of the fixtures the raw
  * values masked to `bits` are already uniform. Generalizes to more
  * dimensions by interleaving every d-th bit; two dimensions cover the
  * dominant filter-pair case. */
object ZOrder {

  /** Morton value: interleave the low `bits` bits of `a` (odd positions)
    * and `b` (even positions). Pure bit arithmetic — whole-stage codegen
    * keeps it scan-side; no shuffle, no UDF. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(am.bitwiseAND(lit(1L << i)), i + 1))
        .bitwiseOR(shiftleft(bm.bitwiseAND(lit(1L << i)), i))
    }
  }

  /** Write `df` into `nFiles` parquet files clustered along the Morton
    * curve of (a, b): range-partition on the z-value (sampled bounds →
    * balanced files), sort within each partition so row groups inside a
    * file are also hyper-rectangles, drop the helper column. */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, bits: Int,
      nFiles: Int, dir: String): Unit =
    df.withColumn("__z", zValue(a, b, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
