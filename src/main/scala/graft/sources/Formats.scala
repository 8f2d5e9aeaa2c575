package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format helpers (SURVEY.md §2 scans/sources/sinks). The
  * engine's canonical storage is parquet (columnar, splittable, predicate
  * pushdown); CSV/JSON exist for interchange and ORC as a columnar
  * alternative. Readers always take an explicit schema — schema inference
  * is a full extra pass over the data and is wrong at 100 TB. */
object Formats {

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  def writeParquet(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  def readCsv(s: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    s.read.schema(schema)
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  def writeCsv(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  def readJson(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def writeJson(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Partitioned-by-column parquet sink: the layout that makes partition
    * pruning work for the retention/date-range scans (Q02/Q06 shapes). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(cols: _*).parquet(path)

  /** Schema-evolved parquet read: unions the footer schemas of every file
    * under `path`, so a table whose files span schema versions (columns
    * added over years of ingest — the normal state of a 100 TB corpus)
    * reads as one frame with nulls for columns a file predates. This is
    * an explicit helper, not the readParquet default, because merging
    * costs a footer pass over EVERY file at planning time — the steady
    * state should pin the current schema via readParquet/schema(), and
    * reach for this one during migrations and backfills. */
  def readParquetEvolved(s: SparkSession, path: String): DataFrame =
    s.read.option("mergeSchema", "true").parquet(path)
}
