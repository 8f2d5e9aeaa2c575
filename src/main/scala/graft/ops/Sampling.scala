package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Deterministic sampling for corpus curation (SURVEY.md §2 E6).
  * At 100 TB you cannot re-draw a random sample and get the same corpus
  * twice — sampling must be a PURE FUNCTION of the record key so it is
  * reproducible across runs, engines, and backfills, and composable with
  * incremental processing (a record's membership never changes). The
  * standard trick: hash the key, keep the record iff the hash lands under
  * the rate. No shuffle, no state, scan-side filter. */
object Sampling {

  /** E6 — 20% per-language stratified sample: membership is
    * splitmix64(doc_id) mod 100 < 20, evaluated per stratum so every
    * language keeps ~20% regardless of corpus skew. The mix64 expression
    * is the oracle-replicable scrambler (see OracleSql); the sign bit is
    * cleared so the modulus is over [0, 2^63). Plan: a narrow scan-side
    * filter — no shuffle, no sampling state, same sample at any scale. */
  def e6StratifiedSample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("slot",
        pmod(org.apache.spark.sql.graftext.minhashExpression.mix64(col("doc_id"))
          .bitwiseAND(lit(Long.MaxValue)), lit(100L)))
      .filter(col("slot") < 20)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("lang")

  /** E6 — the sampled doc ids themselves (scan-shaped variant: what a
    * pipeline actually materializes). */
  def e6SampleIds(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(pmod(org.apache.spark.sql.graftext.minhashExpression.mix64(col("doc_id"))
        .bitwiseAND(lit(Long.MaxValue)), lit(100L)) < 20)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** E6 — deterministic train/val/test split (90/5/5): the split a doc
    * lands in is a pure function of its id (same hash gate as the
    * sampler), so the assignment is stable across runs, engines, and
    * incremental backfills — a document can never leak from train to test
    * because a job re-ran. Scan-side, no shuffle beyond the count. */
  def e6TrainValTest(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("slot",
        pmod(org.apache.spark.sql.graftext.minhashExpression.mix64(col("doc_id"))
          .bitwiseAND(lit(Long.MaxValue)), lit(100L)))
      .withColumn("split",
        when(col("slot") < 90, "train")
          .when(col("slot") < 95, "val")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
      .orderBy("split", "lang")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e6_stratified_sample" -> (e6StratifiedSample _),
    "e6_sample_ids" -> (e6SampleIds _),
    "e6_train_val_test" -> (e6TrainValTest _),
  )

  /** mix64(doc_id) & Long.MaxValue (unsigned u mod 2^63), then mod 100. */
  private val slotCtes: String = {
    import OracleSql._
    s"""mx0 AS (SELECT doc_id, lang, (CAST(doc_id AS HUGEINT) + $A) % $M AS z0 FROM documents),
       |mx1 AS (SELECT doc_id, lang, ${mulmod("xor(z0, z0 >> 30)", C1)} AS z1 FROM mx0),
       |mx2 AS (SELECT doc_id, lang, ${mulmod("xor(z1, z1 >> 27)", C2)} AS z2 FROM mx1),
       |sampled AS (
       |  SELECT doc_id, lang
       |  FROM (SELECT doc_id, lang,
       |    (xor(z2, z2 >> 31) % CAST(power(2, 63) AS HUGEINT)) % 100 AS slot FROM mx2)
       |  WHERE slot < 20)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "e6_stratified_sample" ->
      s"""WITH $slotCtes
         |SELECT lang, count(*) AS n_sampled,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM sampled GROUP BY lang ORDER BY lang""".stripMargin,
    "e6_sample_ids" ->
      s"""WITH $slotCtes
         |SELECT doc_id, lang FROM sampled ORDER BY doc_id""".stripMargin,
    "e6_train_val_test" -> {
      import OracleSql._
      s"""WITH mx0 AS (SELECT doc_id, lang, (CAST(doc_id AS HUGEINT) + $A) % $M AS z0 FROM documents),
         |mx1 AS (SELECT doc_id, lang, ${mulmod("xor(z0, z0 >> 30)", C1)} AS z1 FROM mx0),
         |mx2 AS (SELECT doc_id, lang, ${mulmod("xor(z1, z1 >> 27)", C2)} AS z2 FROM mx1),
         |slots AS (SELECT doc_id, lang,
         |  (xor(z2, z2 >> 31) % CAST(power(2, 63) AS HUGEINT)) % 100 AS slot FROM mx2)
         |SELECT CASE WHEN slot < 90 THEN 'train'
         |  WHEN slot < 95 THEN 'val' ELSE 'test' END AS split,
         |lang, count(*) AS n, min(doc_id) AS first_doc
         |FROM slots GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
    },
  )
}
