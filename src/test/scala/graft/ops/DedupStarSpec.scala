package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Label-equivalence and round-count properties of the large-star/
  * small-star connected-components pass (connectedComponentsStar) against
  * the min-label propagation baseline (connectedComponents). The driver
  * oracle already pins e1_dedup_clusters_star to the SAME recursive-CTE
  * SQL as e1_dedup_clusters; this spec adds the structural claims the
  * oracle can't see: equivalence on constructed graphs the fixture
  * doesn't contain (deep chains), and the O(log n) vs O(diameter) round
  * count that is the whole point of shipping the star form at 100 TB. */
class DedupStarSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def pairsDf(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.toDF("da", "db")

  private def vertsDf(n: Long): DataFrame =
    (0L until n).toDF("doc_id")

  test("star labels match min-label propagation on the sf0.001 fixture pair table") {
    val verts = graft.Tables.documents(spark, TestSpark.sf0001).select("doc_id")
    val pairs = Dedup.e1MinhashPairs(spark, TestSpark.sf0001).select("da", "db")
    val (minLab, _) = Dedup.connectedComponentsWithRounds(verts, pairs)
    val (starLab, _) = Dedup.connectedComponentsStar(verts, pairs)
    assert(labelsOf(starLab) == labelsOf(minLab))
  }

  test("64-edge chain: identical labels, star needs a small fraction of min-label's rounds") {
    // The adversarial shape for min-label: one path 0-1-...-64, diameter
    // 64, so the min label crawls one hop per round. Large-star/small-star
    // halves (at least) the height of the hanging structure per round.
    val n = 65L
    val chain = pairsDf((0L until n - 1).map(i => (i, i + 1)))
    val (minLab, minRounds) =
      Dedup.connectedComponentsWithRounds(vertsDf(n), chain)
    val (starLab, starRounds) =
      Dedup.connectedComponentsStar(vertsDf(n), chain)
    val star = labelsOf(starLab)
    assert(star == labelsOf(minLab))
    assert(star.values.forall(_ == 0L), "one component rooted at 0")
    assert(star.size == n)
    // O(diameter) vs O(log n), measured: the baseline pays ~one round per
    // hop of the 64-long path; the star pass collapses it in a handful.
    assert(minRounds >= 30, s"min-label rounds $minRounds — chain should be diameter-bound")
    assert(starRounds <= 10, s"star rounds $starRounds — should be ~log n")
    assert(starRounds * 3 < minRounds,
      s"star $starRounds vs min-label $minRounds: expected a multiple-x round drop")
    info(s"64-edge chain rounds: min-label $minRounds, star $starRounds")
  }

  test("star labels match min-label on seeded random graphs (multi-component, hubs, isolated vertices)") {
    val rnd = new scala.util.Random(0x5eed)
    for (_ <- 1 to 3) {
      val n = 40L
      val edges = Seq.fill(30)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val (minLab, _) = Dedup.connectedComponentsWithRounds(vertsDf(n), pairsDf(edges))
      val (starLab, _) = Dedup.connectedComponentsStar(vertsDf(n), pairsDf(edges))
      assert(labelsOf(starLab) == labelsOf(minLab), s"edges: $edges")
    }
  }

  test("incremental cluster maintenance equals full recompute on batch rows (incl. cluster merges)") {
    import org.apache.spark.sql.functions._
    // the oracle proves this per scale; here the same invariant is pinned
    // as a law so a refactor of the contraction logic fails fast in CI
    val incr = labelsOf(Dedup.e1IncrementalClusters(spark, TestSpark.sf0001))
    val full = Dedup.e1DedupClusters(spark, TestSpark.sf0001)
      .join(graft.Tables.documents(spark, TestSpark.sf0001)
        .select(col("doc_id"))
        .filter(Sampling.slot(col("doc_id"), Dedup.IncrSalt) >= 90),
        Seq("doc_id"), "left_semi")
    assert(incr == labelsOf(full))
    assert(incr.nonEmpty)
  }

  test("contraction survives a batch doc merging two pre-existing clusters") {
    // constructed graph: corpus clusters {0,1} and {2,3} (labels 0 and 2);
    // batch doc 100 pairs with 1 AND 3 — the merge case. Contract the
    // cross edges through the corpus labels and run star CC: doc 100 must
    // read label 0 (the merged component's min), exactly what a full
    // recompute over all five nodes yields.
    val corpusPairs = pairsDf(Seq((0L, 1L), (2L, 3L)))
    val corpusVerts = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val (labels, _) = Dedup.connectedComponentsStar(corpusVerts, corpusPairs)
    val lab = labelsOf(labels)
    val contractedEdges = pairsDf(Seq((100L, lab(1L)), (100L, lab(3L))))
    val (merged, _) = Dedup.connectedComponentsStar(
      Seq(100L).toDF("doc_id"), contractedEdges)
    assert(labelsOf(merged)(100L) == 0L)
    val (fullRecompute, _) = Dedup.connectedComponentsStar(
      (Seq(100L) ++ Seq(0L, 1L, 2L, 3L)).toDF("doc_id"),
      pairsDf(Seq((0L, 1L), (2L, 3L), (100L, 1L), (100L, 3L))))
    assert(labelsOf(fullRecompute)(100L) == 0L)
  }

  test("star handles an empty pair table: every vertex is its own cluster, zero rounds") {
    val (lab, rounds) = Dedup.connectedComponentsStar(
      vertsDf(5), pairsDf(Seq.empty))
    assert(rounds == 0)
    assert(labelsOf(lab) == (0L until 5L).map(i => i -> i).toMap)
  }
}
