package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-9 operators beyond their oracles: the KMV
  * mergeability law, constructed-corpus behavior of the video near-dup
  * pass, and the embedding-drift monitor's sensitivity direction. */
class Round9OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("KMV mergeability law: union of sketches ranks the same k-smallest as the sketch of the union") {
    // The property e1_kmv_union leans on, pinned directly: for two hash
    // SETS A and B, the K smallest of (topK(A) ∪ topK(B)) equal the K
    // smallest of (A ∪ B). Deterministic synthetic hash sets, unsigned
    // 64-bit order like the operator.
    val K = 64
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def uns(x: Long): BigInt = BigInt(x) & BigInt("ffffffffffffffff", 16)
    val a = (1 to 500).map(i => mix(i.toLong)).toSet
    val b = (400 to 900).map(i => mix(i.toLong)).toSet // overlaps a
    def topK(s: Set[Long]) = s.toSeq.sortBy(uns).take(K)
    val mergedSketch = (topK(a) ++ topK(b)).distinct.sortBy(uns).take(K)
    val sketchOfUnion = topK(a ++ b)
    assert(mergedSketch == sketchOfUnion)
    // and the estimator on the merged sketch lands within ~3σ of |A ∪ B|
    val hk = uns(mergedSketch.last).toDouble
    val est = (K - 1).toDouble * math.pow(2, 64) / hk
    val exact = (a ++ b).size.toDouble
    assert(math.abs(est / exact - 1.0) < 3.0 / math.sqrt(K),
      s"est $est vs exact $exact")
  }

  test("video near-dup: full duplicates read jaccard 1.0, a single shared clip stays sub-threshold") {
    // fake-codec videos: 5 "frames" of 256 chars each (only even frames
    // sampled). Docs 1/2 identical; doc 3 shares exactly one sampled
    // frame (frame 0) with doc 1; doc 4 disjoint.
    def frame(c: Char) = c.toString * 256
    val v1 = frame('a') + frame('b') + frame('c') + frame('d') + frame('e')
    val v3 = frame('a') + frame('x') + frame('y') + frame('z') + frame('w')
    val v4 = frame('p') + frame('q') + frame('r') + frame('s') + frame('t')
    val dir = TestSpark.tmpDir("videond")
    Seq((1L, v1), (2L, v1), (3L, v3), (4L, v4))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.e5VideoNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 2L)), s"pairs: ${got.keySet}")
    assert(got((1L, 2L)) == 1.0)
    // sanity: docs 1 and 3 share 1 of 3 sampled frames -> jaccard 1/5 < 0.5
  }

  test("embedding drift: a shifted half moves ks_bp far above the null split") {
    // constructed corpus: labels 0 (null: both halves same distribution)
    // and 1 (cur half shifted along the probe direction) — the monitor
    // must read near-zero for 0 and large for 1.
    val dirW = Analysis.embDriftDir.map(_.toDouble)
    val n = 400
    val rows = (0 until n).map { i =>
      val vid = i.toLong
      val base = Array.tabulate(64)(j => (((i * 37 + j * 11) % 19) - 9) / 10.0f)
      val label = if (i % 2 == 0) 0L else 1L
      // "cur" half per the real split salt, shifted for label 1 only
      val isRef = {
        def mix(x: Long): Long = {
          var z = x + 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^ (z >>> 31)
        }
        ((mix(vid ^ Analysis.EmbDriftSalt) & Long.MaxValue) % 100) < 50
      }
      val v = if (label == 1L && !isRef)
        base.zipWithIndex.map { case (x, j) => x + 2.0f * dirW(j).toFloat }
      else base
      (vid, label, v)
    }
    val dir = TestSpark.tmpDir("embdrift")
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Analysis.e8EmbedDrift(spark, dir).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("ks_bp")).toMap
    assert(got(1) > 5000, s"shifted label ks_bp ${got(1)} should be large")
    assert(got(0) < got(1) / 2,
      s"null split ks_bp ${got(0)} should sit well below the shifted ${got(1)}")
  }
}
