package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KLL-style rank/quantile sketch state (Karnin, Lang & Liberty, "Optimal
  * quantile approximation in streams", FOCS 2016, in its equal-capacity
  * compactor form): `l0` is the unsorted weight-1 arrival buffer (fill
  * count `n0`); `levels(i)` holds retained samples of weight 2^(i+1),
  * kept SORTED so compaction is a linear merge. A full level sorts,
  * keeps every other item (the survivor PARITY alternates per level via
  * `flips` — KLL proper randomizes the coin; alternating it is the
  * DETERMINISTIC twin, trading the worst-case adversarial guarantee for
  * bit-reproducible state, the house exactness discipline; the error
  * CONTRACT is still enforced, by the q43-style err_ok gate and the
  * spec's rank-error pin), and promotes the half to level i+1. State is
  * ≤ K·(log₂(n/K)+2) doubles — 5 KB at a billion rows — and MERGEABLE:
  * level-wise merge + re-compaction, the property that makes it a
  * map-side partial aggregate in batch and a per-shard ingest state in
  * streaming. */
final case class KllState(
    l0: Array[Double], n0: Int,
    levels: Array[Array[Double]],
    flips: Array[Boolean], n: Long)

object KllSketch {
  /** Per-level compactor capacity. Worst-case rank error of the
    * equal-capacity deterministic variant is ~H/(2K) of n (H = number of
    * compacted levels): 3% at n = 10⁹; parity alternation cancels most
    * of it in practice (RankSketchSpec pins < 2pp on the fixtures). */
  val K = 256

  def empty: KllState =
    KllState(new Array[Double](K), 0, Array.empty, Array.empty, 0L)

  /** Items retained across all levels (the state-bound observable). */
  def items(st: KllState): Int = st.n0 + st.levels.map(_.length).sum

  def add(st: KllState, x: Double): KllState = {
    st.l0(st.n0) = x
    val st2 = st.copy(n0 = st.n0 + 1, n = st.n + 1)
    if (st2.n0 == K) compactL0(st2) else st2
  }

  private def compactL0(st: KllState): KllState = {
    val sorted = st.l0.clone().sorted
    promote(st.copy(l0 = new Array[Double](K), n0 = 0), sorted, 0)
  }

  /** Compact the FULL sorted buffer at level i: pair adjacent items, keep
    * one survivor per pair at doubled weight (alternating parity picks
    * which), promote the survivors into level i+1 (sorted merge), cascade
    * if that overflows. An ODD buffer leaves its last item UNPAIRED: it
    * keeps its own weight at its own level (standard KLL — round-14
    * advisor fix; the previous `(len−start+1)/2` survivor count let
    * retained weight drift ±1 unit per odd compaction, reachable through
    * merge(), so quantile() targeted ceil(q·n) against a cumulative
    * weight that no longer summed to n). Compaction is now exactly
    * weight-preserving — `KllSketch.weight(st) == st.n` always, pinned
    * in spec. */
  private def promote(st0: KllState, full: Array[Double], i: Int): KllState = {
    var st = st0
    while (st.flips.length <= i) st = st.copy(flips = st.flips :+ false)
    val start = if (st.flips(i)) 1 else 0
    val nPairs = full.length / 2
    val half = Array.tabulate(nPairs)(j => full(2 * j + start))
    val flips2 = st.flips.clone(); flips2(i) = !flips2(i)
    var levels2 = st.levels
    while (levels2.length <= i) levels2 = levels2 :+ Array.empty[Double]
    val merged = mergeSorted(levels2(i), half)
    levels2 = levels2.clone()
    val st1 =
      if (merged.length <= K) {
        levels2(i) = merged
        st.copy(levels = levels2, flips = flips2)
      } else {
        levels2(i) = Array.empty
        promote(st.copy(levels = levels2, flips = flips2), merged, i + 1)
      }
    if (full.length % 2 == 0) st1
    else stash(st1, full(full.length - 1), i)
  }

  /** Retain an unpaired item of weight 2^i at its own home: l0 for the
    * weight-1 level, levels(i−1) otherwise. Every call site has just
    * emptied that home (compactL0 empties l0; a cascade empties the level
    * below before promoting), so the insert cannot itself overflow —
    * defensively, an overflowing home re-compacts through promote. */
  private def stash(st: KllState, x: Double, i: Int): KllState =
    if (i == 0) {
      val st1 = if (st.n0 >= K) compactL0(st) else st // unreachable guard
      st1.l0(st1.n0) = x
      st1.copy(n0 = st1.n0 + 1)
    } else {
      val merged = mergeSorted(st.levels(i - 1), Array(x))
      if (merged.length <= K) {
        val levels2 = st.levels.clone(); levels2(i - 1) = merged
        st.copy(levels = levels2)
      } else {
        val levels2 = st.levels.clone(); levels2(i - 1) = Array.empty
        promote(st.copy(levels = levels2), merged, i) // unreachable; safe
      }
    }

  /** Total retained weight — equals `n` by the weight-preserving
    * compaction invariant (the observable the spec pins). */
  def weight(st: KllState): Long =
    st.n0.toLong + st.levels.zipWithIndex.map { case (lv, i) =>
      lv.length.toLong << (i + 1) }.sum

  private def mergeSorted(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      if (a(i) <= b(j)) { out(k) = a(i); i += 1 } else { out(k) = b(j); j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    out
  }

  /** Level-wise merge of two sketches (weights align level-for-level),
    * re-compacting any overflow — associative up to compaction order,
    * which the err_ok contract (not value equality) absorbs. */
  def merge(a0: KllState, b: KllState): KllState = {
    var a = a0
    var j = 0
    while (j < b.n0) { a = add(a, b.l0(j)); j += 1 }
    a = a.copy(n = a.n + (b.n - b.n0))
    var i = 0
    while (i < b.levels.length) {
      if (b.levels(i).nonEmpty) {
        var levels2 = a.levels
        while (levels2.length <= i) levels2 = levels2 :+ Array.empty[Double]
        val merged = mergeSorted(levels2(i), b.levels(i))
        levels2 = levels2.clone()
        if (merged.length <= K) {
          levels2(i) = merged
          a = a.copy(levels = levels2)
        } else {
          // survivors of a level-i overflow carry weight 2^(i+2): they
          // land one level up, exactly like the cascade in promote()
          levels2(i) = Array.empty
          a = promote(a.copy(levels = levels2), merged, i + 1)
        }
      }
      i += 1
    }
    a
  }

  /** Rank-sketch quantile estimate: the smallest retained value whose
    * cumulative weight reaches ceil(q·n). */
  def quantile(st: KllState, q: Double): Double = {
    val weighted =
      (st.l0.take(st.n0).map(x => (x, 1L)) ++
        st.levels.zipWithIndex.flatMap { case (lv, i) =>
          lv.map(x => (x, 1L << (i + 1))) }).sortBy(_._1)
    val target = math.max(1L, math.ceil(q * st.n).toLong)
    var cum = 0L
    var i = 0
    while (i < weighted.length) {
      cum += weighted(i)._2
      if (cum >= target) return weighted(i)._1
      i += 1
    }
    if (weighted.nonEmpty) weighted.last._1 else Double.NaN
  }
}

/** Typed KLL UDAF (the q43 family's sketch, implemented rather than
  * built-in): aggregates doubles into the bounded [[KllState]] and
  * finishes to the estimates at the requested quantiles. Mergeable →
  * full map-side partial aggregation: the shuffle carries one ≤5 KB
  * sketch per group regardless of group size — the same economics as
  * percentile_approx, with state this codebase owns end-to-end (the
  * streaming ingest in streaming.Stateful holds the identical state
  * per shard). */
final class KllAgg(qs: Seq[Double])
    extends Aggregator[Double, KllState, Array[Double]] {
  def zero: KllState = KllSketch.empty
  def reduce(st: KllState, x: Double): KllState = KllSketch.add(st, x)
  def merge(a: KllState, b: KllState): KllState = KllSketch.merge(a, b)
  def finish(st: KllState): Array[Double] =
    qs.map(q => KllSketch.quantile(st, q)).toArray
  def bufferEncoder: Encoder[KllState] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllState]()
  def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
