package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-12 continuation ops. Values are pinned by the
  * DuckDB oracles; these specs pin the CROSS-OP laws — the candidate-set
  * identity between the two kNN link predictors, the per-query audit's
  * reconciliation with its aggregate, and the closed-form invariants of
  * the burstiness / decile / aspect-bucket folds. */
class Round12bOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("adamic-adar ranks the SAME candidate set link_pred_knn ranks") {
    // both consume the identical wedge generator over the mutual-kNN
    // graph; only the scorer differs — so (vec_a, vec_b, common, deg_a,
    // deg_b) must agree row-for-row once re-keyed, and the AA score must
    // sit inside the bounds the weight table forces: every common
    // neighbor contributes w(KnnGraphK) ≤ w_z ≤ w(2)
    val jac = Similarity.e9LinkPredKnn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val aa = Similarity.e9AdamicAdar(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(aa.nonEmpty)
    val ws = Similarity.AdamicAdarMicro.toMap
    val (wMin, wMax) = (ws.values.min, ws.values.max)
    aa.foreach { case (a, b, common, aaMicro, degA, degB) =>
      assert(common * wMin <= aaMicro && aaMicro <= common * wMax,
        s"aa_micro outside the weight-table envelope at ($a,$b)")
      // the fixture's 50-deep lists may differ in tail membership (the
      // scorers order differently), but any pair on BOTH lists must
      // carry identical generator columns
      jac.get((a, b)).foreach { case (c2, da2, db2) =>
        assert((common, degA, degB) == (c2, da2, db2),
          s"wedge generator drifted between scorers at ($a,$b)")
      }
    }
    // AA ordering is by the micro score itself
    assert(aa.map(_._4).sliding(2).forall(p => p.head >= p.last))
  }

  test("recall_per_query drill-down reconciles with the aggregate audit") {
    val per = Similarity.e2RecallPerQuery(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    val labels = graft.Tables.embeddings(spark, d)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val agg = Similarity.e2AnnRecallSampled(spark, d).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // per-label (n, hits) of the drill-down == the aggregate audit
    val grouped = per.groupBy(p => labels(p._1))
    assert(grouped.keySet == agg.keySet)
    grouped.foreach { case (lab, rows) =>
      assert((rows.size.toLong, rows.map(_._4).sum) == agg(lab),
        s"per-query rows disagree with the aggregate at label $lab")
    }
    per.foreach { case (q, exactNb, ivfNb, hit, gap) =>
      assert(hit == (if (ivfNb.contains(exactNb)) 1L else 0L))
      // a hit means the same 4-dp sim on both sides — exact zero gap
      if (hit == 1L) assert(gap.contains(0L), s"hit with nonzero gap at $q")
      if (ivfNb.isEmpty) assert(gap.isEmpty, s"gap without an answer at $q")
    }
  }

  test("burstiness: exact integer quadratic form over the daily counts") {
    import org.apache.spark.sql.functions._
    val rows = Analysis.e8Burstiness(spark, d).collect()
    val daily = graft.Tables.events(spark, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.map(_.getString(0)).toSet == daily.keySet)
    rows.foreach { r =>
      val cs = daily(r.getString(0))
      val (n, tot, ss) = (cs.size.toLong, cs.sum, cs.map(c => c * c).sum)
      assert(r.getLong(1) == n && r.getLong(2) == tot)
      assert(r.getLong(3) == cs.max && r.getLong(4) == cs.min)
      val fano = (n * ss - tot * tot).toDouble / (n * tot).toDouble
      assert(math.abs(r.getDouble(6) -
        math.floor(fano * 10000 + 0.5) / 10000) < 1e-12)
    }
  }

  test("percent_rank deciles: complete, ordered, and closed at both ends") {
    val rows = Relational.q59PercentRank(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
    val totals = graft.Tables.orders(spark, d)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (pri, bs) =>
      assert(bs.map(_._3).sum == totals(pri), s"orders lost at $pri")
      val sorted = bs.sortBy(_._2)
      assert(sorted.head._2 == 0L && sorted.head._4 == 0.0,
        s"first decile must open at percent_rank 0 ($pri)")
      assert(sorted.last._5 == 1.0, s"last decile must close at cume_dist 1 ($pri)")
      assert(sorted.forall(b => b._2 >= 0 && b._2 <= 9))
      // price ranges are disjoint and ascending across buckets (ties
      // stay in one bucket, so max(prev) ≤ min(next))
      sorted.sliding(2).foreach {
        case Array(lo, hi) => assert(lo._7 <= hi._6, s"overlap at $pri")
        case _ => ()
      }
    }
  }

  test("rvq: the zero codeword makes stage 2 dominate stage 1 everywhere") {
    val rows = Similarity.e2Rvq(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(6)))
    assert(rows.map(_._2).sum ==
      graft.Tables.embeddings(spark, d).count(), "every vector coded once")
    assert(rows.map(_._1).forall(c => c >= 0 && c <= Similarity.RvqK2))
    rows.foreach { case (cw, _, coarse, rvq, gainBp) =>
      // per vector d2 ≤ d1 (codeword 0 IS the coarse-only residual), so
      // every per-codeword aggregate inherits the dominance
      assert(rvq <= coarse, s"residual stage lost ground at codeword $cw")
      assert(gainBp >= 0 && gainBp <= 10000)
      if (coarse > 0) assert(gainBp == (coarse - rvq) * 10000 / coarse)
    }
    // the sampled codewords are real residuals, so at least the sampled
    // vectors themselves quantize exactly — some strict gain must exist
    assert(rows.map(p => p._3 - p._4).sum > 0, "no gain anywhere")
  }

  test("moments: exact recompute of the integer-micro central moments") {
    val rows = Analysis.e8Moments(spark, d).collect()
    val mv = graft.Tables.events(spark, d)
      .selectExpr("event_type", "CAST(round(value * 10000) AS BIGINT) AS mi")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.map(_.getString(0)).toSet == mv.keySet)
    rows.foreach { r =>
      val ms = mv(r.getString(0))
      val n = ms.size.toLong
      val mu = ms.sum / n
      val ds = ms.map(_ - mu).map(BigInt(_))
      val (s2, s3, s4) =
        (ds.map(x => x * x).sum, ds.map(x => x * x * x).sum,
          ds.map(x => x * x * x * x).sum)
      assert(r.getLong(1) == n)
      def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
      val m2 = s2.toDouble / n
      assert(math.abs(r.getDouble(3) - r4(math.sqrt(m2) / 10000.0)) < 1e-12)
      assert(math.abs(r.getDouble(4) -
        r4((s3.toDouble / n) / (m2 * math.sqrt(m2)))) < 1e-12)
      assert(math.abs(r.getDouble(5) -
        r4((s4.toDouble / n) / (m2 * m2) - 3.0)) < 1e-12)
    }
  }

  test("stupid backoff: driver replica of the held-out scorer") {
    val rows = TextOps.e3StupidBackoff(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 20, "every source must have held-out docs")
    // recompute on the fixture driver-side
    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
    def mix64(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def sl(id: Long) = java.lang.Math.floorMod(
      mix64(id ^ TextOps.BackoffSalt) & Long.MaxValue, 100L)
    val train = docs.filter(p => sl(p._1) < 50)
    val uni = train.flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong)
    val n = uni.values.sum
    val big = train.flatMap(p => p._3.sliding(2).filter(_.length == 2)
      .map(a => (a(0), a(1)))).groupBy(identity).view.mapValues(_.length.toLong)
    val scored = docs.filter(p => sl(p._1) >= 50)
    val bySrc = scored.groupBy(_._2)
    rows.foreach { case (src, nDocs, nPos, nBk, bkBp, meanMicro) =>
      val ds = bySrc(src).filter(_._3.length >= 2)
      assert(nDocs == ds.length)
      val pos = ds.flatMap(p => p._3.sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))))
      assert(nPos == pos.length)
      val micros = pos.map { case (w1, w2) =>
        big.get((w1, w2)) match {
          case Some(cb) => math.floor(cb.toDouble / uni(w1) * 1e6 + 0.5).toLong
          case None => math.floor(
            0.4 * uni.getOrElse(w2, 0L) / n * 1e6 + 0.5).toLong
        }
      }
      assert(nBk == pos.count(p => !big.contains(p)))
      assert(bkBp == nBk * 10000 / nPos)
      assert(meanMicro == micros.sum / nPos)
    }
  }

  test("doremi step: exact MW update over the backoff table, renormalized") {
    val sc = TextOps.e3StupidBackoff(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(5))).toMap
    val up = Curation.e7DoremiStep(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(up.map(_._1).toSet == sc.keySet)
    up.foreach { case (src, nDocs, _, meanMicro, _, _, _) =>
      assert((nDocs, meanMicro) == sc(src), s"backoff table drifted at $src")
    }
    // a source scoring BELOW the corpus mean gets excess > 0 and factor
    // > 10000; above-mean gets factor < 10000 — and the mixture shifts
    // toward the hard sources while staying a distribution
    up.foreach { case (src, _, _, _, excess, factor, _) =>
      assert(factor == math.max(0L, 10000L + Curation.DoremiEtaBp * excess / 10000L),
        s"factor law at $src")
    }
    val tot = up.map(_._7).sum
    assert(tot >= 10000 - up.length && tot <= 10000,
      "renormalized weights must sum to 1 up to integer-div slack")
    assert(up.exists(_._5 > 0) && up.exists(_._5 < 0),
      "fixture must exercise both update directions")
  }

  test("effective diameter: distribution closes at 10000 bp and d90 is readable") {
    val rows = Analysis.e9EffectiveDiameter(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.head._1 == 0L)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.last._4 == 10000L, "cumulative share must close")
    // cum_pairs is the running sum of n_pairs
    assert(rows.scanLeft(0L)(_ + _._2).tail.toSeq == rows.map(_._3).toSeq)
    // seed rows: one dist-0 entry per seed
    assert(rows.head._2 == Analysis.BfsSeeds ||
      rows.head._2 <= Analysis.BfsSeeds) // fewer seeds if graph is smaller
  }

  test("saturation curve: decile mass conserves and novelty sums to distincts") {
    val rows = Dedup.e1SaturationCurve(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val docs = graft.Tables.documents(spark, d)
    assert(rows.map(_._2).sum == docs.count())
    assert(rows.map(_._3).sum ==
      docs.selectExpr("md5(lower(trim(text)))").distinct().count(),
      "every distinct fingerprint is new in exactly one decile")
    assert(rows.map(_._1).toSeq == (0L to 9L))
    // cumulative columns are running sums; the novelty RATE must not
    // grow once duplicates start arriving only in expectation — pin
    // only the exact arithmetic, not the fixture's shape
    assert(rows.scanLeft(0L)(_ + _._2).tail.toSeq == rows.map(_._5).toSeq)
    assert(rows.scanLeft(0L)(_ + _._3).tail.toSeq == rows.map(_._6).toSeq)
    rows.foreach { r =>
      assert(r._4 == r._3 * 10000 / r._2 && r._7 == r._6 * 10000 / r._5)
    }
  }

  test("closeness composes the effective-diameter BFS: mass reconciles") {
    val efd = Analysis.e9EffectiveDiameter(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cl = Analysis.e9Closeness(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Σ per-seed reach == pooled non-zero pair mass
    assert(cl.map(_._2).sum == efd.filterNot(_._1 == 0L).values.sum)
    cl.foreach { case (sd, nReach, harm) =>
      // harmonic mass is bounded by the all-at-distance-1 extreme and
      // the all-at-max-distance extreme
      assert(harm <= nReach * 1000000L &&
        harm >= nReach * (1000000L / Analysis.BfsRounds), s"bounds at $sd")
    }
  }

  test("mutual info agrees with a driver-side recompute and chi2's table") {
    val r = Analysis.e8MutualInfo(spark, d).collect().head
    val cells = graft.Tables.documents(spark, d)
      .groupBy("source", "lang").count().collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    val n = cells.values.sum.toDouble
    val rs = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cs = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val mi = cells.map { case ((s0, l), o) =>
      (o / n) * math.log(o * n / (rs(s0).toDouble * cs(l))) }.sum
    val hr = rs.values.map(v => -(v / n) * math.log(v / n)).sum
    val hc = cs.values.map(v => -(v / n) * math.log(v / n)).sum
    assert(r.getLong(0) == n.toLong && r.getLong(1) == rs.size &&
      r.getLong(2) == cs.size)
    assert(math.abs(r.getDouble(3) - r4(mi)) < 1e-9)
    assert(math.abs(r.getDouble(6) - r4(mi / math.min(hr, hc))) < 1e-9)
    // MI ≥ 0 and bounded by both entropies (Jensen)
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= math.min(hr, hc) + 1e-9)
  }

  test("rocchio: feedback sets come from the memo; audit columns cohere") {
    val m = Similarity.exactSampleTruth(spark, d).collect()
      .filter(r => r.getString(7) == "cos_g")
      .map(r => (r.getLong(0), r.getInt(6), r.getLong(2)))
    val top3 = m.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val rows = Similarity.e2Rocchio(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // every query with a full memo top-3 appears exactly once
    assert(rows.map(_._1).toSet == top3.filter(_._2.length >= 3).keySet)
    rows.foreach { case (q, orig, prf, moved, ov) =>
      assert(orig == top3(q).head, s"orig_top1 drifted from the memo at $q")
      assert(moved == (if (prf == orig) 0L else 1L))
      assert(ov >= 0 && ov <= 3)
      // the expanded query pulls TOWARD the pseudo-relevant centroid, so
      // the feedback set cannot vanish wholesale from the re-ranked list
      // across the whole sample
    }
    assert(rows.map(_._5).sum > rows.length,
      "feedback lists should overlap their seeds on average")
  }

  test("count-min: one-sided error, exact recompute of cells and estimates") {
    val rows = graft.streaming.StreamOps.e4vCmSketch(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == graft.streaming.StreamOps.CmTopK)
    // driver-side sketch replica
    import org.apache.spark.sql.graftext.minhashExpression.mix
    val w = graft.streaming.StreamOps.CmW
    val counts = graft.Tables.documents(spark, d)
      .selectExpr("explode(split(text, ' ')) AS t").collect()
      .map(_.getString(0)).groupBy(identity).view.mapValues(_.length.toLong)
    def h(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val cells = collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    counts.foreach { case (t, c) =>
      graft.ops.Dedup.BloomSeeds.foreach { sd =>
        cells((sd, java.lang.Math.floorMod(mix(h(t) ^ sd), w))) += c
      }
    }
    rows.foreach { case (t, tc, ec, over, bp) =>
      assert(tc == counts(t))
      val est = graft.ops.Dedup.BloomSeeds
        .map(sd => cells((sd, java.lang.Math.floorMod(mix(h(t) ^ sd), w)))).min
      assert(ec == est, s"estimate drifted at $t")
      assert(over == ec - tc && over >= 0, "CM error must be one-sided")
      assert(bp == over * 10000 / tc)
    }
  }

  test("aspect buckets: lossless integerization, 8-grid targets, area law") {
    val rows = Multimodal.e5AspectBuckets(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // the fixture's 16 width steps each land in their own quarter-unit
    // bucket, every doc exactly once
    assert(rows.map(_._1).toSeq == (4L to 19L))
    assert(rows.map(_._4).sum ==
      graft.Tables.documents(spark, d).count())
    rows.foreach { case (aq, tw, th, n, srcPx, tgtPx, shrinkBp) =>
      assert(tw % 8 == 0 && th % 8 == 0, s"off-grid target at aq=$aq")
      // th is the LARGEST 8-multiple whose square fits the reference
      // area at this aspect, and tw the largest 8-multiple under the
      // bucket aspect at that height — so area never exceeds 4096 but
      // may sit two grid steps under it (both dims floor independently)
      assert(tw * th <= 4096, s"area overflow at aq=$aq")
      assert((th + 8) * (th + 8) > 16384.0 / aq, s"th not maximal at aq=$aq")
      assert(tw <= aq * th / 4.0 && aq * th / 4.0 - tw < 9.0,
        s"tw not the floored aspect width at aq=$aq")
      assert(tgtPx == n * tw * th && srcPx >= tgtPx)
      assert(shrinkBp == (srcPx - tgtPx) * 10000 / srcPx)
    }
  }
}
