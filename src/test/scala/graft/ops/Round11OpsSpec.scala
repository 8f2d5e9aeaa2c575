package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-11 operators: the kNN-graph link-prediction laws
  * (candidates are non-adjacent two-hop pairs with exact common/degree
  * arithmetic — the algorithmic content the fixed-K oracle LIMIT can't
  * fully express), a full driver replica of the bloom audit (split,
  * positions, fill, and false-positive count recomputed from scratch),
  * and the Heaps-fit sanity laws. Values are pinned by the DuckDB
  * oracles; these specs pin the laws. */
class Round11OpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("e9_link_pred_knn: non-adjacent two-hop pairs with exact arithmetic") {
    val mut = Similarity.knnEdges(spark, TestSpark.sf0001)._2.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the mutual edge set is symmetric and out-degree-capped at K
    assert(mut.forall { case (a, b) => mut.contains((b, a)) })
    val deg = mut.groupBy(_._1).view.mapValues(_.size).toMap
    assert(deg.values.forall(_ <= Similarity.KnnGraphK))
    val rows = Similarity.e9LinkPredKnn(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty, "kNN graph unexpectedly clique-like")
    // driver replica of the candidate table: common neighbors over mut
    val nbrs = mut.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val common = (for {
      (a, na) <- nbrs.toSeq; (b, nb) <- nbrs.toSeq
      if a < b && !mut.contains((a, b))
      c = (na intersect nb).size if c > 0
    } yield (a, b) -> c).toMap
    rows.foreach { case (a, b, c, da, db, j) =>
      assert(!mut.contains((a, b)), s"($a,$b) is an edge")
      assert(common(a -> b) == c, s"common mismatch at ($a,$b)")
      assert(deg(a) == da && deg(b) == db, s"degree mismatch at ($a,$b)")
      val expect = BigDecimal(c.toDouble / (da + db - c))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j == expect, s"jaccard mismatch at ($a,$b)")
    }
    // the emitted list is the TOP of the candidate table under the
    // declared total order (jaccard desc, common desc, a, b)
    val all = common.toSeq.map { case ((a, b), c) =>
      val j = BigDecimal(c.toDouble / (deg(a) + deg(b) - c))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, c.toLong, deg(a).toLong, deg(b).toLong, j)
    }.sortBy { case (a, b, c, _, _, j) => (-j, -c, a, b) }
      .take(Similarity.KnnLinkPredK)
    assert(rows.toSeq == all)
  }

  test("e1_bloom_audit: full driver replica of split, fill, and FP count") {
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def h(text: String): Long = {
      // Spark trim strips SPACES only and lower is locale-free
      val t = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        .toLowerCase(java.util.Locale.ROOT)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def slot(id: Long): Long =
      Math.floorMod(mix64(id ^ Dedup.BloomSplitSalt) & Long.MaxValue, 100L)
    val stored = docs.filter(d => slot(d._1) < 50).map(d => h(d._2)).toSet
    val probeOnly = docs.filter(d => slot(d._1) >= 50).map(d => h(d._2))
      .toSet -- stored
    def positions(hp: Long): Set[Long] =
      Dedup.BloomSeeds.map(sd =>
        Math.floorMod(mix64(hp ^ sd), Dedup.BloomBits)).toSet
    val bits = stored.flatMap(positions)
    val falsePos = probeOnly.count(p => positions(p).subsetOf(bits))
    val row = Dedup.e1BloomAudit(spark, TestSpark.sf0001).collect().head
    assert(row.getLong(0) == Dedup.BloomBits && row.getLong(1) == Dedup.BloomK)
    assert(row.getLong(2) == stored.size, "n_stored")
    assert(row.getLong(3) == bits.size, "bits_set")
    assert(row.getLong(4) == bits.size * 10000L / Dedup.BloomBits, "fill_bp")
    assert(row.getLong(6) == probeOnly.size, "n_probe")
    assert(row.getLong(7) == falsePos.toLong, "false_pos")
    assert(row.getLong(8) ==
      (if (probeOnly.isEmpty) 0L
       else falsePos.toLong * 10000L / probeOnly.size), "meas_fp_bp")
    // predicted rate replica in BigInt (the DECIMAL(38,0) path)
    val bs = BigInt(bits.size)
    assert(row.getLong(5) ==
      (bs * bs * bs * bs * 10000 / BigInt(Dedup.BloomBits).pow(4)).toLong,
      "pred_fp_bp")
  }

  test("e8_heaps: 3-gram fit matches a driver least-squares replica") {
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val perSource = docs.groupBy(_._1).map { case (src, ds) =>
      val grams = ds.flatMap { case (_, t) =>
        val toks = t.split(" ", -1)
        if (toks.length < 3) Seq.empty[String]
        else (0 to toks.length - 3).map(i =>
          s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
      }
      src -> ((grams.length.toLong, grams.distinct.length.toLong))
    }
    val row = Analysis.e8Heaps(spark, TestSpark.sf0001).collect().head
    assert(row.getLong(0) == perSource.size, "n_sources")
    // least-squares replica (float-tolerant: regr_* accumulate in a
    // different order than a driver fold — the 4-dp oracle is the
    // bitwise pin, this pins the VALUE to 1e-6)
    val pts = perSource.values.map { case (n, v) =>
      (math.log(n.toDouble), math.log(v.toDouble)) }.toSeq
    val n = pts.size
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(row.getDouble(1) - beta) < 1e-3, s"beta ${row.getDouble(1)} vs $beta")
    assert(row.getDouble(1) > 0.0 && row.getDouble(1) < 1.5, "beta range")
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0, "r2 range")
  }

  test("e8_chi2: driver contingency replica + statistic laws") {
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = docs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sources = docs.map(_._1).distinct
    val langs = docs.map(_._2).distinct
    val n = docs.length.toLong
    val rs = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cs = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    // full cross join incl. observed-zero cells, same algebraic term
    val chi2 = (for (s0 <- sources; l0 <- langs) yield {
      val o = cells.getOrElse((s0, l0), 0L).toDouble
      math.pow(o * n - rs(s0).toDouble * cs(l0), 2) /
        (n.toDouble * rs(s0) * cs(l0))
    }).sum
    val row = Analysis.e8Chi2(spark, TestSpark.sf0001).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == sources.length &&
      row.getLong(2) == langs.length)
    assert(row.getLong(3) == (sources.length - 1L) * (langs.length - 1L))
    assert(math.abs(row.getDouble(4) - chi2) < 1e-3,
      s"chi2 ${row.getDouble(4)} vs $chi2")
    val v = math.sqrt(chi2 / (n * math.min(sources.length, langs.length)
      .toDouble - n))
    // Cramér's V in [0,1] and consistent with the replica
    assert(row.getDouble(5) >= 0.0 && row.getDouble(5) <= 1.0)
    assert(math.abs(row.getDouble(5) -
      math.sqrt(chi2 / (n.toDouble *
        (math.min(sources.length, langs.length) - 1)))) < 1e-3)
  }

  test("e8_tail_index: driver Hill replica over the pinned order statistic") {
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1).length.toLong))
    val m = Analysis.TailM
    val expect = docs.groupBy(_._1).flatMap { case (src, ds) =>
      val sorted = ds.sortBy { case (_, id, tk) => (-tk, id) }
      if (sorted.length < m + 1) None
      else {
        val top = sorted.take(m).map(_._3)
        val xk = sorted(m)._3
        val den = top.map(t => math.log(t.toDouble)).sum -
          m * math.log(xk.toDouble)
        Some(src -> ((xk, if (den > 0) Some(m / den) else None)))
      }
    }
    val rows = Analysis.e8TailIndex(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(rows.keySet == expect.keySet, "source coverage")
    expect.foreach { case (src, (xk, alpha)) =>
      assert(rows(src)._1 == xk, s"x_k mismatch at $src")
      (alpha, rows(src)._2) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-3,
          s"alpha $b vs $a at $src")
        case (None, None) => ()
        case other => fail(s"null disagreement at $src: $other")
      }
    }
    // heavy-tail exponents are positive when defined
    assert(rows.values.flatMap(_._2).forall(_ > 0.0))
  }

  test("e9_rich_club: driver replica + monotone club-size law") {
    val pairs = Dedup.minhashPairTable(spark, TestSpark.sf0001)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = Analysis.e9RichClub(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Analysis.RichClubKs.map(_.toLong))
    rows.foreach { case (k, nn, ne, phi) =>
      val club = deg.filter(_._2 > k).keySet
      assert(nn == club.size.toLong, s"n_nodes at k=$k")
      val edges = pairs.count { case (a, b) =>
        club.contains(a) && club.contains(b) }
      assert(ne == edges.toLong, s"n_edges at k=$k")
      val want = if (nn >= 2) ne * 20000 / (nn * (nn - 1)) else 0L
      assert(phi == want, s"phi_bp at k=$k")
    }
    // club sizes shrink as the threshold rises (strict law of the def)
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted.reverse)
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted.reverse)
  }

  test("e2_hamming_ann: signature replica + exact-arg-min law") {
    val embs = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray))
    val sig = embs.map { case (id, v) =>
      id -> v.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
        if (x > 0f) acc + (1L << i) else acc }
    }.toMap
    val qids = embs.map(_._1)
      .sortBy(id => (mix64(id ^ Similarity.AnnQuerySalt), id))
      .take(Similarity.AnnQueryK).toSet
    val rows = Similarity.e2HammingAnn(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSet == qids, "query sample")
    rows.foreach { case (q, hamNb, ham, exactNb, hit) =>
      // hamming top-1 replica: min (popcount(xor), id) over the corpus
      val cands = embs.map(_._1).filter(_ != q)
        .map(o => (java.lang.Long.bitCount(sig(q) ^ sig(o)).toLong, o))
      val best = cands.min
      assert((ham, hamNb) == best, s"hamming pick at q=$q")
      // the hit flag is exactly agreement with the exact cosine top-1
      val qv = embs.find(_._1 == q).get._2.map(_.toDouble)
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val qn = math.sqrt(dot(qv, qv))
      val ex = embs.filter(_._1 != q).map { case (o, ov0) =>
        val ov = ov0.map(_.toDouble)
        (-(dot(qv, ov) / (qn * math.sqrt(dot(ov, ov)))), o)
      }.min._2
      assert(exactNb == ex, s"exact pick at q=$q")
      assert(hit == (if (hamNb == exactNb) 1L else 0L))
    }
  }

  test("e6_group_kfold: every source lands whole in one fold") {
    val sf0 = TestSpark.sf0001
    val docs = graft.Tables.documents(spark, sf0)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1).length.toLong))
    // replica of the group key: fold(source) from the source's min id
    val fold = docs.groupBy(_._1).view.mapValues { ds =>
      val gkey = ds.map(_._2).min
      ((mix64(gkey ^ Sampling.GroupKfoldSalt) & Long.MaxValue) % 100) %
        Sampling.Kfolds
    }.toMap
    val expect = docs.groupBy(d => fold(d._1)).map { case (f, ds) =>
      f -> ((ds.map(_._1).distinct.length.toLong, ds.length.toLong,
        ds.map(_._3).sum, ds.map(_._2).sum))
    }
    val rows = Sampling.e6GroupKfold(spark, sf0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(rows == expect)
    // partition law: folds are disjoint by construction (pure function
    // of source) and total (every doc counted exactly once)
    assert(rows.values.map(_._2).sum == docs.length.toLong)
  }

  test("e7_shard_plan: partition laws + signed skew identity") {
    val rows = Curation.e7ShardPlan(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val nDocs = graft.Tables.documents(spark, TestSpark.sf0001).count()
    assert(rows.map(_._2).sum == nDocs, "total docs")
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(r => r._1 >= 0 && r._1 < Curation.NShards))
    val tt = rows.map(_._3).sum
    rows.foreach { case (_, _, nt, _, skew) =>
      assert(skew == nt * Curation.NShards * 10000L / tt - 10000L)
    }
    // signed skew sums to ~0 (floor rounding leaves at most N short)
    val ssum = rows.map(_._5).sum
    assert(ssum <= 0 && ssum > -Curation.NShards * rows.length,
      s"skew sum $ssum")
  }

  test("e8_jsd: driver replica + information-theoretic bounds") {
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val st = docs.flatMap { case (src, ts) => ts.map(src -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = st.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val ns = st.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n = ct.values.sum
    val expect = ns.keys.map { src =>
      // .toSeq first: collecting (k, v) tuples straight off a Map
      // re-forms a Map and silently DEDUPES equal (term, q) pairs
      val terms = st.toSeq.collect { case ((s0, t), cs) if s0 == src =>
        val p = cs.toDouble / ns(src)
        val q = (ct(t) - cs).toDouble / (n - ns(src))
        val tq = if (q > 0) q * math.log(2.0 * q / (p + q)) else 0.0
        (p * math.log(2.0 * p / (p + q)) + tq, q)
      }
      val jsd = (terms.map(_._1).sum +
        math.log(2.0) * (1.0 - terms.map(_._2).sum)) / 2.0
      src -> jsd
    }.toMap
    val rows = Analysis.e8Jsd(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows.keySet == expect.keySet)
    rows.foreach { case (src, j) =>
      assert(math.abs(j - expect(src)) < 1e-3, s"jsd at $src")
      // JSD (nats) is bounded by [0, ln 2]
      assert(j >= 0.0 && j <= math.log(2.0) + 1e-9, s"bound at $src")
    }
  }

  test("e2_graph_search: monotone walk replica over the knn edges") {
    val sf0 = TestSpark.sf0001
    val knn = Similarity.knnEdges(spark, sf0)._1.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val embs = graft.Tables.embeddings(spark, sf0).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (embs(a), embs(b))
      val d = x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
      d / (math.sqrt(x.indices.foldLeft(0.0)((s0, i) => s0 + x(i) * x(i))) *
        math.sqrt(y.indices.foldLeft(0.0)((s0, i) => s0 + y(i) * y(i))))
    }
    val entry2 = embs.keys.toSeq.sortBy(id => (mix64(id), id)).take(2)
    val rows = Similarity.e2GraphSearch(spark, sf0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == math.min(Similarity.AnnQueryK, embs.size))
    rows.foreach { case (q, fin, sim, hops, exactNb, hit) =>
      // replica walk: argmax over {cur} ∪ N(cur) \ {q}, ties to smaller id
      var cur = if (entry2.head == q) entry2(1) else entry2.head
      var h = 0L
      for (_ <- 1 to Similarity.GraphSearchSteps) {
        val cands = (knn.getOrElse(cur, Set.empty) + cur) - q
        val next = cands.minBy(c => (-cos(q, c), c))
        if (next != cur) { h += 1; cur = next }
      }
      assert(fin == cur, s"final node at q=$q")
      assert(hops == h, s"hops at q=$q")
      val es = BigDecimal(cos(q, cur))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(sim == es, s"sim at q=$q")
      val ex = embs.keys.filter(_ != q).minBy(c => (-cos(q, c), c))
      assert(exactNb == ex && hit == (if (fin == ex) 1L else 0L))
    }
    // the walk is monotone: hops never exceeds the step budget
    assert(rows.forall(_._4 <= Similarity.GraphSearchSteps))
  }

  test("e5_storage_plan: packing laws (total, overflow-by-one, spans)") {
    val sf0 = TestSpark.sf0001
    val docs = graft.Tables.documents(spark, sf0)
      .selectExpr("doc_id", "source", "CAST(length(text) AS LONG) AS nb")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = Multimodal.e5StoragePlan(spark, sf0).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // total: every blob lands in exactly one archive
    assert(rows.map(_._3).sum == docs.length.toLong)
    assert(rows.map(_._4).sum == docs.map(_._3).sum)
    // replica: same shard hash, same start-offset rule
    val expect = docs.groupBy { case (id, src, _) =>
      (src, ((mix64(id ^ Multimodal.ArchShardSalt) & Long.MaxValue) %
        Multimodal.ArchShards)) }
      .toSeq.flatMap { case ((src, shard), ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (id, _, nb) =>
          val aid = shard * Multimodal.ArchIdStride +
            cum / Multimodal.ArchiveBytes
          cum += nb
          (src, aid, id, nb)
        }
      }.groupBy(t => (t._1, t._2)).map { case ((src, aid), bs) =>
        (src, aid) -> ((bs.size.toLong, bs.map(_._4).sum,
          bs.map(_._3).min, bs.map(_._3).max))
      }
    val got = rows.map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got == expect)
    // overflow-by-one: an archive exceeds the budget only via its last
    // blob (start-offset rule) — bytes minus any single blob's tail
    // cannot exceed the budget unless the archive is that one blob
    rows.filter(_._4 > Multimodal.ArchiveBytes).foreach { r =>
      val blobs = expect((r._1, r._2))
      assert(blobs._1 == 1L ||
        r._4 - docs.filter(d => d._1 == blobs._4).head._3 <
          Multimodal.ArchiveBytes, s"over-packed archive ${r._2}")
    }
  }

  test("q56_attribution: channel funnel replica over q53 sessions") {
    val se = Relational.sessionized(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val bySess = se.groupBy(r => (r._1, r._5))
    val expect = bySess.toSeq.map { case (_, evs) =>
      val first = evs.minBy(e => (e._4, e._2))._3
      val purchases = evs.count(_._3 == "purchase").toLong
      (first, purchases)
    }.groupBy(_._1).map { case (ch, ss) =>
      ch -> ((ss.size.toLong, ss.count(_._2 > 0).toLong, ss.map(_._2).sum))
    }
    val rows = Relational.q56Attribution(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet == expect.keySet)
    expect.foreach { case (ch, (ns, nc, np)) =>
      val (gns, gnc, gnp, bp) = rows(ch)
      assert((gns, gnc, gnp) == ((ns, nc, np)), s"funnel at $ch")
      assert(bp == nc * 10000 / ns, s"conv_bp at $ch")
    }
  }

  test("q57_window_funnel: strict-order funnel replica") {
    val ev = graft.Tables.events(spark, TestSpark.sf0001)
      .selectExpr("user_id", "event_type", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val w = Relational.FunnelWindowUs
    val expect = ev.groupBy(_._1).flatMap { case (_, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val clicks = es.filter(_._2 == "click").map(_._3).sorted
        val purch = es.filter(_._2 == "purchase").map(_._3).sorted
        val lvl = views.map { v =>
          clicks.find(_ > v) match {
            case Some(c) =>
              purch.find(_ > c) match {
                case Some(p) if p - v <= w => 3L
                case _ => if (c - v <= w) 2L else 1L
              }
            case None => 1L
          }
        }.max
        Some(lvl)
      }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = Relational.q57WindowFunnel(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == expect)
    // total users with >= 1 view are fully partitioned across levels
    assert(rows.values.sum ==
      ev.filter(_._2 == "view").map(_._1).distinct.length.toLong)
  }

  test("e9_ppr: restart-mass conservation + seed locality laws") {
    val rows = Analysis.e9Ppr(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.count(_._3) == Analysis.PprSeeds, "seed count")
    // replica seed selection over the pair-graph vertex set
    val pairs = Dedup.minhashPairTable(spark, TestSpark.sf0001)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val verts = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    val seeds = verts.sortBy(id => (mix64(id ^ Analysis.PprSalt), id))
      .take(Analysis.PprSeeds).toSet
    assert(rows.filter(_._3).map(_._1).toSet == seeds, "seed identity")
    // full replica of the damped push loop
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.length.toDouble).toMap
    val sv = verts.map(v =>
      v -> (if (seeds(v)) 1.0 / Analysis.PprSeeds else 0.0)).toMap
    var r = sv
    for (_ <- 1 to Analysis.PrIters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      verts.foreach { v =>
        adj(v).foreach { u => contrib(v) += r(u) / deg(u) }
      }
      r = verts.map(v =>
        v -> (Analysis.PrBase * sv(v) +
          Analysis.PrDamping * contrib(v))).toMap
    }
    rows.foreach { case (id, score, _) =>
      assert(math.abs(score - r(id)) < 1e-4, s"pprank at $id")
    }
    // locality: total mass stays <= 1 (mass only leaks at dangling ends)
    val total = rows.map(_._2).sum
    assert(total > 0.0 && total <= 1.0 + 1e-6, s"mass $total")
    // seeds hold more mass than the average non-seed (restart pull)
    val seedAvg = rows.filter(_._3).map(_._2).sum / Analysis.PprSeeds
    val rest = rows.filterNot(_._3)
    assert(seedAvg > rest.map(_._2).sum / math.max(1, rest.length))
  }

  test("e2_silhouette: bounds + agreement with the vq assignment") {
    val rows = Similarity.e2Silhouette(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // silhouette means live in [-1, 1]
    assert(rows.forall(r => r._3 >= -1.0 && r._3 <= 1.0))
    // cluster populations match the vq assignment exactly (same argmax)
    val vq = Similarity.e2VqAssign(spark, TestSpark.sf0001).collect()
      .map(r => r.getInt(2).toLong)
    val pops = vq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => r._1 -> r._2).toMap ==
      pops.map { case (k, v) => k -> v })
    assert(rows.map(_._2).sum == vq.length.toLong)
  }

  test("e2_top_pc: driver power-iteration replica + unit-norm law") {
    val embs = graft.Tables.embeddings(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .sortBy(_._1).map(_._2)
    var v = Array.fill(64)(0.125)
    var lam = 0.0
    for (_ <- 1 to Similarity.TopPcIters) {
      val sums = Array.fill(64)(BigInt(0))
      embs.foreach { x =>
        val sv = x.indices.foldLeft(0.0)((a, j) => a + x(j) * v(j))
        x.indices.foreach { j =>
          sums(j) += BigInt(math.floor(sv * x(j) * 1000000.0 + 0.5).toLong)
        }
      }
      val ssq = sums.map(s0 => s0 * s0).sum
      val nrm = math.sqrt(ssq.toDouble)
      v = sums.map(_.toDouble / nrm)
      lam = nrm / 1000000.0
    }
    val rows = Similarity.e2TopPc(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 64)
    rows.foreach { case (dim, pc, l) =>
      val exp = BigDecimal(v(dim.toInt - 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(pc - exp) < 2e-6, s"pc at dim $dim: $pc vs $exp")
      assert(math.abs(l - lam) < 1e-3, s"lambda $l vs $lam")
    }
    // the emitted direction is unit-norm on the 6-dp grid
    val n2 = rows.map(r => r._2 * r._2).sum
    assert(math.abs(n2 - 1.0) < 1e-4, s"norm^2 $n2")
    assert(rows.head._3 > 0.0, "lambda positive")
  }

  test("e2_abtt: residual top-1 replica + orthogonality law") {
    val embs = graft.Tables.embeddings(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    // direction from the audited query itself (6-dp is plenty for a
    // 1e-3 replica check; the oracle is the bitwise pin)
    val pc = Similarity.e2TopPc(spark, TestSpark.sf0001).collect()
      .sortBy(_.getLong(0)).map(_.getDouble(1))
    val rows = Similarity.e2Abtt(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def resid(x: Array[Double]) = {
      val pv = dot(x, pc)
      x.indices.map(i => x(i) - pv * pc(i)).toArray
    }
    // residuals are orthogonal to the direction (to replica precision)
    embs.values.take(10).foreach { x =>
      assert(math.abs(dot(resid(x), pc)) < 1e-3)
    }
    rows.foreach { case (q, rawNb, abttNb, agree) =>
      val qv = embs(q)
      val raw = embs.keys.filter(_ != q)
        .minBy(o => (-(dot(qv, embs(o)) /
          (math.sqrt(dot(qv, qv)) * math.sqrt(dot(embs(o), embs(o))))), o))
      assert(rawNb == raw, s"raw top-1 at q=$q")
      val qr = resid(qv)
      val res = embs.keys.filter(_ != q)
        .minBy { o =>
          val or = resid(embs(o))
          (-(dot(qr, or) /
            (math.sqrt(dot(qr, qr)) * math.sqrt(dot(or, or)))), o)
        }
      assert(abttNb == res, s"abtt top-1 at q=$q")
      assert(agree == (if (rawNb == abttNb) 1L else 0L))
    }
  }

  test("e8_dim_stats: driver replica of the micro-unit moments") {
    val embs = graft.Tables.embeddings(spark, TestSpark.sf0001).collect()
      .map(r => r.getSeq[Float](1).toArray.map(_.toDouble))
    val rows = Analysis.e8DimStats(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 64 && rows.forall(_._2 == embs.length.toLong))
    def halfUp(sum: Long, n: Long): Double =
      ((2 * sum + n * 20000100L) / (200 * n) - 100000L).toDouble / 10000.0
    rows.foreach { case (dim, n, mean, variance, mn, mx) =>
      val xs = embs.map(_(dim.toInt - 1))
      val mics = xs.map(x => math.floor(x * 1000000.0 + 0.5).toLong)
      val sqs = xs.map(x => math.floor(x * x * 1000000.0 + 0.5).toLong)
      assert(mean == halfUp(mics.sum, n), s"mean at dim $dim")
      val m2 = halfUp(sqs.sum, n)
      val v = BigDecimal(m2 - mean * mean)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(variance == v, s"variance at dim $dim")
      assert(mn == mics.min && mx == mics.max, s"range at dim $dim")
      // population variance is non-negative up to the quantization grid
      assert(variance >= -1e-4, s"negative variance at dim $dim")
    }
  }

  test("q58_running_distinct: first-touch identity replica") {
    val ev = graft.Tables.events(spark, TestSpark.sf0001)
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) AS dt")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val firstDay = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val daily = firstDay.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val days = daily.keys.toSeq.sorted
    val expect = days.zipWithIndex.map { case (day, i) =>
      (day, daily(day), days.take(i + 1).map(daily).sum)
    }
    val rows = Relational.q58RunningDistinct(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == expect)
    // the curve ends at the total distinct user count
    assert(rows.last._3 == firstDay.size.toLong)
  }

  test("e4n_window_topk: per-window rank laws") {
    val rows = graft.streaming.StreamOps.e4nWindowTopk(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (b, rs) =>
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to byRank.length), s"ranks at $b")
      assert(byRank.length <= 3)
      // counts are non-increasing down the ranks; ties broken by type
      byRank.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi._3 > lo._3 || (hi._3 == lo._3 && hi._2 < lo._2))
        case _ => ()
      }
    }
    // full replica against the unranked tumbling aggregate
    val agg = graft.Tables.events(spark, TestSpark.sf0001)
      .selectExpr("window(ts, '6 hours') AS w", "event_type")
      .groupBy("w", "event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .selectExpr("date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS b",
        "event_type", "n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expect = agg.groupBy(_._1).toSeq.flatMap { case (b, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case ((_, t, n), i) => (b, t, n, i + 1L) }
    }.toSet
    assert(rows.toSet == expect)
  }

  test("e2_lexical_agreement: pair coverage + cosine replica") {
    val pairs = Dedup.e1MinhashPairs(spark, TestSpark.sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val embs = graft.Tables.embeddings(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    val rows = Similarity.e2LexicalAgreement(spark, TestSpark.sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))).toMap
    // every verified pair with both vectors present appears exactly once
    val covered = pairs.keySet.filter { case (a, b) =>
      embs.contains(a) && embs.contains(b) }
    assert(rows.keySet == covered)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    rows.foreach { case ((a, b), (j, cos, low)) =>
      assert(j == pairs((a, b)), s"jaccard at ($a,$b)")
      val exp = BigDecimal(dot(embs(a), embs(b)) /
        (math.sqrt(dot(embs(a), embs(a))) * math.sqrt(dot(embs(b), embs(b)))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(cos - exp) < 1e-9, s"cosine at ($a,$b)")
      assert(low == (cos < Similarity.LexAgreeTau), s"flag at ($a,$b)")
    }
  }

  test("e1_hybrid_dedup: composition laws vs the two detectors") {
    val sf0 = TestSpark.sf0001
    val lexDrop = Dedup.minhashPairTable(spark, sf0)
      .select("db").collect().map(_.getLong(0)).toSet
    val semDrop = Similarity.e2Semdedup(spark, sf0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val docs = graft.Tables.documents(spark, sf0)
      .selectExpr("doc_id", "source",
        "CAST(size(split(text, ' ')) AS LONG) AS nt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = Dedup.e1HybridDedup(spark, sf0).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))).toMap
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val (n, dl, dm, db0, du, tt, kt, bp) = rows(src)
      assert(n == ds.length.toLong)
      assert(dl == ds.count(d => lexDrop(d._1)).toLong, s"lex at $src")
      assert(dm == ds.count(d => semDrop(d._1)).toLong, s"sem at $src")
      assert(db0 == ds.count(d => lexDrop(d._1) && semDrop(d._1)).toLong)
      assert(du == ds.count(d => lexDrop(d._1) || semDrop(d._1)).toLong)
      // inclusion-exclusion ties the four counts together
      assert(du == dl + dm - db0, s"inclusion-exclusion at $src")
      assert(tt == ds.map(_._3).sum)
      assert(kt == ds.filter(d => !lexDrop(d._1) && !semDrop(d._1))
        .map(_._3).sum)
      assert(bp == kt * 10000 / tt)
    }
  }

  test("e3_stopwords: df/mass replica + threshold law") {
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("text").collect().map(_.getString(0).split(" ", -1))
    val nDocs = docs.length.toLong
    val df = docs.flatMap(_.distinct).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val tf = docs.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val nTok = tf.values.sum
    val rows = TextOps.e3Stopwords(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val expectSet = df.filter { case (_, c) =>
      c * 10000 / nDocs > TextOps.StopwordDfBp }.keySet
    assert(rows.map(_._1).toSet == expectSet, "induced list")
    rows.foreach { case (t, d0, dbp, tc, mbp) =>
      assert(d0 == df(t) && tc == tf(t), s"counts at $t")
      assert(dbp == df(t) * 10000 / nDocs && mbp == tf(t) * 10000 / nTok)
    }
  }

  test("e6_ab_srm: balanced fixture passes; statistic replica") {
    val ids = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id").collect().map(_.getLong(0))
    val na = ids.count(id =>
      ((mix64(id ^ Sampling.AbSalt) & Long.MaxValue) % 100) < 50).toLong
    val nb = ids.length - na
    val row = Sampling.e6AbSrm(spark, TestSpark.sf0001).collect().head
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    assert(row.getLong(2) == na - nb)
    val chi2 = BigDecimal(math.pow((na - nb).toDouble, 2) / ids.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(3) == chi2)
    assert(row.getBoolean(4) == (chi2 > Sampling.SrmCrit4))
    // a healthy 50/50 hash on the fixture must NOT trigger SRM
    assert(!row.getBoolean(4), s"SRM triggered on a clean split: $chi2")
  }

  test("e1_winnowing: fingerprint replica + the winnowing guarantee") {
    val sf0 = TestSpark.sf0001
    val docs = graft.Tables.documents(spark, sf0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // driver replica of the native FNV 3-gram hashes
    def fnv(g: String): Long = {
      var h = 0xcbf29ce484222325L
      g.getBytes("UTF-8").foreach { b =>
        h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val fps = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val hs = (0 to toks.length - 3)
        .map(i => fnv(s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}"))
      val w = Dedup.WinnowW
      val sel = (0 to hs.length - w).map(i => hs.slice(i, i + w).min).toSet
      id -> sel
    }.toMap
    val df = fps.values.toSeq.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    val kept = fps.map { case (id, s0) =>
      id -> s0.filter(df(_) <= Dedup.WinnowDfCap) }
    val expect = (for {
      (a, sa) <- kept.toSeq; (b, sb) <- kept.toSeq if a < b
      i = (sa intersect sb).size if i > 0
      j = i.toDouble / (sa.size + sb.size - i) if j >= Dedup.WinnowTau
    } yield (a, b) -> ((i.toLong, BigDecimal(j)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
    val rows = Dedup.e1Winnowing(spark, sf0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rows == expect)
    // coverage law of the winnowing guarantee: every document long
    // enough for one complete window has >= 1 fingerprint, and the
    // selection is ~1/w the full hash set (never larger)
    docs.foreach { case (id, text) =>
      val nTok = text.split(" ", -1).length
      if (nTok >= Dedup.WinnowW + 2) {
        assert(fps(id).nonEmpty, s"no fingerprints for doc $id")
        assert(fps(id).size <= nTok - 2, s"over-selected at doc $id")
      }
    }
  }

  test("q55_gaps_islands: driver islands replica on the date grid") {
    val ev = graft.Tables.events(spark, TestSpark.sf0001)
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) AS dt")
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val expect = ev.distinct.groupBy(_._1).map { case (u, ds) =>
      val days = ds.map(_._2).distinct.sortBy(_.toEpochDay)
      // islands: split where consecutive days differ by more than 1
      val runs = days.foldLeft(List.empty[List[java.time.LocalDate]]) {
        case (acc, d0) => acc match {
          case (h :: t) :: rest if d0.toEpochDay == h.toEpochDay + 1 =>
            (d0 :: h :: t) :: rest
          case _ => List(d0) :: acc
        }
      }
      u -> ((days.length.toLong, runs.length.toLong,
        runs.map(_.length).max.toLong,
        days.head.toString, days.last.toString))
    }
    val rows = Relational.q55GapsIslands(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(rows == expect)
  }
}
