package graft.operators

import graft.SparkSpec

/** The jaccard count-lookup join must be correct on BOTH physical
  * paths: broadcast-hash (AQE's runtime pick at bench scale, where the
  * per-doc count table is tiny) and shuffle join (the 100 TB shape,
  * where one-row-per-doc is corpus-sized and must not be forced onto
  * every executor). jaccardFrom carries no broadcast() hint — the size
  * check is AQE's runtime measurement — so forcing the thresholds to
  * -1 exercises exactly the fallback path a large cluster would take.
  */
class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val broadcastConfs = Seq(
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold")

  private def rows(name: String): (Seq[String], String) = {
    val df = graft.Registry.byName(name).fn(spark, sf)
    val collected = df.collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    (collected, df.queryExecution.executedPlan.toString)
  }

  test("d03 count lookups: shuffle-join fallback matches the broadcast path") {
    val prev = broadcastConfs.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      val (viaAqe, _) = rows("d03_ngram_jaccard")
      spark.sharedState.cacheManager.clearCache()
      broadcastConfs.foreach(spark.conf.set(_, "-1"))
      val (viaShuffle, forcedPlan) = rows("d03_ngram_jaccard")
      // the forced run must genuinely take the non-broadcast path …
      assert(!forcedPlan.contains("BroadcastHashJoin"),
        s"thresholds -1 still planned a broadcast join:\n${forcedPlan.take(2000)}")
      assert(forcedPlan.contains("SortMergeJoin") || forcedPlan.contains("ShuffledHashJoin"))
      // … and produce bit-identical pairs
      assert(viaShuffle == viaAqe)
      assert(viaAqe.nonEmpty)
    } finally {
      spark.sharedState.cacheManager.clearCache()
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("at bench scale AQE lands the count lookups on broadcast-hash") {
    spark.sharedState.cacheManager.clearCache()
    val (_, plan) = rows("d03_ngram_jaccard")
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("BroadcastHashJoin"),
      s"expected AQE to convert the tiny count-lookup joins:\n${plan.take(2000)}")
    spark.sharedState.cacheManager.clearCache()
  }

  test("d10 entity resolution: clusters are closed, canonical-elected, and variant-complete") {
    val out = Dedup.d10.fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    val byEntity = out.groupBy(_._1)
    // every emitted cluster has >= 2 members (singletons never match)
    assert(byEntity.values.forall(_.length >= 2))
    // exactly one canonical per cluster, and it is the min rec_id
    byEntity.foreach { case (eid, ms) =>
      assert(ms.count(_._4) == 1)
      assert(ms.filter(_._4).head._2 == ms.map(_._2).min)
      assert(eid == ms.map(_._2).min)
    }
    // recall on the synthesized truth: every typo'd variant resolves
    // into the same entity as its base record
    val entityOf = out.map(m => m._2 -> m._1).toMap
    out.map(_._2).filter(_ >= 2000000L).foreach { vid =>
      val base = vid % 2000000L
      assert(entityOf.get(base).exists(_ == entityOf(vid)),
        s"variant $vid not clustered with base $base")
    }
  }

  test("d11 SemDeDup ≡ d05 restricted to within-cluster pairs; misses are cross-cluster only") {
    import org.apache.spark.sql.functions.col
    // d05 = the exact all-pairs ≥ 0.4 ground truth
    val exactPairs = Dedup.d05.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the same quantizer d11 trains (shared machinery), as a lookup
    val e = graft.Vec.withNorm(graft.Tables.embeddings(spark, sf)).cache()
    val cents = Similarity.trainCoarse(spark, sf, e)
    val cellOfVec = e.withColumn("cell", Similarity.cellOf(cents))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Dedup.d11.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    // full per-vector verdict table, assignment consistent
    assert(out.map(_._1).toSet == cellOfVec.keySet)
    out.foreach { case (v, c, _, _) => assert(c == cellOfVec(v)) }
    // flagged ⟺ some exact pair with a lower id lands in the SAME cell
    val expectDup = exactPairs.filter { case (lo, hi) => cellOfVec(lo) == cellOfVec(hi) }
    out.foreach { case (v, _, kept, nd) =>
      val lows = expectDup.filter(_._2 == v)
      assert(kept == lows.isEmpty && nd == lows.size, s"vec $v: kept=$kept nd=$nd")
    }
    // the approximation is real on this corpus: some exact pairs cross
    // clusters (otherwise the test proves nothing about the miss set)
    val missed = exactPairs -- expectDup
    assert(expectDup.nonEmpty, "no within-cluster duplicates — corpus degenerate")
    assert((expectDup.size + missed.size) == exactPairs.size)
  }

  test("d12 counts reconcile with d02/d03's own outputs and each other") {
    val dir = "/root/testdata/sf0.001"
    val r = Dedup.d12.fn(spark, dir).collect().head
    val Seq(nTrue, nCand, nCandTrue, nPred, nPredTrue) =
      (0 to 4).map(r.getLong)
    // the eval must count exactly the pairs the shipped operators
    // emit, restricted to the sampled anchor-incident population
    // (doc_id ≡ 0 mod 7 — the d12 sample rule)
    def anchored(da: Long, db: Long): Boolean = da % 7 == 0 || db % 7 == 0
    val d03True = Dedup.d03.fn(spark, dir).collect()
      .count(x => x.getDouble(2) >= 0.5 && anchored(x.getLong(0), x.getLong(1)))
      .toLong
    val d02Pred = Dedup.d02.fn(spark, dir).collect()
      .count(x => anchored(x.getLong(0), x.getLong(1))).toLong
    assert(nTrue == d03True && nPred == d02Pred)
    // lattice invariants
    assert(nCandTrue <= math.min(nCand, nTrue))
    assert(nPred <= nCand && nPredTrue <= math.min(nPred, nCandTrue))
    // ratios are the advertised divisions
    assert(r.getDouble(5) == (if (nTrue == 0) 0.0 else nCandTrue.toDouble / nTrue))
    assert(r.getDouble(6) == (if (nTrue == 0) 0.0 else nPredTrue.toDouble / nTrue))
    assert(r.getDouble(7) == (if (nPred == 0) 0.0 else nPredTrue.toDouble / nPred))
    assert(nTrue > 0, "ground truth empty — corpus degenerate for the eval")
  }

  test("d13 pairs character-level near-dups the LSH surfaces, with exact lev") {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-d13").toString
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    // one inserted character → lev 1; an unrelated doc → no pair
    val near = base.replace("tok30", "tok30x")
    val other = (0 until 60).map(i => s"zzz$i").mkString(" ")
    Seq((1L, base), (2L, near), (3L, other))
      .map { case (id, t) => (id, t, "en", "syn", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val out = Dedup.d13.fn(spark, dst).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 1L)), s"got ${out.toSeq}")
    val sim = out.head.getDouble(3)
    assert(sim == 1.0 - 1.0 / near.length, s"got $sim")
  }

  test("d04 band join input is DISTINCT-fp-sized on a corpus with a large exact-dup class") {
    import spark.implicits._
    // 80 copies of one document (the skew hazard: per-document banding
    // would put all 80 into the same four buckets → a 80²/2 candidate
    // join) + 40 distinct docs. The two-tier shape must band over
    // DISTINCT fingerprints only.
    val popular = (0 until 30).map(i => s"tok$i").mkString(" ")
    val docs = ((0 until 80).map(i => (i.toLong, popular)) ++
        (0 until 40).map(i => (1000L + i, (0 until 30).map(j => s"w${i}x$j").mkString(" "))))
      .map { case (id, t) => (id, t, "en", "syn", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (member, bands, out) = Dedup.simhashTiers(spark, docs)
    val fps = member.collect().map(r => r.getLong(0) -> r.getLong(1))
    val nDistinct = fps.map(_._2).distinct.length
    // the dup class collapses: far fewer fingerprints than documents …
    assert(nDistinct <= fps.length - 79, s"$nDistinct distinct fps for ${fps.length} docs")
    // … and the frame BOTH pigeonhole join legs read is 4 rows per
    // DISTINCT fp, never 4 rows per document
    assert(bands.count() == 4L * nDistinct)
    // output ≡ brute-force all-pairs hamming ≤ 3 (incl. the 80·79/2
    // hamming-0 pairs inside the dup class — they ARE the answer)
    val expect = (for {
      (da, fa) <- fps; (db, fb) <- fps if da < db
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (da, db, h.toLong)).toSet
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(expect.count(_._3 == 0L) >= 80 * 79 / 2)
  }

  test("d15 sweep: candidates nest as rows-per-band grows; recall falls, precision rises") {
    val rows = Dedup.d15.fn(spark, "/root/testdata/sf0.01")
      .orderBy("rows_per_band").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L, 4L, 8L))
    // one shared truth count across configs (same sampled population)
    assert(rows.map(_.getLong(2)).distinct.length == 1)
    // aligned band boundaries nest: an 8-row band agreeing implies its
    // halves agree, so candidate sets (and hits) shrink monotonically
    val nCand = rows.map(_.getLong(3)).toSeq
    assert(nCand == nCand.sorted.reverse, s"candidates not monotone: $nCand")
    val nHit = rows.map(_.getLong(4)).toSeq
    assert(nHit == nHit.sorted.reverse, s"hits not monotone: $nHit")
    // the S-curve trade: precision never falls as bands coarsen
    val prec = rows.map(_.getDouble(6)).toSeq
    assert(prec == prec.sorted, s"precision not monotone: $prec")
    // the (32,1) no-banding config surfaces every true pair here
    assert(rows.head.getDouble(5) == 1.0)
  }

  test("d16 pointer jumping: a 300-node chain converges in O(log d) rounds") {
    import spark.implicits._
    // path graph 0-1-2-...-300: diameter 300 — d06's diameter-round
    // loop (20-round cap) cannot converge on this; pointer jumping
    // must land it in ~log2(300) ≈ 9 rounds
    val n = 300
    val fwd = (0 until n).map(i => (i.toLong, (i + 1).toLong))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("a", "b").repartition(1)
    val loop = spark.newSession()
    loop.conf.set("spark.sql.shuffle.partitions", "1")
    val (labels, rounds) = Dedup.ccPointerJump(loop,
      loop.createDataFrame(edges.rdd, edges.schema), maxRounds = 12)
    assert(rounds <= 10, s"took $rounds rounds for diameter $n")
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == n + 1)
    assert(out.forall(_._2 == 0L), "every node must label to the chain min")
  }
  test("d17 rows are arithmetically consistent and reconcile with d08's jaccard") {
    val d17 = graft.Registry.byName("d17_containment").fn(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(d17.nonEmpty)
    d17.foreach { case ((da, db), (na, nb, i, c)) =>
      assert(da < db)
      assert(i <= math.min(na, nb))
      assert(10 * i >= 8 * math.min(na, nb))
      assert(c == i.toDouble / math.min(na, nb))
    }
    // d17 counts over the SAME capped shingle sets as d08: where a
    // pair also clears d08's J >= 0.1, d08's jaccard must be exactly
    // i/(na+nb-i) recomputed from d17's integers
    val d08 = graft.Registry.byName("d08_dfcap_jaccard").fn(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val overlap = d17.keySet.intersect(d08.keySet)
    assert(overlap.nonEmpty)
    overlap.foreach { k =>
      val (na, nb, i, _) = d17(k)
      assert(d08(k) == i.toDouble / (na + nb - i),
        s"d08/d17 shingle-count drift on $k")
    }
  }

  test("d19 profile reconciles with the corpus and d16's labels, singletons included") {
    val sf = "/root/testdata/sf0.001"
    val prof = graft.Registry.byName("d19_cluster_profile").fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(prof.nonEmpty)
    // per-row identity and the size-1 row carries the edge-free mass
    prof.foreach { case (sz, nc, nd, coll) =>
      assert(nd == sz * nc && coll == nd - nc)
    }
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(prof.map(_._3).sum == nDocs, "every document in exactly one cluster")
    // docs in clusters of size >= 2 are exactly d16's labeled docs
    val labeled = graft.Registry.byName("d16_cc_pointer_jumping")
      .fn(spark, sf).count()
    assert(prof.filter(_._1 >= 2).map(_._3).sum == labeled)
    assert(prof.exists(_._1 == 1), "singleton row must be present")
  }

  test("d20 dividend reconciles with d19's histogram and the corpus token mass") {
    val sf = "/root/testdata/sf0.001"
    val d20 = graft.Registry.byName("d20_dedup_dividend").fn(spark, sf).head()
    val (nc, nd, nr, dupTok, remTok, corpTok, div) =
      (d20.getLong(0), d20.getLong(1), d20.getLong(2), d20.getLong(3),
        d20.getLong(4), d20.getLong(5), d20.getDouble(6))
    // counts equal d19's dup-cluster rows (sizes >= 2)
    val d19 = graft.Registry.byName("d19_cluster_profile").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 >= 2)
    assert(nc == d19.map(_._2).sum && nd == d19.map(_._3).sum &&
      nr == d19.map(_._4).sum)
    // token identities: removable < held-by-dups <= corpus; at least
    // one survivor's tokens stay per cluster
    assert(0 < remTok && remTok < dupTok && dupTok <= corpTok)
    assert(div == remTok.toDouble / corpTok && div > 0.0 && div < 1.0)
  }

}
