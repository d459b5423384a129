package graft.operators

import graft.SparkSpec

/** Determinism and sanity for the engine-internal (rows-only checked)
  * similarity operators.
  */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("s04 IVF ANN is deterministic across runs") {
    def run() = Similarity.s04.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val a = run()
    val b = run()
    assert(a == b)
    assert(a.nonEmpty)
    // every vector's reported neighbor lives in the same cell by construction;
    // cells partition the corpus into at most ivfK(N) cells
    val cells = a.map(_._2).distinct
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(cells.size > 1 && cells.size <= Similarity.ivfK(n))
  }

  test("ivfK derives the cell count from corpus size: floored, monotone, ~sqrt(N)") {
    // degenerate corpora stay on the floor
    assert(Similarity.ivfK(0) == 8)
    assert(Similarity.ivfK(255) == 8)
    // the bench corpora actually exercise the growth
    assert(Similarity.ivfK(500) == 11)
    assert(Similarity.ivfK(2000) == 22)
    // monotone non-decreasing, and ∝ √N: 100× the data → 10× the cells
    val ks = Seq(1L, 500L, 2000L, 200000L, 20000000L).map(Similarity.ivfK)
    assert(ks == ks.sorted)
    assert(Similarity.ivfK(200000) == 10 * Similarity.ivfK(2000) - 2 ||
      Similarity.ivfK(200000) == 223) // √(200000/4)=223.6 → 223
    // candidate-volume contract: expected cell size N/k grows only ~2√N
    assert(200000L / Similarity.ivfK(200000) < 1000)
  }

  test("s02 sign-LSH and s01 brute force agree on the top hit when bucketed together") {
    val brute = Similarity.s01.fn(spark, dir).collect()
    assert(brute.head.getLong(0) == 0L) // self-similarity = 1 comes first
    val lsh = Similarity.s02.fn(spark, dir).collect()
    assert(lsh.nonEmpty)
    // symmetric sanity: if a's NN is b with cosine c, then b's NN cosine >= c - epsilon is not guaranteed,
    // but every reported cosine must be within [-1, 1]
    lsh.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }

  test("s04 yields zero rows (not a crash) on an empty embeddings table") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-s04-empty").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.s04.fn(spark, dir)
    assert(out.columns.toSeq == Seq("va", "cell", "nn", "cos_sim"))
    assert(out.count() == 0)
  }

  test("s05 probe bucket-prunes, and its cosines match an independent recomputation") {
    val df = Similarity.s05.fn(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // buckets are hash(cell) mod max(8, k), so the exact counts are
    // data-shaped; the contract is a STRICT subset of buckets selected
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"probe should bucket-prune; got:\n${plan.take(1200)}")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
      "probe selected every bucket — no pruning")
    val rows = df.collect()
    assert(rows.length == 20)
    // cosines descend, and every returned value equals a from-scratch
    // recomputation over the RAW embeddings (same left-fold pairing) —
    // a stale or mis-probed index cannot return matching values
    val byId = graft.Vec.withNorm(
        graft.Tables.embeddings(spark, "/root/testdata/sf0.001")).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Double](2).toArray, r.getDouble(3)))).toMap
    val (qv, qnrm) = byId(0L)
    rows.foreach { r =>
      val (vv, nrm) = byId(r.getLong(0))
      var dp = 0.0
      var i = 0
      while (i < vv.length) { dp += vv(i) * qv(i); i += 1 }
      assert(r.getDouble(2) == dp / (nrm * qnrm), s"cos mismatch for ${r.getLong(0)}")
    }
    val cs = rows.map(_.getDouble(2)).toSeq
    assert(cs == cs.sorted.reverse)
  }

  test("s06 probes contain own cell, results superset s04's candidates, index side exchange-free at scale") {
    import org.apache.spark.sql.functions._
    val df = Similarity.s06.fn(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every vector reports ≤ 3 neighbors, descending cosine
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val cs = rs.map(_.getDouble(3)).toSeq
      assert(cs == cs.sorted.reverse)
    }
    // rank-1 probe is the vector's own cell, so s04's own-cell top-1 must
    // appear among s06's candidates: s06's best cosine per vector >= s04's
    val s04Best = Similarity.s04.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val s06Best = rows.groupBy(_.getLong(0))
      .map { case (va, rs) => va -> rs.map(_.getDouble(3)).max }
    s04Best.foreach { case (va, c04) =>
      assert(s06Best(va) >= c04, s"vec $va: s06 ${s06Best(va)} < s04 $c04")
    }
    // at-scale join shape: with broadcast disabled the candidate join is
    // a sort-merge join whose INDEX side reads the bucketed layout with
    // no Exchange (the shuffle-once payoff); only the probe side shuffles
    val co = spark.newSession()
    graft.functions.GraftFunctions.register(co)
    co.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    co.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    co.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val probes = graft.Vec.withNorm(graft.Tables.embeddings(co, dir))
      .select(col("vec_id").as("va"), pmod(col("vec_id"), lit(8)).as("pcell"))
    val ivfTable = graft.engine.CatalogMemo.tableName("graft_ivf_assign",
      graft.engine.CatalogMemo.contentKey(dir, co.sparkContext.hadoopConfiguration))
    val plan = probes.join(co.table(ivfTable),
        col("pcell") === col("cell") && col("vec_id") =!= col("va"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ; got:\n${plan.take(900)}")
    assert(plan.contains(ivfTable))
    // exactly ONE shuffle — the probe side; the bucketed index side
    // joins with no Exchange (the shuffle-once payoff)
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nShuffles == 1,
      s"expected exactly one shuffle (probe side only), got $nShuffles:\n${plan.take(1500)}")
  }

  test("s07 PQ: shuffle-free ADC scoring, deterministic, useful recall") {
    val df = Similarity.s07.fn(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // scoring is a narrow projection into the fused top-k: no shuffle
    assert(!plan.contains("Exchange hashpartitioning"),
      s"ADC scoring must not shuffle:\n${plan.take(900)}")
    assert(plan.contains("TakeOrderedAndProject"))
    val rows = df.collect()
    assert(rows.length == 20)
    val adc = rows.map(_.getDouble(1)).toSeq
    assert(adc == adc.sorted.reverse) // ordered by the approximate score
    // deterministic across runs (trained codebooks memoized + replayable)
    val again = Similarity.s07.fn(spark, dir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // recall sanity vs the exact brute-force top-20 (s01 includes the
    // query itself, so 19 is the ceiling): aggressive 8x3-bit codes
    // without re-rank measured 7/19 here — pin a conservative floor,
    // the point of the emitted exact cos_sim being the re-rank input
    val exact = Similarity.s01.fn(spark, dir).collect().map(_.getLong(0)).toSet
    val overlap = rows.map(_.getLong(0)).count(exact)
    assert(overlap >= 4, s"PQ recall collapsed: $overlap/19 of exact top-20")
  }

  test("s05 memo: unchanged dir reuses the index; a rewritten dir rebuilds it") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val work = Files.createTempDirectory("graft-s05-memo").toString
    val src = Paths.get(dir, "embeddings.parquet")
    val dst = Paths.get(work, "embeddings.parquet")
    Files.copy(src, dst, StandardCopyOption.COPY_ATTRIBUTES)
    // the index table's physical name is content-keyed, so resolve it
    // for the dir's CURRENT content
    def ivfName(): String = graft.engine.CatalogMemo.tableName("graft_ivf_assign",
      graft.engine.CatalogMemo.contentKey(work, spark.sparkContext.hadoopConfiguration))
    def indexFiles(tbl: String): Set[(String, Long)] = {
      val loc = new java.io.File(spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).getPath)
      Option(loc.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-"))
        .map(f => (f.getName, f.lastModified)).toSet
    }
    val first = Similarity.s05.fn(spark, work).collect().toSeq
    val name1 = ivfName()
    val builtOnce = indexFiles(name1)
    assert(builtOnce.nonEmpty)
    // unchanged dir → memo HIT: the on-disk index is untouched
    Similarity.s05.fn(spark, work).collect()
    assert(indexFiles(name1) == builtOnce, "memo hit must not rewrite the index")
    // rewrite the dataset at the SAME path (new mtime) → memo MISS: a
    // NEW content-keyed physical table is built (cross-process
    // isolation — the old identity's table is never clobbered), and
    // results over identical data are equal
    dst.toFile.setLastModified(dst.toFile.lastModified() + 60000)
    val again = Similarity.s05.fn(spark, work).collect().toSeq
    val name2 = ivfName()
    assert(name2 != name1, "content change must re-key the physical table")
    assert(indexFiles(name2).nonEmpty, "rewritten dir must rebuild the index")
    assert(indexFiles(name1) == builtOnce, "the old identity's table is untouched")
    assert(again.map(_.toSeq) == first.map(_.toSeq))
  }

  test("s08 MMR: relevance-anchored first pick, then genuine diversification") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val picks = Similarity.s08.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(picks.map(_._1).toSeq == (1L to 5L))
    assert(picks.map(_._2).distinct.length == 5)
    // the pure-relevance ranking over the same corpus
    val e = graft.Vec.withNorm(graft.Tables.embeddings(spark, dir))
    val q = e.where(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val byRel = e.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        (expr(graft.Vec.dot("v", "qv")) / (col("nrm") * col("qn"))).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(20).collect().map(_.getLong(0)).toSeq
    // pick 1 is the pure-relevance argmax; every pick is from the pool
    assert(picks.head._2 == byRel.head)
    assert(picks.forall(p => byRel.contains(p._2)))
    // diversity is real: MMR must diverge from plain top-5 (the corpus
    // has near-dup embeddings, so redundancy penalties bite)
    assert(picks.map(_._2).toSet != byRel.take(5).toSet)
    // pick 1's score is exactly the undiscounted λ·rel (empty selected
    // set → maxsim 0); later picks' penalties are bounded by |cos| ≤ 1
    assert(picks.head._4 == 0.5 * picks.head._3)
    assert(picks.forall(p => math.abs(p._4 - 0.5 * p._3) <= 0.5 + 1e-12))
  }

  test("s09 SQ8: ADC tracks the exact dot within the quantization bound") {
    val dir = "/root/testdata/sf0.001"
    val vecs = graft.Vec.withNorm(graft.Tables.embeddings(spark, dir))
      .select("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dims = vecs.head._2.length
    val mins = Array.tabulate(dims)(i => vecs.values.map(_(i)).min)
    val spans = Array.tabulate(dims)(i => vecs.values.map(_(i)).max - mins(i))
    val q = vecs(0L)
    // per-coordinate reconstruction error ≤ one cell width, so the
    // ADC dot deviates from the exact dot by ≤ Σ|q_i|·span_i/255
    val bound = (0 until dims).map(i => math.abs(q(i)) * spans(i) / 255).sum
    val out = Similarity.s09.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length == 20)
    out.foreach { case (id, adc) =>
      val exact = (0 until dims).map(i => q(i) * vecs(id)(i)).sum
      assert(math.abs(adc - exact) <= bound + 1e-9,
        s"vec $id: adc $adc vs exact $exact exceeds $bound")
    }
    // recall sanity: the exact best neighbor survives into the SQ8
    // top-20 (8× compression must not lose the head of the ranking)
    val best = vecs.collect { case (id, v) if id != 0L =>
      id -> (0 until dims).map(i => q(i) * v(i)).sum }.maxBy(_._2)._1
    assert(out.map(_._1).contains(best))
    // deterministic across runs (fresh aggregation, same extrema)
    spark.sharedState.cacheManager.clearCache()
    val again = Similarity.s09.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == again.toSeq)
  }

  test("s10 recall eval: one row per sampled query, recall = hits/3, honest about misses") {
    val sample = graft.Tables.embeddings(spark, dir)
      .where("vec_id % 37 = 0").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val out = Similarity.s10.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exactly the fixed sample is evaluated — queries with zero
    // approx hits still get their (honest) zero row
    assert(out.map(_._1).toSet == sample && sample.nonEmpty)
    out.foreach { case (va, h, rec) =>
      assert(h >= 0L && h <= 3L, s"query $va: $h hits")
      assert(rec == h / 3.0, s"query $va: recall must be hits/3")
    }
    // the index is useful at this SF: the probe finds at least one
    // true neighbor somewhere in the sample (mean recall > 0)
    assert(out.map(_._2).sum > 0L, "nprobe=2 of 8 cells found no true neighbor at all")
  }

  test("s11 inertia reconciles with an independent fixed-point replay") {
    val out = Similarity.s11.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    assert(out.nonEmpty)
    // membership covers the corpus exactly once
    val total = graft.Tables.embeddings(spark, dir).count()
    assert(out.map(_._2).sum == total)
    out.foreach { case (cell, n, inertia, mean, rms, minsep) =>
      assert(n > 0 && inertia >= 0 && minsep > 0, s"cell $cell")
      assert(mean == inertia.toDouble / n.toDouble, s"cell $cell mean")
      assert(rms == math.sqrt(mean) / 1e6, s"cell $cell rms")
    }
    // independent replay: recompute one cell's inertia from raw
    // vectors + the trained centroids in plain Scala integer math
    val cents = Similarity.trainCoarse(spark, dir,
      graft.Vec.withNorm(graft.Tables.embeddings(spark, dir)))
    val ints = cents.map { case (c, cd, _) => c -> cd.map(x => math.round(x * 1e6)) }.toMap
    val vecs = graft.Vec.withNorm(graft.Tables.embeddings(spark, dir))
      .withColumn("cell", Similarity.cellOf(cents))
      .select("cell", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cell0 = out.head._1
    val expect = vecs.collect { case (c, v) if c == cell0 =>
      v.zip(ints(cell0)).map { case (x, ci) =>
        val d = math.round(x * 1e6) - ci; d * d
      }.sum
    }.sum
    assert(out.head._3 == expect, s"cell $cell0 inertia diverged from replay")
  }

  test("s12 outliers carry the true assigned-centroid distance, descending cut") {
    val rows = Similarity.s12.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 20)
    // dist² is genuinely the MIN over centroids: recompute via the
    // shipped quantizer and compare against the emitted pair
    val e = graft.Vec.withNorm(graft.Tables.embeddings(spark, dir)).cache()
    val cents = Similarity.trainCoarse(spark, dir, e)
    val vecs = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    rows.take(5).foreach { case (id, cell, dist2) =>
      val v = vecs(id)
      val scored = cents.map { case (c, cd, cn2) =>
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += v(i) * cd(i); i += 1 }
        var vv = 0.0
        i = 0
        while (i < v.length) { vv += v(i) * v(i); i += 1 }
        (c, vv + (cn2 - 2.0 * dot))
      }
      val best = scored.minBy(s => (s._2, s._1))
      assert(best._1 == cell && best._2 == dist2, s"vec $id: $best vs ($cell,$dist2)")
    }
    // the 20 are the global maxima: no non-emitted vector may be farther
    val emitted = rows.map(_._1).toSet
    val minEmitted = rows.map(_._3).min
    val allDist = vecs.map { case (id, v) =>
      val ds = cents.map { case (c, cd, cn2) =>
        var dot = 0.0; var vv = 0.0; var i = 0
        while (i < v.length) { dot += v(i) * cd(i); vv += v(i) * v(i); i += 1 }
        vv + (cn2 - 2.0 * dot)
      }.min
      (id, ds)
    }
    allDist.filterNot(kv => emitted(kv._1)).foreach { case (id, d2) =>
      assert(d2 <= minEmitted, s"missed outlier $id with dist² $d2")
    }
  }

  test("s13 hard negatives never share the anchor's label and are per-anchor top-3") {
    val rows = Similarity.s13.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (va, albl, nn, nlbl, _) =>
      assert(albl != nlbl, s"anchor $va paired with same-label $nn")
      assert(va != nn)
    }
    // ≤ 3 negatives per anchor, cosines descending within the anchor
    rows.groupBy(_._1).foreach { case (va, g) =>
      assert(g.length <= 3, s"anchor $va has ${g.length} negatives")
      val cs = g.map(_._5).toSeq
      assert(cs == cs.sorted.reverse, s"anchor $va not sorted: $cs")
    }
  }

  test("s15 IVF-PQ: probed-cells-only candidates, shuffle-free ADC, residual codes beat raw-recall floor") {
    val df = Similarity.s15.fn(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // encode + score are narrow projections into the fused top-k
    assert(!plan.contains("Exchange hashpartitioning"),
      s"IVF-PQ scoring must not shuffle:\n${plan.take(900)}")
    assert(plan.contains("TakeOrderedAndProject"))
    val rows = df.collect()
    assert(rows.length == 10)
    // candidates come ONLY from the query's 2 probed cells
    assert(rows.map(_.getLong(1)).distinct.length <= 2,
      s"candidates span >2 coarse cells: ${rows.map(_.getLong(1)).toSeq}")
    val adc = rows.map(_.getDouble(2)).toSeq
    assert(adc == adc.sorted.reverse)
    // deterministic across runs (coarse + residual codebooks memoized)
    val again = Similarity.s15.fn(spark, dir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // the probe restricts recall's ceiling to the probed cells, so
    // grade the ADC RANKING against an independently recomputed
    // exact-cosine top-10 over the full probed-cell candidate pool —
    // residual codes are only worth shipping if they rank usefully
    import org.apache.spark.sql.functions._
    val e = graft.Vec.withNorm(graft.Tables.embeddings(spark, dir))
    val coarse = Similarity.trainCoarse(spark, dir, e)
    val q = e.filter(col("vec_id") === 0).select(col("v"), col("nrm"))
      .collect().head
    val qv = q.getSeq[Double](0).toArray
    def fold(cd: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < cd.length) { s += qv(i) * cd(i); i += 1 }; s
    }
    val probed = coarse
      .map { case (cell, cd, cn2) => (cn2 - 2.0 * fold(cd), cell) }
      .sorted.take(2).map(_._2)
    val exactTop = e.withColumn("cell", Similarity.cellOf(coarse))
      .filter(col("cell").isin(probed: _*) && col("vec_id") =!= 0)
      .select(col("vec_id"),
        (call_function("vec_dot", col("v"), lit(qv)) / col("nrm")).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val overlap = rows.map(_.getLong(0)).count(exactTop)
    assert(overlap >= 4, s"residual-PQ ranking collapsed: $overlap/10")
  }
  test("s16 re-rank recovers probed-pool exact truth that raw-ADC top-10 misses") {
    // ground truth: exact-cosine top-10 over the SAME probed candidate
    // pool both operators draw from (s10's protocol — the probe fixes
    // the ceiling, the ranking is what's graded)
    val cand = Similarity.ivfPqCandidates(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(cand.length > RERANK_MIN_POOL)
    val exactTop = cand.sortBy { case (id, _, cos) => (-cos, id) }
      .take(10).map(_._1).toSet
    val rawAdc = Similarity.s15.fn(spark, dir).collect().map(_.getLong(0)).toSet
    val rerank = Similarity.s16.fn(spark, dir).collect().map(_.getLong(0)).toSet
    val rRaw = (rawAdc & exactTop).size
    val rRe = (rerank & exactTop).size
    info(s"probed pool=${cand.length} rawADC recall=$rRaw/10 rerank recall=$rRe/10")
    // the 50-row shortlist out-reaches the 3-bit codes' ranking noise.
    // Measured: raw ADC 6/10, re-rank 10/10 — the re-rank recovers ALL
    // of the truth the approximate ranking missed (the probed-pool
    // ceiling, stronger than any fixed multiple could state). Pin a
    // strict improvement plus a near-ceiling floor.
    assert(rRe > rRaw, s"re-rank $rRe must beat raw $rRaw")
    assert(rRe >= 9, s"a 50-of-pool shortlist should recover nearly all of the exact top-10, got $rRe")
  }

  private val RERANK_MIN_POOL = 20

  test("s17 filtered ANN: bucket pruning AND label pushdown live in one scan, no shuffle") {
    val df = Similarity.s17.fn(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // (1) the probe still prunes buckets (the s05 contract survives
    // the added predicate)
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"filtered probe should bucket-prune; got:\n${plan.take(1200)}")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt)
    // (2) the metadata predicate reaches the parquet reader — filtered
    // search pays probed-share × selectivity, not a scan-then-filter.
    // (the textual plan truncates the FileScan line before
    // PushedFilters prints, so introspect the scan node's metadata)
    val pushed = df.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
        sc.metadata.getOrElse("PushedFilters", "")
    }
    assert(pushed.exists(_.contains("In(label")),
      s"label predicate should push into the index scan; pushed=$pushed")
    // (3) single-stage: no join, no shuffle — narrow cosine into the
    // fused global top-k
    assert(!plan.contains("Exchange hashpartitioning"),
      s"filtered search must not shuffle:\n${plan.take(900)}")
    assert(plan.contains("TakeOrderedAndProject"))
    // results honor the predicate and the ordering
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.forall(r => Seq(2L, 5L, 7L).contains(r.getLong(1))))
    val cs = rows.map(_.getDouble(3)).toSeq
    assert(cs == cs.sorted.reverse)
    // every returned neighbor is the true cosine vs the raw embeddings
    // (a mis-filtered or stale index cannot fake matching values)
    val byId = graft.Vec.withNorm(graft.Tables.embeddings(spark, dir))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](2).toArray, r.getDouble(3))).toMap
    val (qv, qn) = byId(0L)
    rows.foreach { r =>
      val (v, nm) = byId(r.getLong(0))
      var dp = 0.0
      var i = 0
      while (i < v.length) { dp += v(i) * qv(i); i += 1 }
      assert(r.getDouble(3) == dp / (nm * qn))
    }
  }

  test("s21 filtered IVF-PQ: bucket pruning AND label pushdown AND zero shuffles in ONE plan") {
    val df = Similarity.s21.fn(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // (1) the widened nprobe=4 probe still prunes buckets
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"filtered IVF-PQ should bucket-prune; got:\n${plan.take(1200)}")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt)
    // (2) the label predicate reaches the parquet reader
    val pushed = df.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
        sc.metadata.getOrElse("PushedFilters", "")
    }
    assert(pushed.exists(_.contains("In(label")),
      s"label predicate should push into the index scan; pushed=$pushed")
    // (3) scoring the compressed codes adds no join and no shuffle:
    // residual + ADC are narrow projections into the fused top-k
    assert(!plan.contains("Exchange hashpartitioning"),
      s"filtered IVF-PQ must not shuffle:\n${plan.take(900)}")
    assert(plan.contains("TakeOrderedAndProject"))
    val rows = df.collect()
    assert(rows.length == 10)
    // predicate honored, ADC ordering honored
    assert(rows.forall(r => Seq(2L, 5L, 7L).contains(r.getLong(1))))
    val adc = rows.map(_.getDouble(3)).toSeq
    assert(adc == adc.sorted.reverse)
    // the rode-along cos_sim is the TRUE cosine vs raw embeddings —
    // a stale index or mis-assigned cell cannot fake matching values
    val byId = graft.Vec.withNorm(graft.Tables.embeddings(spark, dir))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](2).toArray, r.getDouble(3))).toMap
    val (qv, qn) = byId(0L)
    rows.foreach { r =>
      val (v, nm) = byId(r.getLong(0))
      var dp = 0.0
      var i = 0
      while (i < v.length) { dp += v(i) * qv(i); i += 1 }
      assert(r.getDouble(4) == dp / (nm * qn))
    }
  }

  test("s19 grades all 8 subspaces of the shipped codebooks with live codeword usage") {
    val rows = Similarity.s19.fn(spark, "/root/testdata/sf0.001")
      .orderBy("m").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 8L))
    // one corpus, one count, every subspace
    assert(rows.map(_.getLong(1)).distinct.length == 1 && rows.head.getLong(1) > 0)
    rows.foreach { r =>
      assert(r.getLong(2) > 0L, s"subspace ${r.getLong(0)}: zero inertia")
      val used = r.getLong(3)
      assert(used >= 1L && used <= 8L, s"codeword usage out of range: $used")
      // mean/rms are consistent with the exact integer inertia
      assert(r.getDouble(4) == r.getLong(2).toDouble / r.getLong(1).toDouble)
      assert(r.getDouble(5) == math.sqrt(r.getDouble(4)) / 1e6)
    }
  }

  test("s20 sweep: error falls strictly as bits double; one corpus count throughout") {
    val rows = Similarity.s20.fn(spark, "/root/testdata/sf0.001")
      .orderBy("bits").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L))
    assert(rows.map(_.getLong(2)).toSeq == Seq(16L, 32L, 64L), "bytes/vec double")
    assert(rows.map(_.getLong(3)).distinct.length == 1 && rows.head.getLong(3) > 0)
    val errs = rows.map(_.getLong(4)).toSeq
    assert(errs == errs.sorted.reverse && errs.distinct == errs,
      s"error must fall strictly with bits: $errs")
    // the 1/L² law: each +2 bits should cut error by well over 10×
    assert(errs(0) > 10 * errs(1) && errs(1) > 10 * errs(2), s"law violated: $errs")
  }
  test("s22 mutual edges are exactly the reciprocated s06 top-3 pairs") {
    val knn = graft.Registry.byName("s06_ivf_batch_probe").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val mutual = graft.Registry.byName("s22_mutual_knn").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(mutual.nonEmpty)
    mutual.foreach { case (a, b, c) =>
      assert(a < b)
      // the emitted cosine is the SAME double both directions hold
      assert(knn.get((a, b)).contains(c), s"$a->$b missing from s06's top-3")
      assert(knn.get((b, a)).contains(c), s"$b->$a missing from s06's top-3")
    }
    // completeness: every reciprocated s06 pair appears exactly once
    val expected = knn.keySet.filter { case (a, b) => a < b && knn.contains((b, a)) }
    assert(mutual.map(t => (t._1, t._2)).toSet == expected)
    assert(mutual.size == expected.size)
  }

  test("s23 tombstones vanish from both sides; untouched queries equal s06 exactly") {
    val s06 = graft.Registry.byName("s06_ivf_batch_probe").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val s23 = graft.Registry.byName("s23_tombstone_ann").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(s23.nonEmpty)
    // no deleted id on either side
    s23.foreach { case (va, rows) =>
      assert(va % 9 != 0)
      assert(rows.forall(_._2 % 9 != 0))
    }
    // a surviving query whose s06 top-3 held no tombstone is untouched
    val untouched = s06.filter { case (va, rows) =>
      va % 9 != 0 && rows.forall(_._2 % 9 != 0)
    }
    assert(untouched.nonEmpty)
    untouched.foreach { case (va, rows) =>
      assert(s23(va).toSet == rows.toSet, s"query $va drifted without cause")
    }
    // a query that DID lose a neighbor to a tombstone refills from the
    // probed cells (still 3 rows unless the cells ran dry)
    val touched = s06.keys.filter(va =>
      va % 9 != 0 && s06(va).exists(_._2 % 9 == 0))
    assert(touched.nonEmpty, "no query lost a neighbor -- fixture degenerate")
  }

  test("s24 radius results are sound (>= tau, sampled queries) and complete vs s06") {
    val s24 = graft.Registry.byName("s24_range_search").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(s24.nonEmpty)
    // soundness: sampled queries only, never self, cosine >= tau
    s24.foreach { case (va, nn, _, c) =>
      assert(va % 37 == 0 && nn != va && c >= 0.2)
    }
    // completeness against the shipped top-k on the SAME probed cells:
    // any s06 top-3 neighbor of a sampled query with c >= tau must
    // appear in the radius result with the identical double
    val s06 = graft.Registry.byName("s06_ivf_batch_probe").fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .filter(t => t._1 % 37 == 0 && t._3 >= 0.2)
    assert(s06.nonEmpty, "no sampled s06 row clears tau -- fixture degenerate")
    val got = s24.map(t => (t._1, t._2, t._4)).toSet
    s06.foreach { t =>
      assert(got.contains(t), s"s06 row $t missing from the radius result")
    }
    // and the radius result genuinely exceeds any top-3 cut for at
    // least one query OR returns sub-3 neighborhoods -- i.e. it is
    // result-driven, not k-driven (both directions legal; the corpus
    // decides)
    val perQuery = s24.groupBy(_._1).map(_._2.length)
    assert(perQuery.exists(_ != 3) || perQuery.isEmpty)
  }

  test("s25 grades the shipped s24: n_found equals s24's per-query rows, misses only") {
    val s24 = graft.Registry.byName("s24_range_search").fn(spark, dir).collect()
      .map(r => r.getLong(0)).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val s25 = graft.Registry.byName("s25_range_recall").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(s25.nonEmpty)
    s25.foreach { case (va, nTrue, nFound, recall) =>
      // the measured leg IS s24's result set for this query
      assert(nFound == s24.getOrElse(va, 0L), s"query $va drifted from s24")
      // precision 1 by construction: only misses are possible
      assert(nFound <= nTrue)
      assert(recall ==
        (if (nTrue == 0) 1.0 else nFound.toDouble / nTrue))
    }
    // the fixture must exercise both a hit and (bucket pruning being
    // real) at least one miss somewhere, else the eval grades nothing
    assert(s25.exists(_._3 > 0))
  }

  test("s26 card partitions the corpus; shares and occupancies carry their identities") {
    val card = graft.Registry.byName("s26_index_card").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(card.nonEmpty)
    val total = card.map(_._2).sum
    // every vector lives in exactly one cell
    assert(total == graft.Tables.embeddings(spark, dir).count())
    val k = card.length
    card.foreach { case (_, n, share, occ) =>
      assert(n > 0 && share == n.toDouble / total)
      assert(occ == (n * k).toDouble / total)
    }
    // shares sum to 1, occupancies to k (up to float addition)
    assert(math.abs(card.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(card.map(_._4).sum - k) < 1e-9)
  }

}
