package graft.operators

import graft.SparkSpec

/** The c01 capstone's structural contracts: shared scans (the corpus
  * is read once per stage FAMILY, not once per stage), sane packing,
  * and an audited landing. Value correctness is the DuckDB oracle's
  * job (CORRECTNESS gate); this pins the plan and the side effects.
  */
class PipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("c01 packs contiguous budget-bounded shards from a nonempty survivor set") {
    val rows = Pipeline.c01.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // shard ids are 0-based and contiguous (prefix-sum div budget
    // cannot skip a shard: every shard below the last one is entered
    // by a doc whose cumulative start falls inside it)
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    // doc-id ranges of consecutive shards never overlap (packing is
    // by ascending doc_id) and counts/tokens are positive
    rows.sliding(2).foreach {
      case Array((_, _, _, _, lastA), (_, _, _, firstB, _)) =>
        assert(lastA < firstB)
      case _ => ()
    }
    rows.foreach { case (_, nDocs, nTok, first, last) =>
      assert(nDocs > 0 && nTok > 0 && first <= last)
    }
  }

  test("c01 reads the corpus once per stage family: cached attr frame + one shingle pass") {
    val df = Pipeline.c01.fn(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the per-doc attribute family reads through the cache...
    assert(plan.contains("InMemoryTableScan"),
      s"expected the cached per-doc attribute frame in:\n${plan.take(1200)}")
    // ...so DISTINCT corpus scan nodes in the DAG (the textual plan
    // reprints cached-relation subtrees at every reference — count
    // scan identities, not lines) are only the attr build plus the
    // shingle self-join's two legs — never one per stage
    val ids = "FileScan parquet \\[doc_id#(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(ids.size <= 3, s"expected <= 3 distinct corpus scans, found ${ids.size}")
    // and the self-join's second leg rides a reused exchange — the
    // signature shuffle is paid once
    assert(plan.contains("ReusedExchange"),
      "expected the band self-join to reuse the signature exchange")
  }

  test("c01 lands sharded parquet with a clean K1d manifest audit") {
    Pipeline.c01.fn(spark, dir).collect() // ensure the landing ran
    val ck = graft.engine.CatalogMemo.contentKey(
      dir, spark.sparkContext.hadoopConfiguration)
    val dest = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
      "/" + graft.engine.CatalogMemo.tableName("graft_c01_land", ck) +
      "/train_shards.parquet"
    val eng = new graft.engine.Engine(spark)
    val findings = eng.verifyManifest(dest)
    assert(findings.isEmpty, s"landing audit found: ${findings.mkString("; ")}")
    // the landed shards reconcile with the summary the query returned
    val landed = spark.read.parquet(dest)
    val summary = Pipeline.c01.fn(spark, dir).collect()
    assert(landed.count() == summary.map(_.getLong(1)).sum)
  }

  test("c02 report reconciles with the corpus and d11's survivor verdict") {
    val rows = Pipeline.c02.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // kept + dropped across cells account for every corpus vector
    val corpus = graft.Tables.embeddings(spark, dir).count()
    assert(rows.map(t => t._2 + t._3).sum == corpus)
    // keep-lowest can never empty a nonempty cell: the lowest id in a
    // cell has no lower-id same-cell neighbor to collapse into
    rows.foreach { case (cell, nKept, _, _) =>
      assert(nKept >= 1, s"cell $cell lost its keep-lowest survivor")
    }
    // the capstone's collapse IS d11's verdict, not a twin: per-cell
    // kept counts equal d11's is_kept counts exactly
    val d11Kept = Dedup.d11.fn(spark, dir).collect()
      .filter(_.getBoolean(2)).groupBy(_.getLong(1)).view
      .mapValues(_.length.toLong).toMap
    rows.foreach { case (cell, nKept, _, _) =>
      assert(d11Kept.getOrElse(cell, 0L) == nKept,
        s"cell $cell: c02 kept $nKept, d11 kept ${d11Kept.getOrElse(cell, 0L)}")
    }
  }

  test("c02 lands the survivor index bucketed by cell with a clean manifest audit") {
    val summary = Pipeline.c02.fn(spark, dir).collect() // ensure the landing ran
    val ck = graft.engine.CatalogMemo.contentKey(
      dir, spark.sparkContext.hadoopConfiguration)
    val tbl = graft.engine.CatalogMemo.tableName("graft_c02_index", ck)
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl)).toString
    val eng = new graft.engine.Engine(spark)
    val findings = eng.verifyManifest(loc)
    assert(findings.isEmpty, s"index audit found: ${findings.mkString("; ")}")
    // the landed index is the survivor set the report counted
    assert(spark.table(tbl).count() == summary.map(_.getLong(1)).sum)
    // and it carries the bucketed-by-cell layout the probe path needs
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
    assert(cat.bucketSpec.exists(_.bucketColumnNames == Seq("cell")))
  }

  test("c04 decodes ONCE: report reads the cached metrics; scan identities stay bounded") {
    val df = Pipeline.c04.fn(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // every curation branch reads the materialized decode pass…
    assert(plan.contains("InMemoryTableScan"),
      s"expected the cached decode-metrics frame in:\n${plan.take(1200)}")
    // …so the REPORT's plan carries at most the cache-build identity
    // of the asset source (the textual plan reprints cached subtrees
    // per reference — count scan identities, not lines), and the
    // decode mapPartitions appears only under that one build
    val ids = "FileScan parquet \\[doc_id#(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(ids.size <= 1, s"expected <= 1 distinct asset-source scan, found ${ids.size}")
  }

  test("c04 lands the curated images Z-order-clustered with a clean manifest audit") {
    val summary = Pipeline.c04.fn(spark, dir).collect() // ensure the landing ran
    val ck = graft.engine.CatalogMemo.contentKey(
      dir, spark.sparkContext.hadoopConfiguration)
    val tbl = graft.engine.CatalogMemo.tableName("graft_c04_images", ck)
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl)).toString
    val eng = new graft.engine.Engine(spark)
    val findings = eng.verifyManifest(loc)
    assert(findings.isEmpty, s"landing audit found: ${findings.mkString("; ")}")
    val landed = spark.table(tbl)
    // the archive holds exactly the curated assets the report counted…
    assert(landed.count() == summary.map(_.getLong(1)).sum)
    // …it is SERVABLE (original bytes re-attached, decodable to the
    // recorded dims) and Z-ordered (the clustering key column landed)
    assert(landed.columns.contains("z") && landed.columns.contains("data"))
    val sample = landed.orderBy("asset_id").limit(3).collect()
    sample.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("data")
      val img = graft.multimodal.ImageCodecs.decodeImage(bytes, 0, bytes.length)
      assert(img.isDefined, s"asset ${r.getAs[Long]("asset_id")} bytes not decodable")
      assert(img.get._2.getWidth.toLong == r.getAs[Long]("width"))
      assert(img.get._2.getHeight.toLong == r.getAs[Long]("height"))
    }
    // the landing is curated output, not corpus: strictly fewer
    // assets than documents (collapse + gates genuinely dropped)
    assert(landed.count() < graft.Tables.documents(spark, dir).count())
  }

  test("c07 pairs: both sides are dedup survivors; landing audits clean; scans stay bounded") {
    import org.apache.spark.sql.functions._
    val card = Pipeline.c07.fn(spark, dir)
    val plan = card.queryExecution.executedPlan.toString
    // both cached operands (decode metrics + text attribute frame)
    // feed the pair join — never a re-decode or a corpus rescan
    assert(plan.contains("InMemoryTableScan"),
      s"expected the cached operands in:\n${plan.take(1200)}")
    // scan identities: the asset build + the fused text attribute
    // pass + the shingle pass (d02's shadows — whose band self-join
    // re-aliases its second side with fresh expr ids, so the ONE
    // signature subtree prints as two identities) — and nothing else
    val ids = "FileScan parquet \\[doc_id#(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(ids.size <= 4, s"expected <= 4 distinct corpus scans, found ${ids.size}")
    val rows = card.collect()
    assert(rows.nonEmpty)
    // the landing ran and audits clean
    val ck = graft.engine.CatalogMemo.contentKey(
      dir, spark.sparkContext.hadoopConfiguration)
    val dest = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
      "/" + graft.engine.CatalogMemo.tableName("graft_c07_pairs", ck) +
      "/train_pairs.parquet"
    val eng = new graft.engine.Engine(spark)
    assert(eng.verifyManifest(dest).isEmpty, "c07 landing audit found issues")
    val landed = spark.read.parquet(dest)
    assert(landed.count() == rows.map(_.getLong(2)).sum,
      "landed pair count must equal the card's n_pairs total")
    // every pair id is a curated image rep AND its own d01 keeper AND
    // not a d02 shadow — both modalities' survivor verdicts hold
    val pairIds = landed.select("pair_id").collect().map(_.getLong(0)).toSet
    val curatedIds = MultimodalOps.curatedImageMetrics(spark, dir)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(pairIds.subsetOf(curatedIds), "pair image side must be curated reps")
    val keepers = graft.Registry.byName("d01_exact_dedup").fn(spark, dir)
      .select("keep_id").collect().map(_.getLong(0)).toSet
    assert(pairIds.subsetOf(keepers), "pair text side must be d01 keepers")
    val shadows = graft.Registry.byName("d02_minhash_lsh").fn(spark, dir)
      .select("db").collect().map(_.getLong(0)).toSet
    assert(pairIds.intersect(shadows).isEmpty,
      "no pair may carry a d02 near-dup shadow as its caption")
  }

  test("c07 card reconciles with c05's per-language counts on the shared corpus") {
    val c07 = Pipeline.c07.fn(spark, dir).collect()
      .groupBy(_.getString(0))
      .map { case (lang, rs) =>
        lang -> ((rs.map(_.getLong(2)).sum, rs.map(_.getLong(7)).sum))
      }
    val c05 = Pipeline.c05.fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    c07.foreach { case (lang, (nPairs, nHigh)) =>
      assert(c05.contains(lang), s"c07 language $lang missing from c05's card")
      assert(nPairs <= c05(lang)._1,
        s"$lang: pairs ($nPairs) exceed the corpus documents (${c05(lang)._1})")
      assert(nHigh <= c05(lang)._2,
        s"$lang: high-quality pairs exceed the corpus high-quality docs")
    }
  }

  test("c06 ledger reconciles cell-by-cell: base+arrived = tombstoned+live, checksum exact") {
    val led = Pipeline.c06.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(led.nonEmpty)
    led.foreach { case (cell, nb, na, nt, nl, _) =>
      assert(nb + na == nt + nl, s"cell $cell leaks rows")
      assert(nb >= 0 && na >= 0 && nt >= 0 && nl >= 0)
    }
    // global reconciliation against the deterministic subsets
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(led.map(t => t._2 + t._3).sum == n, "every vector lives in exactly one cell")
    val ids = graft.Tables.embeddings(spark, dir)
      .select("vec_id").collect().map(_.getLong(0))
    assert(led.map(_._4).sum == ids.count(_ % 9 == 0))
    assert(led.map(_._6).sum == ids.filter(_ % 9 != 0).sum,
      "live checksum must equal the sum of non-tombstoned ids")
    // the landed base index exists and passed its audit (fn ran it);
    // re-verify the manifest from this session
    val ck = graft.engine.CatalogMemo.contentKey(
      dir, spark.sparkContext.hadoopConfiguration)
    val tbl = graft.engine.CatalogMemo.tableName("graft_c06_index", ck)
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl)).toString
    assert(new graft.engine.Engine(spark).verifyManifest(loc).isEmpty)
    // the landed table holds exactly the base rows
    assert(spark.table(tbl).count() == led.map(_._2).sum)
  }
}
