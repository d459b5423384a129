package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for the model-based text-quality operators (value
  * parity with the oracle is the driver gate; these pin the MEANING).
  */
class TextAnalysisSpec extends SparkSpec {

  private lazy val lmDir: String = {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-lm").toString
    // doc 1: one bigram repeated — maximally probable under the model
    // trained on this corpus; doc 2: every bigram unique (singletons);
    // doc 3: single token (no bigrams); doc 4: repeats doc 1's phrase
    val docs = Seq(
      (1L, ("a b " * 20).trim, "en", "t", 0L),
      (2L, (1 to 40).map(i => s"tok$i").mkString(" "), "en", "t", 0L),
      (3L, "solo", "en", "t", 0L),
      (4L, ("a b " * 10).trim, "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dst/documents.parquet")
    dst
  }

  test("x13: fluent-under-model docs score lower avg_nll than singleton-bigram docs") {
    val rows = TextAnalysis.x13.fn(spark, lmDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // bigram counts: "a b"*20 → 39 bigrams; 40 unique tokens → 39; solo → 0
    assert(rows(1L)._1 == 39L)
    assert(rows(2L)._1 == 39L)
    assert(rows(3L) == ((0L, 0L, 0.0)))
    // the repeated-phrase docs are far more probable than the singleton doc
    assert(rows(1L)._3 < rows(2L)._3,
      s"repeated bigrams should score lower nll: ${rows(1L)._3} vs ${rows(2L)._3}")
    assert(rows(4L)._3 < rows(2L)._3)
    // all scores are non-negative (numerator count ≤ denominator by construction)
    rows.values.foreach { case (_, s, a) => assert(s >= 0L && a >= 0.0) }
  }

  test("BpeKernel.applyMerge is greedy leftmost non-overlapping") {
    def m(ts: String*)(a: String, b: String): Seq[String] =
      BpeKernel.applyMerge(ts.toArray, a, b).toSeq
    assert(m("a", "b", "c")("a", "b") == Seq("ab", "c"))
    assert(m("a", "a", "a")("a", "a") == Seq("aa", "a"))
    assert(m("a", "a", "a", "a")("a", "a") == Seq("aa", "aa"))
    assert(m("x", "a", "b", "a", "b")("a", "b") == Seq("x", "ab", "ab"))
    assert(m("a")("a", "a") == Seq("a"))
    assert(m()("a", "b") == Seq())
    // merged token can participate in later rules, not the same pass
    assert(m("a", "b", "b")("a", "b") == Seq("ab", "b"))
  }

  test("BpeKernel.applyBatch marks against the ORIGINAL sequence — no output-token feeding") {
    def b(ts: String*)(ms: (String, String)*): Seq[String] =
      BpeKernel.applyBatch(ts.toArray, ms.toSet).toSeq
    // the concat-collision case: ("a","b") and ("ab","c") are
    // string-disjoint, but a sequential fold would manufacture "ab"
    // and then consume it with the second rule ⇒ ["abc"]. The batch
    // semantics (the oracle's) marks on the pre-round tokens only.
    assert(b("a", "b", "c")(("a", "b"), ("ab", "c")) == Seq("ab", "c"))
    assert(BpeKernel.applyAll(Array("a", "b", "c"),
      List(("a", "b"), ("ab", "c"))).toSeq == Seq("abc"), "fold MUST differ here")
    // a pre-existing "ab" token is a legitimate match for ("ab","c")
    assert(b("ab", "c", "a", "b")(("a", "b"), ("ab", "c")) == Seq("abc", "ab"))
    // self-run greediness matches applyMerge
    assert(b("a", "a", "a")(("a", "a")) == Seq("aa", "a"))
    // two disjoint rules merge independently in one pass
    assert(b("a", "b", "c", "d")(("a", "b"), ("c", "d")) == Seq("ab", "cd"))
  }

  test("x14 learns deterministic merges with non-increasing selection counts") {
    val rows = TextAnalysis.x14.fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // contiguous ranks from 1
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    // a merge can only create pairs at most as frequent as the merge
    // itself consumed, and never raises an existing pair's count — so
    // selection counts are non-increasing
    val cs = rows.map(_._4).toSeq
    assert(cs == cs.sorted.reverse, s"counts must be non-increasing: $cs")
    // determinism across runs
    val again = TextAnalysis.x14.fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("x28 batches disjoint local-maxima merges; round 1 contains x14's global argmax") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextAnalysis.x28.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    // the batching is REAL: some round selects more than one merge
    val byRound = rows.groupBy(_._2)
    assert(byRound.values.exists(_.length > 1),
      s"every round selected one pair — no batching happened: $byRound")
    // within each round, selected pairs are pairwise symbol-DISJOINT —
    // the property that makes one-pass application exact
    byRound.foreach { case (round, b) =>
      val syms = b.flatMap(p => Seq(p._3, p._4))
      assert(syms.distinct.length == syms.length,
        s"round $round selected symbol-sharing pairs: $b")
    }
    // the global argmax beats every pair, in particular its
    // symbol-neighbors ⇒ x14's first merge is always in batch 1
    val first14 = TextAnalysis.x14.fn(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2))).head
    assert(byRound(1L).exists(p => (p._3, p._4) == first14),
      s"round 1 ${byRound(1L).toSeq} missing x14's argmax $first14")
    // within-round counts are not above the round's opening maximum
    byRound.foreach { case (_, b) =>
      val cs = b.sortBy(_._1).map(_._5)
      assert(cs.toSeq == cs.sorted.reverse.toSeq)
    }
  }

  test("x15 tokenization compresses: tokens <= chars, ratio >= 1 for non-empty docs") {
    val rows = TextAnalysis.x15.fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nw, nt, nc, ratio) =>
      // merging only ever concatenates: word count <= tokens <= chars
      assert(nw <= nt && nt <= nc, s"doc $id: $nw words, $nt tokens, $nc chars")
      if (nt > 0) assert(ratio >= 1.0 && ratio == nc.toDouble / nt.toDouble)
      else assert(ratio == 0.0)
    }
    // 16 learned merges on a natural-ish corpus must actually compress
    val totTok = rows.map(_._3).sum
    val totChar = rows.map(_._4).sum
    assert(totTok < totChar, "learned merges should reduce token count below chars")
  }

  test("x13 is deterministic across runs and partitionings") {
    val a = TextAnalysis.x13.fn(spark, "/root/testdata/sf0.001").collect().toSeq
    spark.sharedState.cacheManager.clearCache()
    val b = TextAnalysis.x13.fn(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    assert(a.nonEmpty)
  }

  test("x19 chunks tile each document: strided starts, clamped tails, known hash") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = TextAnalysis.x19.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet, "every document chunks")
    byDoc.foreach { case (id, chunks) =>
      val n = docs(id).toLong
      // chunk_no consecutive from 0; start = chunk_no·stride; exactly
      // ⌊(n−1)/stride⌋+1 chunks — starts strictly below n
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(0L until sorted.length))
      assert(sorted.forall(c => c._3 == c._2 * 48 && c._3 < n))
      assert(sorted.length == (n - 1) / 48 + 1)
      // every chunk holds min(64, n − start) tokens — full windows
      // inside, a clamped tail at the end
      assert(sorted.forall(c => c._4 == math.min(64L, n - c._3)))
    }
    // hash contract on a hand corpus: one 3-token doc, one chunk,
    // hash = fold (h·31 + codepoint) mod 1e9+7 over "aa b c"
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    Seq((7L, "aa b c", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val one = TextAnalysis.x19.fn(spark, dst).collect()
    val expect = "aa b c".foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    assert(one.length == 1 && one.head.getLong(4) == expect)
  }

  test("x20 reports exactly the maximal duplicated runs: cross-doc, adjacent, split") {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-dupspan").toString
    def words(pfx: String, n: Int): Seq[String] = (1 to n).map(i => s"$pfx$i")
    val docs = Seq(
      // all-unique doc: contributes no spans
      (1L, words("u", 30).mkString(" ")),
      // docs 2 and 3 share a 12-token phrase at offset 5: the merged
      // dup windows must recover EXACTLY the phrase, [5, 17)
      (2L, (words("a", 5) ++ words("p", 12) ++ words("b", 5)).mkString(" ")),
      (3L, (words("c", 5) ++ words("p", 12) ++ words("d", 5)).mkString(" ")),
      // within-doc ADJACENT repeat: dup windows at p=0 and p=8 touch,
      // so the island merge yields ONE span covering the whole doc
      (4L, (words("r", 8) ++ words("r", 8)).mkString(" ")),
      // one separating token breaks adjacency: TWO spans, [0,8) and [9,17)
      (5L, (words("s", 8) ++ Seq("gap") ++ words("s", 8)).mkString(" ")))
      .map { case (id, t) => (id, t, "en", "t", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val spans = TextAnalysis.x20.fn(spark, dst).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq(
      (2L, 5L, 17L, 12L),
      (3L, 5L, 17L, 12L),
      (4L, 0L, 16L, 16L),
      (5L, 0L, 8L, 8L),
      (5L, 9L, 17L, 8L)))
  }

  test("x21 excises every copy but the FIRST: the rewrite keeps one anchor per span") {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-dedupclean").toString
    def words(pfx: String, n: Int): Seq[String] = (1 to n).map(i => s"$pfx$i")
    val docs = Seq(
      (1L, words("u", 30).mkString(" ")),
      (2L, (words("a", 5) ++ words("p", 12) ++ words("b", 5)).mkString(" ")),
      (3L, (words("c", 5) ++ words("p", 12) ++ words("d", 5)).mkString(" ")),
      (4L, (words("r", 8) ++ words("r", 8)).mkString(" ")),
      (5L, (words("s", 8) ++ Seq("gap") ++ words("s", 8)).mkString(" ")))
      .map { case (id, t) => (id, t, "en", "t", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val out = TextAnalysis.x21.fn(spark, dst).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      // unique doc: untouched
      (1L, words("u", 30).mkString(" "), 30L, 30L, 0L),
      // doc 2 holds the FIRST occurrence of the shared phrase → kept whole
      (2L, (words("a", 5) ++ words("p", 12) ++ words("b", 5)).mkString(" "), 22L, 22L, 0L),
      // doc 3's copy is second in (doc_id, p) order → the phrase is cut
      (3L, (words("c", 5) ++ words("d", 5)).mkString(" "), 22L, 10L, 12L),
      // within-doc repeat: exactly ONE copy survives
      (4L, words("r", 8).mkString(" "), 16L, 8L, 8L),
      // separated repeat: first copy + separator survive
      (5L, (words("s", 8) ++ Seq("gap")).mkString(" "), 17L, 9L, 8L)))
  }
  test("x29 novelty is exact, bounded, and 0 for exact-duplicate representatives") {
    val sf = "/root/testdata/sf0.001"
    val nov = graft.Registry.byName("x29_ngram_novelty").fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(nov.nonEmpty)
    nov.values.foreach { case (ng, nu, v) =>
      assert(nu <= ng)
      assert(v >= 0.0 && v <= 1.0)
      assert(v == nu.toDouble / ng)
    }
    // planted corpus: a text with an exact copy shares EVERY shingle
    // with its twin (df >= 2 for all of them) -> novelty exactly 0;
    // a text sharing nothing -> novelty exactly 1
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-x29").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon", "en", "web", 30L),
      (2L, "alpha beta gamma delta epsilon", "en", "web", 30L),
      (3L, "zeta eta theta iota kappa", "en", "web", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val planted = graft.Registry.byName("x29_ngram_novelty").fn(spark, dst)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(planted == Map(1L -> 0.0, 2L -> 0.0, 3L -> 1.0))
  }

  test("x30 explains the shipped x03 gate: mask 0 count = 'high' count, flags decode the mask") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.Registry.byName("x30_gate_explain").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    // flags are the mask's own bits — self-consistency
    rows.foreach { case (m, _, b0, b1, b2, b3, b4) =>
      assert(Seq(b0, b1, b2, b3, b4).zipWithIndex.forall { case (b, i) =>
        b == (((m >> i) & 1L) == 1L)
      }, s"mask $m flags drifted")
      // too_short and too_long are mutually exclusive, as are the
      // two stop-ratio bits
      assert(!(b0 && b1) && !(b3 && b4))
    }
    // partition of the corpus, and mask 0 <=> x03's 'high'
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == nDocs)
    val nHigh = graft.Registry.byName("x03_quality").fn(spark, sf).collect()
      .count(_.getString(5) == "high")
    assert(rows.find(_._1 == 0L).map(_._2).getOrElse(0L) == nHigh,
      "mask 0 must count exactly the x03 'high' documents")
  }

}
