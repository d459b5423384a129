package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // the library config (Main.scala ships it): TopKRewrite +
      // TopKPerKey strategy + native function registration — bench
      // numbers must reflect the shipped session, not a bare one
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JIT/codegen paths and parquet footers, so the first
    // measured query isn't charged ~4s of one-time session cost.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // …including the SESSION-WINDOW aggregate path: its merging-
    // sessions codegen + UpdatingSessionsIterator machinery is a
    // distinct first-touch cost that used to land inside e03's
    // min-of-2 (driver-run flap: 1.15 s vs 0.43–0.47 s committed
    // snapshots) — one tiny synthetic sessionization JITs it up front
    spark.range(20000L)
      .selectExpr("id % 97 AS uid",
        "timestamp_micros(CAST(id * 1000000 AS LONG)) AS ts", "id AS v")
      .groupBy(org.apache.spark.sql.functions.session_window(
          org.apache.spark.sql.functions.col("ts"), "5 minutes"),
        org.apache.spark.sql.functions.col("uid"))
      .count().count()
    Seq("lineitem", "orders", "documents", "embeddings", "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // …and one untimed first-touch of the historically flap-prone
    // one-pass entries (r5 driver runs: q20 0.2→1.2, e05 0.2→1.1,
    // x07 0.5→2.6, q36 0.5→2.6 inside host-contention windows, code
    // unchanged): their steady state is fractions of a second, so a
    // single cold codegen/JIT execution landing in a contended window
    // reads as a 5× regression. Executing each once before the timed
    // loop moves the one-time cost where it belongs — the e03
    // session-window lesson applied to their CASE/JSON-path/shingle/
    // sketch-agg codegen shapes. Cache state doesn't leak: the timed
    // loop clears Spark caches before every entry.
    Seq("q20_case_expr", "e05_json_extract", "x07_contamination",
      "q36_custom_quantile").foreach { n =>
      try Registry.byName(n).fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // Timing structure (round 8): the suite runs as FULL INTERLEAVED
    // PASSES and each entry reports its min ACROSS passes. Rounds 5–7
    // showed the old per-entry consecutive min-of-N is structurally
    // blind to SUSTAINED host contention: all retries of one entry run
    // back-to-back inside the same multi-second contention window, so
    // they inflate together and agree (r7: 11 entries read 3–14× their
    // committed quiet-box anchors in the driver run; every one
    // re-measured clean on a quiet window). With whole-suite passes, a
    // contention window lands on DIFFERENT entries in each pass, so the
    // cross-pass min recovers the quiet number for all of them.
    def timeOnce(name: String)(body: => Unit): Option[Double] = {
      val t0 = System.nanoTime()
      try { body; Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      }
    }
    // SPARK_GRAFT_ONLY narrows the run (validated; archives selectable
    // by name too); unset = the full suite
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    val archiveNames = Set("archive_lineitem_csv_sharded", "archive_lineitem_csv_single")
    val (selected, selectedArchives) = SparkEntry.selected(only, archiveNames)
    // Committed quiet-box steady-states (docs/BUDGET.json, via the
    // BudgetSnapshot parser BudgetLintSpec shares) anchor the
    // sustained-contention arbitration below. The anchor only applies
    // at the snapshot's own scale factor: at a larger SF every entry
    // legitimately exceeds its sf0.1 value and the 3× trigger would
    // fire on ALL of them, doubling the run for no signal. A missing
    // file or entry (operators newer than the last snapshot) simply
    // means no anchor for that name.
    val committed: Map[String, Double] =
      if (sfDir.stripSuffix("/").endsWith(BudgetSnapshot.SnapshotSfDir))
        BudgetSnapshot.perQuery()
      else Map.empty
    // Unified entry list: queries + the archive throughput entries
    // (the reference's own workload — format rows, write one object /
    // sharded parts; measured on lineitem) run inside the SAME passes.
    val engine = new graft.engine.Engine(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-bench-archive").toString
    val archiveBodies: Seq[(String, () => Unit)] = Seq(
      "archive_lineitem_csv_sharded" -> { () =>
        engine.archive(sfDir, "lineitem", out, _.copy(sharded = true)); () },
      "archive_lineitem_csv_single" -> { () =>
        engine.archive(sfDir, "lineitem", out,
          _.copy(key = Some("lineitem_single.csv"))); () })
      .filter { case (n, _) => selectedArchives(n) }
    val entries: Seq[(String, () => Unit)] =
      selected.toSeq.map { case (name, fn) =>
        (name, { () => fn(spark, sfDir).count(); () }: () => Unit)
      } ++ archiveBodies
    // benchmark integrity: queries like d03/x07 cache their shingle
    // tables and d06/d07 reuse d03's entry via plan matching — clear
    // Spark-level caches before each entry so no query's number
    // silently excludes work a previous entry materialized
    def onePass(names: Seq[(String, () => Unit)]): Map[String, Option[Double]] =
      names.map { case (name, body) =>
        spark.sharedState.cacheManager.clearCache()
        name -> timeOnce(name)(body())
      }.toMap
    // Contention sentinel (round 9, additive field): a fixed synthetic
    // probe timed immediately before each pass. Its three values land
    // in the JSON line as "sentinel":[s1,s2,s3]; on a quiet box they
    // sit near a constant (~0.1 s at 32 cores), under host contention
    // they inflate with it — so a driver run whose totals read 2× the
    // committed snapshot can be arbitrated as contended/clean from its
    // own artifact instead of requiring a re-run. The probe is pure
    // deterministic compute (no I/O, no caches), identical every
    // round, and is NOT part of any entry's time.
    def sentinelOnce(): Double = {
      val t0 = System.nanoTime()
      // xxhash64 per row gives the probe real CPU weight; the modulo
      // keeps the 64 M-row sum far below 2^63 (ANSI mode overflow)
      spark.range(64000000L).selectExpr("sum(xxhash64(id) % 1000)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val sentinel1 = sentinelOnce()
    val pass1 = onePass(entries)
    val sentinel2 = sentinelOnce()
    val pass2 = onePass(entries)
    // Third pass ONLY for entries still suspect after two passes:
    // the two pass-values disagree >1.5× on a non-trivial entry (a
    // spike hit one pass — min may still be the inflated-both case if
    // the window spanned both), or the cross-pass min still exceeds 3×
    // its committed quiet-box anchor (sustained contention across both
    // passes). The flagged subset runs as its own interleaved sub-pass,
    // so a window during arbitration again spreads across entries
    // instead of landing wholly on one.
    val suspect = entries.filter { case (name, _) =>
      (pass1(name), pass2(name)) match {
        case (Some(a), Some(b)) =>
          val mn = math.min(a, b)
          (mn > 1.0 && math.max(a, b) > 1.5 * mn) ||
            committed.get(name).exists(c => c > 0 && mn > 3 * c)
        case _ => false
      }
    }
    val sentinel3 = sentinelOnce()
    val pass3 = onePass(suspect)
    val sentinels = Seq(sentinel1, sentinel2, sentinel3)
    // A query failing in pass 1 or 2 reports -1 — a breakage can never
    // read as a speedup (a deterministic failure fails both). The
    // ARBITRATION pass is different: an entry only reaches pass 3 with
    // two valid timings in hand, so a transient pass-3 failure
    // (contention flake) keeps the measured min rather than branding
    // the entry broken — the old arbitration's getOrElse semantics.
    // Archive entries tolerate one transient-pass failure anywhere
    // (filesystem flakes) as long as one pass succeeded.
    val archiveNameSet = archiveBodies.map(_._1).toSet
    val results: Map[String, Double] = entries.map { case (name, _) =>
      val mandatory = Seq(pass1(name), pass2(name))
      val ok = (mandatory ++ pass3.get(name)).flatten
      val v =
        if (archiveNameSet(name)) { if (ok.isEmpty) -1.0 else ok.min }
        else if (mandatory.exists(_.isEmpty)) -1.0
        else ok.min
      name -> v
    }.toMap
    val total = results.values.filter(_ >= 0).sum
    // One JSON line, two renderings of the same numbers. The driver
    // tail-parses the LAST ≤2000 stdout chars (BENCH_r0{1,2,3} all
    // "parsed": null): full-precision per-query values made the line
    // 2220 chars, so its head fell out of the window. Stdout gets
    // seconds rounded to 10 ms — ~1730 chars for 70 entries, ample
    // slack — while bench.json keeps full precision for MICROBENCH
    // work. (build.sbt's `showSuccess := false` removes the other
    // killer: sbt's trailing "[success] Total time: …" line, which
    // used to follow the JSON as the true last line.)
    def renderOf(subset: Seq[(String, Double)], omitted: Int)(
        perQuery: Double => String, key: String => String): String = {
      val qs = subset.map { case (k, v) =>
        "\"" + key(k) + "\":" + (if (v < 0) "-1" else perQuery(v))
      }.mkString("{", ",", "}")
      val t = "%.3f".formatLocal(java.util.Locale.ROOT, total)
      val omit = if (omitted > 0) s""","omitted_fast":$omitted""" else ""
      val sent = sentinels.map(s =>
        "%.2f".formatLocal(java.util.Locale.ROOT, s)).mkString("[", ",", "]")
      s"""{"metric":"total","value":$t,"unit":"sec","n_queries":${results.size},"queries":$qs$omit,"sentinel":$sent,"sf":"$sfDir"}"""
    }
    def render(perQuery: Double => String, key: String => String): String =
      renderOf(results.toSeq, 0)(perQuery, key)
    val full = render(_.toString, identity)
    // Stdout keys compress to the registry short id (the prefix
    // before the first '_': "g02_personalized_pagerank" → "g02") —
    // at 119 entries even 1-decimal FULL names blew the tail window
    // (2807 chars, round 5), and the suffix is decoration: short ids
    // are unique by construction (a collision falls back to the full
    // name so two queries can never silently merge). bench.json keeps
    // full names + full precision for MICROBENCH/verdict work; the
    // archive entries keep full names — they are the reference's own
    // flagship workload and there are only two of them.
    val shortKey: String => String = n =>
      if (n.startsWith("archive_")) n else n.takeWhile(_ != '_')
    val shortCounts = results.keys.toSeq.groupBy(shortKey).map { case (k, v) => (k, v.size) }
    val key: String => String = n => {
      val s = shortKey(n); if (shortCounts(s) == 1) s else n
    }
    // Adaptive stdout detail on top of short keys: 2-decimal detail
    // while it fits, 1-decimal when tight — and past ~215 entries even
    // that overflows the driver's ~2000-char tail window (round 7's
    // BENCH json records "parsed": null for exactly this reason), so
    // the last resort keeps the line PARSEABLE by listing only the
    // SLOWEST entries (the ones a performance reader needs in-window)
    // plus an explicit omitted_fast count; every omitted number still
    // lives at full precision in bench.json, which is committed.
    val compact = {
      val two = render(v => "%.2f".formatLocal(java.util.Locale.ROOT, v), key)
      lazy val one = render(v => "%.1f".formatLocal(java.util.Locale.ROOT, v), key)
      if (two.length <= 1900) two
      else if (one.length <= 1900) one
      else {
        // slowest-first (failures sort first so a -1 is never hidden),
        // largest prefix that fits the window
        val ordered = results.toSeq.sortBy { case (_, v) => if (v < 0) -1e18 else -v }
        val fit = (ordered.length to 1 by -1).view.map { k =>
          renderOf(ordered.take(k), ordered.length - k)(
            v => "%.1f".formatLocal(java.util.Locale.ROOT, v), key)
        }.find(_.length <= 1900)
        fit.getOrElse(renderOf(Seq.empty, ordered.length)(_.toString, key))
      }
    }
    // Persist to a well-known file as well. A filtered run must NOT
    // clobber the canonical full-suite snapshot — partial results go
    // to bench_partial.json.
    val snapshot = if (only.isDefined) "bench_partial.json" else "bench.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(snapshot), full + "\n")
    // …and print the JSON only AFTER the session is stopped, so no
    // Spark shutdown chatter can land between it and process exit: the
    // line the driver's tail-parse sees last is the JSON itself.
    spark.stop()
    // Headroom guard: the slowest-prefix fallback makes overflow
    // structurally impossible, so this only fires on a logic error.
    if (compact.length > 1900)
      System.err.println(s"[bench] WARNING compact line ${compact.length} chars " +
        "— exceeds the driver's ~2000-char tail window despite the fallback")
    println(compact)
  }
}
