package graft.plans

import org.apache.spark.sql.DataFrame

/** Registry-wide physical-plan fingerprints — the drift lint's shared
  * kernel (round-7 verdict item: a silent broadcast→SMJ or a new
  * Exchange on any of 200+ entries used to surface only as a
  * wall-time flap, and the bench box makes wall time a noisy channel;
  * the plan SHAPE is the clean one).
  *
  * A fingerprint is the multiset of operator names in the entry's
  * SimpleMode explain text: one line per operator, normalized to the
  * leading operator token — no expression IDs, no file paths, no
  * codegen stage numbers, no partition counts — so it is stable
  * across sessions and machines while still catching every join-
  * strategy change, added/removed Exchange, lost whole-stage span
  * boundary (the operator set changes), or a new scan.
  *
  * The committed lock lives at docs/PLANS.json; PlanDriftSpec
  * compares live fingerprints against it and regenerates the file
  * when GRAFT_REGEN_PLANLOCK=1 (intentional plan changes re-snapshot
  * in the same commit — the x30 gate-explain idea applied to plans).
  */
object PlanFingerprint {

  /** Leading operator token of one explain line: strips tree art
    * (`+- : |`), the whole-stage codegen star `*(3)`, and anything
    * after the operator word. */
  private val OpRe =
    """^[\s:+\-|]*(?:\*\(\d+\)\s*)?([A-Za-z][A-Za-z0-9]*)""".r

  def ofExplain(explain: String): Map[String, Int] =
    explain.linesIterator
      .flatMap(ln => OpRe.findFirstMatchIn(ln).map(_.group(1)))
      .toSeq.groupBy(identity).map { case (k, v) => k -> v.size }

  def of(df: DataFrame): Map[String, Int] =
    ofExplain(df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))

  /** AQE-runtime artifacts that appear in an entry's explain ONLY
    * when part of its plan already executed (capstones that cache or
    * land eagerly during construction): materialized query stages and
    * exchange reuse depend on SESSION HISTORY — which suites ran
    * first, which memoized operands exist — not on the operator's
    * design, and the explain text reprints cached subtrees a
    * history-dependent number of times.
    */
  private val RuntimeMarkers = Set(
    "AQEShuffleRead", "ShuffleQueryStage", "BroadcastQueryStage",
    "ResultQueryStage", "TableCacheQueryStage", "ReusedExchange")

  private def isVolatile(fp: Map[String, Int]): Boolean =
    fp.keys.exists(RuntimeMarkers)

  /** Drift test: exact operator-count equality for pure-plan entries;
    * entries carrying runtime markers on EITHER side (eagerly-executed
    * capstones) compare on the DISTINCT operator-name set with the
    * markers removed — still catches a join-strategy change, a new
    * CartesianProduct, or a lost custom operator, while staying
    * immune to history-dependent stage materialization and subtree
    * reprint counts (round-8 lesson: c01's Exchange count read 21 or
    * 22 depending on which suite had already built its memo caches).
    */
  def matches(a: Map[String, Int], b: Map[String, Int]): Boolean =
    if (isVolatile(a) || isVolatile(b))
      (a.keySet -- RuntimeMarkers) == (b.keySet -- RuntimeMarkers)
    else a == b

  /** Render all fingerprints as one stable JSON document: entries and
    * operator keys both sorted, so the committed file diffs cleanly.
    */
  def render(all: Seq[(String, Map[String, Int])]): String =
    all.sortBy(_._1).map { case (name, fp) =>
      val ops = fp.toSeq.sorted
        .map { case (op, n) => s""""$op":$n""" }.mkString(",")
      s"""  "$name":{$ops}"""
    }.mkString("{\n", ",\n", "\n}\n")

  private val EntryRe = """"([A-Za-z0-9_]+)":\{([^}]*)\}""".r
  private val PairRe = """"([A-Za-z0-9]+)":(\d+)""".r

  /** Parse [[render]]'s output (the only JSON this file ever reads —
    * names are `[A-Za-z0-9_]+` by construction, so the regex parse is
    * exact; no JSON library dependency). */
  def parse(json: String): Map[String, Map[String, Int]] =
    EntryRe.findAllMatchIn(json).map { m =>
      m.group(1) -> PairRe.findAllMatchIn(m.group(2))
        .map(p => p.group(1) -> p.group(2).toInt).toMap
    }.toMap
}
