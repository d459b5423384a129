package graft.plans

import graft.SparkSpec

/** Whole-registry plan lint: every query's physical plan is audited
  * for the scale anti-patterns the 100 TB design forbids. This is the
  * automated form of the per-round manual plan audit — a new operator
  * that sneaks in a cartesian product or an unbounded nested-loop
  * join fails HERE, at sf0.001, not in a cluster incident.
  */
class PlanLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose nested-loop/cartesian shape is the DOCUMENTED
    * design (exactness baselines over broadcast-bounded sides), with
    * the reason pinned here so the whitelist can't grow silently.
    */
  private val nestedLoopAllowed: Map[String, String] = Map(
    "s01_cosine_topk" -> "broadcast of ONE query row against the corpus",
    "d05_embedding_neardup" -> "all-pairs exactness baseline (s02/s04 are the scale paths)",
    "q07_join_nonequi" -> "theta join; small side broadcast by design",
    "x11_oov_rate" -> "crossJoin of a ONE-row count aggregate (vocab threshold)",
    "e08_gapfill" -> "crossJoin of a ONE-row min/max bounds aggregate",
    "e24_periodicity" -> "e08's grid shape: crossJoin of a ONE-row min/max bounds aggregate",
    "q47_kmv_overlap" -> "pair join of ONE sketch row per segment (bounded by segment count)",
    "q50_quality_audit" -> "crossJoin of TWO one-row audit aggregates (single-table checks x fk anti-join count)",
    "s10_recall_eval" -> "exact-ground-truth leg broadcasts the FIXED query sample (|Q| = N/37); linear in the corpus, the documented eval protocol",
    "s18_nprobe_sweep" -> "same exact-ground-truth leg as s10 (broadcast 1/37 sample x one corpus scan); the sweep itself is one bucketed candidate join",
    "x25_nb_domain" -> "docs × per-domain base-score table: the broadcast side is domain-cardinality-sized by construction",
    "q62_join_size" -> "cross joins of ONE-row sketch/exact aggregates (driver-sized by construction)",
    // e28_stickiness left the whitelist in round 8: the trailing-week
    // band join was rewritten as a 7-way generator + EQUI-join on the
    // day grid, so its plan no longer contains a nested loop at all
    "s25_range_recall" -> "s10's exact-ground-truth leg (broadcast 1/37 sample x one corpus scan), threshold-filtered",
    "e29_time_to_convert" -> "the q50 shape: cross of TWO one-row aggregates (clicker count x latency order statistics)",
    "d20_dedup_dividend" -> "the q50 shape: one-row dup-cluster aggregate x one-row corpus-token aggregate",
    "s26_index_card" -> "k-row occupancy table x broadcast ONE-row total (k = trained cell count)",
    "m16_neardup_eval" -> "exact all-pairs hamming ground truth over DISTINCT fingerprints (group-table-sized, the d03/d05 exactness-baseline rule) + crossJoins of ONE-row aggregates (the q50 shape)")

  test("no registry query plans a cartesian product or unlisted nested-loop join") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    graft.Registry.all.foreach { q =>
      spark.sharedState.cacheManager.clearCache()
      val plan =
        try q.fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name}: planning failed: $e") }
      val cartesian = plan.contains("CartesianProduct")
      val nlj = plan.contains("BroadcastNestedLoopJoin")
      if (cartesian)
        offenders += s"${q.name}: CartesianProduct"
      else if (nlj && !nestedLoopAllowed.contains(q.name))
        offenders += s"${q.name}: BroadcastNestedLoopJoin (not whitelisted)"
    }
    assert(offenders.isEmpty,
      s"scale anti-patterns found:\n  ${offenders.mkString("\n  ")}")
  }

  test("whitelisted nested-loop queries still have bounded broadcast sides") {
    // the whitelist is only valid while the NLJ side stays a broadcast
    // (bounded) build — a whitelisted query regressing to an unbounded
    // cartesian must fail
    nestedLoopAllowed.keys.foreach { name =>
      spark.sharedState.cacheManager.clearCache()
      val plan = graft.Registry.byName(name).fn(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name regressed to cartesian")
    }
  }
}
