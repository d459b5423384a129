package graft.operators

import graft.{Registry, SparkSpec}

/** Physical-plan shape assertions — the properties the 100 TB design
  * depends on, pinned so a refactor can't silently regress them.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.byName(name).fn(spark, dir).queryExecution.executedPlan.toString

  test("q03: all dimension joins broadcast (no shuffle on the dim side)") {
    val p = plan("q03_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    assert(!p.contains("CartesianProduct"))
  }

  test("q65: the 8-table star broadcasts every dimension role — one fact pass, no fact shuffle before the agg") {
    val p = plan("q65_market_share")
    // part (filtered), supplier, orders?, customer, nation×2, region —
    // at least six broadcast joins; the fact side never hash-exchanges
    // except into the 2-row final aggregate
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 6, s"\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"star dims must broadcast:\n${p.take(1200)}")
  }

  test("q74: both dimension paths broadcast; the nation-agreement predicate adds no exchange") {
    val p = plan("q74_local_supplier_volume")
    // customer+nation+region and supplier+nation collapse to broadcasts;
    // only the orders⋈lineitem fact join may sort-merge
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, s"\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"))
    // the orderdate range reaches the orders scan
    assert(p.contains("GreaterThanOrEqual(o_orderdate") &&
      p.contains("LessThan(o_orderdate"), s"\n${p.take(1500)}")
  }

  test("q76: every predicate pushes into ONE scan; no exchange before the final agg") {
    val exec = Registry.byName("q76_forecast_revenue").fn(spark, dir)
      .queryExecution.executedPlan
    val p = exec.toString
    // the PushedFilters list is elided in toString; read the scan's
    // own metadata for the full pushed set (unwrapping AQE)
    val inner = exec match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case o => o
    }
    val scans = inner.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1)
    val pushed = scans.head.metadata("PushedFilters")
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)"))
      assert(pushed.contains(f), s"missing pushed filter $f in: $pushed")
    // read schema restricted to the four referenced columns
    assert(scans.head.requiredSchema.fieldNames.toSet ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"))
    // single-row aggregate: partial+final, no other exchange
    assert("HashAggregate".r.findAllIn(p).size == 2)
  }

  test("q02: filters and pruning reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    // read schema restricted to referenced columns, not the full table
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment"))
  }

  test("q16: global top-k fuses into TakeOrderedAndProject") {
    assert(plan("q16_topk").contains("TakeOrderedAndProject"))
  }

  test("s01: single-row query side is broadcast, not shuffled") {
    assert(plan("s01_cosine_topk").contains("BroadcastNestedLoopJoin") ||
      plan("s01_cosine_topk").contains("BroadcastExchange"))
  }

  test("d05: pair filter evaluates inside the join, not post-materialization") {
    val p = plan("d05_embedding_neardup")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("SortMergeJoin"))
    assert(p.contains(">= 0.4"))
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan("q01_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("every registered query has a distinct name and entry() is registered") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(graft.SparkEntry.queries.keySet == names.toSet)
  }

  test("q53: the correlated scalar subquery decorrelates into an aggregate-join") {
    val plan = Registry.byName("q53_correlated_subquery").fn(spark, dir)
      .queryExecution.executedPlan.toString
    // no per-row subquery re-execution survives decorrelation
    assert(!plan.contains("Subquery"), s"subquery not decorrelated:\n${plan.take(900)}")
    // the per-part threshold is a partial+final aggregate feeding a join
    assert(plan.contains("partial_sum"))
    assert(plan.contains("Join"))
    // the brand filter reaches the part scan
    assert(plan.contains("PushedFilters: [IsNotNull(p_brand), EqualTo(p_brand,Brand#1)"))
  }

  test("q56: rollup + typed HLL plans ONE Expand and one partial+final aggregate") {
    val plan = Registry.byName("q56_sketch_rollup_sets").fn(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).size >= 1, "grouping sets must plan an Expand")
    // one corpus scan builds every rollup level — not one job per level
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      "orders must be scanned exactly once for all three levels")
    assert("partial_hllagg".r.findAllIn(plan).nonEmpty,
      "the typed sketch must participate in partial aggregation under the Expand")
  }

  test("q54: the LATERAL ORDER BY + LIMIT subquery rewrites to one window, not a per-nation re-scan") {
    val plan = Registry.byName("q54_lateral_topk").fn(spark, dir)
      .queryExecution.executedPlan.toString
    // DecorrelateInnerQuery turns the correlated LIMIT into a
    // row_number window over customer + one join with nation — and the
    // repo's TopKRewrite then replaces that window with the partial+
    // final TopKPerKey operator (map-side top-3 before the exchange)
    assert(!plan.contains("Subquery"), s"lateral not decorrelated:\n${plan.take(900)}")
    assert(plan.contains("TopKPerKey") || plan.contains("Window"),
      "expected a window/top-k rewrite of the correlated LIMIT")
    assert("Scan parquet".r.findAllIn(plan).size == 2,
      "each table must be scanned exactly once")
  }
}
