package graft.operators

import graft.{QueryDef, Qdsl, Tables}
import Qdsl._
import org.apache.spark.sql.functions._

/** Aggregation variants beyond the plain hash agg (SURVEY.md §2.5):
  * exact & approximate distinct counts, rollup, cube, grouping sets.
  */
object Aggregates {

  def queries: Seq[QueryDef] = Seq(q09, q10, q11, q12, q21, q26, q27, q28, q29)

  /** Skew-resistant two-phase (salted) aggregation: phase 1 groups on
    * (key, salt) so a hot key spreads over 8 reducers, phase 2 merges
    * the partials. The salt derives deterministically from a
    * high-cardinality column (not rand()) so results are reproducible
    * — and provably equal to the direct aggregation, which is exactly
    * what the oracle asserts. The technique for 100 TB heavy-hitter
    * keys; here shown on l_returnflag (3 keys → 3 reducers unsalted).
    */
  val q28 = QueryDef(
    "q28_salted_agg",
    Some("""SELECT l_returnflag,
      CAST(sum(l_quantity) AS DECIMAL(18,2)) AS sum_qty,
      CAST(sum(l_extendedprice) AS DECIMAL(18,2)) AS sum_price,
      count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("salt", pmod(col("l_orderkey"), lit(8)))
      .groupBy("l_returnflag", "salt")
      .agg(sum("l_quantity").as("pq"), sum("l_extendedprice").as("pp"),
        count(lit(1)).as("pn"))
      .groupBy("l_returnflag")
      .agg(dec2(sum("pq")).as("sum_qty"), dec2(sum("pp")).as("sum_price"),
        sum("pn").as("n"))
      .orderBy("l_returnflag")
  }

  /** Approximate percentiles — the sketch path for q26 at 100 TB
    * (mergeable fixed-size summaries instead of a full sort).
    * Sketch output is engine-specific → rows-only check; exactness is
    * pinned by q26 on the same grouping.
    */
  val q29 = QueryDef("q29_approx_percentile", None) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), 10000)").as("p"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        dec4(element_at(col("p"), 1)).as("ap50"),
        dec4(element_at(col("p"), 2)).as("ap90"),
        dec4(element_at(col("p"), 3)).as("ap99"),
        col("n"))
      .orderBy("l_returnflag")
  }

  /** Exact percentiles (linear interpolation — Spark `percentile` ≡
    * DuckDB `quantile_cont`). At 100 TB the same query shape swaps in
    * `approx_percentile` (KLL-style sketch, mergeable, fixed size) —
    * that variant is q10's rows-only territory; exactness pinned here.
    */
  val q26 = QueryDef(
    "q26_percentiles",
    Some("""SELECT l_returnflag,
      CAST(quantile_cont(l_quantity, 0.5) AS DECIMAL(18,4)) AS p50_qty,
      CAST(quantile_cont(l_quantity, 0.9) AS DECIMAL(18,4)) AS p90_qty,
      CAST(quantile_cont(l_extendedprice, 0.95) AS DECIMAL(18,4)) AS p95_price,
      CAST(min(l_extendedprice) AS DECIMAL(18,4)) AS min_price,
      CAST(max(l_extendedprice) AS DECIMAL(18,4)) AS max_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        dec4(expr("percentile(l_quantity, 0.5D)")).as("p50_qty"),
        dec4(expr("percentile(l_quantity, 0.9D)")).as("p90_qty"),
        dec4(expr("percentile(l_extendedprice, 0.95D)")).as("p95_price"),
        dec4(min("l_extendedprice")).as("min_price"),
        dec4(max("l_extendedprice")).as("max_price"))
      .orderBy("l_returnflag")
  }

  /** Statistical aggregates: stddev/variance/correlation/covariance.
    * Implementations differ across engines only at ~1e-12 relative;
    * DECIMAL(18,6) absorbs that.
    */
  val q27 = QueryDef(
    "q27_stats",
    Some("""SELECT o_orderstatus,
      CAST(stddev_samp(o_totalprice) AS DECIMAL(18,4)) AS sd_price,
      CAST(var_samp(o_totalprice) / 1000000 AS DECIMAL(18,2)) AS var_price_m,
      CAST(corr(o_totalprice, o_custkey) AS DECIMAL(18,6)) AS corr_pc,
      CAST(covar_samp(o_totalprice, o_custkey) / 1000000 AS DECIMAL(18,2)) AS covar_pc_m
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        dec4(stddev_samp(col("o_totalprice"))).as("sd_price"),
        dec2(var_samp(col("o_totalprice")) / 1000000).as("var_price_m"),
        corr(col("o_totalprice"), col("o_custkey")).cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("corr_pc"),
        dec2(covar_samp(col("o_totalprice"), col("o_custkey")) / 1000000).as("covar_pc_m"))
      .orderBy("o_orderstatus")
  }

  /** Exact distinct aggregation — Catalyst expands to a two-phase plan
    * (distinct-ify then count) with partial aggregation on both phases.
    */
  val q09 = QueryDef(
    "q09_count_distinct",
    Some("""SELECT l_returnflag,
      CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
      count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        big(countDistinct(col("l_partkey"))).as("n_parts"),
        big(countDistinct(col("l_suppkey"))).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Approximate distinct via HyperLogLog++ — the 100 TB answer to
    * count-distinct (no per-key shuffle of raw values, fixed-size
    * sketches merge associatively). Sketch estimates are
    * engine-specific → no SQL oracle; the driver rows-only checks it.
    * Exactness is covered by q09 on the same grouping.
    */
  val q10 = QueryDef("q10_approx_distinct", None) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        big(approx_count_distinct(col("l_partkey"), 0.02)).as("approx_parts"),
        big(approx_count_distinct(col("l_suppkey"), 0.02)).as("approx_supps"))
      .orderBy("l_returnflag")
  }

  /** ROLLUP — hierarchical subtotals; Spark plans one Expand + single
    * aggregate rather than one pass per level.
    */
  val q11 = QueryDef(
    "q11_rollup",
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(sum(l_quantity) AS DECIMAL(18,2)) AS sum_qty,
      count(*) AS n
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(dec2(sum("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** CUBE — all grouping combinations in one Expand+aggregate. */
  val q12 = QueryDef(
    "q12_cube",
    Some("""SELECT o_orderstatus, o_orderpriority,
      count(*) AS n,
      CAST(sum(o_totalprice) AS DECIMAL(18,2)) AS total
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")) { (s, d) =>
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dec2(sum("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** Explicit GROUPING SETS (each-dimension marginals + grand total). */
  val q21 = QueryDef(
    "q21_grouping_sets",
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(sum(l_extendedprice) AS DECIMAL(18,2)) AS sum_price,
      count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")) { (s, d) =>
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dec2(sum("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }
}
