package graft.operators

import graft.SparkSpec

/** q48's contract: after the MV is built, the steady-state plan reads
  * the stored aggregate plus ONE delta-filtered base scan — the full
  * base table is never rescanned (the entire point of maintenance at
  * 100 TB), and the merged answer equals a full recompute exactly.
  */
class IncrementalMvSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("steady-state plan merges the stored MV with one delta scan only") {
    val q48 = graft.Registry.byName("q48_incremental_mv")
    q48.fn(spark, dir).collect() // first call builds + memoizes the MV
    val plan = q48.fn(spark, dir).queryExecution.executedPlan.toString
    val liScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(liScans == 1, s"exactly one (delta) base scan expected:\n${plan.take(2000)}")
    val mvTable = graft.engine.CatalogMemo.tableName("graft_mv_lineitem",
      graft.engine.CatalogMemo.contentKey(dir, spark.sparkContext.hadoopConfiguration))
    assert(plan.contains(mvTable), "stored MV must be read")
  }

  test("incremental merge equals full recompute") {
    import org.apache.spark.sql.functions._
    import graft.Qdsl._
    val merged = graft.Registry.byName("q48_incremental_mv").fn(spark, dir)
    val full = graft.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(xsum2(col("l_quantity")).as("sum_qty"),
        xsum2(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows"),
        xavg2(col("l_extendedprice")).as("avg_price"))
      .orderBy("l_returnflag", "l_linestatus")
    assert(merged.collect().toSeq == full.collect().toSeq)
  }
}
