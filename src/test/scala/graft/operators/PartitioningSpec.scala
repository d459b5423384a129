package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Storage-layout techniques the 100 TB design leans on: hive-style
  * partition pruning and bucketed (pre-shuffled) joins.
  */
class PartitioningSpec extends SparkSpec {

  test("hive-partitioned layout prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    val src = graft.Tables.events(spark, "/root/testdata/sf0.001").drop("ts")
    src.write.partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir).where(col("event_type") === "click")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"))
    assert(df.count() == src.where(col("event_type") === "click").count())
    // the pruned scan must not list non-click files in its plan
    assert(!plan.contains("event_type=error"))
  }

  test("bucketed tables co-locate an equi-join: no shuffle exchange") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    // forbid broadcast so the bucket co-location is what avoids the
    // shuffle (at real scale neither side broadcasts anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").last
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("Bucketed: true"))
      // no hash-partitioning exchange below the join
      assert(!joinSection.contains("Exchange hashpartitioning"))
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q58 join inserts a dynamicpruning subquery on the partitioned scan") {
    val df = graft.Registry.byName("q58_dpp_join").fn(spark, "/root/testdata/sf0.001")
    // the pruning subquery must appear in the OPTIMIZED plan (inserted
    // by PartitionPruning) and survive into the executed plan
    assert(df.queryExecution.optimizedPlan.toString.contains("dynamicpruning"),
      "no dynamicpruning in optimized plan")
    val rows = df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      "no dynamicpruning in executed plan")
    // runtime dim selects a strict subset of the 5 priorities — the
    // pruning is real, not a full-scan pass-through
    assert(rows.nonEmpty && rows.length < 5,
      s"expected a strict partition subset, got ${rows.length} priorities")
  }
}
