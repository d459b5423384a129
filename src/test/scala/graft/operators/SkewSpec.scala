package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join handling: with one hot key dominating the build of a
  * shuffled join, adaptive execution must split the skewed partition
  * at runtime — the third leg of the skew strategy (broadcast for
  * small dims, salting for aggregations [q28], AQE for joins).
  */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed shuffled join partition at runtime") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 500k rows, 80% on one hot key, with a wide payload so the hot
      // reduce partition's shuffle bytes clear the skew threshold
      val left = spark.range(500000)
        .select(when(col("id") % 5 =!= 0, lit(1L)).otherwise(col("id") % 1000).as("k"),
          concat(lit("payload-"), col("id")).as("payload"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("rv"))
      // aggregate WITHOUT the join key: requiring the join's hash
      // distribution downstream would (correctly) veto the skew split
      val joined = left.join(right, "k").agg(count(lit(1)).as("n"))
      joined.collect() // drive to completion so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"), s"expected a skew-split join in:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
