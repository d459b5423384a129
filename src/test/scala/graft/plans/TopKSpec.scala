package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Custom TopKPerKey operator: equivalence with the window
  * formulation and the sort-free two-stage plan shape.
  */
class TopKSpec extends SparkSpec {

  private lazy val orders = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")
    .select("o_custkey", "o_orderkey", "o_totalprice")

  test("perKey equals the row_number window formulation") {
    graft.functions.GraftFunctions.register(spark)
    val custom = TopK.perKey(orders,
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == windowed)
    assert(custom.nonEmpty)
  }

  test("plan: two TopKPerKeyExec stages around one exchange, no Sort, no Window") {
    graft.functions.GraftFunctions.register(spark)
    val df = TopK.perKey(orders, Seq(col("o_custkey")), Seq(col("o_totalprice").desc), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).size == 2) // nodeName strips "Exec"
    assert(plan.contains("Exchange hashpartitioning(o_custkey"))
    assert(!plan.contains("WindowExec"))
    assert(!plan.contains("Sort "))
  }

  test("k larger than any group degenerates to the full input") {
    graft.functions.GraftFunctions.register(spark)
    val all = TopK.perKey(orders, Seq(col("o_custkey")),
      Seq(col("o_orderkey").asc), 1000000).count()
    assert(all == orders.count())
  }
}
