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

  test("float keys normalize: -0.0 and 0.0 are one group, like row_number") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (1.5, 4L)).toDF("key", "id")
    val top = TopK.perKey(df, Seq(col("key")), Seq(col("id").asc), 2)
      .collect().map(_.getLong(1)).toSet
    assert(top == Set(1L, 2L, 4L)) // zero-group keeps ids 1,2; 1.5-group keeps 4
  }

  test("downstream per-key operators reuse the operator's clustering (no re-shuffle)") {
    graft.functions.GraftFunctions.register(spark)
    val agg = TopK.perKey(orders, Seq(col("o_custkey")), Seq(col("o_totalprice").desc), 3)
      .groupBy("o_custkey").count()
    val plan = agg.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(o_custkey".r.findAllIn(plan).size == 1)
  }

  test("misuse fails clearly: empty keys, map-typed keys") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    assertThrows[IllegalArgumentException] {
      TopK.perKey(orders, Seq.empty, Seq(col("o_orderkey")), 3)
    }
    val m = Seq((Map("a" -> 1), 1L)).toDF("mk", "id")
    val e = intercept[Exception] {
      TopK.perKey(m, Seq(col("mk")), Seq(col("id")), 1).collect()
    }
    assert(e.getMessage.contains("map"))
  }

  test("k larger than any group degenerates to the full input") {
    graft.functions.GraftFunctions.register(spark)
    val all = TopK.perKey(orders, Seq(col("o_custkey")),
      Seq(col("o_orderkey").asc), 1000000).count()
    assert(all == orders.count())
  }

  // --- TopKRewrite: the optimizer rule that hands users the custom
  // operator when they write the row_number()≤k idiom themselves ---

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice")
  }

  test("rewrite: row_number()<=k + drop-rn projection becomes TopKPerKey") {
    graft.functions.GraftFunctions.register(spark)
    val df = windowTopK(3)
    assert(df.queryExecution.optimizedPlan.exists(_.isInstanceOf[TopKPerKey]))
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).size == 2)
    assert(!plan.contains("WindowExec"))
    // and the rewritten plan returns exactly the window answer
    val rewritten = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = TopK.perKey(orders, Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rewritten == direct && rewritten.nonEmpty)
  }

  test("rewrite fires through the SQL surface too") {
    graft.functions.GraftFunctions.register(spark)
    orders.createOrReplaceTempView("orders_topk_sql")
    val df = spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders_topk_sql) WHERE rn <= 2""".stripMargin)
    assert(df.queryExecution.optimizedPlan.exists(_.isInstanceOf[TopKPerKey]))
    assert(!df.queryExecution.executedPlan.toString.contains("WindowExec"))
    assert(df.count() > 0)
  }

  test("rewrite guards: Int.MinValue strict bound stays an empty filter; '1 = rn' rewrites") {
    graft.functions.GraftFunctions.register(spark)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    // always-false filter: v - 1 must NOT wrap to Int.MaxValue and
    // become a return-everything top-k
    val neverRows = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") < Int.MinValue)
      .select("o_custkey", "o_orderkey")
    assert(!neverRows.queryExecution.optimizedPlan.exists(_.isInstanceOf[TopKPerKey]))
    assert(neverRows.count() == 0)
    // flipped equality form
    val flipped = orders.withColumn("rn", row_number().over(w))
      .where(lit(1) === col("rn"))
      .select("o_custkey", "o_orderkey")
    assert(flipped.queryExecution.optimizedPlan.exists(_.isInstanceOf[TopKPerKey]))
    assert(flipped.count() == orders.select("o_custkey").distinct().count())
  }

  test("rewrite leaves rn-keeping and rank() formulations untouched") {
    graft.functions.GraftFunctions.register(spark)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    // output keeps rn → TopKPerKey cannot produce it → no rewrite
    val keepsRn = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_custkey", "rn")
    assert(!keepsRn.queryExecution.optimizedPlan.exists(_.isInstanceOf[TopKPerKey]))
    // rank() admits >k rows on ties → not a top-k → no rewrite
    val ranked = orders.withColumn("rk", rank().over(w))
      .where(col("rk") <= 3)
      .select("o_custkey", "o_orderkey")
    assert(!ranked.queryExecution.optimizedPlan.exists(_.isInstanceOf[TopKPerKey]))
  }
}
