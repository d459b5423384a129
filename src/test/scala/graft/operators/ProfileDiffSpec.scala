package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic pins for the round-5 profiling/reconciliation family that
  * the driver data cannot exercise on its own:
  *
  *   - q59 on a corpus WITH nulls (the driver lineitem has none, so
  *     its n_null column is all-zero there; a profiler that miscounts
  *     or lets nulls poison min/max must fail HERE)
  *   - q60's class accounting against independently-computed set
  *     algebra (the invariants a reconciliation must satisfy)
  *   - x26's log-quantization identity: exact below the threshold,
  *     within the documented 9-bit-mantissa bound above it
  */
class ProfileDiffSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val nulledDir: String = {
    val dst = java.nio.file.Files.createTempDirectory("graft-nulled").toString
    spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("l_returnflag",
        when(col("l_orderkey") % 7 === 0, lit(null: String))
          .otherwise(col("l_returnflag")))
      .withColumn("l_quantity",
        when(col("l_orderkey") % 11 === 0, lit(null: java.lang.Double))
          .otherwise(col("l_quantity")))
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    dst
  }

  test("q59 counts nulls and keeps them out of min/max and distinct") {
    val rows = Relational.q59.fn(spark, nulledDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val li = spark.read.parquet(s"$nulledDir/lineitem.parquet")
    val total = li.count()

    val rf = rows("l_returnflag")
    val rfNulls = li.filter(col("l_returnflag").isNull).count()
    assert(rfNulls > 0, "fixture degenerate: no null returnflags")
    assert(rf.getLong(2) == rfNulls) // n_null
    assert(rf.getLong(1) == total - rfNulls) // n_nonnull
    // min/max ignore nulls — still the live domain values
    assert(rf.getString(4) == "A" && rf.getString(5) == "R")
    assert(rf.getLong(3) == 3L) // distinct over non-null only

    val qty = rows("l_quantity_cents")
    val qtyNulls = li.filter(col("l_quantity").isNull).count()
    assert(qtyNulls > 0 && qty.getLong(2) == qtyNulls)
    assert(qty.getString(4) != null && qty.getString(5) != null)

    // the untouched column still profiles clean
    assert(rows("l_orderkey").getLong(2) == 0L)
  }

  test("q60's class accounting equals independent set algebra") {
    val byClass = Relational.q60.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val oldKeys = orders.filter(col("o_orderkey") % 89 =!= 3)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val newKeys = orders.filter(col("o_orderkey") % 97 =!= 5)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val both = oldKeys & newKeys
    val changed = both.count(k => k % 11 == 0)

    def n(c: String): Long = byClass.get(c).map(_.getLong(1)).getOrElse(0L)
    assert(n("added") == (newKeys -- oldKeys).size)
    assert(n("removed") == (oldKeys -- newKeys).size)
    assert(n("changed") == changed)
    assert(n("unchanged") == both.size - changed)
    // one-sided classes carry no bytes from the absent side
    assert(byClass("added").getLong(3) == 0L) // old_cents_total
    assert(byClass("removed").getLong(4) == 0L) // new_cents_total
    // unchanged rows are value-identical by definition
    assert(byClass("unchanged").getLong(3) == byClass("unchanged").getLong(4))
    // every changed row is the +100-cent update
    assert(byClass("changed").getLong(4) - byClass("changed").getLong(3)
      == 100L * changed)
  }

  test("x26's quantized centi-ln is exact below 512 and within the 9-bit bound above") {
    val ns = (1L to 512L) ++ Seq(513L, 964L, 4093L, 4094L, 9182L, 1000000L,
      123456789L, 987654321012L)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(ns.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tf",
          org.apache.spark.sql.types.LongType))))
    val got = df
      .withColumn("ln4q", lit(TextAnalysis.LnCenti))
      .withColumn("y", expr(TextAnalysis.lnCentiQ(
        "tf", e => s"element_at(ln4q, CAST($e AS INT))", "div")))
      .select("tf", "y").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n =>
      val err = math.abs(got(n) / 1e4 - math.log(n.toDouble))
      val bound = if (n <= 512) 5.1e-5 else math.log1p(1.0 / 256) + 5.1e-5
      assert(err <= bound, s"lnq($n) err $err > bound $bound")
    }
  }
}
