package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K1c bucketed-table sink: the archive's storage-layout contract.
  * Writing both fact tables bucketed on the join key must (a) record
  * the bucket spec in the catalog, (b) plan every equi-join on that
  * key WITHOUT any Exchange — the scans themselves report the hash
  * partitioning — and (c) never change a value relative to the raw
  * parquet join. (a)+(b) are the 100 TB story: the one-time layout
  * cost at write buys shuffle-free fact joins forever after.
  */
class BucketedArchiveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def engine = new Engine(spark)

  test("bucketed archive joins exchange-free on the bucket key") {
    engine.archiveBucketed(
      graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice"),
      "bas_lineitem", "l_orderkey", 4)
    engine.archiveBucketed(
      graft.Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority"),
      "bas_orders", "o_orderkey", 4)

    // the catalog really carries the layout
    val meta = spark.sql("DESCRIBE FORMATTED bas_lineitem")
      .collect().map(_.toSeq.mkString(" ")).mkString("\n")
    assert(meta.contains("Num Buckets"), meta)
    assert(meta.linesIterator.exists(l => l.contains("Num Buckets") && l.contains("4")), meta)

    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = confs.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach(spark.conf.set(_, "-1"))
    try {
      val j = spark.table("bas_lineitem")
        .join(spark.table("bas_orders"), col("l_orderkey") === col("o_orderkey"))
      val n = j.count()
      j.collect() // finalize the adaptive plan
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(2000)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(2000)}")
      // layout changes nothing about the values
      val raw = graft.Tables.lineitem(spark, sf)
        .join(graft.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n == raw && n > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("row formats and degenerate bucket counts are rejected") {
    val df = graft.Tables.lineitem(spark, sf).select("l_orderkey")
    val e = intercept[ArchiveException] {
      engine.archiveBucketed(df, "bas_bad", "l_orderkey", 4,
        _.copy(format = Format.Yaml))
    }
    assert(e.getMessage.contains("columnar"))
    intercept[IllegalArgumentException] {
      engine.archiveBucketed(df, "bas_bad", "l_orderkey", 0)
    }
  }

  test("q37's layout memo re-lays-out when the source dir changes mid-catalog") {
    import graft.operators.Relational
    val small = Relational.q37.fn(spark, "/root/testdata/sf0.001").collect()
    // repeat WITHOUT a dir change: layout reused (no rewrite), same rows
    val smallRepeat = Relational.q37.fn(spark, "/root/testdata/sf0.001").collect()
    assert(small.toSeq == smallRepeat.toSeq)
    val big = Relational.q37.fn(spark, "/root/testdata/sf0.01").collect()
    assert(big.map(_.getLong(1)).sum > small.map(_.getLong(1)).sum)
    // switching back must NOT reuse the sf0.01 tables
    val smallBack = Relational.q37.fn(spark, "/root/testdata/sf0.001").collect()
    assert(small.toSeq == smallBack.toSeq)
  }
}
