package graft.operators

import graft.SparkSpec

/** q77 max_by/min_by: the struct-tiebreak discipline under genuine
  * ties, and agreement with the window formulation on the corpus.
  */
class ArgExtremumSpec extends SparkSpec {

  private def writeCustomers(rows: Seq[(Long, String, Double)]): String = {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-argmax").toString
    rows.map { case (k, seg, bal) => (k, s"Customer#$k", 1, bal, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dst/customer.parquet")
    dst
  }

  test("q77 ties resolve to the LOWEST custkey on both extremes") {
    // segment A: two customers tie at the top (keys 5, 3 -> pick 3)
    // and two tie at the bottom (keys 9, 7 -> pick 7)
    val rows = Seq(
      (5L, "A", 100.0), (3L, "A", 100.0),
      (9L, "A", -50.0), (7L, "A", -50.0),
      (1L, "B", 0.0))
    val out = Aggregates.q77.fn(spark, writeCustomers(rows)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out("A") == ((4L, 3L, 100.0, 7L, -50.0)))
    assert(out("B") == ((1L, 1L, 0.0, 1L, 0.0)))
  }

  test("q77 aggregate form agrees with an independent window replay on the corpus") {
    val sf = "/root/testdata/sf0.001"
    val agg = Aggregates.q77.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    val rows = graft.Tables.customer(spark, sf)
      .select("c_mktsegment", "c_custkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    assert(agg.keySet == rows.keySet)
    rows.foreach { case (seg, cs) =>
      val top = cs.minBy(c => (-c._3, c._2))._2
      val bottom = cs.minBy(c => (c._3, c._2))._2
      assert(agg(seg) == ((top, bottom)), s"segment $seg drifted")
    }
  }
}
