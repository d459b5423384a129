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

  test("q79 distribution ranks are closed-form exact on a planted segment") {
    val rows = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0),
      (4L, "A", 40.0))
    val out = Windows.q79.fn(spark, writeCustomers(rows)).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getInt(5))))
      .toMap
    assert(out(1L) == ((0.0, 0.25, 1)))
    assert(out(2L) == ((1.0 / 3.0, 0.5, 2)))
    assert(out(3L) == ((2.0 / 3.0, 0.75, 3)))
    assert(out(4L) == ((1.0, 1.0, 4)))
  }

  test("q79 corpus invariants: pct_rank/cume in [0,1], monotone with balance per segment") {
    val sf = "/root/testdata/sf0.001"
    val rows = Windows.q79.fn(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getLong(0),
        r.getDouble(3), r.getDouble(4), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, seg) =>
      val sorted = seg.sortBy(t => (t._2, t._3))
      // ranks strictly increase along the segment's total order
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq)
      assert(sorted.map(_._5).toSeq == sorted.map(_._5).sorted.toSeq)
      assert(sorted.head._4 == 0.0 && sorted.last._4 == 1.0)
      assert(sorted.last._5 == 1.0)
      assert(seg.forall(t => t._6 >= 1 && t._6 <= 10))
    }
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
