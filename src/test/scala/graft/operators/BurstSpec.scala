package graft.operators

import graft.SparkSpec

/** e25 burst detection: the exact-integer 3σ test on closed-form hour
  * counts, the single-outlier bound (an outlier inflates its own σ —
  * max deviation is (n−1)/√n σ, so small-n users can NEVER flag), the
  * zero-variance user, and the n = 1 exclusion.
  */
class BurstSpec extends SparkSpec {

  private def flags(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    EventWindows.burstFlags(rows.toDF("user_id", "hour_us", "cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("a spike among many quiet hours flags; the same spike among few cannot") {
    // user 1: fifteen 1-count hours + one 10-count hour.
    // S = 25, Q = 115, n = 16: dev = 160−25 = 135, dev² = 18225 >
    // 9·(16·115 − 625) = 10935 → flagged (and ONLY the spike).
    val many = (0L until 15L).map(h => (1L, h * 3600000000L, 1L)) :+
      (1L, 15L * 3600000000L, 10L)
    assert(flags(many) == Seq((1L, 15L * 3600000000L, 10L)))
    // user 2: the SAME 10-count spike among only three quiet hours —
    // with n = 4 a single outlier can reach at most (n−1)/√n ≈ 1.5σ
    // of the distribution it itself inflates, so nothing may flag.
    val few = (0L until 3L).map(h => (2L, h * 3600000000L, 1L)) :+
      (2L, 3L * 3600000000L, 10L)
    assert(flags(few).isEmpty,
      "a 4-hour user must never flag: the outlier inflates its own σ")
  }

  test("zero-variance and single-hour users never flag") {
    // flat activity: dev = 0 for every hour
    val flat = (0L until 5L).map(h => (3L, h * 3600000000L, 2L))
    assert(flags(flat).isEmpty)
    // one active hour: no variance to test (n < 2 excluded by contract)
    assert(flags(Seq((4L, 0L, 100L))).isEmpty)
  }

  test("corpus flags satisfy the exact predicate against their own stats") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.Registry.byName("e25_burst_detect").fn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (cnt, n, mean) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(n >= 2)
      assert(cnt > mean, s"flagged hour must sit above the user mean: $r")
    }
  }
}
