package graft.operators

import graft.SparkSpec

/** e18 rolling z-score: trailing-frame semantics (current row
  * excluded), full-window warm-up, the cross-multiplied integer test,
  * and the zero-variance edge.
  */
class RollingZscoreSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, Long, Long, Double)]): String = {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-zscore").toString
    rows.map { case (id, us, uid, v) =>
      (id, java.time.Instant.ofEpochSecond(0, us * 1000), uid, "metric", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    dst
  }

  test("e18 flags a spike after warm-up and never inside it") {
    var id = 0L
    def ev(uid: Long, v: Double): (Long, Long, Long, Double) = {
      id += 1; (id, id * 10, uid, v)
    }
    // user 1: 20 alternating baseline values (mean 150, sd ~5 cents
    // scale), then a huge spike, then a normal value
    val baseline = (1 to 20).map(i => ev(1, if (i % 2 == 0) 1.40 else 1.60))
    val spike = Seq(ev(1, 50.0), ev(1, 1.50))
    val out = EventWindows.e18.fn(spark, writeEvents(baseline ++ spike)).collect()
    // only the spike row is flagged: rows 1..20 lack a full window;
    // row 22 (1.50) sits within 3 sd of the window that now contains
    // the spike? spike pulls mean to ~3.8 and sd up massively, so no.
    assert(out.map(_.getLong(0)).toSeq == Seq(21L), s"got ${out.toSeq}")
  }

  test("e18 zero-variance window flags any deviation (z = infinity)") {
    var id = 0L
    def ev(uid: Long, v: Double): (Long, Long, Long, Double) = {
      id += 1; (id, id * 10, uid, v)
    }
    val rows = (1 to 20).map(_ => ev(7, 2.00)) ++ Seq(ev(7, 2.01), ev(7, 2.00))
    val out = EventWindows.e18.fn(spark, writeEvents(rows)).collect()
    // 2.01 deviates from a constant window → flagged; the trailing
    // 2.00 equals 19 of its 20 predecessors but not the 2.01 → its
    // window has nonzero variance and |z| < 3 → NOT flagged
    assert(out.map(_.getLong(0)).toSeq == Seq(21L), s"got ${out.toSeq}")
  }

  test("e18 partitions by user: a hot neighbor never leaks into the frame") {
    var id = 0L
    def ev(uid: Long, v: Double): (Long, Long, Long, Double) = {
      id += 1; (id, id * 10, uid, v)
    }
    // interleave a wild user 2 with a flat user 1; user 1's final row
    // is unflagged because ITS window is user-1-only
    val rows = (1 to 20).flatMap(i =>
      Seq(ev(1, if (i % 2 == 0) 1.40 else 1.60), ev(2, i * 100.0))) ++
      Seq(ev(1, 1.50))
    val out = EventWindows.e18.fn(spark, writeEvents(rows)).collect()
    assert(!out.map(_.getLong(0)).contains(id), s"got ${out.toSeq}")
  }
}
