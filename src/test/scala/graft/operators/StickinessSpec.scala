package graft.operators

import graft.SparkSpec

/** e28 DAU/WAU: trailing-7-day window semantics, distinctness across
  * repeat events, and the stickiness bounds.
  */
class StickinessSpec extends SparkSpec {

  private val DayUs = 86400000000L

  private def writeEvents(rows: Seq[(Long, Long, Long)]): String = {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-stick").toString
    rows.map { case (id, us, uid) =>
      (id, java.time.Instant.ofEpochSecond(0, us * 1000), uid, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    dst
  }

  test("e28 trailing window is 7 days inclusive; repeats never double-count") {
    // day 0: users 1,2 (user 1 twice — distinctness), day 1: user 3,
    // day 7: user 1. Day 7's trailing window is [day1..day7]: it sees
    // day 1's user 3 and its own user 1 (day 0 fell out) -> wau 2.
    val rows = Seq(
      (1L, 0L * DayUs + 100, 1L), (2L, 0L * DayUs + 200, 1L),
      (3L, 0L * DayUs + 300, 2L),
      (4L, 1L * DayUs + 100, 3L),
      (5L, 7L * DayUs + 100, 1L))
    val out = EventWindows.e28.fn(spark, writeEvents(rows)).collect()
      .map(r => r.getLong(0) / DayUs -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(0L) == ((2L, 2L, 1.0)))
    assert(out(1L) == ((1L, 3L, 1.0 / 3.0)))
    assert(out(7L) == ((1L, 2L, 0.5)))
    assert(out.size == 3)
  }

  test("e28 corpus rows hold the invariants: dau <= wau, stickiness in (1/7, 1]") {
    val out = EventWindows.e28.fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (dau, wau, st) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dau >= 1 && dau <= wau)
      assert(st > 0.0 && st <= 1.0)
      assert(st == dau.toDouble / wau)
    }
    // days are distinct and sorted
    val days = out.map(_.getLong(0)).toSeq
    assert(days == days.sorted && days.distinct == days)
  }
}
