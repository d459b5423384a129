package graft.operators

import graft.SparkSpec

/** e29 funnel time-to-convert: first-click anchoring, the at-or-after
  * rule, lower-median/p90 rank selection, and the zero-converter edge.
  */
class TimeToConvertSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-ttc").toString
    rows.map { case (id, us, uid, tpe) =>
      (id, java.time.Instant.ofEpochSecond(0, us * 1000), uid, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    dst
  }

  test("e29 anchors on the FIRST click, ignores purchases before it, selects lower ranks") {
    var id = 0L
    def ev(uid: Long, us: Long, tpe: String) = { id += 1; (id, us, uid, tpe) }
    val rows = Seq(
      // user 1: purchase BEFORE any click (ignored), click at 100,
      // purchase at 150 -> latency 50
      ev(1, 50, "purchase"), ev(1, 100, "click"), ev(1, 150, "purchase"),
      // user 2: two clicks; the FIRST (200) anchors; purchase 260 -> 60
      ev(2, 200, "click"), ev(2, 240, "click"), ev(2, 260, "purchase"),
      // user 3: click at 300, purchase at the SAME instant -> 0 (>= rule)
      ev(3, 300, "click"), ev(3, 300, "purchase"),
      // user 4: clicks but never converts
      ev(4, 400, "click"),
      // user 5: converts at 999 latency -> the max and the p90 pick
      ev(5, 1, "click"), ev(5, 1000, "purchase"))
    val r = EventWindows.e29.fn(spark, writeEvents(rows)).head()
    // latencies sorted: (0, 50, 60, 999); n=4: med rank (4+1)/2=2 -> 50,
    // p90 rank (36+9)/10=4 -> 999
    assert(r.getLong(0) == 5 && r.getLong(1) == 4)
    assert(r.getLong(2) == 50 && r.getLong(3) == 999 && r.getLong(4) == 999)
  }

  test("e29 zero converters reads zeros, not nulls or a crash") {
    val rows = Seq((1L, 10L, 1L, "click"), (2L, 20L, 2L, "view"))
    val r = EventWindows.e29.fn(spark, writeEvents(rows)).head()
    assert(r.getLong(0) == 1 && r.getLong(1) == 0 &&
      r.getLong(2) == 0 && r.getLong(3) == 0 && r.getLong(4) == 0)
  }
}
