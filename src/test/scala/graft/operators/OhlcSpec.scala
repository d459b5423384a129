package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** e15 OHLC bars: the semantic subtlety is the tie-break — open/close
  * must be chosen by the TOTAL key (ts, event_id), so same-timestamp
  * events resolve deterministically under any partitioning.
  */
class OhlcSpec extends SparkSpec {

  test("e15 picks open/close by (ts, event_id) with same-microsecond ties") {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-ohlc").toString
    // one hour-bar for type "t": open tie at t=0 between event_id 1
    // and 2 (id 1 must win), close tie at t=100 between 5 and 6 (id 6
    // must win); extremes live mid-bar
    val rows = Seq(
      (1L, 0L, 10.0), (2L, 0L, 20.0),
      (3L, 50L, -7.0), (4L, 60L, 99.0),
      (5L, 100L, 30.0), (6L, 100L, 40.0))
    rows.map { case (id, us, v) =>
      (id, java.time.Instant.ofEpochSecond(0, us * 1000), 1L, "t", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    val out = EventWindows.e15.fn(spark, dst).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 0L && r.getString(1) == "t")
    assert(r.getDouble(2) == 10.0, s"open must be the LOWER event_id: $r")
    assert(r.getDouble(3) == 99.0 && r.getDouble(4) == -7.0)
    assert(r.getDouble(5) == 40.0, s"close must be the HIGHER event_id: $r")
    assert(r.getLong(6) == 6L)
  }
}
