package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** e24 on data that HAS a cycle — the driver corpus is uniform
  * (|r| ≤ 0.11 everywhere, the honest null), so the detector's
  * positive face is pinned here on a synthetic strictly-24h-periodic
  * event stream: the lag-24 autocorrelation must read ≈ 1 and the
  * half-period lag-12 must read strongly negative (business-hours
  * pattern anti-correlates with its 12 h shift).
  */
class PeriodicitySpec extends SparkSpec {

  test("a strictly daily pattern reads r(24) ≈ 1 and r(12) < 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-e24").toString
    // 14 days of hourly events: 9 per business hour (8-17), 2 otherwise
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    val rows = for {
      day <- 0 until 14
      hour <- 0 until 24
      n = if (hour >= 8 && hour < 18) 9 else 2
      i <- 0 until n
    } yield {
      val ts = java.sql.Timestamp.from(
        base.plusSeconds(day * 86400L + hour * 3600L + i * 60L))
      ((day * 24L + hour) * 16 + i, ts, i.toLong, "click", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val r = EventWindows.e24.fn(spark, dir).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(4)).toMap
    val r24 = r(("click", 24L))
    val r12 = r(("click", 12L))
    assert(r24 > 0.9, s"daily cycle not detected: r(24) = $r24")
    assert(r12 < -0.5, s"half-period must anti-correlate: r(12) = $r12")
    // short lags sit between: the pattern is a square wave, so lag-1
    // correlation is high but below the full-period echo
    assert(r(("click", 1L)) > 0.5 && r(("click", 1L)) < r24)
  }
}
