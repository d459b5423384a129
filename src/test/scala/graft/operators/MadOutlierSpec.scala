package graft.operators

import graft.SparkSpec

/** e27 median/MAD robust outliers: lower-median selection (never
  * interpolated), exact integer MAD, the cross-multiplied flag, the
  * zero-MAD edge, and per-type isolation.
  */
class MadOutlierSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, String, Double)]): String = {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-mad").toString
    rows.zipWithIndex.map { case ((id, tpe, v), i) =>
      (id, java.time.Instant.ofEpochSecond(0, (i + 1) * 10000L), 1L, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    dst
  }

  test("e27 flags the spike a constant baseline isolates; MAD 0 flags any deviation") {
    // ten 2.00s and one 9.99: med = 200 cents, every deviation 0 except
    // the spike's 799 -> MAD = 0, so ANY nonzero deviation flags
    val rows = (1L to 10L).map(i => (i, "m", 2.00)) :+ ((11L, "m", 9.99))
    val out = EventWindows.e27.fn(spark, writeEvents(rows)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "m" && r.getLong(1) == 11 &&
      r.getLong(2) == 200 && r.getLong(3) == 0 && r.getLong(4) == 1)
  }

  test("e27 even count selects the LOWER median, never interpolates") {
    // cents (100, 200, 300, 1000): lower median = 200 (interpolation
    // would give 250); deviations (100, 0, 100, 800) -> lower MAD =
    // 100; flag needs ad > 444.78 -> only the 800
    val rows = Seq((1L, "m", 1.00), (2L, "m", 2.00), (3L, "m", 3.00),
      (4L, "m", 10.00))
    val r = EventWindows.e27.fn(spark, writeEvents(rows)).head()
    assert(r.getLong(1) == 4 && r.getLong(2) == 200 && r.getLong(3) == 100 &&
      r.getLong(4) == 1)
  }

  test("e27 types are independent: a clean type reports zero outliers beside a dirty one") {
    val clean = (1L to 5L).map(i => (i, "clean", 3.00))
    val dirty = (6L to 15L).map(i => (i, "dirty", 2.00)) :+ ((16L, "dirty", 99.0))
    val out = EventWindows.e27.fn(spark, writeEvents(clean ++ dirty)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out("clean") == ((5L, 300L, 0L, 0L)))
    assert(out("dirty") == ((11L, 200L, 0L, 1L)))
    // output is ordered by event_type
    val types = EventWindows.e27.fn(spark, writeEvents(clean ++ dirty))
      .collect().map(_.getString(0)).toSeq
    assert(types == types.sorted)
  }
}
