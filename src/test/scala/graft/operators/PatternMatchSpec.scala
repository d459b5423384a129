package graft.operators

import graft.SparkSpec

/** e17 row-pattern detection: the semantic content is CONTIGUITY
  * (`V+ C P` with no interposed events — unlike e11's subsequence
  * funnel), maximal-run view counting, and non-overlap of matches.
  */
class PatternMatchSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft-pattern").toString
    rows.map { case (id, us, uid, tpe) =>
      (id, java.time.Instant.ofEpochSecond(0, us * 1000), uid, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    dst
  }

  test("e17 matches exactly the contiguous view+ click purchase runs") {
    var id = 0L
    def ev(uid: Long, us: Long, t: String): (Long, Long, Long, String) = {
      id += 1; (id, us, uid, t)
    }
    val rows = Seq(
      // user 1: V V C P → one match, n_views = 2, span [10, 40]
      ev(1, 10, "view"), ev(1, 20, "view"), ev(1, 30, "click"), ev(1, 40, "purchase"),
      // user 2: V C V P → NO match (purchase not preceded by click)
      ev(2, 10, "view"), ev(2, 20, "click"), ev(2, 30, "view"), ev(2, 40, "purchase"),
      // user 3: V error C P → NO match (contiguity broken before click)
      ev(3, 10, "view"), ev(3, 20, "error"), ev(3, 30, "click"), ev(3, 40, "purchase"),
      // user 4: two back-to-back matches, runs of 1 and 3 views
      ev(4, 10, "view"), ev(4, 20, "click"), ev(4, 30, "purchase"),
      ev(4, 40, "view"), ev(4, 50, "view"), ev(4, 60, "view"),
      ev(4, 70, "click"), ev(4, 80, "purchase"),
      // user 5: C P with no view → NO match
      ev(5, 10, "click"), ev(5, 20, "purchase"))
    val out = EventWindows.e17.fn(spark, writeEvents(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 10L, 40L, 2L, 4L),
      (4L, 10L, 30L, 1L, 3L),
      (4L, 40L, 80L, 3L, 5L)),
      s"got ${out.toSeq}")
  }

  test("e17 differs from e11 exactly on contiguity: an interposed event kills the match") {
    // user 3 above IS an e11-style funnel completion (view ≺ click ≺
    // purchase as a subsequence) but NOT an e17 match — pin the
    // distinction on the operator the registry ships
    var id = 0L
    def ev(uid: Long, us: Long, t: String): (Long, Long, Long, String) = {
      id += 1; (id, us, uid, t)
    }
    val rows = Seq(
      ev(1, 10, "view"), ev(1, 20, "error"), ev(1, 30, "click"), ev(1, 40, "purchase"))
    val out = EventWindows.e17.fn(spark, writeEvents(rows)).collect()
    assert(out.isEmpty, "interposed event must break the contiguous pattern")
  }
}
