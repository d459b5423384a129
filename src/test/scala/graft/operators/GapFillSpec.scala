package graft.operators

import graft.SparkSpec

/** Semantic invariants for e10 (interpolated gap fill) beyond the
  * value-hash oracle: grid density, class accounting, and the
  * betweenness property of linear interpolation.
  */
class GapFillSpec extends SparkSpec {

  test("e10: dense grid, gaps interpolate strictly between neighbors") {
    val rows = EventWindows.e10.fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // grid is dense: consecutive windows exactly 10 minutes apart
    rows.map(_._1).sliding(2).foreach {
      case Array(a, b) => assert(b - a == 600000000L)
      case _ =>
    }
    // the sparse series exercises both classes at this SF
    val bySrc = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("actual", 0) > 0)
    assert(bySrc.getOrElse("interp", 0) > 0)
    // min/max grid bounds come from real windows → no edge rows here
    assert(rows.head._2 == "actual" && rows.last._2 == "actual")
    assert(!bySrc.contains("edge"))
    // every interpolated value lies between its nearest real neighbors
    val actuals = rows.zipWithIndex.filter(_._1._2 == "actual").map(_._2)
    rows.zipWithIndex.filter(_._1._2 == "interp").foreach { case ((_, _, v), i) =>
      val lo = actuals.filter(_ < i).last
      val hi = actuals.filter(_ > i).head
      val (a, b) = (rows(lo)._3, rows(hi)._3)
      assert(v >= math.min(a, b) && v <= math.max(a, b), s"row $i")
    }
  }
}
