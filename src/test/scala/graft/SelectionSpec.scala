package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SPARK_GRAFT_ONLY dev filter shared by Bench/Verify: narrows to
  * known entries, fails fast on typos (a misspelled name must never
  * "succeed" as an empty run that then overwrites a snapshot).
  */
class SelectionSpec extends AnyFunSuite {

  test("no filter = the full registry plus all extra entries") {
    val (qs, extra) = SparkEntry.selected(None, Set("archive_x"))
    assert(qs.keySet == SparkEntry.queries.keySet)
    assert(extra == Set("archive_x"))
  }

  test("a filter narrows queries and extras by name") {
    val (qs, extra) =
      SparkEntry.selected(Some("q01_agg, archive_x"), Set("archive_x", "archive_y"))
    assert(qs.keySet == Set("q01_agg"))
    assert(extra == Set("archive_x"))
  }

  test("unknown names fail fast instead of selecting nothing") {
    val e = intercept[IllegalArgumentException] {
      SparkEntry.selected(Some("q01_agg,q99_typo"), Set.empty)
    }
    assert(e.getMessage.contains("q99_typo"))
  }

  test("a set-but-empty filter fails fast instead of running nothing") {
    for (junk <- Seq("", "  ", ",", " , ,")) {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.selected(Some(junk), Set("archive_x"))
      }
      assert(e.getMessage.contains("SPARK_GRAFT_ONLY"))
    }
  }
}
