package graft.operators

import graft.SparkSpec

/** Structural invariants for q44 (SCD-2 history) and x16 (temperature
  * mixture) that the value-hash oracle can't state directly: interval
  * chaining / current-row uniqueness for the history, and quota
  * arithmetic / no-upsampling for the mixture.
  */
class Scd2MixtureSpec extends SparkSpec {

  test("q44: versions chain into a partition of each key's history") {
    val rows = Relational.q44.fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getString(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (key, vs) =>
      val sorted = vs.sortBy(_._2)
      // version numbers are contiguous from 1
      assert(sorted.map(_._2).toSeq == (1L to vs.length).toSeq, s"key $key")
      // each version closes exactly where the next opens; only the
      // last stays open
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3), s"key $key gap at v${a._2}")
        case _ =>
      }
      assert(sorted.init.forall(_._4.isDefined) && sorted.last._4.isEmpty, s"key $key")
      // at most one current version, and only if the open one isn't a delete
      val current = vs.filter(_._6)
      assert(current.length == (if (sorted.last._5 != "D") 1 else 0), s"key $key")
      assert(current.forall(c => c._2 == sorted.last._2), s"key $key")
    }
  }

  test("x16: quotas follow the temperature weights; sampling never upsamples") {
    val rows = TextAnalysis.x16.fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val wsum = rows.map(_._3).sum
    rows.foreach { case (lang, nDocs, wt, quota, nSampled) =>
      assert(wt == math.floor(math.sqrt(nDocs.toDouble)).toLong, lang)
      assert(quota == (total / 2) * wt / wsum, lang)
      // selection fills the quota exactly when possible, caps at the
      // domain size otherwise — never repeats documents
      assert(nSampled == math.min(quota, nDocs), lang)
    }
    // the resample budget is respected overall
    assert(rows.map(_._5).sum <= total / 2)
  }
}
