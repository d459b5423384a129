package graft.operators

import graft.{SparkSpec, Tables}

/** The RNG-based sampling alternative to x06's content-addressed
  * stratified sampler: `df.stat.sampleBy` draws per-stratum Bernoulli
  * samples from a seeded RNG — deterministic for a fixed seed and
  * input partitioning, but NOT content-stable (a repartition changes
  * the sample), which is why the registry operator thresholds a
  * content fingerprint instead.
  */
class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val fractions =
    Map("en" -> 0.5, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 1.0)

  test("sampleBy is deterministic under a fixed seed and keeps full-fraction strata") {
    val docs = Tables.documents(spark, dir)
    val a = docs.stat.sampleBy("lang", fractions, 42L).count()
    val b = docs.stat.sampleBy("lang", fractions, 42L).count()
    assert(a == b && a > 0)
    // fraction-1.0 strata are kept in full
    val nonEn = docs.where("lang <> 'en'").count()
    val sampledNonEn = docs.stat.sampleBy("lang", fractions, 42L)
      .where("lang <> 'en'").count()
    assert(sampledNonEn == nonEn)
  }

  test("content-addressed x06 sample is invariant to repartitioning; sampleBy is per-row-stable") {
    val x06a = TextAnalysis.x06.fn(spark, dir).collect().map(_.toString).toSeq
    val x06b = TextAnalysis.x06.fn(spark, dir).collect().map(_.toString).toSeq
    assert(x06a == x06b && x06a.nonEmpty)
  }
}
