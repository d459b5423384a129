package graft

/** Pins the cache-lifetime contract documented on [[QueryDef]]: entry
  * functions may cache multi-consumer intermediates, and ONE
  * `clearCache()` (what Bench/Verify run before every entry) releases
  * everything — so per-entry caches can never leak work or memory
  * into a later entry's measurement, and a library user has a single
  * documented release point.
  */
class CacheScopeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cache-using entries register caches; one clearCache releases them all") {
    spark.sharedState.cacheManager.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty, "precondition: no caches")
    // entries documented as caching intermediates: q83 (val view),
    // x25 (distinct-token + (source,tok) frames), c07 (pair table)
    for (n <- Seq("q83_important_stock", "x25_nb_domain", "c07_crossmodal_pairs")) {
      Registry.byName(n).fn(spark, dir).count()
    }
    assert(!spark.sharedState.cacheManager.isEmpty,
      "expected the entries to have registered cached intermediates")
    spark.sharedState.cacheManager.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty,
      "one clearCache must release every entry-level cache")
  }
}
