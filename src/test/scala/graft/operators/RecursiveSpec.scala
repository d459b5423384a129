package graft.operators

import graft.SparkSpec

/** q78 native WITH RECURSIVE: agreement with q46's distributed
  * pointer-doubling closure over the same synthetic forest, and the
  * rollup identities.
  */
class RecursiveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q78 per-root rollup equals an aggregation of q46's closure rows") {
    val q46 = graft.Registry.byName("q46_tree_closure").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byRoot = q46.groupBy(_._2)
    val q78 = graft.Registry.byName("q78_recursive_cte").fn(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(q78.keySet == byRoot.keySet)
    byRoot.foreach { case (root, rows) =>
      assert(q78(root)._1 == rows.length, s"root $root node count drifted")
      assert(q78(root)._2 == rows.map(_._3).max, s"root $root depth drifted")
    }
    // every part key is in exactly one subtree
    val nParts = graft.Tables.part(spark, dir).count()
    assert(byRoot.values.map(_.length.toLong).sum == nParts)
  }

  test("q78 pins the recursion depth guard on the session it runs in") {
    graft.Registry.byName("q78_recursive_cte").fn(spark, dir).count()
    assert(spark.conf.get("spark.sql.cteRecursionLevelLimit") ==
      Relational.RecursionDepthGuard.toString)
  }

  test("q78 cliff: a chain deeper than the guard FAILS FAST, not grinds") {
    // a pure chain is the pathological hierarchy the scaladoc
    // documents: depth = N, one sequential join round per level —
    // the guard must turn it into a fast error
    spark.conf.set("spark.sql.cteRecursionLevelLimit",
      Relational.RecursionDepthGuard.toString)
    val chain =
      s"""WITH RECURSIVE c AS (
        SELECT CAST(0 AS BIGINT) AS n
        UNION ALL
        SELECT n + 1 FROM c
        WHERE n < ${Relational.RecursionDepthGuard * 3})
      SELECT count(*) FROM c"""
    val e = intercept[Exception](spark.sql(chain).collect())
    assert(e.getMessage.toLowerCase.contains("recursion"),
      s"expected a recursion-limit error, got: ${e.getMessage.take(200)}")
  }

  test("q78 plan at sf0.1 stays UnionLoop with broadcast-shaped legs") {
    // plan-only (never executed): the recursive leg must not regress
    // to a shuffled SortMergeJoin per level — at one join PER DEPTH
    // LEVEL a per-round exchange would multiply the cliff
    val p = graft.Registry.byName("q78_recursive_cte")
      .fn(spark, "/root/testdata/sf0.1").queryExecution.executedPlan.toString
    assert(p.contains("UnionLoop"), "native recursion must plan as UnionLoop")
    assert(!p.contains("SortMergeJoin"),
      "recursive leg regressed to a per-level shuffle join")
  }
}
