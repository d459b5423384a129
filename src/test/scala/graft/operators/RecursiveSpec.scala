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
}
