package graft.operators

import graft.SparkSpec

/** q46 (pointer-doubling hierarchy closure) against an independent
  * driver-side reference: the parent function is pure arithmetic, so
  * the expected (root, depth) of every node is a sequential chain
  * walk — the O(depth)-per-node formulation the distributed loop must
  * match exactly.
  */
class TreeClosureSpec extends SparkSpec {

  private def parent(k: Long): Long = 1 + (k * 2654435761L) % (k - 1)

  private def walk(k: Long): (Long, Long) = {
    var node = k
    var depth = 0L
    while (node > 5) { node = parent(node); depth += 1 }
    (node, depth)
  }

  test("q46: every node's (root, depth) equals the sequential chain walk") {
    val rows = Relational.q46.fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (node, root, depth) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (expRoot, expDepth) = walk(node)
      assert(root == expRoot, s"node $node root")
      assert(depth == expDepth, s"node $node depth")
      assert(root <= 5, s"node $node resolved to a non-root")
    }
    // the forest must be deep enough that the loop actually doubles
    // (depth ≥ 4 ⇒ at least 2 composition rounds beyond the init map)
    assert(rows.map(_.getLong(2)).max >= 4, "synthetic forest too shallow to exercise doubling")
  }
}
