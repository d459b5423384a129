package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch (q45): the classic one-sided guarantee, partition
  * invariance of the merge, and that collisions are actually live at
  * the chosen width (otherwise the operator demonstrates nothing).
  */
class CountMinSpec extends SparkSpec {

  test("est >= true for every key, and collisions are live at W=64") {
    val out = graft.operators.Aggregates.q45.fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS underestimated key ${r.getLong(0)}: est ${r.getLong(2)} < true ${r.getLong(1)}")
    }
    // 200 distinct partkeys into 64 buckets per row: some key must
    // show an over-count or the sketch is degenerate
    assert(out.exists(r => r.getLong(2) > r.getLong(1)))
  }

  test("sketch is partition-order invariant (merge is a plain sum)") {
    import spark.implicits._
    val keys = (1L to 500L).map(k => k % 37)
    val one = keys.toDS().repartition(1).agg(CountMinAgg.cms(col("value")))
      .head.getSeq[Long](0)
    val many = keys.toDS().repartition(7).agg(CountMinAgg.cms(col("value")))
      .head.getSeq[Long](0)
    assert(one == many)
    // every row of the sketch sums to the total ingested count
    (0 until CountMinAgg.D).foreach { j =>
      assert(one.slice(j * CountMinAgg.W, (j + 1) * CountMinAgg.W).sum == keys.size.toLong)
    }
  }
}
