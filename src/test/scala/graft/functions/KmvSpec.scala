package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV theta-family sketch (q47): bounded-buffer invariants, the
  * exact-below-K contract, merge/partitioning invariance (the
  * property that makes the DuckDB oracle able to replay a
  * distributed aggregation), and the estimator's accuracy band.
  */
class KmvSpec extends SparkSpec {
  import KmvAgg.{Dom, K}

  private def sketchOf(keys: Seq[Long]): Array[Long] = {
    val agg = new KmvAgg
    keys.foldLeft(agg.zero)((b, k) => agg.reduce(b, k)) match {
      case b => agg.finish(b)
    }
  }

  private def estimate(ret: Array[Long]): Long =
    if (ret.length < K) ret.length.toLong
    else {
      val th = math.max(ret.last, 1L)
      (Dom / th) * (K - 1) + ((Dom % th) * (K - 1)) / th
    }

  test("below K the sketch IS the distinct set (exact estimates)") {
    val keys = (1L to 40L) ++ (1L to 40L) // duplicates must collapse
    val ret = sketchOf(keys)
    assert(ret.length == 40)
    assert(ret.sorted.sameElements(ret), "retained set must be ascending")
    assert(ret.toSet == (1L to 40L).map(KmvAgg.hash).toSet)
    assert(estimate(ret) == 40L)
  }

  test("buffer is bounded at K and keeps exactly the K smallest hashes") {
    val keys = (1L to 5000L)
    val ret = sketchOf(keys)
    assert(ret.length == K)
    val expected = keys.map(KmvAgg.hash).distinct.sorted.take(K)
    assert(ret.toSeq == expected)
  }

  test("merge equals single-pass reduce in any split and order") {
    val agg = new KmvAgg
    val keys = (1L to 1000L).map(k => k * 7919L)
    val whole = sketchOf(keys)
    Seq(1, 3, 128).foreach { parts =>
      val chunks = keys.grouped(math.max(1, keys.length / parts)).toSeq
      val merged = chunks.reverse // merge in reversed chunk order too
        .map(c => c.foldLeft(agg.zero)((b, k) => agg.reduce(b, k)))
        .reduce((a, b) => agg.merge(a, b))
      assert(agg.finish(merged).toSeq == whole.toSeq, s"parts=$parts")
    }
  }

  test("estimator lands inside the theta-standard accuracy band") {
    // 1/sqrt(K-2) ~ 12.7% standard error; assert a 3-sigma band so
    // the test pins accuracy without being flaky (the data and hash
    // are deterministic, so this is really a one-shot draw check)
    Seq(500L, 5000L, 50000L).foreach { n =>
      val est = estimate(sketchOf(1L to n))
      assert(math.abs(est - n).toDouble / n < 0.38, s"n=$n est=$est")
    }
  }

  test("distributed aggregation is partitioning-invariant") {
    import spark.implicits._
    val ds = (1L to 20000L).toDS().toDF("key")
    val results = Seq(1, 7, 32).map { p =>
      ds.repartition(p).agg(KmvAgg.kmv(col("key")).as("ret"))
        .head.getSeq[Long](0).toSeq
    }
    assert(results.distinct.size == 1, "sketch must not depend on partitioning")
    assert(results.head.length == K)
  }
}
