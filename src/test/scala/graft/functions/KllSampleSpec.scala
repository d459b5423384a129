package graft.functions

import graft.SparkSpec

/** KLL-style level sampler: exactness below capacity, the
  * L = min{ℓ : |g ≥ ℓ| ≤ K} identity, merge-order invariance, and the
  * rank-error band once the sketch path engages.
  */
class KllSampleSpec extends SparkSpec {
  import KllSampleAgg.{GCap, K}

  private def run(items: Seq[(Long, Long)], splits: Int = 1): Array[Long] = {
    val agg = new KllSampleAgg
    val parts = items.grouped(math.max(1, items.size / splits)).toSeq
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    agg.finish(bufs.reduce(agg.merge))
  }

  /** Exact ⌈q·n⌉-th order statistic over the raw values. */
  private def exactQ(vs: Seq[Long], q: Double): Long = {
    val sorted = vs.sorted
    sorted((math.ceil(q * vs.size).toLong - 1).max(0).toInt)
  }

  test("n <= K: no pruning, quantiles are exact order statistics") {
    val vs = (1L to 1000L).map(v => (v * 7 % 1009, v)) // (value, key)
    val out = run(vs)
    val values = vs.map(_._1)
    assert(out(0) == exactQ(values, 0.5))
    assert(out(1) == exactQ(values, 0.9))
    assert(out(2) == exactQ(values, 0.99))
    assert(out(3) == 1000L) // m = n
    assert(out(4) == 0L) // L = 0
  }

  test("L is the data-determined minimum and m the survivor count") {
    val n = 60000
    val items = (0 until n).map(i => ((i * 31L) % 100000L, 1000000L + i))
    val out = run(items)
    val levels = items.map { case (_, k) => KllSampleAgg.level(k) }
    val expectedL = (0L to GCap + 1)
      .find(l => levels.count(_ >= l) <= K).get
    assert(out(4) == expectedL)
    assert(out(3) == levels.count(_ >= expectedL).toLong)
    assert(expectedL >= 1L, "sketch path must engage at this n")
    assert(out(3) <= K && out(3) > K / 4)
  }

  test("merge-order and partitioning invariance") {
    val items = (0 until 50000).map(i => (i.toLong % 7919, 42L + 3 * i))
    val a = run(items)
    val b = run(items, splits = 7)
    val c = run(scala.util.Random.shuffle(items.toVector), splits = 13)
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq == c.toSeq)
  }

  test("rank error within 4% of n on uniform data (deterministic given the hash)") {
    val n = 100000
    // value == rank for a uniform ramp, so value error IS rank error
    val items = (1 to n).map(i => (i.toLong, 777L + 11L * i))
    val out = run(items, splits = 5)
    Seq(0.5, 0.9, 0.99).zipWithIndex.foreach { case (q, i) =>
      val err = math.abs(out(i) - q * n) / n
      assert(err <= 0.04, s"q=$q est=${out(i)} err=$err")
    }
  }

  test("udaf end-to-end over a DataFrame matches the direct aggregation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val items = (0 until 20000).map(i => ((i * 13L) % 5000, i.toLong))
    val df = items.toDF("v", "k").repartition(8)
    val row = df.agg(KllSampleAgg.kllSample(col("v"), col("k")).as("p"))
      .select(col("p")).head().getSeq[Long](0)
    assert(row.toSeq == run(items).toSeq)
  }
}
