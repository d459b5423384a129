package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The graft-native HyperLogLog (q35's sketch): accuracy band, merge
  * associativity (the partial-aggregation contract), and mixer width
  * invariants. Pure JVM — no session needed; the cross-engine
  * bit-equality itself is pinned by the driver gate / check.py.
  */
class HllSpec extends AnyFunSuite {

  private def sketch(keys: Seq[Long]): Array[Byte] = {
    val agg = new HllAgg
    keys.foldLeft(agg.zero)(agg.reduce)
  }

  private def estimate(keys: Seq[Long]): Double =
    new HllAgg().finish(sketch(keys))

  test("estimates stay within the m=1024 error band (deterministic, so pinned tight)") {
    for ((keys, n) <- Seq(
        ((1L to 300L), 300), ((1L to 5000L), 5000),
        ((1L to 60000L), 60000),
        ((1 to 5000).map(k => k * 7L + 3), 5000))) {
      val e = estimate(keys)
      assert(math.abs(e / n - 1.0) < 0.05, s"n=$n est=$e")
    }
  }

  test("duplicates do not move the estimate (distinctness)") {
    val once = estimate(1L to 1000L)
    val thrice = estimate((1L to 1000L) ++ (1L to 1000L) ++ (1L to 1000L))
    assert(once == thrice)
  }

  test("merge is associative and order-independent (partial aggregation contract)") {
    val agg = new HllAgg
    val (a, b, c) = ((1L to 400L), (300L to 900L), (850L to 1500L))
    val whole = sketch(a ++ b ++ c)
    val merged = agg.merge(agg.merge(sketch(a), sketch(b)), sketch(c))
    val mergedRev = agg.merge(sketch(c), agg.merge(sketch(b), sketch(a)))
    assert(whole.toSeq == merged.toSeq && merged.toSeq == mergedRev.toSeq)
  }

  test("sketch/merge rollup equals the one-shot aggregate bit-for-bit (e16 contract)") {
    // partition the keys into "hours", persist each hour's registers
    // via HllSketchAgg, merge any union of hours via HllMergeAgg — the
    // estimate must equal a direct HllAgg pass over the union exactly
    val hours: Seq[Seq[Long]] =
      Seq((1L to 500L).toSeq, (400L to 1100L).toSeq, (1000L to 1800L).toSeq)
    val sk = new HllSketchAgg
    val partials = hours.map(ks => ks.foldLeft(sk.zero)(sk.reduce).clone())
    val mg = new HllMergeAgg
    for (win <- Seq(Seq(0), Seq(0, 1), Seq(1, 2), Seq(0, 1, 2))) {
      val merged = win.map(partials).map(_.clone())
        .foldLeft(mg.zero)(mg.reduce)
      val direct = estimate(win.map(hours).reduce(_ ++ _))
      assert(mg.finish(merged) == direct, s"window $win diverged")
    }
  }

  test("mixer keeps every intermediate below 2^63 and output below 2^62") {
    // adversarial keys: extremes and values exercising the fold clamp
    for (k <- Seq(0L, 1L, Long.MaxValue, Long.MinValue, 2147483647L, 2147483648L, -1L)) {
      val h = HllAgg.hash(k)
      assert(h >= 0 && h < (1L << 62), s"k=$k h=$h")
    }
  }
}
