package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The graft-native quantile sketch (q36): relative-error bound
  * against exact order statistics, merge associativity, and bucket
  * decode invariants. Pure JVM; cross-engine bit-equality is pinned
  * by the driver gate / check.py.
  */
class QuantileSketchSpec extends AnyFunSuite {

  private def sketch(values: Seq[Long]): Array[Long] = {
    val agg = new QuantileSketchAgg
    values.foldLeft(agg.zero)(agg.reduce)
  }

  private def quantiles(values: Seq[Long]): Array[Double] =
    new QuantileSketchAgg().finish(sketch(values))

  test("every reported quantile is within the 1/32 relative-error band") {
    val rng = new scala.util.Random(7)
    // lognormal-ish positive cents — the money shape the sketch targets
    val values = Seq.fill(20000)(math.exp(rng.nextGaussian() * 1.2 + 10).toLong max 1L)
    val sorted = values.sorted
    val qs = quantiles(values)
    for ((q, got) <- QuantileSketchAgg.Qs.zip(qs)) {
      val exactCents = sorted(math.ceil(q * values.size).toInt - 1).toDouble
      val gotCents = got * 100.0
      assert(math.abs(gotCents / exactCents - 1.0) <= 1.0 / 32 + 1e-9,
        s"q=$q got=$gotCents exact=$exactCents")
    }
  }

  test("merge is associative and equals the single-pass sketch") {
    val agg = new QuantileSketchAgg
    val (a, b, c) = (Seq.fill(500)(123L), (1L to 800L), Seq.fill(300)(9999999L))
    val whole = sketch(a ++ b ++ c)
    val merged = agg.merge(agg.merge(sketch(a), sketch(b)), sketch(c))
    assert(whole.toSeq == merged.toSeq)
  }

  test("bucket decode: representative sits inside its bucket's value range") {
    for (v <- Seq(1L, 15L, 16L, 17L, 1000L, 123456L, (1L << 40) + 12345L)) {
      val idx = QuantileSketchAgg.bucket(v)
      val repCents = QuantileSketchAgg.representative(idx) * 100.0
      // bucket width is 2^e/16; the midpoint is within half a width
      val e = idx / 16
      val width = math.max((1L << e) / 16.0, 1.0)
      assert(math.abs(repCents - v) <= width, s"v=$v rep=$repCents width=$width")
    }
  }

  test("non-positive inputs are ignored, not crashed on") {
    val qs = quantiles(Seq(-5L, 0L, 100L, 100L, 100L))
    assert(qs(0) * 100.0 > 96 && qs(0) * 100.0 < 104)
  }
}
