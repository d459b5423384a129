package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A log-bucketed quantile sketch (DDSketch shape) whose every step is
  * CROSS-ENGINE-REPRODUCIBLE — q29's limitation answered the same way
  * [[HllAgg]] answers q10's: Spark's `approx_percentile` (KLL over
  * internal comparisons) can never be value-checked by a SQL oracle,
  * but this sketch can, because bucketing, counting, and rank
  * selection are pure integer arithmetic and the only float ops are a
  * fixed, shared sequence of exact-or-deterministic IEEE operations.
  *
  * Shape: positive integer inputs (price CENTS here — the established
  * exact fixed-point door for money) land in bucket
  * `(e, sub)` where e = ⌊log₂ v⌋ (exact: bit length − 1) and sub is
  * the next 4 mantissa bits — 16 sub-buckets per octave → relative
  * error ≤ 1/32 ≈ 3%. A quantile's answer is the REPRESENTATIVE
  * (bucket midpoint) of the first bucket whose cumulative count
  * reaches ⌈q·n⌉; the midpoint `(1 + (2·sub+1)/32)·2^e / 100` is
  * computed with the same operation order on both engines (every
  * term exact in double except the final division, which is a single
  * correctly-rounded IEEE op on identical operands).
  *
  * Scale design: fixed 1008-slot Long buffer (63 octaves × 16),
  * elementwise-add merge — associative/commutative, so partial
  * aggregation works and the shuffle carries one sketch per
  * (group × partition); exact percentiles (q26) shuffle-sort every
  * row. Accuracy/merge contracts pinned in QuantileSketchSpec.
  */
class QuantileSketchAgg extends Aggregator[Long, Array[Long], Array[Double]] {
  import QuantileSketchAgg._

  override def zero: Array[Long] = new Array[Long](Slots)

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    if (v >= 1) buf(bucket(v)) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Slots) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Double] = {
    var n = 0L
    var i = 0
    while (i < Slots) { n += buf(i); i += 1 }
    Qs.map { q =>
      // ⌈q·n⌉ — identical to the oracle's CAST(ceil(q * n) AS BIGINT)
      val target = math.ceil(q * n).toLong
      // first PRESENT bucket whose cumulative count reaches the target
      // — exactly the oracle's min() over eligible buckets (its cum
      // CTE only carries buckets with rows)
      var cum = 0L
      var idx = -1
      var j = 0
      while (j < Slots && idx < 0) {
        cum += buf(j)
        if (buf(j) > 0 && cum >= target) idx = j
        j += 1
      }
      if (idx < 0) Double.NaN else representative(idx)
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object QuantileSketchAgg {
  val Slots = 63 * 16
  val Qs: Array[Double] = Array(0.5, 0.9, 0.99)

  /** Bucket of a positive value: 16·⌊log₂v⌋ + next-4-mantissa-bits.
    * The sub-bucket shifts RIGHT for e ≥ 4 — `(v − 2^e) << 4` would
    * overflow Long for e ≥ 60 and silently corrupt the bucket (the
    * oracle's `* 16` would error instead: divergence).
    */
  def bucket(v: Long): Int = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val frac = v - (1L << e)
    val sub = (if (e >= 4) frac >> (e - 4) else frac << (4 - e)).toInt
    e * 16 + sub
  }

  /** Bucket midpoint in DOLLARS for cent inputs — operation order
    * matches the oracle SQL token for token.
    */
  def representative(idx: Int): Double = {
    val e = idx / 16
    val sub = idx % 16
    (1.0 + (2.0 * sub + 1.0) / 32.0) * (1L << e).toDouble / 100.0
  }

  /** Untyped-groupBy handle over integer-cent inputs. */
  lazy val sketch: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new QuantileSketchAgg, Encoders.scalaLong)
}
