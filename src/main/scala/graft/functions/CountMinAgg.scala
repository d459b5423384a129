package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A Count-Min sketch whose every step is CROSS-ENGINE-REPRODUCIBLE —
  * the frequency-estimation member of the graft-native sketch family
  * (q35 HLL for cardinality, q36 DDSketch-shaped / q38 KLL-style for
  * quantiles, this for heavy hitters): d×w counters, each row j
  * incrementing counter h_j(key), estimate = min over rows of the
  * key's counter. Estimates are deterministic given the input
  * MULTISET — counters are plain sums, so the aggregation is
  * associative, commutative and order-independent, and the oracle can
  * replay every counter exactly: counter(j, b) = Σ count(k) over keys
  * k with h_j(k) = b, so est(k) = min_j counter(j, h_j(k)). The
  * classic guarantee holds: est ≥ true always (counters only
  * over-count via collisions), and est ≤ true + εN with probability
  * 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * The hash rows are affine-mod-P (h_j(k) = ((k·a_j + b_j) mod P)
  * mod w) — unlike HLL (which needs Poisson bucket filling and
  * therefore the multiply–xor-fold mixer, HllAgg.scala:89), CMS's
  * guarantee only needs pairwise-independent rows, for which affine
  * transforms are the textbook choice — and they replay in SQL with
  * `*` and `%` alone.
  *
  * Scale design: the buffer is a fixed d×w = 192-long (1.5 KiB)
  * array merging by elementwise sum, so partial aggregation works and
  * the shuffle carries one sketch per partition regardless of input
  * size — the 100 TB frequency-table path when the exact per-key
  * groupBy (which shuffles every distinct key) is the thing being
  * avoided. W is deliberately small here so collisions are LIVE on
  * the test corpus and the est-vs-true gap is visible; production
  * sizes w to the tolerated εN.
  */
class CountMinAgg(val w: Int = CountMinAgg.W)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  import CountMinAgg._

  override def zero: Array[Long] = new Array[Long](D * w)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var j = 0
    while (j < D) { buf(j * w + bucketW(j, key, w)) += 1; j += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * w) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAgg {
  val D = 3 // hash rows (δ = e^−3 ≈ 5%)
  val W = 64 // counters per row (small on purpose — collisions live at test scale)
  val P = 1000000007L
  val A: Array[Long] = Array(131L, 137L, 139L)
  val B: Array[Long] = Array(7L, 11L, 13L)

  /** Row-j bucket of a key. floorMod so negative keys land in range;
    * for the non-negative keys of the oracle queries this is plain
    * `%`, which is what the SQL replays.
    */
  def bucket(j: Int, key: Long): Int = bucketW(j, key, W)

  def bucketW(j: Int, key: Long, w: Int): Int =
    (java.lang.Math.floorMod(key * A(j) + B(j), P) % w).toInt

  /** Untyped-groupBy handle: `df.agg(cms(col("key")))` → the d×w
    * counter array, row-major.
    */
  lazy val cms: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CountMinAgg, Encoders.scalaLong)

  /** Same sketch at a caller-chosen width (production sizes w to the
    * tolerated εN; q62 uses 1024 so join-size estimates are in the
    * right ballpark while collisions stay live).
    */
  def cmsOf(w: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CountMinAgg(w), Encoders.scalaLong)
}
