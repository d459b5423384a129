package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A HyperLogLog sketch whose every step is CROSS-ENGINE-REPRODUCIBLE
  * — the "novel sketch as a custom aggregate" slot of SURVEY.md §2.5,
  * and the answer to q10's limitation: Spark's `approx_count_distinct`
  * (HLL++ over xxhash64) can never be value-checked by a SQL oracle,
  * but this sketch can, because it uses the same plain-BIGINT affine
  * hashing as [[MinHashAgg]] and an exact-integer register sum.
  *
  * Shape: p = 10 → m = 1024 registers; key → 61-bit composite affine
  * hash → bucket = h mod m, rank = leading-zero count + 1 within the
  * remaining 50-bit window (register ∈ [1, 51]; 0 = empty). The
  * estimator is the raw HLL harmonic mean E = α·m²/Σ2^(−reg), with
  * the sum computed EXACTLY as the integer Σ2^(51−reg) (so it is
  * order-independent — a double Σ2^(−reg) would not be), and the
  * whole constant α·m²·2⁵¹ folded into ONE double literal shared with
  * the oracle SQL: the only floating-point operation is the final
  * division. The standard linear-counting small-range correction
  * applies below 2.5·m — ln() itself is not bit-stable across libm
  * implementations, so the correction values for all 1024 possible
  * zero-register counts are PRECOMPUTED here and interpolated into
  * the oracle as literals ([[LnCorrection]]).
  *
  * Scale design: the buffer is a fixed 1024-byte register array
  * merging by elementwise max — associative and commutative, so
  * partial aggregation works and the shuffle carries one sketch per
  * (group × partition) regardless of input size. This is the 100 TB
  * count-distinct path (q09's exact variant shuffles every distinct
  * key).
  */
class HllAgg extends Aggregator[Long, Array[Byte], Double] {
  import HllAgg._

  override def zero: Array[Byte] = new Array[Byte](M)
  override def reduce(buf: Array[Byte], key: Long): Array[Byte] = update(buf, key)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeRegs(a, b)
  override def finish(buf: Array[Byte]): Double = estimate(buf)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** The PARTIAL form of [[HllAgg]]: emits the 1024 registers themselves
  * instead of the estimate — the sketch a rollup table PERSISTS so
  * any window/superset of groups can later be answered by merging
  * partials without re-reading the raw data (the e16 hierarchical
  * rollup; max-merge of per-hour registers ≡ registers of the union,
  * so the merged estimate is bit-identical to a direct pass).
  */
class HllSketchAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {
  import HllAgg._

  override def zero: Array[Byte] = new Array[Byte](M)
  override def reduce(buf: Array[Byte], key: Long): Array[Byte] = update(buf, key)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeRegs(a, b)
  override def finish(buf: Array[Byte]): Array[Byte] = buf
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merge side of the rollup: aggregates STORED register arrays (the
  * [[HllSketchAgg]] output) by elementwise max and finishes with the
  * shared estimator — `agg(hllMerge(col("sk")))` over any regrouping
  * of the partials.
  */
class HllMergeAgg extends Aggregator[Array[Byte], Array[Byte], Double] {
  import HllAgg._

  override def zero: Array[Byte] = new Array[Byte](M)
  override def reduce(buf: Array[Byte], sk: Array[Byte]): Array[Byte] = mergeRegs(buf, sk)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeRegs(a, b)
  override def finish(buf: Array[Byte]): Double = estimate(buf)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object HllAgg {
  val M = 1024 // registers (p = 10)
  val W = 1L << 50 // hash window width above the bucket bits

  /** Multiply–xor-fold mixer constants and fold width — the ONE
    * shared set in [[PolyPair]] (the d02/d04 oracles interpolate
    * PolyPair's copies, q35's oracle these aliases: same values by
    * construction).
    */
  val A1: Long = PolyPair.Mix1
  val A2: Long = PolyPair.Mix2
  val A3: Long = PolyPair.Mix3
  val F: Long = PolyPair.F

  /** 62-bit mixed hash of a long key — replayable in SQL with only
    * `*`, `%`, `//` and `xor()` (the floorMod is SQL's
    * `((k % F) + F) % F`, which the q35 oracle uses, so negative keys
    * replay correctly too). A plain affine-mod-P transform is NOT
    * enough here: HLL's occupancy/rank statistics assume Poisson
    * bucket filling, and an affine map sends sequential ids round-robin
    * through the buckets (measured +50% overestimate on this data).
    * Three multiply + xor-fold rounds break that linearity — the
    * xor of a product's high and low halves mixes carry chains the
    * way a murmur finalizer does, without ever widening past 63 bits.
    * Validated within HLL's ±3.25% band on sequential and strided
    * keys, n ∈ [300, 150 000] (HllSpec pins the band).
    */
  def hash(key: Long): Long = {
    val x0 = java.lang.Math.floorMod(key, F)
    val x1 = PolyPair.fold(A1 * x0)
    val x2 = PolyPair.fold(A2 * x1)
    val x3 = PolyPair.fold(A3 * x2)
    x2 * F + x3
  }

  private def bitLength(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Observe one key into a register buffer (shared by the one-shot
    * and partial aggregators).
    */
  def update(buf: Array[Byte], key: Long): Array[Byte] = {
    val h = hash(key)
    val bucket = (h % M).toInt
    val v = (h / M) % W // the 50-bit window above the bucket bits
    val rank = (51 - bitLength(v)).toByte // v = 0 → 51
    if (rank > buf(bucket)) buf(bucket) = rank
    buf
  }

  /** Elementwise-max register merge — associative, commutative,
    * idempotent, so partials can be merged in any grouping.
    */
  def mergeRegs(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** The shared estimator: exact integer Σ 2^(51 − reg) (empty
    * registers contribute 2^51), one double division, and the
    * PRECOMPUTED linear-counting correction below 2.5·m — both branch
    * condition and value bit-identical with the oracle's replay.
    */
  def estimate(buf: Array[Byte]): Double = {
    var s = 0L
    var zeros = 0
    var i = 0
    while (i < M) {
      s += (1L << (51 - buf(i)))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val e = K / s.toDouble
    if (e <= 2560.0 && zeros > 0) LnCorrection(zeros - 1) else e
  }

  /** α(1024)·m²·2⁵¹ folded to one double — the oracle SQL interpolates
    * THIS value, so both engines perform exactly one float op (the
    * division by the exact integer register sum).
    */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)
  val K: Double = Alpha * (M.toDouble * M.toDouble) * 2251799813685248.0 // 2^51

  /** Linear-counting correction m·ln(m/V) for every possible
    * zero-register count V ∈ [1, m], PRECOMPUTED (index V−1) so the
    * oracle SQL interpolates the identical double literals — ln()
    * itself is a libm call whose rounding is not bit-stable across
    * engines, but a table of 1024 constants is.
    */
  val LnCorrection: Array[Double] =
    Array.tabulate(M)(i => M * Math.log(M.toDouble / (i + 1)))

  /** Untyped-groupBy handle: `df.groupBy(...).agg(hll(col("key")))`. */
  lazy val hll: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllAgg, Encoders.scalaLong)

  /** Partial-sketch handle: emits the raw registers for persistence. */
  lazy val hllSketch: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllSketchAgg, Encoders.scalaLong)

  /** Rollup-merge handle over stored register arrays. */
  lazy val hllMerge: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllMergeAgg, Encoders.BINARY)
}
