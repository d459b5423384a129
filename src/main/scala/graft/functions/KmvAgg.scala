package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A K-minimum-values (theta-family) distinct sketch whose every step
  * is CROSS-ENGINE-REPRODUCIBLE — the SET-ALGEBRA member of the
  * sketch family: [[HllAgg]] (q35) estimates one set's cardinality
  * and unions implicitly, but only a theta-style sketch supports
  * INTERSECTION — the "audience overlap" query (how many users did
  * both A and B) that at 100 TB cannot afford the exact
  * distinct-pair join.
  *
  * Mechanism: keep the K smallest DISTINCT values of a deterministic
  * uniform hash of the member key ([[HllAgg.hash]] — the one
  * [[PolyPair]] mixer family every oracle already replays — floored
  * into [0, 2⁵²)). The K-th smallest retained value x_K estimates the
  * sampling threshold: below K distinct members the sketch IS the
  * set (estimates are exact); at K it estimates
  *
  *     n̂ = (K−1) · D/x_K          (D = 2⁵², the hash domain)
  *
  * and two sketches intersect by counting common retained hashes
  * below θ = min(θ_A, θ_B) and scaling by D/θ. Every division is
  * INTEGER and overflow-safe by splitting ((D div θ)·c +
  * ((D mod θ)·c) div θ, c ≤ K, D mod θ < θ ≤ 2⁵², products < 2⁵⁹),
  * so the DuckDB oracle replays estimates BIT-FOR-BIT — the q35/q38
  * discipline applied to set algebra. The 2⁵² floor costs nothing at
  * these scales (hash collisions merge members deterministically on
  * both engines; ~10⁻⁷ relative at 10⁹ members) and is what keeps
  * every intermediate product inside 63 bits.
  *
  * Scale design: fixed-capacity sorted buffer (≤ K+1 longs) with
  * insertion dedup — reduce needs no pre-`distinct()` shuffle, the
  * sketch absorbs duplicates — and sorted-merge union keeping the K
  * smallest: associative, commutative, idempotent, so partial
  * aggregation works and the shuffle carries ≤ 520 bytes per
  * (group × partition) regardless of input size. KmvSpec pins
  * merge-order/partitioning invariance, the exact-below-K contract,
  * and the estimator's accuracy band.
  */
class KmvAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  import KmvAgg._

  override def zero: Array[Long] = new Array[Long](1 + K) // [m, h…]

  override def reduce(buf: Array[Long], key: Long): Array[Long] =
    insert(buf, hash(key))

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    val m = b(0).toInt
    var out = a
    while (i < m) { out = insert(out, b(1 + i)); i += 1 }
    out
  }

  /** The retained hash set, ascending — pair algebra happens in plain
    * column expressions over these arrays (q47).
    */
  override def finish(buf: Array[Long]): Array[Long] =
    java.util.Arrays.copyOfRange(buf, 1, 1 + buf(0).toInt)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvAgg {
  /** Retained minima per sketch. 64 keeps the estimation path LIVE at
    * the driver's own scales (sf0.01 already has > 64 distinct users)
    * while the accuracy band stays the theta-standard ~1/√(K−2).
    */
  val K = 64

  /** Hash domain bound: [[HllAgg.hash]]'s 62-bit composite floored by
    * 2¹⁰ — see the overflow analysis in the class doc.
    */
  val Shrink = 1024L
  val Dom: Long = (PolyPair.F * PolyPair.F) / Shrink // 2⁵²

  def hash(key: Long): Long = HllAgg.hash(key) / Shrink

  /** Sorted-insert with dedup into [m, h₀ < h₁ < …]; drops the
    * largest once full. Binary search + memmove — O(log K + K) worst
    * case per NEW minimum, O(log K) for the common no-op paths
    * (duplicate, or ≥ current max when full).
    */
  def insert(buf: Array[Long], h: Long): Array[Long] = {
    val m = buf(0).toInt
    if (m == K && h >= buf(m)) return buf // not smaller than the max
    var lo = 1
    var hi = m // search [1, m+1): first index with buf(i) >= h
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < h) lo = mid + 1 else hi = mid - 1
    }
    if (lo <= m && buf(lo) == h) return buf // already present
    val keep = if (m == K) m - lo else m - lo + 1 // tail kept after shift
    if (keep > 0) System.arraycopy(buf, lo, buf, lo + 1, keep)
    buf(lo) = h
    if (m < K) buf(0) = m + 1
    buf
  }

  /** Untyped-groupBy handle: `df.groupBy(...).agg(kmv(col("key")))`. */
  lazy val kmv: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvAgg, Encoders.scalaLong)
}
