package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A KLL-style quantile sketch with a RANK-error contract whose every
  * step is CROSS-ENGINE-REPRODUCIBLE — the round-4 answer to q36's
  * open question (its DDSketch shape bounds relative VALUE error,
  * ≈3%; a KLL-family sketch bounds the rank instead).
  *
  * True Datasketches KLL compacts pairs with per-compaction coin
  * flips, which makes the retained set depend on arrival/merge order —
  * unreplayable by a SQL oracle. This sketch keeps KLL's essential
  * mechanism (geometric level weights, capacity-triggered promotion)
  * but derives each item's level from a HASH OF THE ROW KEY instead of
  * compaction coins:
  *
  *     g(row) = trailing zeros of mix(key)   (≥ g with prob 2^−g)
  *     retained = { row : g(row) ≥ L },  L = min{ ℓ : |g ≥ ℓ| ≤ k }
  *
  * L only ever rises (reduce and merge prune when the buffer exceeds
  * k), and the pruning rule makes the FINAL state a pure function of
  * the input multiset: a sub-multiset can only exceed k at level ℓ if
  * the full multiset does, so every engine — and the DuckDB oracle,
  * which computes L directly from per-level counts — converges on the
  * same L and the same retained set, in any arrival or merge order.
  * Quantiles are then order statistics of the retained values: the
  * ⌈q·m⌉-th smallest of m kept values, each standing for 2^L rows.
  * All arithmetic is BIGINT; the only float op is the shared
  * ⌈q·m⌉ (one IEEE multiply + ceil on identical operands, as in
  * [[QuantileSketchAgg]]).
  *
  * Accuracy: the retained set is a uniform (hash-determined) sample of
  * m ∈ (k/2, k] rows once n > k, so rank error concentrates at
  * ~√(q(1−q)/m) ≈ 1% of n at k = 4096 — and the estimate is the
  * value of an ACTUAL input row near the target rank (KLL's property),
  * not a bucket midpoint (q36's). For n ≤ k nothing is pruned and
  * every quantile is EXACT. KllSampleSpec pins both, plus merge-order
  * invariance and the L = min{ℓ : cnt(g≥ℓ) ≤ k} identity.
  *
  * Scale design: fixed-capacity buffer (≤ k pairs + header) with
  * elementwise-union merge — associative and commutative, so partial
  * aggregation works and the shuffle carries ≤ 64 KiB per
  * (group × partition) regardless of input size. The level hash reuses
  * [[HllAgg.hash]] — the one [[PolyPair]] mixer family every oracle
  * already replays.
  *
  * Buffer layout (Array[Long]): [L, m, g₀, v₀, g₁, v₁, …] with
  * capacity slack; pairs live at 2+2i. Appends amortize by doubling,
  * so a partition's reduce chain is O(items kept), not O(k²).
  */
class KllSampleAgg extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  import KllSampleAgg._

  override def zero: Array[Long] = {
    val a = new Array[Long](2 + 2 * 64)
    a // L = 0, m = 0
  }

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val g = level(in._2)
    if (g < buf(0)) buf
    else append(buf, g, in._1)
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // union at L = max(La, Lb); appends prune further if capacity is
    // exceeded, so the result is again {g ≥ L} with |·| ≤ k
    var out = a
    if (b(0) > out(0)) raiseLevel(out, b(0))
    var i = 0
    val m = b(1).toInt
    while (i < m) {
      val g = b(2 + 2 * i)
      if (g >= out(0)) out = append(out, g, b(2 + 2 * i + 1))
      i += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Array[Long] = {
    val m = buf(1).toInt
    val vs = new Array[Long](m)
    var i = 0
    while (i < m) { vs(i) = buf(2 + 2 * i + 1); i += 1 }
    java.util.Arrays.sort(vs)
    val qs = Qs.map { q =>
      // ⌈q·m⌉ — identical to the oracle's ceil(q * m); the t-th
      // smallest kept value (1-indexed). m = 0 cannot occur for a
      // non-empty group unless > k rows share a 40-deep hash tail
      // (P < k·2^−40); emit −1 sentinels if it ever does.
      val t = math.ceil(q * m).toLong
      if (m == 0) -1L else vs((t - 1).max(0).toInt)
    }
    qs :+ m.toLong :+ buf(0)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KllSampleAgg {
  /** Capacity: retained rows per sketch once n > K sits in (K/2, K]. */
  val K = 4096

  /** Level cap — g = min(trailingZeros(mix(key)), GCap). At L =
    * GCap + 1 the retained set is empty, which bounds the prune loop;
    * reaching it needs > K keys with identical 40-deep hash tails.
    */
  val GCap = 40L

  val Qs: Array[Double] = Array(0.5, 0.9, 0.99)

  /** Geometric level of a row key: trailing zeros of the shared
    * [[PolyPair]] mixer ([[HllAgg.hash]]), capped. Replayed in SQL as
    * a CASE chain on h % 2^(j+1) — see q38's oracle.
    */
  def level(key: Long): Long = {
    val h = HllAgg.hash(key)
    if (h == 0L) GCap
    else math.min(java.lang.Long.numberOfTrailingZeros(h).toLong, GCap)
  }

  /** Append (g, v), then prune while over capacity: L += 1 and drop
    * items below it. Returns the (possibly re-allocated) buffer.
    */
  private def append(buf0: Array[Long], g: Long, v: Long): Array[Long] = {
    var buf = buf0
    val m = buf(1).toInt
    if (2 + 2 * (m + 1) > buf.length) {
      buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, 2 + 2 * (m + 1)))
    }
    buf(2 + 2 * m) = g
    buf(2 + 2 * m + 1) = v
    buf(1) = m + 1
    while (buf(1) > K) {
      buf(0) += 1
      val lvl = buf(0)
      var w = 0
      var i = 0
      val mm = buf(1).toInt
      while (i < mm) {
        if (buf(2 + 2 * i) >= lvl) {
          buf(2 + 2 * w) = buf(2 + 2 * i)
          buf(2 + 2 * w + 1) = buf(2 + 2 * i + 1)
          w += 1
        }
        i += 1
      }
      buf(1) = w
    }
    buf
  }

  /** In-place: raise the buffer's level to `lvl`, dropping items below
    * it (merge helper — only ever mutates the left/owned buffer).
    */
  private def raiseLevel(buf: Array[Long], lvl: Long): Unit = {
    buf(0) = lvl
    var w = 0
    var i = 0
    val m = buf(1).toInt
    while (i < m) {
      if (buf(2 + 2 * i) >= lvl) {
        buf(2 + 2 * w) = buf(2 + 2 * i)
        buf(2 + 2 * w + 1) = buf(2 + 2 * i + 1)
        w += 1
      }
      i += 1
    }
    buf(1) = w
  }

  /** Untyped-groupBy handle: `kllSample(valueCents, rowKey)`. */
  lazy val kllSample: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KllSampleAgg,
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
}
