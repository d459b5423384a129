package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed `Aggregator` building a 32-permutation MinHash signature in
  * one pass (UDAF surface of SURVEY.md §2.5's last row).
  *
  * Input is the 61-bit composite shingle hash from
  * [[ShinglePolyHashes]] (not the gram string): permutation i's value
  * is the affine transform `(A(i)·(g mod P) + B(i)) mod P` over
  * P = 1 000 000 007 — the textbook universal-hash MinHash family,
  * chosen because it is plain BIGINT arithmetic a DuckDB oracle can
  * replay exactly (the round-2 xxhash64 chain made d02 rows-only by
  * necessity). Hashing the hash preserves the min-wise uniformity
  * MinHash needs, and the signature aggregation shuffles 8-byte longs
  * instead of gram strings — a ~3× narrower exchange into the groupBy
  * at corpus scale, on top of hashing each shingle once per
  * permutation in a single buffer (vs the 32-column min() fan-out).
  *
  * Buffers are fixed 32×8 bytes regardless of document size — the
  * property that makes MinHash the 100 TB dedup path: signatures
  * merge associatively across partitions (partial aggregation works).
  */
class MinHashAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  import MinHashAgg.{A, B, MOD, P}

  override def zero: Array[Long] = Array.fill(P)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingleHash: Long): Array[Long] = {
    // floorMod, not %: ShinglePolyHashes outputs are non-negative (same
    // result), but a caller feeding signed 64-bit hashes (e.g. the
    // xxhash64-based shingle_hashes) must not silently poison every
    // signature slot with negative affine values
    val g = java.lang.Math.floorMod(shingleHash, MOD)
    var i = 0
    while (i < P) {
      // A(i)·g < 2⁶⁰ — no overflow, identical in any BIGINT engine
      val h = (A(i) * g + B(i)) % MOD
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < P) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Number of simulated permutations (16 LSH bands × 2 rows). */
  val P = 32

  /** The affine family's modulus (shared with the DuckDB oracles). */
  val MOD = 1000000007L

  private def powmod(base: Long, exp: Int): Long = {
    var r = 1L
    var i = 0
    while (i < exp) { r = r * base % MOD; i += 1 }
    r
  }

  /** Permutation multipliers/offsets: A(i) = 31^(i+1), B(i) = 131^(i+1)
    * mod P — fixed, nonzero, and trivially reproducible in oracle SQL
    * (interpolated as literal arrays by d02's QueryDef).
    */
  val A: Array[Long] = Array.tabulate(P)(i => powmod(31L, i + 1))
  val B: Array[Long] = Array.tabulate(P)(i => powmod(131L, i + 1))

  /** Untyped-groupBy handle: `df.groupBy(...).agg(minhash(col("g")))`
    * where `g` is a [[ShinglePolyHashes]] composite shingle hash.
    */
  lazy val minhash: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinHashAgg, Encoders.scalaLong)
}
