package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.unsafe.types.UTF8String

/** Typed `Aggregator` building a 32-permutation MinHash signature in
  * one pass (UDAF surface of SURVEY.md §2.5's last row).
  *
  * Input is the 64-bit shingle hash from [[ShingleHashes]] (not the
  * gram string): permutation i's value is the xxhash64 chain
  * (seed 42 → long i → long shingle-hash), i.e. bit-identical to
  * Spark's `xxhash64(i, shingle_hash)`. Hashing the hash preserves
  * the min-wise uniformity MinHash needs, and the signature
  * aggregation then shuffles 8-byte longs instead of gram strings —
  * a ~3× narrower exchange into the groupBy at corpus scale, on top
  * of hashing each shingle once per permutation in a single buffer
  * (vs the 32-column min() fan-out).
  *
  * Buffers are fixed 32×8 bytes regardless of document size — the
  * property that makes MinHash the 100 TB dedup path: signatures
  * merge associatively across partitions (partial aggregation works).
  */
class MinHashAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  import MinHashAgg.P

  override def zero: Array[Long] = Array.fill(P)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingleHash: Long): Array[Long] = {
    val seeds = MinHashAgg.seeds
    var i = 0
    while (i < P) {
      // == xxhash64(i, shingle_hash): chain long i then the long, seed 42
      val h = XXH64.hashLong(shingleHash, seeds(i))
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

  /** Permutation seeds, hoisted: seed(i) = xxhash64-chain of long i. */
  private[functions] val seeds: Array[Long] =
    Array.tabulate(P)(i => XXH64.hashLong(i.toLong, 42L))

  /** Untyped-groupBy handle: `df.groupBy(...).agg(minhash(col("g")))`
    * where `g` is a [[ShingleHashes]] 64-bit shingle hash.
    */
  lazy val minhash: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinHashAgg, Encoders.scalaLong)
}
