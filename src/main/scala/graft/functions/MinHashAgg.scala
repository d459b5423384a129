package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.unsafe.types.UTF8String

/** Typed `Aggregator` building a 32-permutation MinHash signature in
  * one pass (UDAF surface of SURVEY.md §2.5's last row).
  *
  * Permutation i's hash of a shingle is bit-identical to Spark's
  * `xxhash64(i, shingle)`: xxhash64 chains children — seed 42, hash
  * the long i, then hash the string bytes with that as seed — so the
  * signatures equal the expression-composed formulation while hashing
  * each shingle once per permutation in a single aggregation buffer
  * (vs the 32-column min() fan-out; comparable wall-clock at local
  * scale, one object buffer instead of 32 agg slots per key).
  *
  * Buffers are fixed 32×8 bytes regardless of document size — the
  * property that makes MinHash the 100 TB dedup path: signatures
  * merge associatively across partitions (partial aggregation works).
  */
class MinHashAgg extends Aggregator[String, Array[Long], Array[Long]] {
  import MinHashAgg.P

  override def zero: Array[Long] = Array.fill(P)(Long.MaxValue)

  override def reduce(buf: Array[Long], gram: String): Array[Long] = {
    val u = UTF8String.fromString(gram)
    val seeds = MinHashAgg.seeds
    var i = 0
    while (i < P) {
      // == xxhash64(i, gram): chain long i then bytes, seed 42
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seeds(i))
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

  /** Untyped-groupBy handle: `df.groupBy(...).agg(minhash(col("g")))`. */
  lazy val minhash: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinHashAgg, Encoders.STRING)
}
