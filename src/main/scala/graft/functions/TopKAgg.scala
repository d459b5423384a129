package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded per-group top-k as a typed Aggregator: each aggregation
  * buffer holds at most k (value, id) pairs, ordered by value DESC
  * with id ASC tiebreak.
  *
  * This is the scale answer to "top N per key": the window
  * formulation (`row_number() OVER (PARTITION BY key ORDER BY v) <=
  * k`) sorts every row of every group; this aggregator's partial
  * (map-side) buffers cap at k entries, so only k rows per key per
  * partition ever reach the shuffle — the per-key analogue of what
  * `TakeOrderedAndProject` does for global top-k (preference order
  * (b) of the build plan: a custom aggregator before a custom
  * SparkStrategy, since Spark's partial aggregation already gives the
  * physical behavior we need).
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortWith(better).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k) trim(buf :+ row)
    else if (better(row, buf.last)) trim(buf :+ row)
    else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  /** Untyped handle: `df.groupBy(key).agg(topK(3)(struct(v, id)))`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
}
