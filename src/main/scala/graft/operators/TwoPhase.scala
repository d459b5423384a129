package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** The x12 two-phase prefix pattern, shared by every operator that
  * needs a GLOBAL running statistic without a single-task sort
  * (x12 prefix-sum ranks, q51 global row ranks, e14 running
  * watermark): range-partition on the full sort key, fold one Long
  * stat per partition (P driver-sized values), exclusive-scan them on
  * the driver, then a NARROW second pass seeds each partition with
  * its prefix.
  *
  * Invariants the callers must hold (they are the pattern's
  * correctness, so they live here once):
  *   - the dataset passed in is already `repartitionByRange` on the
  *     TOTAL sort key, `sortWithinPartitions` the same key, and
  *     `persist()`ed — the persist pins ONE range sampling across the
  *     phase-1 and phase-2 jobs (unpersisted repartitionByRange
  *     re-draws its bounds per job and the offsets would misalign);
  *   - `combine` is associative with `zero` as identity, so the
  *     driver-side exclusive scan equals the distributed fold;
  *   - empty partitions still contribute `zero`, keeping pid →
  *     prefix total.
  */
private[operators] object TwoPhase {

  /** Partition-count sizing shared by the two-phase operators: ~1M
    * rows per range partition — a few tens of MB of narrow rows,
    * comfortably in-memory — with the session's parallelism as the
    * floor so small inputs still use every core. P stays driver-sized
    * by construction (at 100 TB / ~100B rows, ~1e5 Longs).
    */
  def sizedParts(s: SparkSession, rows: Long): Int =
    math.max(s.sparkContext.defaultParallelism, (rows / 1000000L).toInt + 1)

  /** Phase 1: fold a Long stat within each partition of `ordered`,
    * collect the P results, and return pid → combined stat over all
    * EARLIER partitions (exclusive scan — partition 0 maps to
    * `zero`).
    */
  def partitionPrefix[T](ordered: Dataset[T], zero: Long,
      fold: (Long, T) => Long, combine: (Long, Long) => Long): Map[Int, Long] = {
    import org.apache.spark.sql.Encoders
    val stats = ordered.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var s = zero
      it.foreach(t => s = fold(s, t))
      Iterator.single((pid.toLong, s))
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .collect().sortBy(_._1)
    stats.map(_._1.toInt).zip(stats.map(_._2).scanLeft(zero)(combine)).toMap
  }
}
