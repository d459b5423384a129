package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q52 sweep-line concurrency: the two-phase distributed prefix sum
  * must equal the single-partition window formulation exactly — the
  * same cross-check q51/x12 rest on, applied to a SUM fold.
  */
class SweepLineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q52 two-phase running sum equals the one-window reference") {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts_us"))
    val iv = ev.select(col("event_id"), col("ts_us").as("s_us"),
      (col("ts_us") + (lit(1L) + col("event_id") % 7L) * 60000000L)
        .as("e_us"))
    val pts = iv.select(col("s_us").as("t_us"), lit(1L).as("delta"),
        col("event_id"))
      .unionByName(iv.select(col("e_us").as("t_us"), lit(-1L).as("delta"),
        col("event_id")))
    // reference: the naive single-task global window — correct by
    // construction, unusable at scale, perfect as a test oracle
    val w = Window.orderBy("t_us", "delta", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = pts
      .withColumn("conc", sum("delta").over(w))
      .select((col("t_us") - col("t_us") % 3600000000L).as("win_start_us"),
        col("conc"))
      .groupBy("win_start_us")
      .agg(max("conc").as("max_concurrency"))
      .orderBy("win_start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Aggregates.q52.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q52 concurrency is sane: non-negative peaks, ordered windows") {
    val out = Aggregates.q52.fn(spark, dir).collect()
    // a window holding only end points can peak at 0 (the sweep
    // drains there), but the running sum must never go negative —
    // every −1 is preceded by its own +1 in the total order
    assert(out.forall(_.getLong(1) >= 0L))
    // at least one window sees real overlap, or the operator would be
    // vacuous on this corpus
    assert(out.exists(_.getLong(1) >= 2L))
    // declared total order on the window key
    val keys = out.map(_.getLong(0))
    assert(keys.sameElements(keys.sorted))
  }
}
