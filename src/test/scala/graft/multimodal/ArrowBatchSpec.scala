package graft.multimodal

import graft.SparkSpec

/** Arrow-batch stage: kernel exactness vs a plain per-row reference,
  * batch reuse across multiple batches, scratch growth, empties.
  */
object ArrowBatchSpec {
  /** Plain per-row reference for the batch kernel (object-scoped so
    * executor closures don't capture the non-serializable suite).
    */
  def ref(data: Array[Byte]): (Long, Long, Long) = {
    var ws = 0L; var h = 0L
    data.foreach { b =>
      val u = b & 0xff
      if (u <= 0x20) ws += 1
      h = (h * 131 + u) % 1000000007L
    }
    (data.length.toLong, ws, h)
  }
}

class ArrowBatchSpec extends SparkSpec {
  import ArrowBatchSpec.ref

  test("byteStats matches the per-row reference across batch boundaries") {
    import spark.implicits._
    // > 2×BatchRows rows on few partitions → every partition refills its
    // roots several times, proving the reset/reuse path; payload sizes
    // vary so offsets are non-trivial.
    val assets = (0 until (ArrowBatchStage.BatchRows * 2 + 57)).map { i =>
      val payload = (s"doc $i " * (i % 40)).getBytes("UTF-8")
      Asset(i.toLong, "image", payload, 1, 1)
    }
    val got = ArrowBatchStage.byteStats(assets.toDS().repartition(3))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assets.foreach { a =>
      assert(got(a.asset_id) == ref(a.data), s"asset ${a.asset_id}")
    }
  }

  test("byteStats: empty payloads and scratch growth beyond 64 KiB") {
    import spark.implicits._
    val big = ("α" + ("z" * 200000)).getBytes("UTF-8") // > initial scratch; non-ASCII head byte
    val assets = Seq(
      Asset(1L, "audio", Array.empty[Byte], 0, 0),
      Asset(2L, "video", big, 1, 1),
      Asset(3L, "image", " \t\n".getBytes("UTF-8"), 1, 1)).toDS()
    val got = ArrowBatchStage.byteStats(assets)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((0L, 0L, 0L)))
    assert(got(2L) == ref(big))
    assert(got(3L) == ((3L, 3L, ref(" \t\n".getBytes("UTF-8"))._3)))
  }

  test("m04 over sf0.001 equals a non-Arrow recomputation from the text") {
    import org.apache.spark.sql.functions._
    val m04 = graft.operators.MultimodalOps.m04.fn(spark, "/root/testdata/sf0.001")
    val plain = MultimodalPipeline.assetsFromDocuments(spark, "/root/testdata/sf0.001")
      .map { a => val (l, w, h) = ref(a.data); (a.asset_id, l, w, h) }(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
      .toDF("asset_id", "byte_len", "ws_count", "checksum")
      .orderBy("asset_id")
    assert(m04.collect().toSeq == plain.collect().toSeq)
    assert(m04.count() > 0)
  }
}
