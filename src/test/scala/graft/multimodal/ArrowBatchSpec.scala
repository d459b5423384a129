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

  test("ImageCodecs: decoded pixels equal the generator arithmetic for both codecs") {
    // even id → hand-built BMP, odd id → JDK PNG; decode must recover
    // the exact px(id,x,y,c) arithmetic through the real codec path
    Seq(42L, 43L, 0L, 101L).foreach { id =>
      val (w, h) = ImageCodecs.dims(id)
      val dec = ImageCodecs.decode(ImageCodecs.encode(id)).get
      assert(dec.codec == (if (id % 2 == 0) "bmp" else "png"), s"id $id")
      assert((dec.width, dec.height) == ((w, h)))
      var rs = 0L; var gs = 0L; var bs = 0L; var ck = 0L
      for (y <- 0 until h; x <- 0 until w) {
        rs += ImageCodecs.px(id, x, y, 0)
        gs += ImageCodecs.px(id, x, y, 1)
        bs += ImageCodecs.px(id, x, y, 2)
        for (c <- 0 to 2) ck = (ck * 131 + ImageCodecs.px(id, x, y, c)) % 1000000007L
      }
      assert((dec.rSum, dec.gSum, dec.bSum, dec.pxChecksum) == ((rs, gs, bs, ck)), s"id $id")
    }
  }

  test("decodeImages crosses batch boundaries and quarantines undecodable payloads") {
    import spark.implicits._
    // > BatchRows real images (mixed codecs) + junk payloads, few
    // partitions → root-reuse across refills, sentinel contract pinned
    val good = (0 until ArrowBatchStage.BatchRows + 23).map(i =>
      Asset(i.toLong, "image", ImageCodecs.encode(i.toLong), 0, 0))
    // sniffable-but-malformed: a real BMP whose header declares a
    // 2^31-pixel canvas (reader throws a RuntimeException or would
    // allocate GBs — the MaxPixels probe must quarantine it first)
    val hugeCanvas = ImageCodecs.encodeBmp(2L)
    val bb = java.nio.ByteBuffer.wrap(hugeCanvas).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, Int.MaxValue) // width
    bb.putInt(22, Int.MaxValue) // height
    val bad = Seq(
      Asset(90001L, "image", "not an image at all".getBytes("UTF-8"), 0, 0),
      Asset(90002L, "image", ImageCodecs.encodePng(7L).take(20), 0, 0), // truncated PNG
      Asset(90003L, "image", hugeCanvas, 0, 0))
    val got = ArrowBatchStage.decodeImages((good ++ bad).toDS().repartition(2))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(7)))).toMap
    good.foreach { a =>
      val d = ImageCodecs.decode(a.data).get
      assert(got(a.asset_id) == ((d.codec, d.width.toLong, d.height.toLong, d.pxChecksum)))
    }
    assert(got(90001L) == (("undecodable", -1L, -1L, 0L)))
    assert(got(90002L) == (("undecodable", -1L, -1L, 0L)))
    assert(got(90003L) == (("undecodable", -1L, -1L, 0L)))
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
