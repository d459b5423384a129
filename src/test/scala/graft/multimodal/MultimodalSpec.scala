package graft.multimodal

import graft.SparkSpec

/** Multimodal pipeline: byte-feature kernel exactness + Spark plumbing. */
class MultimodalSpec extends SparkSpec {

  test("byteHistogram buckets by high nibble") {
    val hist = ByteFeatures.byteHistogram(Array[Byte](0x00, 0x0f, 0x10, 0x7f, -1))
    assert(hist(0) == 2L) // 0x00, 0x0f
    assert(hist(1) == 1L) // 0x10
    assert(hist(7) == 1L) // 0x7f
    assert(hist(15) == 1L) // 0xff
    assert(hist.sum == 5L)
  }

  test("checksum: rolling polynomial over bytes") {
    assert(ByteFeatures.checksum(Array.empty) == 0L)
    assert(ByteFeatures.checksum("a".getBytes) == 97L)
    assert(ByteFeatures.checksum("ab".getBytes) == 97L * 31 + 98)
  }

  test("frameSample: evenly spaced slices, clamped at the end") {
    val data = (0 until 100).map(_.toByte).toArray
    val frames = ByteFeatures.frameSample(data, 4, 10)
    assert(frames.size == 4)
    assert(frames.map(_.head.toInt) == Seq(0, 25, 50, 75))
    assert(ByteFeatures.frameSample(Array.empty, 4, 10).isEmpty)
  }

  test("extractFeatures runs partition-local over binary assets") {
    import spark.implicits._
    val assets = Seq(
      Asset(1L, "image", "hello world".getBytes, 8, 8),
      Asset(2L, "video", ("x" * 1000).getBytes, 16, 9),
      Asset(3L, "audio", Array.empty[Byte], 0, 0)).toDS()
    val feats = MultimodalPipeline.extractFeatures(assets)
      .collect().sortBy(_.asset_id)
    assert(feats.map(_.byte_len).toSeq == Seq(11, 1000, 0))
    assert(feats(0).checksum == ByteFeatures.checksum("hello world".getBytes))
    assert(feats(1).n_frames == 4)
    assert(feats(2).n_frames == 0)
    assert(feats(0).histogram.sum == 11L)
  }

  test("features DataFrame has the documented schema") {
    val df = MultimodalPipeline.features(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq == Seq("asset_id", "modality", "byte_len",
      "checksum", "n_frames", "hist_bucket0", "hist_total"))
    val first = df.head()
    assert(first.getLong(0) == 0L)
    assert(df.count() > 0)
  }

  test("pHash60 is codec-stable and bounded: same pixels, same hash via BMP and PNG") {
    Seq(0L, 5L, 42L, 101L, 256L).foreach { id =>
      val viaBmp = ImageCodecs.decodeImage(ImageCodecs.encodeBmp(id), 0,
        ImageCodecs.encodeBmp(id).length).map { case (_, i) => ImageCodecs.pHash60(i) }
      val viaPng = ImageCodecs.decodeImage(ImageCodecs.encodePng(id), 0,
        ImageCodecs.encodePng(id).length).map { case (_, i) => ImageCodecs.pHash60(i) }
      assert(viaBmp.isDefined && viaBmp == viaPng, s"id $id: $viaBmp vs $viaPng")
      assert(viaBmp.get >= 0L && viaBmp.get < (1L << 60))
    }
  }
}
