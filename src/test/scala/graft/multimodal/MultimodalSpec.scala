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

  test("resizeNearest: identity at same dims, exact index map both directions") {
    Seq(0L, 7L, 42L).foreach { id =>
      val bytes = ImageCodecs.encode(id)
      val (_, img) = ImageCodecs.decodeImage(bytes, 0, bytes.length).get
      val w = img.getWidth
      val h = img.getHeight
      // identity resize must reproduce every source pixel verbatim
      val same = ImageCodecs.resizeNearest(img, w, h)
      for (y <- 0 until h; x <- 0 until w)
        assert(same.getRGB(x, y) == img.getRGB(x, y))
      // up- and down-scale both follow out(x,y) = in(⌊x·w/ow⌋,⌊y·h/oh⌋)
      for ((ow, oh) <- Seq((8, 8), (2, 2), (11, 3))) {
        val t = ImageCodecs.resizeNearest(img, ow, oh)
        for (y <- 0 until oh; x <- 0 until ow)
          assert(t.getRGB(x, y) == img.getRGB(x * w / ow, y * h / oh),
            s"id $id out ($ow x $oh) at ($x,$y)")
      }
    }
  }

  test("m09 thumbnail stats are codec-stable: BMP and PNG of one id agree") {
    Seq(4L, 9L).foreach { id =>
      val stats = Seq(ImageCodecs.encodeBmp(id), ImageCodecs.encodePng(id)).map { b =>
        val (_, img) = ImageCodecs.decodeImage(b, 0, b.length).get
        ImageCodecs.pixelStats(ImageCodecs.resizeNearest(img, 8, 8))
      }
      assert(stats.head == stats.last)
    }
  }

  test("m10 entropy: bounded, zero iff one bucket, flag matches the integer rule") {
    val rows = graft.operators.MultimodalOps.m10.fn(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nPx, nBuckets, contrast, entNano, entropy, low) =>
      assert(entropy >= 0.0 && entropy <= math.log(8.0) + 1e-9, s"asset $id")
      assert((entropy == 0.0) == (nBuckets == 1L), s"asset $id")
      assert((nBuckets == 1L) || contrast > 0L, s"asset $id")
      assert(low == (entNano < nPx * 1000000000L), s"asset $id")
      assert(entropy == entNano.toDouble / (nPx * 1000000000L).toDouble, s"asset $id")
    }
    // independent replay of one asset from the synthetic pixel function
    val (id, nPx, _, contrast, entNano, _, _) = rows.head
    val (w, h) = ImageCodecs.dims(id)
    val lums = for (y <- 0 until h; x <- 0 until w) yield
      (299 * ImageCodecs.px(id, x, y, 0) + 587 * ImageCodecs.px(id, x, y, 1) +
        114 * ImageCodecs.px(id, x, y, 2)) / 1000
    assert(nPx == w.toLong * h)
    assert(contrast == (lums.max - lums.min).toLong)
    val ln = (1 to 40).map(n => math.round(math.log(n.toDouble) * 1e9))
    val s = lums.groupBy(_ / 32).values
      .map(g => g.size.toLong * (ln(lums.size - 1) - ln(g.size - 1))).sum
    assert(entNano == s, s"asset $id entropy sum diverged from pixel replay")
  }

  test("m16 eval: pigeonhole recall is exactly 1.0 and the counts reconcile") {
    val r = graft.Registry.byName("m16_neardup_eval")
      .fn(spark, "/root/testdata/sf0.001").head()
    val (nHashes, nTrue, nCand, nCandTrue) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nHashes > 0 && nTrue > 0, "eval must run on a live fingerprint space")
    // the pigeonhole theorem as data: 4 bands x 15 bits surface EVERY
    // hamming<=3 pair — a band-geometry edit that breaks the
    // guarantee fails here, in-repo, not only at the external oracle
    assert(nCandTrue == nTrue && r.getDouble(4) == 1.0,
      s"banding missed ${nTrue - nCandTrue} of $nTrue true pairs")
    // precision is candidate-true over candidates (never n_true/n_cand
    // — those only agree while recall is 1.0) and bounded by both
    assert(nCand >= nCandTrue)
    assert(r.getDouble(5) == nCandTrue.toDouble / nCand)
    assert(r.getLong(6) >= 1L, "occupancy max must see at least one hash")
  }
}
