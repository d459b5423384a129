package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec

/** Video container path (m08): the GVID frame walk recovers exactly
  * the per-frame images the generator encoded (both codecs, decoded
  * through the real `javax.imageio` path), and every demuxer failure
  * mode — junk magic, truncated framing, lying length fields,
  * trailing bytes, absurd declared counts — is rejected at the
  * container level while a corrupt single frame quarantines alone.
  */
class VideoContainerSpec extends SparkSpec {

  private def le(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  test("frame walk recovers every encoded frame; codecs alternate in-video") {
    Seq(0L, 1L, 5L, 42L, 101L).foreach { id =>
      val data = VideoCodecs.encode(id)
      val frames = VideoCodecs.decodeFrames(data)
      assert(frames.isDefined, s"id $id")
      assert(frames.get.length == VideoCodecs.nFrames(id), s"id $id")
      val decoded = frames.get.zipWithIndex.map { case ((off, len), f) =>
        val d = ImageCodecs.decode(data, off, len)
        assert(d.isDefined, s"id $id frame $f")
        // slice-decode equals whole-array decode of the frame image:
        // the (offset,length) walk introduced no drift
        assert(d == ImageCodecs.decode(ImageCodecs.encode(VideoCodecs.frameId(id, f))),
          s"id $id frame $f")
        d.get
      }
      // even derived id → bmp, odd → png; with 97·id+f the parity
      // flips every frame, so both codecs appear in every video
      decoded.zipWithIndex.foreach { case (d, f) =>
        val want = if (VideoCodecs.frameId(id, f) % 2 == 0) "bmp" else "png"
        assert(d.codec == want, s"id $id frame $f")
      }
      assert(decoded.map(_.codec).toSet == Set("bmp", "png"), s"id $id")
    }
  }

  test("container-level failure modes all reject") {
    val good = VideoCodecs.encode(3L)

    // junk magic
    assert(VideoCodecs.decodeFrames("not a video".getBytes("UTF-8")).isEmpty)
    // too short for even the header
    assert(VideoCodecs.decodeFrames(good.take(7)).isEmpty)
    // truncated mid-framing (length word or payload cut off)
    assert(VideoCodecs.decodeFrames(good.take(10)).isEmpty)
    assert(VideoCodecs.decodeFrames(good.dropRight(1)).isEmpty)
    // trailing junk after the last frame
    assert(VideoCodecs.decodeFrames(good :+ 0.toByte).isEmpty)
    // lying length field: first frame claims one byte more than it has
    val lying = good.clone()
    le(lying).putInt(8, le(good).getInt(8) + 1)
    assert(VideoCodecs.decodeFrames(lying).isEmpty)
    // negative length field
    val neg = good.clone()
    le(neg).putInt(8, -5)
    assert(VideoCodecs.decodeFrames(neg).isEmpty)
    // absurd declared count (2^31-ish from a 60-byte container)
    val absurd = good.clone()
    le(absurd).putInt(4, Int.MaxValue)
    assert(VideoCodecs.decodeFrames(absurd).isEmpty)
  }

  test("a corrupt frame quarantines alone; siblings still decode") {
    val id = 4L
    val data = VideoCodecs.encode(id)
    val frames = VideoCodecs.decodeFrames(data).get
    // zero out frame 1's payload: the container walk still succeeds
    // (framing is intact) but that frame's image decode must fail
    val corrupt = data.clone()
    val (off1, len1) = frames(1)
    java.util.Arrays.fill(corrupt, off1, off1 + len1, 0.toByte)
    val walked = VideoCodecs.decodeFrames(corrupt)
    assert(walked.contains(frames))
    walked.get.zipWithIndex.foreach { case ((off, len), f) =>
      val d = ImageCodecs.decode(corrupt, off, len)
      if (f == 1) assert(d.isEmpty) else assert(d.isDefined, s"frame $f")
    }
  }

  test("m08 over sf0.001 is non-empty, fully decoded, both codecs present") {
    val rows = graft.operators.MultimodalOps.m08.fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(2) != "quarantine"))
    assert(rows.map(_.getString(2)).toSet == Set("bmp", "png"))
    // frame counts per asset follow nFrames
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      assert(rs.length == VideoCodecs.nFrames(id), s"asset $id")
    }
  }
}
