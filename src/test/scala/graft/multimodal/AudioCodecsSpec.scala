package graft.multimodal

import graft.SparkSpec

/** Audio codec path (m07): real `javax.sound.sampled` decode equals
  * the generator arithmetic for both containers (little-endian WAV,
  * big-endian AIFF), batch-boundary reuse at the Arrow seam, and the
  * quarantine contract for undecodable / malformed / capped payloads.
  */
object AudioCodecsSpec {
  /** Plain reference: fold the m07 statistics straight from the
    * synthetic sample function (never touching encoded bytes).
    */
  def ref(id: Long): AudioCodecs.DecodedAudio = {
    val n = AudioCodecs.nSamples(id)
    var amp = 0L; var abs = 0L; var peak = 0L; var zc = 0L; var ck = 0L
    var prevNonNeg = false
    for (i <- 0 until n) {
      val r = AudioCodecs.raw(id, i)
      val s = r - 32768
      amp += s
      abs += math.abs(s.toLong)
      peak = math.max(peak, math.abs(s.toLong))
      val nonNeg = s >= 0
      if (i > 0 && nonNeg != prevNonNeg) zc += 1
      prevNonNeg = nonNeg
      ck = (ck * 131 + r) % 1000000007L
    }
    AudioCodecs.DecodedAudio(
      if (id % 2 == 0) "wave" else "aiff",
      n.toLong, AudioCodecs.SampleRate.toLong, amp, abs, peak, zc, ck)
  }
}

class AudioCodecsSpec extends SparkSpec {
  import AudioCodecsSpec.ref

  test("decoded samples equal the generator arithmetic for both containers") {
    // even id → hand-built little-endian WAV, odd id → JDK big-endian
    // AIFF; the decode must recover the exact raw(id,i) arithmetic
    // through the real codec path — any endianness or sign mistake
    // breaks every sum and the checksum
    Seq(0L, 1L, 42L, 43L, 101L, 500L).foreach { id =>
      val dec = AudioCodecs.decode(AudioCodecs.encode(id))
      assert(dec.contains(ref(id)), s"id $id")
    }
  }

  test("decodeAudio crosses batch boundaries and quarantines bad payloads") {
    import spark.implicits._
    val good = (0 until ArrowBatchStage.BatchRows + 19).map(i =>
      Asset(i.toLong, "audio", AudioCodecs.encode(i.toLong), 0, 0))
    // sniffable-but-capped: a real WAV whose header declares ~1G
    // frames (the MaxFrames probe must quarantine before buffering)
    val hugeFrames = AudioCodecs.encodeWav(2L)
    val bb = java.nio.ByteBuffer.wrap(hugeFrames).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue) // data-chunk size → declared frames ≈ 2^30
    // sniffable-but-unsupported: 8-bit sample size in the fmt chunk
    val eightBit = AudioCodecs.encodeWav(4L)
    java.nio.ByteBuffer.wrap(eightBit).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(34, 8.toShort)
    val bad = Seq(
      Asset(90001L, "audio", "not audio at all".getBytes("UTF-8"), 0, 0),
      Asset(90002L, "audio", AudioCodecs.encodeAiff(7L).take(20), 0, 0), // truncated AIFF
      Asset(90003L, "audio", hugeFrames, 0, 0),
      Asset(90004L, "audio", eightBit, 0, 0))
    val got = ArrowBatchStage.decodeAudio((good ++ bad).toDS().repartition(2))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(8)))).toMap
    good.foreach { a =>
      val d = ref(a.asset_id)
      assert(got(a.asset_id) == ((d.codec, d.nSamples, d.checksum)), s"asset ${a.asset_id}")
    }
    Seq(90001L, 90002L, 90003L, 90004L).foreach { id =>
      assert(got(id) == (("undecodable", -1L, 0L)), s"asset $id")
    }
  }

  test("m07 over sf0.001 is non-empty and fully decoded (no sentinels)") {
    val m07 = graft.operators.MultimodalOps.m07.fn(spark, "/root/testdata/sf0.001")
    val rows = m07.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1) != "undecodable"))
    // both containers present on real corpus ids
    assert(rows.map(_.getString(1)).toSet == Set("wave", "aiff"))
  }

  test("m14 fingerprint: DC-offset invariant, container-stable, pigeonhole-exact radius") {
    // DC invariance: shifting every sample by a constant (clamped to
    // stay in 16-bit range) leaves the delta-sign print unchanged
    val base = Array(-3000, -100, 250, 240, 9000, 8000, 8001, -20000, 500, 70)
    val shifted = base.map(_ + 1234)
    assert(AudioCodecs.deltaSignFingerprint(base, 20) ==
      AudioCodecs.deltaSignFingerprint(shifted, 20))
    // container stability: the same id decoded via WAV and AIFF
    // fingerprints identically (endianness mistakes would flip bits)
    Seq(0L, 7L, 42L).foreach { id =>
      def fpOf(bytes: Array[Byte]): Long =
        AudioCodecs.decodeSamples(bytes, 0, bytes.length)
          .map { case (_, _, _, s) => AudioCodecs.deltaSignFingerprint(s, 20) }
          .getOrElse(fail(s"id $id undecodable"))
      assert(fpOf(AudioCodecs.encodeWav(id)) == fpOf(AudioCodecs.encodeAiff(id)))
    }
    // 19 bits, 4 disjoint 5-bit bands: any two prints within hamming
    // <= 3 agree on at least one band (the m14 banding's exactness)
    val a = 0x7ffffL
    Seq(0x7ffffL ^ 0x5L, 0x7ffffL ^ 0x40020L, 0x7ffffL ^ 0x10101L).foreach { b =>
      assert(java.lang.Long.bitCount(a ^ b) <= 3)
      val agree = (0 until 4).exists(band =>
        ((a >> (band * 5)) & 31) == ((b >> (band * 5)) & 31))
      assert(agree, f"no band agrees for $b%x")
    }
  }
}
