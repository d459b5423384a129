package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** The video face of the multimodal pipeline: a minimal length-
  * prefixed frame container ("GVID") holding REAL encoded images, so
  * the frame-extraction path exercises genuine container parsing and
  * the per-frame decode runs the same `javax.imageio` codecs as m05.
  * (The JDK ships no video codec, so the container is ours — but
  * every byte inside it is a real BMP/PNG stream, and the walk has
  * all the failure modes a demuxer has: bad magic, truncated framing,
  * lying length fields, trailing junk.)
  *
  * Layout: 4-byte magic 'GVID' | u32 LE frame count | per frame:
  * u32 LE payload length + payload. Frame f of asset id is
  * [[ImageCodecs.encode]] of the derived id 97·id + f — even derived
  * ids BMP, odd PNG, so codecs alternate WITHIN one video and the
  * oracle replays every pixel arithmetically.
  *
  * Scale note: encode/parse are partition-local per-row kernels; the
  * frame walk yields (offset, length) slices into the original byte
  * array — no per-frame copies — and the per-frame decode reuses
  * [[ImageCodecs.decode]]'s range variant, the same zero-copy seam
  * the Arrow stage uses.
  */
object VideoCodecs {

  /** Frames per asset (2..5) — enough to alternate codecs in-video. */
  def nFrames(id: Long): Int = (id % 4 + 2).toInt

  /** Derived per-frame image id: prime-spread so consecutive assets
    * never share frame pixels.
    */
  def frameId(id: Long, f: Int): Long = id * 97 + f

  /** Parse ceiling: a 60-byte container can declare 2³¹ frames; cap
    * before trusting the header (the [[ImageCodecs.MaxPixels]]
    * discipline applied to framing).
    */
  val MaxFrames: Int = 65536

  def encode(id: Long): Array[Byte] = {
    val frames = (0 until nFrames(id)).map(f => ImageCodecs.encode(frameId(id, f)))
    val buf = ByteBuffer.allocate(8 + frames.map(4 + _.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('G'.toByte).put('V'.toByte).put('I'.toByte).put('D'.toByte)
    buf.putInt(frames.length)
    frames.foreach { fb => buf.putInt(fb.length); buf.put(fb) }
    buf.array()
  }

  /** Walk the framing; every frame is returned as an (offset, length)
    * slice into `data` — zero copies. None when the CONTAINER is
    * malformed (bad magic, truncated length word, frame running past
    * the buffer, trailing junk, absurd declared count); payload
    * validity is the image decoder's concern, per frame.
    */
  def decodeFrames(data: Array[Byte]): Option[IndexedSeq[(Int, Int)]] = {
    if (data.length < 8 ||
      data(0) != 'G' || data(1) != 'V' || data(2) != 'I' || data(3) != 'D')
      return None
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt(4)
    if (n < 0 || n > MaxFrames) return None
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var off = 8
    var i = 0
    while (i < n) {
      if (off + 4 > data.length) return None
      val len = buf.getInt(off)
      if (len < 0 || off.toLong + 4 + len > data.length) return None
      out += ((off + 4, len))
      off += 4 + len
      i += 1
    }
    if (off != data.length) return None
    Some(out.result())
  }
}
