package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

/** REAL image encode/decode for the multimodal pipeline, built on the
  * JDK's own `javax.imageio` codecs (PNG/BMP/JPEG/GIF/TIFF readers
  * ship with every JRE and run headless — no native libraries, no
  * AWT display).
  *
  * Testdata strategy — deterministic images, oracle-replayable stats:
  * the container has no real media corpus, so payloads are SYNTHESIZED
  * per asset: every channel value is the pure arithmetic function
  *
  *     px(id, x, y, c) = (id·7 + x·3 + y·5 + c·11) mod 256
  *
  * encoded as a real on-disk image format (hand-built uncompressed
  * 24-bit BMP for even ids; JDK-encoded PNG for odd ids — two codecs,
  * one of them compressed). The decode operator (m05) then runs the
  * GENUINE path — format sniffing + `ImageIO.read` over the byte
  * stream — and emits pixel statistics; the DuckDB oracle replays the
  * arithmetic directly, never seeing the bytes. Both codecs are
  * lossless, so decode(encode(px)) = px exactly and any decoder
  * mis-step (stride, channel order, row direction, palette) breaks the
  * hash. The reference treats all cells as opaque bytes
  * (chiv.go:152–199); this is the training-pipeline extension surface.
  *
  * Scale note: encode/decode are partition-local per-row kernels — no
  * shuffle, no driver involvement; at 100 TB the images would arrive
  * from storage instead of a synthesizer, and ONLY the decode side
  * runs (see [[ArrowBatchStage.decodeImages]] for the batch seam).
  */
object ImageCodecs {

  // ImageIO's default ImageInputStream/ImageOutputStream cache is a
  // TEMP FILE per stream — two disk round-trips per image in a kernel
  // that never re-seeks. Disable once per JVM: streams then buffer in
  // memory (MemoryCache*Stream), and a read-only/full java.io.tmpdir
  // can no longer fail the job.
  ImageIO.setUseCache(false)

  /** Decode ceiling: reject images whose HEADER declares more pixels
    * than this before allocating anything (64 MPix ≈ a 256 MB ARGB
    * buffer). A crafted 60-byte BMP can declare a 2³¹-pixel canvas;
    * without the cap the reader's allocation — not the data — kills
    * the executor.
    */
  val MaxPixels: Long = 64L * 1024 * 1024

  /** The synthetic channel value at (x, y), channel c ∈ {0=R,1=G,2=B}. */
  def px(id: Long, x: Int, y: Int, c: Int): Int =
    ((id * 7 + x * 3 + y * 5 + c * 11) % 256).toInt

  /** Image dimensions as a pure function of the asset id (kept tiny:
    * the point is the codec path, not pixel volume).
    */
  def dims(id: Long): (Int, Int) = (((id % 5) + 4).toInt, ((id % 3) + 3).toInt)

  /** Hand-built uncompressed 24-bit BMP (BITMAPINFOHEADER): 54-byte
    * header, bottom-up rows, BGR byte order, rows padded to 4 bytes —
    * every byte a pure function of (id, x, y), so the payload itself
    * is reproducible, not just its decoded pixels.
    */
  def encodeBmp(id: Long): Array[Byte] = {
    val (w, h) = dims(id)
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h) // positive height = bottom-up
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        buf.put(px(id, x, y, 2).toByte) // B
        buf.put(px(id, x, y, 1).toByte) // G
        buf.put(px(id, x, y, 0).toByte) // R
        x += 1
      }
      var p = w * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** JDK-encoded PNG of the same pixel function — a real DEFLATE
    * stream the decoder must actually inflate.
    */
  def encodePng(id: Long): Array[Byte] = {
    val (w, h) = dims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (px(id, x, y, 0) << 16) | (px(id, x, y, 1) << 8) | px(id, x, y, 2))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Codec per asset: even ids BMP, odd ids PNG. */
  def encode(id: Long): Array[Byte] =
    if (id % 2 == 0) encodeBmp(id) else encodePng(id)

  final case class Decoded(
      codec: String, width: Int, height: Int,
      rSum: Long, gSum: Long, bSum: Long, pxChecksum: Long)

  private val Mod = 1000000007L

  /** The real decode: sniff the format from the byte stream, inflate /
    * parse it with the JDK reader, and fold per-channel sums plus a
    * ×131 rolling checksum over row-major (R,G,B) channel values —
    * exactly the sequence the oracle replays arithmetically. Returns
    * None for undecodable payloads (no registered reader, truncated
    * stream): the caller decides quarantine policy.
    */
  def decode(data: Array[Byte]): Option[Decoded] = decode(data, 0, data.length)

  /** Range variant so the Arrow stage can decode straight from its
    * batch scratch buffer without per-row slice copies; stats fold
    * over the pixels of [[decodeImage]]'s result.
    */
  def decode(data: Array[Byte], off: Int, len: Int): Option[Decoded] =
    decodeImage(data, off, len).map { case (codec, img) =>
      val (rs, gs, bs, ck) = pixelStats(img)
      Decoded(codec, img.getWidth, img.getHeight, rs, gs, bs, ck)
    }

  /** Per-channel sums + ×131 rolling checksum over row-major (R,G,B)
    * channel values — the shared stat fold of m05 (original pixels)
    * and m09 (resampled pixels).
    */
  def pixelStats(img: BufferedImage): (Long, Long, Long, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    var rs = 0L; var gs = 0L; var bs = 0L; var ck = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        rs += r; gs += g; bs += b
        ck = (ck * 131 + r) % Mod
        ck = (ck * 131 + g) % Mod
        ck = (ck * 131 + b) % Mod
        x += 1
      }
      y += 1
    }
    (rs, gs, bs, ck)
  }

  /** The raw decode: sniff → header-probe → parse, returning the
    * detected codec and the decoded image. None for undecodable
    * payloads — the caller decides quarantine policy.
    */
  def decodeImage(data: Array[Byte], off: Int, len: Int): Option[(String, BufferedImage)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(data, off, len))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        val codec = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        reader.setInput(iis)
        try {
          // header-only dimension probe BEFORE decode: a malformed-but-
          // sniffable payload can declare an absurd canvas
          val hw = reader.getWidth(0).toLong
          val hh = reader.getHeight(0).toLong
          if (hw <= 0 || hh <= 0 || hw * hh > MaxPixels)
            throw new java.io.IOException(s"graft: declared canvas ${hw}x$hh exceeds cap")
          Some((codec, reader.read(0)))
        } catch {
          // quarantine ANY decode failure, not just IOException:
          // javax.imageio readers throw RuntimeExceptions
          // (IllegalArgument, NegativeArraySize, IndexOutOfBounds…) on
          // malformed-but-sniffable payloads, and the one-bad-asset-
          // cannot-kill-the-job contract must hold for those too
          case scala.util.control.NonFatal(_) => None
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Nearest-neighbor resample to (ow × oh): out(x, y) = in(⌊x·w/ow⌋,
    * ⌊y·h/oh⌋) — pure integer index arithmetic, bit-reproducible on
    * any JVM and replayable by a SQL oracle, which Java2D's
    * `Graphics2D.drawImage` scaling is NOT (its filtering pipeline is
    * implementation-dependent). Works both directions (up- and
    * down-scale); NN is the resize every deterministic data pipeline
    * starts from — smoother kernels (bilinear &c.) would follow the
    * same decoded-pixel seam with a fixed-point weight table.
    */
  def resizeNearest(img: BufferedImage, ow: Int, oh: Int): BufferedImage = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < oh) {
      // Long index products: a MaxPixels-legal 2^26-wide source times
      // a large target x overflows Int and getRGB would see a
      // negative index
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        out.setRGB(x, y, img.getRGB((x.toLong * w / ow).toInt, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** 60-bit perceptual difference hash (dHash) over a decoded image:
    * a 10×6 grid of luma samples (integer nearest-neighbor, no
    * resampling kernel — exactly replayable arithmetic), bit k set
    * when the right neighbor of grid cell (k%10, k/10) is brighter.
    * 60 bits keeps the value positive in a BIGINT on both engines
    * (the d04 discipline); luma = (299r + 587g + 114b)/1000 integer.
    * Robust to the perturbations that break exact byte hashes
    * (re-encoding, scaling) because only gradient SIGNS survive into
    * the fingerprint.
    */
  def pHash60(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    def luma(x: Int, y: Int): Int = {
      val rgb = img.getRGB(x, y)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
    }
    var hash = 0L
    var k = 0
    while (k < 60) {
      val i = k % 10
      val j = k / 10
      val sy = j * h / 6
      if (luma((i + 1) * w / 11, sy) > luma(i * w / 11, sy)) hash |= 1L << k
      k += 1
    }
    hash
  }
}
