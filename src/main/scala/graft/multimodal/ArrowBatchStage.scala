package graft.multimodal

import org.apache.arrow.memory.{ArrowBuf, RootAllocator}
import org.apache.arrow.vector.{BigIntVector, VarBinaryVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

/** Columnar (Arrow-batch) stage for binary payloads — the Scala-native
  * equivalent of PySpark's `mapInArrow`.
  *
  * PySpark's `mapInArrow` is a Python-worker bridge: Spark serializes
  * each partition to Arrow record batches, ships them over a socket,
  * and a Python function maps batch → batch. On the JVM there is no
  * worker hop — the idiomatic shape is a `mapPartitions` stage that
  * assembles the SAME Arrow `VectorSchemaRoot` batches in-process and
  * runs a vectorized kernel directly over the Arrow buffers:
  *
  *   rows ─(batch fill)→ VectorSchemaRoot[asset_id, data]
  *        ─(kernel: one pass over the contiguous value buffer,
  *          row boundaries from the offset buffer)→
  *        VectorSchemaRoot[out columns]
  *        ─(drain)→ rows
  *
  * Why bother with Arrow at all in-JVM? The batch hand-off point is
  * exactly where a native media codec plugs in: a real decoder
  * (libjpeg/ffmpeg behind JNI or the Arrow C Data Interface) consumes
  * an Arrow batch pointer without copying — and [[decodeImages]] runs
  * a REAL codec (the JDK's javax.imageio) at exactly that seam, while
  * [[byteStats]] keeps the codec-free byte-arithmetic kernel,
  * oracle-checkable against DuckDB recomputing the same features from
  * the source text (ASCII corpus: codepoints = bytes, proven by m01).
  *
  * Design for 100 TB:
  *   - one allocator + two roots per PARTITION (not per batch), reused
  *     across batches; constant memory ∝ batch size, never ∝ partition.
  *   - each batch does ONE bulk copy of its value region into a
  *     reusable scratch array, then tight primitive-array passes —
  *     no per-row `Array[Byte]` allocation, no per-byte JNI chatter.
  *   - stays a narrow map stage: no shuffle, pipelines with the scan.
  *
  * Reference: chiv treats every cell as an opaque byte string
  * (chiv.go:152–199 formats [][]byte rows); it has no columnar or
  * media path — this is part of the training-pipeline extension
  * surface (SURVEY.md §2 "multimodal columns").
  */
object ArrowBatchStage {

  /** Rows per Arrow batch. Small enough that scratch = batch bytes
    * stays cache/heap-friendly at any payload size; large enough to
    * amortize batch setup. PySpark's default Arrow batch is 10k rows;
    * payloads here are documents (KBs), so batches are capped lower.
    */
  val BatchRows = 512

  private val Mod = 1000000007L

  private def bigint(name: String): Field =
    new Field(name, FieldType.notNullable(new ArrowType.Int(64, true)), null)

  /** The ONE copy of the load-bearing Arrow lifecycle, shared by every
    * kernel: allocator + two roots per partition (freed exactly once
    * at task completion), per-batch input fill, offset-buffer walk,
    * overflow-safe scratch growth and the single bulk value-region
    * copy. The `kernel` sees (input ids, scratch bytes, offset buffer,
    * first-offset, row count, output root) and must fill the output
    * root's vectors for rows 0..n-1; `drain` materializes each batch's
    * rows so the roots can be refilled.
    */
  private def binaryBatchStage[T: Encoder](assets: Dataset[Asset], outFields: () => Seq[Field])(
      kernel: (BigIntVector, Array[Byte], ArrowBuf, Int, Int, VectorSchemaRoot) => Unit)(
      drain: (VectorSchemaRoot, Int) => Array[T]): Dataset[T] = {
    assets.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val allocator = new RootAllocator()
        val inSchema = new Schema(java.util.Arrays.asList(
          bigint("asset_id"),
          new Field("data", FieldType.notNullable(ArrowType.Binary.INSTANCE), null)))
        val outSchema = new Schema(java.util.Arrays.asList(outFields(): _*))
        val inRoot = VectorSchemaRoot.create(inSchema, allocator)
        val outRoot = VectorSchemaRoot.create(outSchema, allocator)
        // Roots/allocator live for the whole task; freed exactly once at
        // task completion (success or failure) so the lazy flatMap below
        // can't outlive its buffers.
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
          inRoot.close(); outRoot.close(); allocator.close()
        })
        var scratch = new Array[Byte](64 * 1024)

        it.grouped(BatchRows).flatMap { batch =>
          val n = batch.size
          // ---- fill the input batch (row → Arrow) ----
          val idVec = inRoot.getVector("asset_id").asInstanceOf[BigIntVector]
          val dataVec = inRoot.getVector("data").asInstanceOf[VarBinaryVector]
          idVec.reset(); dataVec.reset()
          var i = 0
          batch.foreach { a =>
            idVec.setSafe(i, a.asset_id)
            dataVec.setSafe(i, a.data)
            i += 1
          }
          inRoot.setRowCount(n)

          // Row boundaries come from the offset buffer (4-byte ints,
          // n+1 entries); the value region [first, last) is copied ONCE
          // into the reusable scratch array.
          val offBuf = dataVec.getOffsetBuffer
          val first = offBuf.getInt(0L)
          val total = offBuf.getInt(n * 4L) - first
          // grow-to-fit without Int overflow (a doubling of
          // highestOneBit would go negative near 2^31)
          if (scratch.length < total)
            scratch = new Array[Byte](math.max(total, math.min(scratch.length * 2L, Int.MaxValue - 16).toInt))
          dataVec.getDataBuffer.getBytes(first.toLong, scratch, 0, total)

          // ---- vectorized kernel (Arrow buffers → Arrow buffers) ----
          kernel(idVec, scratch, offBuf, first, n, outRoot)
          outRoot.setRowCount(n)

          // ---- drain the output batch (Arrow → row) ----
          // Materialized per batch (≤ BatchRows tuples) so the output
          // root can be safely refilled by the next batch.
          drain(outRoot, n)
        }
      }
    }
  }

  /** Per-asset byte stats computed batch-at-a-time over Arrow buffers:
    * byte_len from the offset buffer alone, ws_count (bytes ≤ 0x20) and
    * a ×131 rolling checksum from one pass over the value buffer.
    */
  def byteStats(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    // schema built INSIDE the task (Arrow Field isn't serializable)
    binaryBatchStage[(Long, Long, Long, Long)](assets,
      () => Seq(bigint("asset_id"), bigint("byte_len"), bigint("ws_count"), bigint("checksum"))) {
      (idVec, scratch, offBuf, first, n, outRoot) =>
        val outId = outRoot.getVector("asset_id").asInstanceOf[BigIntVector]
        val outLen = outRoot.getVector("byte_len").asInstanceOf[BigIntVector]
        val outWs = outRoot.getVector("ws_count").asInstanceOf[BigIntVector]
        val outCk = outRoot.getVector("checksum").asInstanceOf[BigIntVector]
        var i = 0
        while (i < n) {
          val s = offBuf.getInt(i * 4L) - first
          val e = offBuf.getInt((i + 1) * 4L) - first
          var ws = 0L
          var h = 0L
          var j = s
          while (j < e) {
            val b = scratch(j) & 0xff
            if (b <= 0x20) ws += 1
            h = (h * 131 + b) % Mod
            j += 1
          }
          outId.setSafe(i, idVec.get(i))
          outLen.setSafe(i, (e - s).toLong)
          outWs.setSafe(i, ws)
          outCk.setSafe(i, h)
          i += 1
        }
    } { (outRoot, n) =>
      val outId = outRoot.getVector("asset_id").asInstanceOf[BigIntVector]
      val outLen = outRoot.getVector("byte_len").asInstanceOf[BigIntVector]
      val outWs = outRoot.getVector("ws_count").asInstanceOf[BigIntVector]
      val outCk = outRoot.getVector("checksum").asInstanceOf[BigIntVector]
      Array.tabulate(n)(i => (outId.get(i), outLen.get(i), outWs.get(i), outCk.get(i)))
    }.toDF("asset_id", "byte_len", "ws_count", "checksum")
  }

  /** REAL image decode at the Arrow batch seam — the codec the m04
    * scaffolding was built to host, now plugged in: each batch's
    * binary payloads land contiguously in the value buffer, and the
    * kernel runs `javax.imageio` (format sniff → PNG inflate / BMP
    * parse) over each row's range of that buffer, emitting per-image
    * stats (dimensions, per-channel sums, a row-major RGB rolling
    * checksum) into the output batch. A native decoder (libjpeg/ffmpeg
    * via JNI or the Arrow C Data Interface) would consume the very
    * same batch pointer; the JDK codecs prove the seam with zero new
    * dependencies.
    *
    * Quarantine policy: undecodable payloads (no registered reader,
    * truncated stream, malformed header, absurd declared canvas) emit
    * a `codec='undecodable'` sentinel row with width/height −1 — rows
    * stay accountable (a corrupt shard is visible downstream,
    * countable, and filterable) and one bad asset cannot kill a
    * 100 TB job. Pinned in ArrowBatchSpec.
    */
  def decodeImages(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    binaryBatchStage[(Long, String, Long, Long, Long, Long, Long, Long)](assets,
      () => Seq(bigint("asset_id"),
        new Field("codec", FieldType.notNullable(ArrowType.Utf8.INSTANCE), null),
        bigint("width"), bigint("height"),
        bigint("r_sum"), bigint("g_sum"), bigint("b_sum"), bigint("px_checksum"))) {
      (idVec, scratch, offBuf, first, n, outRoot) =>
        val outId = outRoot.getVector("asset_id").asInstanceOf[BigIntVector]
        val outCodec = outRoot.getVector("codec").asInstanceOf[VarCharVector]
        val outW = outRoot.getVector("width").asInstanceOf[BigIntVector]
        val outH = outRoot.getVector("height").asInstanceOf[BigIntVector]
        val outR = outRoot.getVector("r_sum").asInstanceOf[BigIntVector]
        val outG = outRoot.getVector("g_sum").asInstanceOf[BigIntVector]
        val outB = outRoot.getVector("b_sum").asInstanceOf[BigIntVector]
        val outCk = outRoot.getVector("px_checksum").asInstanceOf[BigIntVector]
        outCodec.reset()
        var i = 0
        while (i < n) {
          val s = offBuf.getInt(i * 4L) - first
          val e = offBuf.getInt((i + 1) * 4L) - first
          val dec = ImageCodecs.decode(scratch, s, e - s)
            .getOrElse(ImageCodecs.Decoded("undecodable", -1, -1, 0L, 0L, 0L, 0L))
          outId.setSafe(i, idVec.get(i))
          outCodec.setSafe(i, dec.codec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          outW.setSafe(i, dec.width.toLong)
          outH.setSafe(i, dec.height.toLong)
          outR.setSafe(i, dec.rSum)
          outG.setSafe(i, dec.gSum)
          outB.setSafe(i, dec.bSum)
          outCk.setSafe(i, dec.pxChecksum)
          i += 1
        }
    } { (outRoot, n) =>
      val outId = outRoot.getVector("asset_id").asInstanceOf[BigIntVector]
      val outCodec = outRoot.getVector("codec").asInstanceOf[VarCharVector]
      val outW = outRoot.getVector("width").asInstanceOf[BigIntVector]
      val outH = outRoot.getVector("height").asInstanceOf[BigIntVector]
      val outR = outRoot.getVector("r_sum").asInstanceOf[BigIntVector]
      val outG = outRoot.getVector("g_sum").asInstanceOf[BigIntVector]
      val outB = outRoot.getVector("b_sum").asInstanceOf[BigIntVector]
      val outCk = outRoot.getVector("px_checksum").asInstanceOf[BigIntVector]
      Array.tabulate(n)(i => (outId.get(i),
        new String(outCodec.get(i), java.nio.charset.StandardCharsets.UTF_8),
        outW.get(i), outH.get(i), outR.get(i), outG.get(i), outB.get(i), outCk.get(i)))
    }.toDF("asset_id", "codec", "width", "height", "r_sum", "g_sum", "b_sum", "px_checksum")
  }

  /** REAL audio decode at the same Arrow batch seam — the second
    * modality's codec plugged into the m04 scaffolding: each row's
    * range of the contiguous value buffer is sniffed and frame-parsed
    * by `javax.sound.sampled` (RIFF/WAV little-endian vs AIFF
    * big-endian resolved from the detected format), emitting per-clip
    * signal statistics (sample count, rate, amplitude/energy sums,
    * peak, zero crossings, a ×131 rolling checksum over unsigned
    * sample values) into the output batch. Quarantine mirrors
    * [[decodeImages]]: undecodable payloads emit a
    * `codec='undecodable'` sentinel row with n_samples −1 —
    * accountable, never job-fatal.
    */
  def decodeAudio(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    binaryBatchStage[(Long, String, Long, Long, Long, Long, Long, Long, Long)](assets,
      () => Seq(bigint("asset_id"),
        new Field("codec", FieldType.notNullable(ArrowType.Utf8.INSTANCE), null),
        bigint("n_samples"), bigint("sample_rate"),
        bigint("amp_sum"), bigint("abs_sum"), bigint("peak"),
        bigint("zero_crossings"), bigint("checksum"))) {
      (idVec, scratch, offBuf, first, n, outRoot) =>
        val outId = outRoot.getVector("asset_id").asInstanceOf[BigIntVector]
        val outCodec = outRoot.getVector("codec").asInstanceOf[VarCharVector]
        val outN = outRoot.getVector("n_samples").asInstanceOf[BigIntVector]
        val outRate = outRoot.getVector("sample_rate").asInstanceOf[BigIntVector]
        val outAmp = outRoot.getVector("amp_sum").asInstanceOf[BigIntVector]
        val outAbs = outRoot.getVector("abs_sum").asInstanceOf[BigIntVector]
        val outPeak = outRoot.getVector("peak").asInstanceOf[BigIntVector]
        val outZc = outRoot.getVector("zero_crossings").asInstanceOf[BigIntVector]
        val outCk = outRoot.getVector("checksum").asInstanceOf[BigIntVector]
        outCodec.reset()
        var i = 0
        while (i < n) {
          val s = offBuf.getInt(i * 4L) - first
          val e = offBuf.getInt((i + 1) * 4L) - first
          val dec = AudioCodecs.decode(scratch, s, e - s)
            .getOrElse(AudioCodecs.DecodedAudio("undecodable", -1L, -1L, 0L, 0L, 0L, 0L, 0L))
          outId.setSafe(i, idVec.get(i))
          outCodec.setSafe(i, dec.codec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          outN.setSafe(i, dec.nSamples)
          outRate.setSafe(i, dec.sampleRate)
          outAmp.setSafe(i, dec.ampSum)
          outAbs.setSafe(i, dec.absSum)
          outPeak.setSafe(i, dec.peak)
          outZc.setSafe(i, dec.zeroCrossings)
          outCk.setSafe(i, dec.checksum)
          i += 1
        }
    } { (outRoot, n) =>
      val outId = outRoot.getVector("asset_id").asInstanceOf[BigIntVector]
      val outCodec = outRoot.getVector("codec").asInstanceOf[VarCharVector]
      val outN = outRoot.getVector("n_samples").asInstanceOf[BigIntVector]
      val outRate = outRoot.getVector("sample_rate").asInstanceOf[BigIntVector]
      val outAmp = outRoot.getVector("amp_sum").asInstanceOf[BigIntVector]
      val outAbs = outRoot.getVector("abs_sum").asInstanceOf[BigIntVector]
      val outPeak = outRoot.getVector("peak").asInstanceOf[BigIntVector]
      val outZc = outRoot.getVector("zero_crossings").asInstanceOf[BigIntVector]
      val outCk = outRoot.getVector("checksum").asInstanceOf[BigIntVector]
      Array.tabulate(n)(i => (outId.get(i),
        new String(outCodec.get(i), java.nio.charset.StandardCharsets.UTF_8),
        outN.get(i), outRate.get(i), outAmp.get(i), outAbs.get(i),
        outPeak.get(i), outZc.get(i), outCk.get(i)))
    }.toDF("asset_id", "codec", "n_samples", "sample_rate",
      "amp_sum", "abs_sum", "peak", "zero_crossings", "checksum")
  }
}
