package graft.operators

import graft.{QueryDef, Qdsl, Tables}
import Qdsl._
import org.apache.spark.sql.functions._

/** Multimodal/binary column operators (queries-map surface; the
  * reusable pipeline lives in [[graft.multimodal.MultimodalPipeline]]).
  */
object MultimodalOps {

  def queries: Seq[QueryDef] = Seq(m01, m02, m03)

  /** Binary payload features computed relationally: byte length, head
    * bytes as hex, and an additive codepoint checksum — all
    * oracle-checkable (the corpus is ASCII, so codepoints = bytes).
    */
  val m01 = QueryDef(
    "m01_binary_features",
    Some("""SELECT doc_id,
      CAST(strlen(text) AS BIGINT) AS byte_len,
      hex(encode(substr(text, 1, 8))) AS head_hex,
      list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(1, length(text) + 1), i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))),
        (acc, c) -> (acc + c) % 997) AS checksum
      FROM documents ORDER BY doc_id""")) { (s, d) =>
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        big(octet_length(col("text"))).as("byte_len"),
        hex(encode(substring(col("text"), 1, 8), "UTF-8")).as("head_hex"),
        expr("rolling_hash(text, 1L, 997L)").as("checksum"))
      .orderBy("doc_id")
  }

  /** Stubbed decode pipeline end-to-end (mapPartitions over binary
    * payloads → typed features). Feature values come from the Scala
    * decode stub → rows-only driver check; the Scala-side unit spec
    * asserts the exact values.
    */
  val m02 = QueryDef("m02_decode_pipeline", None) { (s, d) =>
    graft.multimodal.MultimodalPipeline.features(s, d)
  }

  /** Frame sampling as a generator: "video" assets explode into 4
    * frame rows each with per-frame byte features — the row-explosion
    * shape a real video pipeline has (asset → frames → per-frame
    * model input). Frame values come from the deterministic stub →
    * rows-only check.
    */
  val m03 = QueryDef("m03_frame_sample", None) { (s, d) =>
    import org.apache.spark.sql.Encoders
    val assets = graft.multimodal.MultimodalPipeline.assetsFromDocuments(s, d)
      .filter(_.modality == "video")
    val frames = assets.mapPartitions { it =>
      it.flatMap { a =>
        graft.multimodal.ByteFeatures.frameSample(a.data, 4, 256)
          .zipWithIndex.map { case (f, i) =>
            (a.asset_id, i, f.length, graft.multimodal.ByteFeatures.checksum(f))
          }
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaLong))
    frames.toDF("asset_id", "frame_no", "frame_bytes", "frame_checksum")
      .orderBy("asset_id", "frame_no")
  }
}
