package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus a feature-extraction path.
  *
  * The DECODE itself is a deterministic STUB ([[fakeDecode]]) — the real
  * codec libraries are not in this container. Everything around it is the
  * real 100 TB design: payloads never leave their partition (feature
  * extraction is `mapPartitions`, no shuffle), metadata is computed by
  * codegen'd expressions in the scan stage, and the output schema is fixed
  * `(id, format, byte_len, features: array<float>)` so downstream similarity
  * ops ([[Similarity]]) consume it directly.
  */
object Multimodal {

  /** Magic-byte container sniffing on the payload prefix. */
  def inferFormat(payload: Column): Column = {
    val hx = lower(hex(substring(payload, 1, 8)))
    when(hx.startsWith("ffd8ff"), lit("jpeg"))
      .when(hx.startsWith("89504e47"), lit("png"))
      .when(hx.startsWith("52494646"), lit("riff")) // wav/avi/webp family
      .when(hx.startsWith("494433") || hx.startsWith("fffb"), lit("mp3"))
      .when(hx.startsWith("000000"), lit("mp4"))
      .otherwise(lit("unknown"))
  }

  /** Typed metadata struct — pure expressions, fused into the scan stage. */
  def mediaMeta(payload: Column): Column =
    struct(
      inferFormat(payload).as("format"),
      octet_length(payload).as("byte_len"),
      sha2(payload, 256).as("sha"))

  /** Every-`step`-th byte offsets (frame-sampling shape for fixed-rate
    * payloads): 1-based positions, computed without touching the bytes.
    */
  def frameOffsets(payload: Column, step: Int): Column =
    sequence(lit(1), octet_length(payload), lit(step))

  private def asCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def asExpr(c: Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)

  /** REAL header parsing (not the decode stub): `struct(width, height)`
    * from PNG/JPEG/GIF headers, NULL on anything else — the resolution /
    * aspect-ratio gate of an image-curation pipeline, run in the scan
    * stage over header bytes only.
    */
  def imageDims(payload: Column): Column =
    asCol(graft.expr.ImageDims(asExpr(payload)))

  /** REAL WAV header parsing: `struct(sample_rate, channels,
    * bits_per_sample)` from the RIFF fmt chunk, NULL otherwise.
    */
  def wavInfo(payload: Column): Column =
    asCol(graft.expr.WavInfo(asExpr(payload)))

  /** Deterministic stand-in for a real decoder (STUB — see object docs): a
    * rolling hash of the bytes seeds each feature lane. Real decode would
    * replace only this function; the Spark plumbing is unchanged.
    */
  def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h   = 1125899906842597L
    var i   = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      out(i % dim) += (h % 1000003L).toFloat / 1000003f
      i += 1
    }
    out
  }

  /** Batch feature extraction: `(id, payload)` → `(id, format, byte_len,
    * features)`. `mapPartitions`, so each executor decodes its partition's
    * payloads in one pass — no shuffle, no driver involvement, and the
    * partition is the batch unit a native decoder would amortize setup over.
    */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          (id, b.length.toLong, fakeDecode(b, dim))
        }
      }
      .toDF(idCol, "byte_len", "features")
  }
}
