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
    // the real mp4 test is the 'ftyp' box at byte offset 4 — a leading-zero
    // prefix also matches ICO/TGA/zero-padded blobs
    val ftyp = lower(hex(substring(payload, 5, 4))) === "66747970"
    when(hx.startsWith("ffd8ff"), lit("jpeg"))
      .when(hx.startsWith("89504e47"), lit("png"))
      .when(hx.startsWith("52494646"), lit("riff")) // wav/avi/webp family
      // ID3 tag, or any MPEG frame sync (0xFF + top 3 bits of byte 2:
      // covers fff2/fff3/fffa/fffb and the ffe* MPEG-2 variants)
      .when(hx.startsWith("494433") || hx.startsWith("fff") || hx.startsWith("ffe"),
        lit("mp3"))
      .when(ftyp, lit("mp4"))
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
    * Empty payloads need the guard: `sequence(1, 0, step)` with an explicit
    * positive step throws (same trap [[graft.ops.Text.ngrams]] documents).
    */
  def frameOffsets(payload: Column, step: Int): Column =
    when(octet_length(payload) >= 1,
      sequence(lit(1), octet_length(payload), lit(step)))
      .otherwise(array().cast("array<int>"))

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
  /** JVM-side mirror of [[inferFormat]] for the `mapPartitions` decode
    * path — same rules, same labels, kept adjacent so they evolve together.
    */
  private def formatOf(b: Array[Byte]): String = {
    def at(i: Int) = if (i < b.length) b(i) & 0xFF else -1
    if (at(0) == 0xFF && at(1) == 0xD8 && at(2) == 0xFF) "jpeg"
    else if (at(0) == 0x89 && at(1) == 0x50 && at(2) == 0x4E && at(3) == 0x47) "png"
    else if (at(0) == 0x52 && at(1) == 0x49 && at(2) == 0x46 && at(3) == 0x46) "riff"
    else if ((at(0) == 0x49 && at(1) == 0x44 && at(2) == 0x33) ||
             (at(0) == 0xFF && at(1) >= 0 && (at(1) & 0xE0) == 0xE0)) "mp3"
    else if (at(4) == 0x66 && at(5) == 0x74 && at(6) == 0x79 && at(7) == 0x70) "mp4"
    else "unknown"
  }

  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          (id, formatOf(b), b.length.toLong, fakeDecode(b, dim))
        }
      }
      .toDF(idCol, "format", "byte_len", "features")
  }
}
