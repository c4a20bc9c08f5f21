package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Real container-header parsers for multimodal `binary` columns — byte
  * arithmetic only, no codec libraries, so unlike the (stubbed) pixel
  * decode these run for real in any environment. They extract the metadata
  * a curation pipeline filters on (resolution gates, aspect-ratio gates,
  * sample-rate gates) WITHOUT decoding payloads — a scan-stage expression
  * over the first kilobyte of each blob.
  */

/** Image dimensions from PNG (IHDR), JPEG (SOF marker scan), or GIF
  * (logical screen descriptor) headers; NULL for anything else or any
  * truncated/corrupt header — a malformed blob must route to a filter,
  * not kill the job.
  */
case class ImageDims(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_dims expects binary, got ${other.simpleString}")
  }

  override def nullable: Boolean = true

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int = ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imageDims", this)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("dims")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  def compute(b: Array[Byte]): InternalRow = {
    val dims: (Int, Int) =
      if (b.length >= 24 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
          // full signature (\r\n\x1a\n) AND the IHDR tag at offset 12 — a
          // corrupt blob that merely starts \x89PNG would otherwise yield
          // garbage (possibly negative) dimensions instead of NULL
          b(4) == 0x0d.toByte && b(5) == 0x0a.toByte &&
          b(6) == 0x1a.toByte && b(7) == 0x0a.toByte &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        // PNG: 8-byte signature, IHDR length+type (8), then width/height BE32
        (be32(b, 16), be32(b, 20))
      } else if (b.length >= 4 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte) {
        // JPEG: walk marker segments to the first SOFn (C0–CF except C4/C8/CC)
        var i = 2
        var found: (Int, Int) = null
        while (found == null && i + 9 < b.length && b(i) == 0xff.toByte) {
          val m = b(i + 1) & 0xff
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            found = (be16(b, i + 7), be16(b, i + 5)) // (width, height)
          } else if (m == 0xff) {
            i += 1 // fill byte (spec B.1.1.2): markers may be 0xFF-padded
          } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) {
            i += 2 // standalone marker, no length field
          } else {
            i += 2 + be16(b, i + 2) // skip the segment payload
          }
        }
        found
      } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
        (le16(b, 6), le16(b, 8)) // GIF logical screen, LE16
      } else null
    if (dims == null) null else InternalRow(dims._1, dims._2)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** WAV (RIFF/WAVE) audio header: (sample_rate, channels, bits_per_sample)
  * from the fmt chunk, walked chunk-by-chunk (the fmt chunk is usually but
  * not always first). NULL for non-WAV or truncated input.
  */
case class WavInfo(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_info expects binary, got ${other.simpleString}")
  }

  override def nullable: Boolean = true

  private def le16(b: Array[Byte], i: Int): Int = ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wavInfo", this)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("wav")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 36 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return null
    // walk in Long space: a crafted chunk size near Int.MaxValue must not
    // overflow `i` negative (corrupt input yields NULL, never a crash)
    var i = 12L
    while (i + 8 <= b.length) {
      val size = le32(b, i.toInt + 4).toLong & 0xffffffffL
      if (b(i.toInt) == 'f' && b(i.toInt + 1) == 'm' &&
          b(i.toInt + 2) == 't' && b(i.toInt + 3) == ' ') {
        if (i + 8 + 16 > b.length || size < 16) return null
        val j = i.toInt
        return InternalRow(le32(b, j + 12), le16(b, j + 10), le16(b, j + 22))
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    null
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
