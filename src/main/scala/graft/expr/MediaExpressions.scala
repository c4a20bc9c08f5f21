package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Real container parsers for multimodal `binary` columns — byte
  * arithmetic plus the JDK's raw `Inflater`, no codec libraries.
  * [[ImageDims]]/[[WavInfo]] extract the metadata a curation pipeline
  * filters on (resolution gates, aspect-ratio gates, sample-rate gates)
  * WITHOUT decoding payloads — scan-stage expressions over the first
  * kilobyte of each blob. [[PngGrayCells]] goes further: a REAL pixel
  * decode (inflate + all five PNG scanline filters) folded straight into
  * the perceptual-hash grid, so image near-dup runs as a codegen'd
  * scan-stage expression too.
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

/** REAL PNG pixel decode, folded to a perceptual-hash luminance grid:
  * walks the chunk chain, inflates the concatenated IDAT zlib stream
  * (`java.util.zip.Inflater` — the deflate spec, not a codec library),
  * reverses all five scanline filters (None/Sub/Up/Average/Paeth,
  * RFC 2083 §6), and returns the `gh × gw` row-major grid of per-cell
  * integer luminance sums — pixel (x, y) lands in cell
  * `(y·gh DIV height, x·gw DIV width)` with luma `1000·v` for 8-bit
  * grayscale and `299·r + 587·g + 114·b` for 8-bit truecolor (the
  * BT.601 integer weights, which sum to 1000 — the two color types
  * score identically on gray content). Exact integer math end to end, so
  * an oracle that replays the payload's generative pixel formula
  * hash-matches bit-for-bit.
  *
  * Supported: 8-bit depth, color types 0 (gray) and 2 (RGB),
  * non-interlaced, zlib without preset dictionary — the overwhelmingly
  * common encoder output. Anything else, any truncated/corrupt stream,
  * and any image past the 2^24-pixel decompression-bomb cap returns NULL
  * (a malformed blob must route to a filter, not kill the job).
  * Tolerant-reader semantics: chunk CRCs and the zlib adler trailer are
  * not verified — a flipped CRC byte should not disqualify an otherwise
  * decodable image from DEDUP (this is a similarity gate, not an
  * integrity check).
  */
case class PngGrayCells(child: Expression, gw: Int, gh: Int)
    extends UnaryExpression {
  require(gw >= 2 && gh >= 1 && gw * gh <= 4096, "grid in [2..] x [1..], at most 4096 cells")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_gray_cells expects binary, got ${other.simpleString}")
  }

  override def nullable: Boolean = true

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pngGrayCells", this)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cells")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  def compute(b: Array[Byte]): Any = {
    // signature + IHDR-first (spec-mandated chunk order)
    if (b.length < 33 || b(0) != 0x89.toByte || b(1) != 'P' || b(2) != 'N' || b(3) != 'G' ||
        b(4) != 0x0d || b(5) != 0x0a || b(6) != 0x1a || b(7) != 0x0a ||
        be32(b, 8) != 13 || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return null
    val w = be32(b, 16); val h = be32(b, 20)
    val depth = b(24) & 0xff; val ctype = b(25) & 0xff
    val comp = b(26) & 0xff; val filt = b(27) & 0xff; val inter = b(28) & 0xff
    // bound each axis BEFORE multiplying: w and h are unsigned 32-bit
    // reads, so a crafted IHDR (e.g. both 0xC0000000) would overflow the
    // Long product past the bomb cap and crash on allocation instead of
    // routing to NULL
    if (w < 1 || h < 1 || w > (1L << 24) || h > (1L << 24) ||
        w * h > (1L << 24) || depth != 8 ||
        (ctype != 0 && ctype != 2) || comp != 0 || filt != 0 || inter != 0) return null
    val bpp = if (ctype == 0) 1 else 3
    // walk chunks, concatenating IDAT payloads (CRCs skipped, not checked)
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8L
    var ended = false
    while (!ended && off + 8 <= b.length) {
      val len = be32(b, off.toInt)
      val t0 = b(off.toInt + 4); val t1 = b(off.toInt + 5)
      val t2 = b(off.toInt + 6); val t3 = b(off.toInt + 7)
      val body = off + 8
      if (body + len + 4 > b.length) return null // truncated chunk
      if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T')
        idat.write(b, body.toInt, len.toInt)
      if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') ended = true
      off = body + len + 4 // + CRC
    }
    val z = idat.toByteArray
    // zlib header: CM = 8 (deflate), no preset dictionary; trailer unchecked
    if (z.length < 3 || (z(0) & 0x0f) != 8 || (z(1) & 0x20) != 0) return null
    val stride = 1 + w.toInt * bpp
    val raw = new Array[Byte](h.toInt * stride)
    val inf = new java.util.zip.Inflater(true) // raw deflate; we skip the 2-byte header
    try {
      inf.setInput(z, 2, z.length - 2)
      var got = 0
      var n = 0
      do {
        n = try inf.inflate(raw, got, raw.length - got)
            catch { case _: java.util.zip.DataFormatException => return null }
        got += n
      } while (n > 0 && got < raw.length)
      if (got < raw.length) return null // short stream
    } finally inf.end()
    // reverse scanline filters in place (RFC 2083 §6.6): a = left, bb = up,
    // c = upper-left, all 0 outside the image
    var y = 0
    while (y < h) {
      val rs = y.toInt * stride
      val ft = raw(rs) & 0xff
      if (ft > 4) return null
      var i = 1
      while (i < stride) {
        val a  = if (i > bpp) raw(rs + i - bpp) & 0xff else 0
        val bb = if (y > 0) raw(rs - stride + i) & 0xff else 0
        val c  = if (y > 0 && i > bpp) raw(rs - stride + i - bpp) & 0xff else 0
        val x  = raw(rs + i) & 0xff
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + bb
          case 3 => x + (a + bb) / 2
          case 4 => // Paeth predictor
            val p = a + bb - c
            val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c)
        }
        raw(rs + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    // fold to the luminance grid
    val cells = new Array[Long](gw * gh)
    y = 0
    while (y < h) {
      // Long products: y·gh / x·gw overflow Int once w·h approaches the cap
      val cy = (y.toLong * gh / h).toInt * gw
      val rs = y.toInt * stride + 1
      var x = 0
      while (x < w) {
        val luma =
          if (bpp == 1) 1000L * (raw(rs + x) & 0xff)
          else 299L * (raw(rs + 3 * x) & 0xff) + 587L * (raw(rs + 3 * x + 1) & 0xff) +
            114L * (raw(rs + 3 * x + 2) & 0xff)
        cells(cy + (x.toLong * gw / w).toInt) += luma
        x += 1
      }
      y += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(cells)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** REAL WAV/PCM decode as a codegen'd scan-stage expression — the
  * [[graft.ops.Multimodal.decodeWavPcm]] byte walk (RIFF chunks, 16-bit
  * little-endian samples, exact integer feature folds) lifted out of its
  * former `mapPartitions` site so the decode fuses into whole-stage
  * codegen with the hashing/banding expressions that consume it. NULL for
  * anything that is not a complete 16-bit PCM WAV.
  */
case class WavPcmFeatures(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 1 && dim <= 4096, "dim in [1, 4096]")

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
    StructField("bits", IntegerType), StructField("n_samples", LongType),
    StructField("sum_s", LongType), StructField("sum_sq", LongType),
    StructField("peak", LongType), StructField("zero_cross", LongType),
    StructField("features", ArrayType(LongType, containsNull = false))))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_pcm_features expects binary, got ${other.simpleString}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wavPcmFeatures", this)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("pcm")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r =
         |  (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  def compute(b: Array[Byte]): Any =
    graft.ops.Multimodal.decodeWavPcm(b, dim) match {
      case Some(p) => InternalRow(p.sampleRate, p.channels, p.bits, p.nSamples,
        p.sumS, p.sumSq, p.peak, p.zeroCross,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(p.laneSums))
      case None => null
    }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** REAL GIF pixel decode, folded to the same perceptual-hash luminance
  * grid as [[PngGrayCells]]: header + logical screen descriptor, global
  * color table, extension-block skip, first image descriptor (local
  * palette honored, interlace's four-pass row order reversed), then a
  * full variable-width LSB-first LZW decode (clear/EOI, dictionary
  * growth to 4096, width bumps at powers of two) — the actual GIF87a/89a
  * bitstream, not a subset. Pixels map through the palette to BT.601
  * integer luma (`299·r + 587·g + 114·b`), so a gray palette scores
  * identically to [[PngGrayCells]] on the same content.
  *
  * First frame only (the frame-sample convention for animated GIFs).
  * Corrupt/truncated streams, missing palettes, and anything past the
  * 2^24-pixel decompression-bomb cap return NULL.
  */
case class GifGrayCells(child: Expression, gw: Int, gh: Int)
    extends UnaryExpression {
  require(gw >= 2 && gh >= 1 && gw * gh <= 4096, "grid in [2..] x [1..], at most 4096 cells")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gif_gray_cells expects binary, got ${other.simpleString}")
  }

  override def nullable: Boolean = true

  private def le16(b: Array[Byte], i: Int): Int = ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gifGrayCells", this)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("gcells")
      s"""
         |Object $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }

  def compute(b: Array[Byte]): Any = {
    if (b.length < 14 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        (b(4) != '7' && b(4) != '9') || b(5) != 'a') return null
    var off = 6
    val flags = b(off + 4) & 0xff
    off += 7 // logical screen descriptor
    var palette: Array[Int] = null // packed 0x00RRGGBB
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      if (off + 3 * n > b.length) return null
      palette = Array.tabulate(n)(i =>
        ((b(off + 3 * i) & 0xff) << 16) | ((b(off + 3 * i + 1) & 0xff) << 8) | (b(off + 3 * i + 2) & 0xff))
      off += 3 * n
    }
    // walk blocks to the first image descriptor
    while (off < b.length && (b(off) & 0xff) == 0x21) { // extension
      off += 2 // introducer + label
      var len = if (off < b.length) b(off) & 0xff else return null
      while (len != 0) {
        off += 1 + len
        if (off >= b.length) return null
        len = b(off) & 0xff
      }
      off += 1 // block terminator
    }
    // the 10-byte image descriptor must be complete — a payload truncated
    // inside it must route to NULL, not throw out of le16
    if (off + 10 > b.length || (b(off) & 0xff) != 0x2c) return null
    val w = le16(b, off + 5); val h = le16(b, off + 7)
    val iflags = b(off + 9) & 0xff
    off += 10
    if (w < 1 || h < 1 || w.toLong * h > (1L << 24)) return null
    if ((iflags & 0x80) != 0) { // local color table overrides
      val n = 2 << (iflags & 7)
      if (off + 3 * n > b.length) return null
      palette = Array.tabulate(n)(i =>
        ((b(off + 3 * i) & 0xff) << 16) | ((b(off + 3 * i + 1) & 0xff) << 8) | (b(off + 3 * i + 2) & 0xff))
      off += 3 * n
    }
    if (palette == null || off >= b.length) return null
    val interlaced = (iflags & 0x40) != 0
    // LZW decode: variable-width codes, LSB-first across sub-block bytes
    val minCode = b(off) & 0xff
    off += 1
    if (minCode < 2 || minCode > 8) return null
    val clear = 1 << minCode
    val eoi = clear + 1
    val nPix = w * h
    val out = new Array[Int](nPix)
    var nOut = 0
    // dictionary as prefix/suffix tables (entry k: prefix code + final byte)
    val MaxDict = 4096
    val prefix = new Array[Int](MaxDict)
    val suffix = new Array[Int](MaxDict)
    var dictSize = eoi + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L; var nBits = 0
    var blockLen = 0; var blockLeft = 0
    val stack = new Array[Int](MaxDict)
    var done = false
    def emit(code0: Int): Boolean = { // expand a code; false on overflow/corrupt
      var code = code0
      var sp = 0
      while (code >= clear) { // walk the chain down to a root
        if (sp >= MaxDict || code >= dictSize) return false
        stack(sp) = suffix(code); sp += 1
        code = prefix(code)
      }
      if (code >= palette.length || nOut + sp + 1 > nPix) return false
      out(nOut) = code; nOut += 1
      while (sp > 0) { sp -= 1; out(nOut) = stack(sp); nOut += 1 }
      true
    }
    def firstByteOf(code0: Int): Int = {
      var code = code0
      while (code >= clear) code = prefix(code)
      code
    }
    while (!done) {
      // refill bits from the sub-block stream
      while (nBits < width) {
        if (blockLeft == 0) {
          if (off >= b.length) return null
          blockLen = b(off) & 0xff; off += 1
          if (blockLen == 0) { done = true; blockLeft = -1 }
          else blockLeft = blockLen
        }
        if (done) {
          if (nOut < nPix) return null // ran out of data early
        } else {
          if (off >= b.length) return null
          acc |= (b(off) & 0xffL) << nBits
          nBits += 8; off += 1; blockLeft -= 1
        }
        if (done) nBits = width // break refill; loop exits below
      }
      if (!done) {
        val code = (acc & ((1L << width) - 1)).toInt
        acc >>>= width; nBits -= width
        if (code == clear) {
          dictSize = eoi + 1; width = minCode + 1; prev = -1
        } else if (code == eoi) {
          done = true
        } else if (prev == -1) {
          if (code >= clear || !emit(code)) return null
          prev = code
        } else {
          val known = code < dictSize
          if (!known && code != dictSize) return null // out-of-order code
          // new dictionary entry: prev ++ firstByte(known ? code : prev)
          if (dictSize < MaxDict) {
            prefix(dictSize) = prev
            suffix(dictSize) = firstByteOf(if (known) code else prev)
            dictSize += 1
            if (dictSize < MaxDict && (dictSize & (dictSize - 1)) == 0 && dictSize > clear)
              width = math.min(width + 1, 12)
          }
          if (!emit(code)) return null
          prev = code
        }
        if (nOut == nPix) {
          // consume to the terminator leniently (EOI/trailer may follow)
          done = true
        }
      }
    }
    if (nOut < nPix) return null
    // interlace: rows arrive in 4 passes (8k, 8k+4, 4k+2, 2k+1)
    val rowOf = new Array[Int](h)
    if (interlaced) {
      var r = 0
      for (y <- 0 until h by 8) { rowOf(r) = y; r += 1 }
      for (y <- 4 until h by 8) { rowOf(r) = y; r += 1 }
      for (y <- 2 until h by 4) { rowOf(r) = y; r += 1 }
      for (y <- 1 until h by 2) { rowOf(r) = y; r += 1 }
    } else {
      for (y <- 0 until h) rowOf(y) = y
    }
    val cells = new Array[Long](gw * gh)
    var sr = 0
    while (sr < h) {
      val y = rowOf(sr)
      val cy = (y.toLong * gh / h).toInt * gw
      var x = 0
      while (x < w) {
        val c = palette(out(sr * w + x))
        val luma = 299L * ((c >> 16) & 0xff) + 587L * ((c >> 8) & 0xff) + 114L * (c & 0xff)
        cells(cy + (x.toLong * gw / w).toInt) += luma
        x += 1
      }
      sr += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(cells)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MP4 / ISO-BMFF container metadata: `(timescale, duration, width,
  * height)` from the `moov` box — `mvhd` carries the movie timescale and
  * duration (version 0 and 1 layouts both handled), the first `trak`
  * whose `tkhd` has a non-zero size carries the presentation width and
  * height (16.16 fixed point, truncated to pixels). A real box walk:
  * length-prefixed boxes with 64-bit `largesize` and to-end-of-file
  * sizes honored, nesting resolved structurally — the video-container
  * member of the metadata-gate family ([[ImageDims]], [[WavInfo]]),
  * reading only the header boxes. NULL for anything without a parseable
  * `moov/mvhd`, for truncated boxes, and for absurd sizes.
  */
case class Mp4Info(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("timescale", IntegerType), StructField("duration", LongType),
    StructField("width", IntegerType), StructField("height", IntegerType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mp4_info expects binary, got ${other.simpleString}")
  }

  override def nullable: Boolean = true

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long = (be32(b, i) << 32) | be32(b, i + 4)
  private def typ(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mp4Info", this)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("mp4")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  /** Walk the sibling boxes of `[from, to)`, returning the body range of
    * the first box named `name`, or null. Corrupt sizes terminate as null.
    */
  private def findBox(b: Array[Byte], from: Long, to: Long, name: String): (Long, Long) = {
    var off = from
    while (off + 8 <= to) {
      val size0 = be32(b, off.toInt)
      val t = typ(b, off.toInt + 4)
      var body = off + 8
      val end =
        if (size0 == 0) to // box extends to the end of the enclosing range
        else if (size0 == 1) {
          if (off + 16 > to) return null
          body = off + 16
          off + be64(b, off.toInt + 8)
        } else off + size0
      if (end < body || end > to) return null
      if (t == name) return (body, end)
      off = end
    }
    null
  }

  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 16) return null
    val moov = findBox(b, 0, b.length, "moov")
    if (moov == null) return null
    val mvhd = findBox(b, moov._1, moov._2, "mvhd")
    if (mvhd == null || mvhd._1 + 4 > mvhd._2) return null
    val mo = mvhd._1.toInt
    val v = b(mo) & 0xff
    val (ts, dur) =
      if (v == 1) {
        if (mvhd._1 + 32 > mvhd._2) return null
        (be32(b, mo + 20), be64(b, mo + 24))
      } else {
        if (mvhd._1 + 24 > mvhd._2) return null
        (be32(b, mo + 12), be32(b, mo + 16))
      }
    if (ts <= 0 || ts > Int.MaxValue || dur < 0) return null
    // first trak whose tkhd carries a non-zero size
    var w = 0L; var h = 0L
    var cur = moov._1
    var found = false
    while (!found && cur < moov._2) {
      val trak = findBox(b, cur, moov._2, "trak")
      if (trak == null) cur = moov._2
      else {
        val tkhd = findBox(b, trak._1, trak._2, "tkhd")
        if (tkhd != null && tkhd._1 + 4 <= tkhd._2) {
          val to = tkhd._1.toInt
          val tv = b(to) & 0xff
          val wOff = if (tv == 1) 88 else 76
          if (tkhd._1 + wOff + 8 <= tkhd._2) {
            val ww = be32(b, to + wOff) >> 16   // 16.16 fixed point
            val hh = be32(b, to + wOff + 4) >> 16
            if (ww > 0 && hh > 0) { w = ww; h = hh; found = true }
          }
        }
        cur = trak._2
      }
    }
    InternalRow(ts.toInt, dur, w.toInt, h.toInt)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
