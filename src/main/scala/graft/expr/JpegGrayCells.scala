package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Per-cell luminance sums of a REAL baseline-JPEG decode — the third
  * container of the [[PngGrayCells]]/[[GifGrayCells]] family, covering the
  * dominant web image format (the round-15 verdict's remaining decode gap).
  * Same output contract as its siblings: `array<long>` of `gw·gh` cell
  * sums over integer luma (1000-scale), cell (y·gh/h, x·gw/w), NULL for
  * anything undecodable — never a crash.
  *
  * What it implements (ITU-T T.81 baseline sequential DCT, 8-bit):
  *  - marker walk: APPn/COM skipped, DQT (8- and 16-bit tables, zigzag
  *    order), SOF0/SOF1, DHT (canonical Huffman, DC+AC classes), DRI, SOS;
  *  - entropy decode: bit-serial canonical Huffman (mincode/maxcode per
  *    length), 0xFF00 byte unstuffing, RSTn restart handling with DC
  *    predictor reset, T.81 EXTEND for coefficient magnitudes, EOB/ZRL
  *    runs, zigzag coefficient placement, per-component dequantization;
  *  - pixel path: LUMA ONLY — chroma blocks are entropy-decoded (the
  *    stream cannot be advanced otherwise) but never IDCT'd, since the
  *    grid consumes luminance and JPEG's Y IS the BT.601 luma the PNG/GIF
  *    lanes compute (1000·Y here vs 299R+587G+114B there);
  *  - IDCT: separable double-precision 8×8 with a DC-only fast path
  *    (exact: flat block at dc/8 — what makes the q216 in-plan fixture
  *    integer-replayable by the SQL oracle).
  *
  * Scope boundaries (NULL, by design): progressive (SOF2) and arithmetic
  *  coding — the formats a curation pipeline re-encodes rather than
  *  feature-extracts; multi-scan files whose FIRST scan lacks the luma
  *  component; luma not at full sampling resolution (h1 < maxH or
  *  v1 < maxV — no standard encoder subsamples Y); 4-component Adobe
  *  CMYK/YCCK, where component 0 is not luma (cyan, typically inverted)
  *  and decoding it as Y would be wrong-but-plausible.
  *
  * Bomb guards mirror [[PngGrayCells]]: w·h ≤ 2^24 before any allocation,
  * every read bounds-checked, all loops bounded by the byte length.
  */
case class JpegGrayCells(child: Expression, gw: Int, gh: Int)
    extends UnaryExpression {
  require(gw >= 2 && gh >= 1 && gw * gh <= 4096, "grid in [2..] x [1..], at most 4096 cells")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_gray_cells expects binary, got ${other.simpleString}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jpegGrayCells", this)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cells")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  // zigzag index -> natural (row-major) index
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val CosTab: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) { t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16); x += 1 }
      u += 1
    }
    t
  }

  /** Canonical Huffman table: cumulative code bounds per length + symbols. */
  private final class Huff(counts: Array[Int], val symbols: Array[Int]) {
    val minCode: Array[Int] = new Array[Int](17)
    val maxCode: Array[Int] = Array.fill(17)(-1) // -1 = no codes at this length
    val valPtr: Array[Int]  = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1); k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  def compute(b: Array[Byte]): Any = {
    try computeOrNull(b)
    catch { case _: ArrayIndexOutOfBoundsException => null } // belt over the explicit bounds
  }

  // scalastyle:off method.length cyclomatic.complexity
  private def computeOrNull(b: Array[Byte]): Any = {
    def u8(i: Int): Int = b(i) & 0xff
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8 || u8(2) != 0xff) return null

    // ---- marker walk ----------------------------------------------------
    val qt    = new Array[Array[Int]](4)           // quant tables, zigzag order
    val huffD = new Array[Huff](4); val huffA = new Array[Huff](4)
    var w = 0; var h = 0; var nComp = 0
    var compId: Array[Int] = null; var compH: Array[Int] = null
    var compV: Array[Int] = null; var compQ: Array[Int] = null
    var dri = 0
    var off = 2
    var sosAt = -1
    var scanComp: Array[Int] = null; var scanDc: Array[Int] = null; var scanAc: Array[Int] = null
    while (sosAt < 0) {
      // tolerate 0xFF fill bytes before a marker (T.81 B.1.1.2)
      if (off >= b.length) return null
      if (u8(off) != 0xff) return null
      var m = off + 1
      while (m < b.length && u8(m) == 0xff) m += 1
      if (m >= b.length) return null
      val marker = u8(m)
      off = m + 1
      marker match {
        case 0xd9 => return null            // EOI before any scan
        case x if x >= 0xd0 && x <= 0xd7 => // stray RST outside a scan
        case 0x01 =>                         // TEM, parameterless
        case 0xc0 | 0xc1 =>                  // baseline / extended sequential
          if (off + 2 > b.length) return null
          val len = (u8(off) << 8) | u8(off + 1)
          if (off + len > b.length || len < 8) return null
          val prec = u8(off + 2)
          h = (u8(off + 3) << 8) | u8(off + 4)
          w = (u8(off + 5) << 8) | u8(off + 6)
          nComp = u8(off + 7)
          // component 0 is treated as luma below; that holds for grayscale
          // (1) and JFIF YCbCr (3) but NOT Adobe CMYK/YCCK (4), where
          // channel 0 is cyan (often inverted) — NULL rather than produce
          // wrong-but-plausible cell sums
          if (prec != 8 || w < 1 || h < 1 || w.toLong * h > (1L << 24) ||
              (nComp != 1 && nComp != 3) || len < 8 + 3 * nComp) return null
          compId = new Array[Int](nComp); compH = new Array[Int](nComp)
          compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = u8(off + 8 + 3 * c)
            val hv = u8(off + 9 + 3 * c)
            compH(c) = hv >> 4; compV(c) = hv & 15
            compQ(c) = u8(off + 10 + 3 * c)
            if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4 ||
                compQ(c) > 3) return null
            c += 1
          }
          off += len
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return null                        // progressive / lossless / arithmetic
        case 0xc4 =>                         // DHT
          if (off + 2 > b.length) return null
          val len = (u8(off) << 8) | u8(off + 1)
          if (off + len > b.length) return null
          var p = off + 2
          while (p < off + len) {
            if (p + 17 > b.length) return null
            val tc = u8(p) >> 4; val th = u8(p) & 15
            if (tc > 1 || th > 3) return null
            val counts = new Array[Int](16)
            var total = 0
            var i = 0
            while (i < 16) { counts(i) = u8(p + 1 + i); total += counts(i); i += 1 }
            if (total > 256 || p + 17 + total > off + len) return null
            val syms = new Array[Int](total)
            i = 0
            while (i < total) { syms(i) = u8(p + 17 + i); i += 1 }
            val t = new Huff(counts, syms)
            if (tc == 0) huffD(th) = t else huffA(th) = t
            p += 17 + total
          }
          off += len
        case 0xdb =>                         // DQT
          if (off + 2 > b.length) return null
          val len = (u8(off) << 8) | u8(off + 1)
          if (off + len > b.length) return null
          var p = off + 2
          while (p < off + len) {
            val pq = u8(p) >> 4; val tq = u8(p) & 15
            if (pq > 1 || tq > 3) return null
            val n = if (pq == 0) 64 else 128
            if (p + 1 + n > off + len) return null
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(i) = if (pq == 0) u8(p + 1 + i)
                     else (u8(p + 1 + 2 * i) << 8) | u8(p + 2 + 2 * i)
              i += 1
            }
            qt(tq) = t
            p += 1 + n
          }
          off += len
        case 0xdd =>                         // DRI
          if (off + 4 > b.length) return null
          dri = (u8(off + 2) << 8) | u8(off + 3)
          off += 4
        case 0xda =>                         // SOS
          if (compId == null) return null
          if (off + 2 > b.length) return null
          val len = (u8(off) << 8) | u8(off + 1)
          if (off + len > b.length) return null
          val ns = u8(off + 2)
          if (ns < 1 || ns > 4 || len < 6 + 2 * ns) return null
          scanComp = new Array[Int](ns); scanDc = new Array[Int](ns); scanAc = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cs = u8(off + 3 + 2 * i)
            val ci = compId.indexOf(cs)
            if (ci < 0) return null
            scanComp(i) = ci
            scanDc(i) = u8(off + 4 + 2 * i) >> 4
            scanAc(i) = u8(off + 4 + 2 * i) & 15
            i += 1
          }
          sosAt = off + len
        case _ =>                            // APPn, COM, anything sized: skip
          if (off + 2 > b.length) return null
          val len = (u8(off) << 8) | u8(off + 1)
          if (len < 2 || off + len > b.length) return null
          off += len
      }
    }

    // luma must ride the first scan at full sampling resolution
    val maxH = compH.max; val maxV = compV.max
    val yScan = scanComp.indexOf(0)
    if (yScan < 0 || compH(0) != maxH || compV(0) != maxV) return null
    var i0 = 0
    while (i0 < scanComp.length) {
      val c = scanComp(i0)
      if (qt(compQ(c)) == null || huffD(scanDc(i0)) == null || huffA(scanAc(i0)) == null)
        return null
      i0 += 1
    }

    // ---- entropy decode --------------------------------------------------
    val cells = new Array[Long](gw * gh)
    var pos = sosAt
    var bitBuf = 0; var bitCnt = 0
    var eos = false // hit a non-RST marker (scan end) — further reads fail

    def fillBit(): Int = {
      if (bitCnt == 0) {
        if (eos || pos >= b.length) return -1
        var byte0 = u8(pos); pos += 1
        if (byte0 == 0xff) {
          if (pos >= b.length) return -1
          val nxt = u8(pos)
          if (nxt == 0x00) { pos += 1 }            // stuffed 0xFF
          else { eos = true; pos -= 1; return -1 } // marker: scan over
        }
        bitBuf = byte0; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { val bit = fillBit(); if (bit < 0) return -1; v = (v << 1) | bit; i += 1 }
      v
    }
    def huffDecode(t: Huff): Int = {
      var code = 0; var l = 1
      while (l <= 16) {
        val bit = fillBit(); if (bit < 0) return -1
        code = (code << 1) | bit
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.symbols(t.valPtr(l) + code - t.minCode(l))
        l += 1
      }
      -1
    }
    def extend(v: Int, s: Int): Int = if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

    val dcPred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val out = new Array[Double](64)
    val colBuf = new Array[Double](8) // hoisted: the column-pass scratch

    // decode one block of scan component si; fold luma into cells when
    // (bx, by) is the block's top-left pixel in image coordinates
    def block(si: Int, bx: Int, by: Int): Boolean = {
      val c = scanComp(si)
      val q = qt(compQ(c))
      val t = huffDecode(huffD(scanDc(si))); if (t < 0 || t > 15) return false
      val diffBits = if (t == 0) 0 else { val v = readBits(t); if (v < 0) return false; v }
      dcPred(c) += extend(diffBits, t)
      val isLuma = c == 0
      var nz = 0
      if (isLuma) { java.util.Arrays.fill(coef, 0); coef(0) = dcPred(c) * q(0) }
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = huffDecode(huffA(scanAc(si))); if (rs < 0) return false
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 else done = true   // ZRL / EOB
        } else {
          k += r
          if (k > 63) return false
          val v = readBits(s); if (v < 0) return false
          if (isLuma) { coef(Zigzag(k)) = extend(v, s) * q(k); nz += 1 }
          k += 1
        }
      }
      if (!isLuma) return true
      if (bx >= w || by >= h) return true          // MCU padding block: decoded, dropped
      // IDCT: DC-only fast path is EXACT (flat block at dc/8) — the
      // property the q216 integer-replayable fixture stands on
      if (nz == 0) {
        val v = coef(0) / 8.0
        val px = math.max(0L, math.min(255L, math.round(v) + 128L))
        var y0 = 0
        while (y0 < 8) {
          val yy = by + y0
          if (yy < h) {
            val cy = (yy.toLong * gh / h).toInt * gw
            var x0 = 0
            while (x0 < 8) {
              val xx = bx + x0
              if (xx < w) cells(cy + (xx.toLong * gw / w).toInt) += 1000L * px
              x0 += 1
            }
          }
          y0 += 1
        }
        return true
      }
      // rows then columns, double precision
      var r0 = 0
      while (r0 < 8) {
        var x0 = 0
        while (x0 < 8) {
          var acc = 0.0
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) 0.70710678118654752440 else 1.0
            acc += cu * coef(r0 * 8 + u) * CosTab(u * 8 + x0)
            u += 1
          }
          out(r0 * 8 + x0) = acc / 2.0
          x0 += 1
        }
        r0 += 1
      }
      var x1 = 0
      while (x1 < 8) {
        var yy = 0
        while (yy < 8) { colBuf(yy) = out(yy * 8 + x1); yy += 1 }
        yy = 0
        while (yy < 8) {
          var acc = 0.0
          var v0 = 0
          while (v0 < 8) {
            val cv = if (v0 == 0) 0.70710678118654752440 else 1.0
            acc += cv * colBuf(v0) * CosTab(v0 * 8 + yy)
            v0 += 1
          }
          val yy2 = by + yy
          val xx2 = bx + x1
          if (yy2 < h && xx2 < w) {
            val px = math.max(0L, math.min(255L, math.round(acc / 2.0) + 128L))
            cells((yy2.toLong * gh / h).toInt * gw + (xx2.toLong * gw / w).toInt) += 1000L * px
          }
          yy += 1
        }
        x1 += 1
      }
      true
    }

    def restart(m: Int): Boolean = {
      bitCnt = 0; eos = false
      // skip fill 0xFFs, expect RSTm
      while (pos + 1 < b.length && u8(pos) == 0xff && u8(pos + 1) == 0xff) pos += 1
      if (pos + 1 >= b.length || u8(pos) != 0xff || u8(pos + 1) != (0xd0 | (m & 7))) return false
      pos += 2
      java.util.Arrays.fill(dcPred, 0)
      true
    }

    val ns = scanComp.length
    var mcuCount = 0; var rstIdx = 0
    if (ns == 1) {
      // non-interleaved: MCU = one block; the component walks its own grid
      val c = scanComp(0)
      val cw = (w * compH(c) + maxH * 8 - 1) / (maxH * 8)  // blocks across
      val ch = (h * compV(c) + maxV * 8 - 1) / (maxV * 8)
      var byI = 0
      while (byI < ch) {
        var bxI = 0
        while (bxI < cw) {
          if (dri > 0 && mcuCount > 0 && mcuCount % dri == 0) {
            if (!restart(rstIdx)) return null
            rstIdx = (rstIdx + 1) & 7
          }
          // luma-at-full-resolution invariant: image coords = 8·block coords
          if (!block(0, bxI * 8, byI * 8)) return null
          mcuCount += 1
          bxI += 1
        }
        byI += 1
      }
    } else {
      val mcusX = (w + maxH * 8 - 1) / (maxH * 8)
      val mcusY = (h + maxV * 8 - 1) / (maxV * 8)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (dri > 0 && mcuCount > 0 && mcuCount % dri == 0) {
            if (!restart(rstIdx)) return null
            rstIdx = (rstIdx + 1) & 7
          }
          var si = 0
          while (si < ns) {
            val c = scanComp(si)
            var v = 0
            while (v < compV(c)) {
              var hh = 0
              while (hh < compH(c)) {
                // luma is full-resolution by the invariant above, so its
                // block origin is exact in image coordinates; chroma
                // origins are irrelevant (entropy-advance only)
                if (!block(si,
                    (mx * compH(c) + hh) * 8 * maxH / compH(c),
                    (my * compV(c) + v) * 8 * maxV / compV(c))) return null
                hh += 1
              }
              v += 1
            }
            si += 1
          }
          mcuCount += 1
          mx += 1
        }
        my += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(cells)
  }
  // scalastyle:on method.length cyclomatic.complexity

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
