package graft.ops

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable.ArrayBuffer

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element

/** Dependency-free XLSX support (reference S1 source `app.py:170` and S6
  * multi-sheet sink `app.py:35-134`).
  *
  * An .xlsx file is a ZIP of SpreadsheetML XML parts; the JDK ships both a
  * ZIP codec and a DOM parser, so no external library is needed (this
  * container has no network for spark-excel/POI). Reading is deliberately
  * DRIVER-SIDE: header detection must run before a DataFrame schema exists
  * (SURVEY §1.3.1) — parse a workbook's raw rows here, then hand them to
  * [[graft.Pipeline.ingestRaw]] which resolves the header and builds the
  * distributed frame. Writing is likewise a driver-side presentation sink
  * (one workbook = one machine's byte stream); parquet remains the
  * at-scale sink (SURVEY §2.1 S6).
  *
  * Supported on read: shared strings, inline strings, numbers, formula
  * string results, blanks, sparse cell references. Written cells are inline
  * strings — enough for a faithful round-trip of the reference's use.
  */
object Excel {

  // ---- read ----------------------------------------------------------------

  /** Raw positional rows of the FIRST worksheet, header undetected (the
    * shape `pd.read_excel(..., header=None)` returns). Numeric cells whose
    * style carries a date/time number format arrive as `java.sql.Timestamp`
    * (matching `pd.read_excel` + `to_datetime`, `app.py:170,184-186`);
    * everything else arrives as the raw string.
    */
  def readRaw(path: String): Seq[Seq[Any]] = {
    val parts = readZip(path)
    val shared = parts.keys.find(_ == "xl/sharedStrings.xml")
      .map(k => parseSharedStrings(parts(k))).getOrElse(Vector.empty)
    val dateStyles = parts.get("xl/styles.xml").map(parseDateStyles).getOrElse(Set.empty)
    val sheetName = firstSheetPart(parts)
      // fallback for workbooks missing the indirection: NUMERIC part order —
      // lexicographic puts sheet10.xml before sheet2.xml
      .orElse(parts.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml")).toSeq
        .sortBy(_.replaceAll("\\D", "").toLong).headOption)
      .getOrElse(throw new IllegalArgumentException(s"$path: no worksheet found"))
    parseSheet(parts(sheetName), shared, dateStyles)
  }

  /** The FIRST sheet in WORKBOOK order (pd.read_excel's default sheet),
    * resolved via workbook.xml → its rels: part filenames need not follow
    * tab order — reordering tabs in Excel rewires the rels, not the part
    * names, so picking the lowest-numbered part reads the wrong sheet.
    */
  private def firstSheetPart(parts: Map[String, Array[Byte]]): Option[String] =
    for {
      wb    <- parts.get("xl/workbook.xml")
      rels  <- parts.get("xl/_rels/workbook.xml.rels")
      sheet <- elems(parseXml(wb), "sheet").headOption
      rid    = sheet.getAttribute("r:id")
      rel   <- elems(parseXml(rels), "Relationship").find(_.getAttribute("Id") == rid)
      tgt    = rel.getAttribute("Target")
      part   = if (tgt.startsWith("/")) tgt.stripPrefix("/")
               else "xl/" + tgt.stripPrefix("./")
      // a first TAB can be a chartsheet (xl/chartsheets/…) — parseSheet
      // would silently yield zero rows; fall through to the fallback, which
      // picks the first real worksheet like pd.read_excel does
      if part.contains("worksheets/") && parts.contains(part)
    } yield part

  private def readZip(path: String): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new FileInputStream(path))
    try {
      val out = Map.newBuilder[String, Array[Byte]]
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        val buf = new ByteArrayOutputStream()
        zin.transferTo(buf)
        out += e.getName -> buf.toByteArray
        e = zin.getNextEntry
      }
      out.result()
    } finally zin.close()
  }

  private def parseXml(bytes: Array[Byte]): Element = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // XLSX is untrusted upload content in the reference product: refuse
    // DOCTYPE outright and disable external-entity resolution so a crafted
    // workbook can't XXE the driver (local file read / SSRF).
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes)).getDocumentElement
  }

  private def elems(parent: Element, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] =
    elems(parseXml(bytes), "si").map(si => elems(si, "t").map(_.getTextContent).mkString).toVector

  private def parseSheet(
      bytes: Array[Byte],
      shared: Vector[String],
      dateStyles: Set[Int]): Seq[Seq[Any]] = {
    val rows = ArrayBuffer.empty[Seq[Any]]
    elems(parseXml(bytes), "row").foreach { row =>
      // honor the row's r attribute: Excel OMITS fully-empty rows from the
      // XML, but pandas/openpyxl preserve them as blank — collapsing them
      // would shift every later row up and break header/offset parity
      // (sparse CELLS below get the same treatment via the cell ref)
      Option(row.getAttribute("r")).filter(_.nonEmpty)
        .flatMap(_.toIntOption).map(_ - 1).foreach { target =>
          while (rows.length < target) rows += Seq.empty
        }
      val cells = ArrayBuffer.empty[Any]
      elems(row, "c").foreach { c =>
        val idx = Option(c.getAttribute("r")).filter(_.nonEmpty)
          .map(colIndex).getOrElse(cells.length)
        while (cells.length < idx) cells += null
        val v = cellValue(c, shared, dateStyles)
        // out-of-order refs (legal in the spec, produced by some writers)
        // must land AT their column, not append into the wrong one
        if (idx < cells.length) cells(idx) = v else cells += v
      }
      rows += cells.toSeq
    }
    rows.toSeq
  }

  /** Style indices (the sheet's `s=` attribute values) whose number format is
    * a date/time format: built-in numFmtIds 14–22 and 45–47, plus any custom
    * `numFmt` whose code contains a date token (y/m/d/h/s) outside quoted
    * literals, `[...]` sections, and backslash-escaped characters — the same
    * style-based detection pandas/openpyxl use (there is no cell-level
    * "date" type in SpreadsheetML; dates are just styled numbers). An xf
    * with `applyNumberFormat="0"` declares its format NOT applied and is
    * never a date style.
    */
  private def parseDateStyles(bytes: Array[Byte]): Set[Int] = {
    val root = parseXml(bytes)
    val custom = elems(root, "numFmts").headOption.map(e => elems(e, "numFmt")).getOrElse(Nil)
      .flatMap { f =>
        val code = f.getAttribute("formatCode")
          .replaceAll("\"[^\"]*\"", "")  // quoted literals render verbatim
          .replaceAll("\\[[^\\]]*\\]", "") // color/locale/elapsed sections
          .replaceAll("\\\\.", "")       // backslash-escaped literal chars
          .toLowerCase
        // untrusted content: a missing/garbage numFmtId must not crash ingest
        if (code.exists("ymdhs".contains(_))) f.getAttribute("numFmtId").toIntOption else None
      }.toSet
    // built-in date ids: 14–22 + elapsed-time 45–47, PLUS the East Asian
    // date/era blocks 27–36 and 50–58 (ECMA-376 §18.8.30 — implied, never
    // written to styles.xml, so zh/ja/ko-locale workbooks carry them bare)
    val dateIds = ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet ++ custom
    elems(root, "cellXfs").headOption.map(e => elems(e, "xf")).getOrElse(Nil)
      .zipWithIndex
      .collect {
        case (xf, i)
            if xf.getAttribute("applyNumberFormat") != "0" &&
              // toIntOption: untrusted styles.xml — same hardening as the
              // custom-format branch above; garbage must not crash ingest
              Option(xf.getAttribute("numFmtId")).filter(_.nonEmpty)
                .exists(_.toIntOption.exists(dateIds.contains)) =>
          i
      }
      .toSet
  }

  /** Excel serial day count → timestamp. Base 1899-12-30 (not 1899-12-31):
    * the convention openpyxl/pandas use, which absorbs Excel's fictitious
    * 1900-02-29 so every post-Feb-1900 date converts exactly.
    */
  private[graft] def serialToTimestamp(serial: Double): java.sql.Timestamp = {
    val base = java.time.LocalDateTime.of(1899, 12, 30, 0, 0, 0)
    java.sql.Timestamp.valueOf(
      base.plus(math.round(serial * 86400000.0), java.time.temporal.ChronoUnit.MILLIS))
  }

  /** "C5" → 0-based column 2. */
  private[graft] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1

  private def cellValue(c: Element, shared: Vector[String], dateStyles: Set[Int]): Any = {
    def v  = elems(c, "v").headOption.map(_.getTextContent)
    def is = elems(c, "is").headOption.map(e => elems(e, "t").map(_.getTextContent).mkString)
    c.getAttribute("t") match {
      case "s" => // untrusted: non-numeric/out-of-range shared index → null
        v.flatMap(_.toIntOption).filter(i => i >= 0 && i < shared.length)
          .map(shared).orNull
      case "inlineStr" => is.orNull
      case "" | "n" => // numeric (possibly date-styled) / blank
        val isDate = Option(c.getAttribute("s")).filter(_.nonEmpty)
          .exists(s => s.toIntOption.exists(dateStyles.contains))
        // untrusted content: a date-styled cell with a non-numeric <v>
        // degrades to the raw string instead of crashing ingest
        v.map { raw =>
          val serial = if (isDate) raw.toDoubleOption else None
          serial.map(serialToTimestamp).getOrElse(raw: Any)
        }.orNull
      case _ => v.orNull // "str" formula result / "b" / "e"
    }
  }

  // ---- write ---------------------------------------------------------------

  /** Multi-sheet workbook from named row sets (the engine-side contract of
    * the reference's `df_to_xlsx_bytes`): sheet names are sanitized and
    * truncated to Excel's 31-char limit like `app.py:55,108`, and the
    * reference's presentation formatting (`app.py:72-99`) is applied:
    *
    *  - row 1 (the header) is FROZEN (`worksheet.freeze_panes(1, 0)`);
    *  - all-integral columns get number format `#,##0`, columns with any
    *    fractional numeric get `#,##0.00`, written as NUMERIC cells (the
    *    reference's `fmt_int`/`fmt_float`; xlsxwriter's last-set_column-wins
    *    quirk silently drops them there — the declared intent is applied);
    *  - column widths come from a ≤1000-row sample: the widest FORMATTED
    *    value (`%,.2f` / `%,d` with thousands separators, like the
    *    reference's width estimate) vs the header, +2 padding, capped at 60.
    *
    * Column type classification is per SHEET COLUMN over the data rows
    * (row 0 is the header): the JVM types of the values stand in for the
    * pandas dtype the reference consults.
    */
  def writeRaw(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    require(sheets.nonEmpty, "at least one sheet")
    // Sanitization + the 31-char cap can collapse distinct catalog names
    // ("a/b" and "a*b" → "a_b"); duplicate sheet names violate ECMA-376 and
    // Excel refuses the file — suffix within the cap until unique. Keyed on
    // lowercase: Excel's uniqueness rule is CASE-INSENSITIVE ("Status" vs
    // "status" is still a duplicate).
    val used = scala.collection.mutable.Set.empty[String]
    val names = sheets.map { case (n, _) =>
      val base = sheetName(n)
      var cand = base
      var k    = 1
      while (used(cand.toLowerCase)) { k += 1; cand = base.take(31 - s"_$k".length) + s"_$k" }
      used += cand.toLowerCase
      cand
    }
    val zout  = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    try {
      val sheetTypes = names.indices
        .map(i => s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        .mkString
      put("[Content_Types].xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
           |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
           |<Default Extension="xml" ContentType="application/xml"/>
           |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
           |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
           |$sheetTypes
           |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      val sheetRefs = names.zipWithIndex.map { case (n, i) =>
        s"""<sheet name="${escape(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      put("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets>$sheetRefs</sheets>
           |</workbook>""".stripMargin)
      val rels = names.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString
      val stylesRel =
        s"""<Relationship Id="rId${names.length + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>"""
      put("xl/_rels/workbook.xml.rels",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels$stylesRel</Relationships>""".stripMargin)
      // cellXfs index 1 = float (#,##0.00), 2 = int (#,##0) — the
      // reference's fmt_float/fmt_int (`app.py:75-76`)
      put("xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<numFmts count="2"><numFmt numFmtId="164" formatCode="#,##0.00"/><numFmt numFmtId="165" formatCode="#,##0"/></numFmts>
          |<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
          |<fills count="2"><fill><patternFill patternType="none"/></fill><fill><patternFill patternType="gray125"/></fill></fills>
          |<borders count="1"><border/></borders>
          |<cellStyleXfs count="1"><xf/></cellStyleXfs>
          |<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="164" applyNumberFormat="1"/><xf numFmtId="165" applyNumberFormat="1"/></cellXfs>
          |</styleSheet>""".stripMargin)
      sheets.zipWithIndex.foreach { case ((_, rows), i) =>
        val dataRows = rows.drop(1)
        val nCols    = rows.iterator.map(_.length).maxOption.getOrElse(0)
        // column class from JVM types over ALL data rows (the stand-in for
        // the pandas dtype the reference consults): 1=float, 2=int, 0=other
        val cls = (0 until nCols).map { ci =>
          val vs = dataRows.iterator
            .map(r => if (ci < r.length) r(ci) else null).filter(_ != null)
          var any = false; var frac = false; var allNum = true
          vs.foreach { v => any = true
            if (isFractional(v)) frac = true else if (!isIntegral(v)) allNum = false
          }
          if (any && allNum) { if (frac) 1 else 2 } else 0
        }
        // width from a ≤1000-row sample of FORMATTED values (`app.py:79-99`)
        val sample = dataRows.take(1000)
        val widths = (0 until nCols).map { ci =>
          val headerLen = rows.headOption.flatMap(_.lift(ci))
            .flatMap(Option(_)).map(_.toString.length).getOrElse(0) // header cell may be null
          val dataLen = sample.iterator
            .map(r => if (ci < r.length) r(ci) else null).filter(_ != null)
            .map(v => cellText(v, cls(ci)).length)
            .maxOption.getOrElse(0)
          math.min(math.max(headerLen, dataLen) + 2, 60)
        }
        val colsXml =
          if (nCols == 0) ""
          else "<cols>" + (0 until nCols).map { ci =>
            val style = if (cls(ci) == 0) "" else s""" style="${cls(ci)}""""
            s"""<col min="${ci + 1}" max="${ci + 1}" width="${widths(ci)}" customWidth="1"$style/>"""
          }.mkString + "</cols>"
        val body = rows.zipWithIndex.map { case (r, ri) =>
          val cells = r.zipWithIndex.collect {
            case (v, ci) if v != null =>
              val ref = s"${colRef(ci)}${ri + 1}"
              // header row (ri == 0) stays an unstyled inline string even in
              // numeric columns; numeric data cells carry the column style.
              // NaN/Infinity have no ECMA-376 numeric literal — they fall
              // back to inline strings rather than corrupting the workbook
              val finite = v match {
                case d: Double => !d.isNaN && !d.isInfinite
                case f: Float  => !f.isNaN && !f.isInfinite
                case _         => true
              }
              if (ri > 0 && cls(ci) != 0 && finite)
                s"""<c r="$ref" s="${cls(ci)}"><v>${numText(v)}</v></c>"""
              else
                s"""<c r="$ref" t="inlineStr"><is><t>${escape(v.toString)}</t></is></c>"""
          }.mkString
          s"""<row r="${ri + 1}">$cells</row>"""
        }.mkString
        put(s"xl/worksheets/sheet${i + 1}.xml",
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
             |<sheetViews><sheetView workbookViewId="0"><pane ySplit="1" topLeftCell="A2" activePane="bottomLeft" state="frozen"/></sheetView></sheetViews>
             |$colsXml
             |<sheetData>$body</sheetData>
             |</worksheet>""".stripMargin)
      }
    } finally zout.close()
  }

  private def isIntegral(v: Any): Boolean = v match {
    case _: Byte | _: Short | _: Int | _: Long               => true
    case _: java.math.BigInteger | _: scala.math.BigInt      => true
    case _                                                   => false
  }

  private def isFractional(v: Any): Boolean = v match {
    case _: Float | _: Double                                   => true
    case _: java.math.BigDecimal | _: scala.math.BigDecimal     => true
    case _                                                      => false
  }

  /** The literal written into a numeric `<v>` element. */
  private def numText(v: Any): String = v match {
    case b: java.math.BigDecimal  => b.toPlainString
    case b: scala.math.BigDecimal => b.underlying.toPlainString
    case n                        => n.toString
  }

  /** What the cell DISPLAYS under its column's number format — the
    * reference estimates widths from `f"{x:,.2f}"` / `f"{int(x):,d}"`
    * (`app.py:87-93`), not the raw repr.
    */
  private def cellText(v: Any, cls: Int): String = cls match {
    case 1 => v match {
      case n: Number => String.format(java.util.Locale.US, "%,.2f", Double.box(n.doubleValue()))
      case other     => other.toString
    }
    case 2 => v match {
      case n: Number => String.format(java.util.Locale.US, "%,d", Long.box(n.longValue()))
      case other     => other.toString
    }
    case _ => v.toString
  }

  /** Reference sheet-name handling: strip illegal chars, cap at 31. */
  private[graft] def sheetName(n: String): String = {
    val cleaned = n.replaceAll("[\\\\/*?\\[\\]:]", "_")
    (if (cleaned.isEmpty) "Sheet" else cleaned).take(31)
  }

  private[graft] def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** XML 1.0 forbids control characters below 0x20 (except TAB/LF/CR) even
    * as entity references — one raw 0x01 in a cell would corrupt the WHOLE
    * workbook (Excel's repair dialog, SAX error on re-read). Scraped text
    * carries such bytes routinely, so they are dropped, matching what
    * openpyxl's writer does on ILLEGAL_CHARACTERS_RE.
    */
  private def escape(s: String): String = {
    val legal = s.filter(c => c >= 0x20 || c == '\t' || c == '\n' || c == '\r')
    legal.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")
  }
}
