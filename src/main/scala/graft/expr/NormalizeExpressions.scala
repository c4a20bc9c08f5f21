package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for corpus cleaning.
  *
  * A multilingual crawl corpus mixes precomposed (`é` = U+00E9) and
  * decomposed (`e` + U+0301) forms of the same visible text; exact and
  * fuzzy dedup both treat them as different documents unless the corpus is
  * normalized first. These run once per row in plain JVM code — no UDF
  * serialization, null-safe via `UnaryExpression`.
  */

/** Normalize to a Unicode normal form (NFC/NFD/NFKC/NFKD). Matches DuckDB
  * `nfc_normalize` when `form = NFC`. Skips allocation when the input is
  * already in the requested form (the common case for ASCII-heavy corpora).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val normalForm: Normalizer.Form = form.toUpperCase(java.util.Locale.ROOT) match {
    case "NFC"  => Normalizer.Form.NFC
    case "NFD"  => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other  => throw new IllegalArgumentException(
      s"unicode_normalize: form must be one of NFC/NFD/NFKC/NFKD, got $other")
  }

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNormalize", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    if (Normalizer.isNormalized(s, normalForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, normalForm))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Accent folding: NFD-decompose, drop combining marks (general category M),
  * NFC-recompose — `Café Zürich niño` → `Cafe Zurich nino`. Same contract as
  * DuckDB `strip_accents` (utf8proc decompose + strip-mark) for scripts whose
  * accents are combining sequences; ligatures (`œ`, `ß`) are NOT folded by
  * either engine. ASCII rows take a no-allocation fast path — at 100 TB the
  * dominant cost is the scan, not this expression.
  */
case class StripAccents(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stripAccents", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(u: UTF8String): UTF8String = {
    // pure-ASCII bytes can hold no marks and decompose to themselves
    if (isAscii(u)) return u
    val d  = Normalizer.normalize(u.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i  = 0
    while (i < d.length) {
      val ch = d.charAt(i)
      val t  = Character.getType(ch)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(Normalizer.normalize(sb, Normalizer.Form.NFC))
  }

  private def isAscii(u: UTF8String): Boolean = {
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      if ((u.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
