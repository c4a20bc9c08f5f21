package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-expression cleaning library — the Spark-native re-expression of the
  * reference's per-file normalization pass (reference `app.py:148-216`).
  *
  * Every function here is a pure `Column => Column` (or `DataFrame =>
  * DataFrame` with no action inside), so the whole normalize chain fuses into
  * a single narrow whole-stage-codegen stage — no shuffle, no materialization,
  * unlike the reference's eager per-step copies (`app.py:56,109,174`).
  */
object Clean {

  /** Snake-case column-name normalization (reference `app.py:148-151`):
    * strip → non-alphanumeric runs → `_` → collapse `_+` → trim `_` → lower.
    * Pure Scala on the schema: renaming is free (no plan node).
    */
  def normCol(name: String): String = {
    val s = name.trim
      .replaceAll("[^0-9A-Za-z]+", "_")
      .replaceAll("_+", "_")
      .stripPrefix("_").stripSuffix("_")
    s.toLowerCase
  }

  /** P1 — bulk computed rename of every column. */
  def normColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normCol).toIndexedSeq: _*)

  /** F2 — categorical casing canonicalization (reference `app.py:189-192`,
    * `str.strip().str.title()`): `initcap(trim(c))`. Divergence from pandas
    * on letters after apostrophes/digits is documented in SURVEY §7.5.
    */
  def titleCase(c: Column): Column = initcap(trim(c))

  /** F9 — date parse with coercion (reference `app.py:184-186`,
    * `errors="coerce"`): unparseable strings become NULL. Must be
    * `try_to_timestamp` — under Spark 4's default ANSI mode a plain
    * `to_timestamp` THROWS on malformed input.
    */
  def parseTs(c: Column): Column = try_to_timestamp(c)

  private val Ipv4Pattern = "\\b(\\d{1,3}(?:\\.\\d{1,3}){3})\\b"

  /** F5 — first IPv4 in a possibly multi-valued cell (reference
    * `app.py:195-203`). `regexp_extract` returns `""` on no-match where the
    * reference yields missing — wrap in `nullif` (SURVEY §7.5).
    */
  def firstIpv4(c: Column): Column =
    nullif(regexp_extract(c, Ipv4Pattern, 1), lit(""))

  /** F6 — split on comma, first part containing `:` (IPv6 heuristic,
    * reference `app.py:205-214`). Higher-order functions keep it codegen-able
    * (no UDF).
    */
  def firstIpv6(c: Column): Column = {
    val parts = transform(split(c, ","), p => trim(p))
    val hits  = filter(parts, p => instr(p, ":") > 0)
    when(size(hits) > 0, element_at(hits, 1))
  }

  /** P8/F7 — case-insensitive regex-alternation keyword mask across N
    * columns, NULL→false (reference `app.py:263-270`: `fail_mask |=
    * col.str.lower().str.contains(pat, na=False)`).
    */
  def keywordAny(cols: Seq[Column], pattern: String): Column =
    cols
      .map(c => coalesce(lower(c.cast("string")).rlike(pattern), lit(false)))
      .reduce(_ || _)

  /** Reference failure keywords (`app.py:267`). */
  val FailurePattern = "fail|timed out|faulty|lost|error"

  /** F4 — collapse non-alphanumeric runs in values (same regex the reference
    * applies to names, offered on values for the cleaning surface). One
    * pass suffices: the first replace already leaves no adjacent runs, and
    * a second `rep+` pass both broke on regex-metacharacter reps ("+" →
    * PatternSyntaxException) and would collapse PRE-EXISTING repeats of an
    * alphanumeric rep in the data. `quoteReplacement` guards `$`/`\` in
    * the replacement position.
    */
  def collapseNonAlnum(c: Column, rep: String = "_"): Column =
    regexp_replace(c, "[^0-9A-Za-z]+", java.util.regex.Matcher.quoteReplacement(rep))

  /** Whitespace-collapse + trim + lowercase — canonical text form used by the
    * text-analysis operators (T-ops).
    */
  def canonicalText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** PII scrubbing for training text: emails → `<EMAIL>`, dotted quads →
    * `<IP>`, 7+-digit runs (phone/account numbers) → `<NUM>`. A pure
    * per-row expression chain — fuses into the scan stage, no shuffle, the
    * only shape that works when the scrub runs over every byte of a 100 TB
    * corpus. Patterns are explicit-ASCII so Java regex and RE2 agree
    * (`\d`/`\b` are ASCII in both engines' defaults). Order matters: emails
    * first (an address contains digit runs), then IPs (a dotted quad
    * contains digit runs), then bare digit runs.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
      "\\b\\d{7,}\\b", "<NUM>")

  private def asCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def asExpr(c: Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)

  /** Unicode normal-form canonicalization (NFC default) — precomposed and
    * decomposed spellings of the same text hash identically afterwards, a
    * prerequisite for exact/fuzzy dedup over multilingual corpora.
    */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    asCol(graft.expr.UnicodeNormalize(asExpr(c), form))

  /** Accent folding (`Café` → `Cafe`); DuckDB `strip_accents` parity. */
  def stripAccents(c: Column): Column =
    asCol(graft.expr.StripAccents(asExpr(c)))
}
