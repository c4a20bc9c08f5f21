package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Clean

/** F-ops edge cases mined from the reference (SURVEY §5.3). */
class CleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normCol: reference algorithm on nasty strings (app.py:148-151)") {
    assert(Clean.normCol("  Endpoint Name ") == "endpoint_name")
    assert(Clean.normCol("A--B__C") == "a_b_c")
    assert(Clean.normCol("__x__") == "x")
    assert(Clean.normCol("Último Logín!") == "ltimo_log_n") // non-ASCII folds to _
    assert(Clean.normCol("a1 B2") == "a1_b2")
    assert(Clean.normCol(Clean.normCol("A  B")) == Clean.normCol("A  B")) // idempotent
  }

  test("normColumns renames every column") {
    val df = Seq((1, 2)).toDF("Endpoint Name", "OS Version!")
    assert(Clean.normColumns(df).columns.toSeq == Seq("endpoint_name", "os_version"))
  }

  test("titleCase = trim + initcap (app.py:189-192)") {
    val out = Seq("  connected ", "DISCONNECTED", "lost contact")
      .toDF("s").select(Clean.titleCase($"s")).as[String].collect()
    assert(out.toSeq == Seq("Connected", "Disconnected", "Lost Contact"))
  }

  test("firstIpv4: first match wins; no-match is NULL not empty (F5 pitfall)") {
    val out = Seq("10.0.0.1, 192.168.1.2", "n/a", "ip 172.16.0.9 end", null)
      .toDF("s").select(Clean.firstIpv4($"s")).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("10.0.0.1"), None, Some("172.16.0.9"), None))
  }

  test("firstIpv6: first comma-part containing ':'; else NULL (app.py:205-214)") {
    val out = Seq("fe80::1, fe80::2", "1.2.3.4", "x, ::1", null)
      .toDF("s").select(Clean.firstIpv6($"s")).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("fe80::1"), None, Some("::1"), None))
  }

  test("parseTs: garbage coerces to NULL under ANSI mode (errors='coerce')") {
    val out = Seq("2024-01-02 03:04:05", "not a date", null)
      .toDF("s").select(Clean.parseTs($"s")).collect()
    assert(out(0).getTimestamp(0) == java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("keywordAny: NULL rows are false, not NULL (app.py:268 na=False)") {
    val df  = Seq(("Failed", null: String), (null, null), ("ok", "Timed Out"), ("ok", "fine"))
      .toDF("a", "b")
    val got = df.filter(Clean.keywordAny(Seq($"a", $"b"), Clean.FailurePattern)).count()
    assert(got == 2)
  }

  test("collapseNonAlnum collapses runs") {
    val out = Seq("a - b!! c").toDF("s").select(Clean.collapseNonAlnum($"s")).as[String].head()
    assert(out == "a_b_c")
  }

  test("canonicalText: whitespace-collapse + trim + lower") {
    val out = Seq("  Fast\t\tCar  ").toDF("s").select(Clean.canonicalText($"s")).as[String].head()
    assert(out == "fast car")
  }

  test("redactPii masks emails, IPs, and long digit runs; leaves short numbers") {
    val out = Seq("mail a.b+c@ex-1.org, host 10.0.255.1, acct 12345678, port 80")
      .toDF("s").select(Clean.redactPii($"s")).as[String].head()
    assert(out == "mail <EMAIL>, host <IP>, acct <NUM>, port 80")
  }

  test("stripAccents folds combining and precomposed accents, leaves ligatures/CJK") {
    val rows = Seq("Café Zürich niño", "Café", "œ ß 中文", "plain 123", null)
      .toDF("s").select(Clean.stripAccents($"s")).as[String].collect()
    assert(rows(0) == "Cafe Zurich nino")
    assert(rows(1) == "Cafe")                  // decomposed input folds too
    assert(rows(2) == "œ ß 中文") // ligatures + CJK untouched (DuckDB parity)
    assert(rows(3) == "plain 123")
    assert(rows(4) == null)
  }

  test("stripAccents/unicodeNormalize properties: idempotent, mark-free, length-bounded") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // strings mixing ASCII, precomposed accents, combining marks, CJK
    val g = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'ü', 'ñ', 'Å', 'ç', '中', 'œ', '́', '̈', ' ')
    )).map(_.mkString)
    val p = Prop.forAll(g) { s: String =>
      val out = Seq(s).toDF("s").select(
        Clean.stripAccents($"s").as("f"),
        Clean.stripAccents(Clean.stripAccents($"s")).as("ff"),
        Clean.unicodeNormalize(Clean.unicodeNormalize($"s")).as("nn"),
        Clean.unicodeNormalize($"s").as("n")).head()
      val folded = out.getString(0)
      folded == out.getString(1) &&                       // stripAccents idempotent
      out.getString(2) == out.getString(3) &&             // NFC idempotent
      !folded.exists(ch => Character.getType(ch) == Character.NON_SPACING_MARK)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30).withInitialSeed(7L), p)
    assert(res.passed, res.status.toString)
  }

  test("unicodeNormalize NFC unifies decomposed and precomposed spellings") {
    val df  = Seq(("Café", "Café")).toDF("a", "b")
    val out = df.select(
      Clean.unicodeNormalize($"a").as("na"), Clean.unicodeNormalize($"b").as("nb"),
      length(Clean.unicodeNormalize($"a", "NFD")).as("dlen")).head()
    assert(out.getString(0) == out.getString(1)) // same canonical form
    assert(out.getString(0) == "Café")
    assert(out.getInt(2) == 5)                   // NFD re-splits into e + mark
    intercept[IllegalArgumentException] { Clean.unicodeNormalize($"a", "bogus") }
  }
}
