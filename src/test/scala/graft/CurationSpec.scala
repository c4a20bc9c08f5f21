package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curation, Ingest}

class CurationSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("bloomAntiJoin equals the plain anti-join, false positives corrected") {
    val corpus  = (1L to 400L).map(i => (i, s"doc $i")).toDF("id", "k")
    val exclude = (1L to 400L by 3).map(i => (s"doc $i", 0)).toDF("k", "pad")
    // 64-bit filter for ~134 keys → high fpp, so the exact-confirm branch
    // is genuinely exercised (a roomy bloom would make it vacuous)
    val out = Curation.bloomAntiJoin(corpus, col("k"), exclude, col("k"),
        expectedItems = 134L, fpp = 0.5)
      .orderBy("id").as[(Long, String)].collect()
    val ref = corpus.join(exclude, corpus("k") === exclude("k"), "left_anti")
      .orderBy("id").as[(Long, String)].collect()
    assert(out.sameElements(ref))
    assert(ref.length == 400 - 134)
  }

  test("bloomAntiJoin keeps null-key rows, like the anti-join it replaces") {
    val corpus  = Seq((1L, "a"), (2L, null), (3L, "b")).toDF("id", "k")
    val exclude = Seq(("a", 0)).toDF("k", "pad")
    val out = Curation.bloomAntiJoin(corpus, col("k"), exclude, col("k"), 10L)
      .select("id").as[Long].collect().sorted
    assert(out.sameElements(Array(2L, 3L)))
  }

  test("domainCap keeps at most k docs per domain, content-addressed") {
    val docs = (1L to 30L).map(i => (i, s"dom${i % 2}", s"text $i")).toDF("id", "dom", "txt")
    val out  = Curation.domainCap(docs, "dom", "id", "txt", 5)
    val byDom = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom == Map("dom0" -> 5L, "dom1" -> 5L))
    // deterministic: same pick on a re-run with shuffled input order
    val again = Curation.domainCap(docs.orderBy(rand(7)), "dom", "id", "txt", 5)
    assert(out.select("id").as[Long].collect().sorted.sameElements(
      again.select("id").as[Long].collect().sorted))
  }

  test("curationPipeline gates, dedups, caps, and splits in one plan") {
    val docs = Seq(
      (1L, "d", "one two three four five"),   // passes gate
      (2L, "d", "one two three four five"),   // exact dup of 1 -> dropped
      (3L, "d", "alpha beta gamma delta eps"),
      (4L, "d", "too short"),                 // gated out (< 4 tokens)
      (5L, "e", "omega psi chi phi upsilon")
    ).toDF("doc_id", "source", "text")
    val out = Curation.curationPipeline(docs, "doc_id", "text", "source",
        minTokens = 4, maxTokens = 10, cap = 10,
        splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 3L, 5L)) // 2 deduped, 4 gated
    assert(out.values.forall(Set("train", "val", "test")))
    // cap binds: with cap = 1, one survivor per source
    val capped = Curation.curationPipeline(docs, "doc_id", "text", "source",
      4, 10, 1, Seq("train" -> 1.0))
    assert(capped.groupBy("source").count().as[(String, Long)].collect().toMap ==
      Map("d" -> 1L, "e" -> 1L))
  }

  test("stripBoilerplate drops domain-frequent lines, keeps order, empty-text survivor") {
    val docs = Seq(
      (1L, "d", "COOKIE BANNER\nreal content one\nFOOTER"),
      (2L, "d", "COOKIE BANNER\nreal content two\nFOOTER"),
      (3L, "d", "COOKIE BANNER\nFOOTER"), // all boilerplate -> empty text
      (4L, "e", "COOKIE BANNER\nunique here")  // different domain: banner is rare there
    ).toDF("id", "dom", "txt")
    val lines = Curation.linesOf(docs, "id", "dom", "txt")
    val out = Curation.stripBoilerplate(docs, lines, "id", "dom", maxFrac = 0.6)
      .select("id", "clean_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "real content one")
    assert(out(2L) == "real content two")
    assert(out(3L) == "")
    assert(out(4L) == "COOKIE BANNER\nunique here")
  }

  test("tokenChunks windows tokens into fixed-width pseudo-lines") {
    val docs = Seq((1L, "d", "a b c d e f g")).toDF("id", "dom", "txt")
    val got = Curation.tokenChunks(docs, "id", "dom", "txt", 3)
      .orderBy("pos").select("line").as[String].collect().toSeq
    assert(got == Seq("a b c", "d e f", "g"))
  }

  test("slidingTokenWindows: overlap, clamped tail, short doc yields one chunk") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y")).toDF("id", "txt")
    val out = graft.ops.Curation.slidingTokenWindows(docs, "id", "txt", 4, 2)
      .as[(Long, Int, String)].collect().toSet
    assert(out == Set(
      (1L, 1, "a b c d"), (1L, 3, "c d e f"),
      (1L, 4, "d e f g"), // off-grid final start: tail token covered
      (2L, 1, "x y")))    // short doc: one short chunk
  }

  test("charEntropy hits the closed-form values") {
    val got = Seq("aaaa", "ab", "abab", "abcd").toDF("t")
      .select(Curation.charEntropy($"t")).as[Double].collect().toSeq
    assert(got == Seq(0.0, 1.0, 1.0, 2.0))
  }

  test("zScoreOutliers flags only far-from-mean rows, per group") {
    // group a: tight cluster around 100 plus one spike; group b: all tight
    val df = (Seq.tabulate(20)(i => ("a", 100L + (i % 3))) :+ (("a", 500L)))
      .++(Seq.tabulate(10)(i => ("b", 50L + (i % 2))))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "v")
    val out = Curation.zScoreOutliers(df, "grp", "v", 2.0)
      .select("grp", "v").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 500L)))
  }

  test("madOutliers flags only extreme values; MAD-zero groups flag nothing") {
    // g1: tight cluster around 10 plus one wild value
    val g1 = (1L to 11L).map(i => ("g1", i, 9.0 + (i % 3))) :+ (("g1", 99L, 500.0))
    // g2: more than half identical -> MAD 0 -> no flags even for the 1000
    val g2 = Seq(("g2", 1L, 5.0), ("g2", 2L, 5.0), ("g2", 3L, 5.0), ("g2", 4L, 1000.0))
    val df = (g1 ++ g2).toDF("g", "id", "v")
    val out = Curation.madOutliers(df, "g", col("v"), "id")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq(("g1", 99L)))
    assert(out.head._3 == 500.0)
  }

  test("winsorize clips to exact order-statistic bounds, NULLs pass through") {
    val vals = (1 to 20).map(i => ("g", i.toLong, Some(i.toDouble))) :+ (("g", 99L, Option.empty[Double]))
    val df = vals.toDF("g", "id", "v")
    // n=20: ilo = floor(19*.05)+1 = 1 -> 1.0; ihi = floor(19*.95)+1 = 19 -> 19.0
    val out = Curation.winsorize(df, "g", col("v"), "id")
      .select(col("id"), col("clipped"), col("was_clipped"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
         if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toMap
    assert(out(20L) == ((Some(19.0), Some(true))))  // clipped down to p95 bound
    assert(out(19L) == ((Some(19.0), Some(false)))) // the bound itself untouched
    assert(out(1L)  == ((Some(1.0),  Some(false)))) // p05 bound = min here
    assert(out(99L) == ((None, None)))              // NULL passes through
  }

  test("tokenChunks native ≡ HOF reference on randomized docs, all widths") {
    val rnd  = new scala.util.Random(7L)
    val vocab = Seq("alpha", "B", "cc", "Ω語", "d.1")
    val docs = (Seq("", "   ", "one") ++ (1 to 50).map(_ =>
      (0 until rnd.nextInt(13)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, s"dom${i % 3}", t) }
      .toDF("id", "dom", "txt")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("id", "pos").collect().map(_.toString).toSeq
    for (w <- Seq(1, 3, 5))
      assert(rows(Curation.tokenChunks(docs, "id", "dom", "txt", w)) ==
        rows(Curation.tokenChunksHof(docs, "id", "dom", "txt", w)), s"width $w")
  }

  test("charEntropy native ≡ sorted-fold HOF reference, bit-for-bit") {
    val rnd      = new scala.util.Random(99L)
    val alphabet = "aAb ÉΩ語テ.1\n"
    val strs = Seq("", "aaaa", "mixed Ωcase") ++ (1 to 60).map(_ =>
      (0 until rnd.nextInt(24)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = strs.toDF("t").select(
      Curation.charEntropy($"t").as("fast"),
      Curation.charEntropyHof($"t").as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("madOutliers/winsorize: high-cardinality window path ≡ runningSums path") {
    // 50 groups of ~8 rows with per-group spikes and ties; maxGroups = 5
    // forces the per-key-window fallback (the broadcast/offsets tables of
    // the runningSums path are |groups|-sized — the guard's whole point),
    // maxGroups = 10_000 keeps the designed low-cardinality path. The two
    // regimes must produce identical rows.
    val df = (0L until 400L)
      .map(i => (s"g${i % 50}", i, if (i % 97 == 0) 900.0 + i else (i % 7).toDouble))
      .toDF("g", "id", "v")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("g", "id").collect().map(_.toString).toSeq
    assert(rows(Curation.madOutliers(df, "g", col("v"), "id", maxGroups = 5)) ==
      rows(Curation.madOutliers(df, "g", col("v"), "id", maxGroups = 10000)))
    val w = Seq("id", "g", "v", "clipped", "was_clipped").map(col)
    assert(rows(Curation.winsorize(df, "g", col("v"), "id", 0.1, 0.9, maxGroups = 5).select(w: _*)) ==
      rows(Curation.winsorize(df, "g", col("v"), "id", 0.1, 0.9, maxGroups = 10000).select(w: _*)))
  }

  test("withGlobalId assigns dense ids in key order across many partitions") {
    val df  = spark.range(1000).select((col("id") * 37 % 1000).as("k")) // permuted keys
      .repartition(8)
    val out = Ingest.withGlobalId(df, Seq("k"), "gid", partitions = 6)
    val rows = out.select("k", "gid").as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).sameElements(rows.map(_._1))) // gid == rank == k here
    assert(out.rdd.getNumPartitions == 6)
  }
}
