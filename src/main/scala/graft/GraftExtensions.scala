package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's native expressions
  * available in ANY session — including plain `spark-submit --conf
  * spark.sql.extensions=graft.GraftExtensions` and pure-SQL users — without
  * going through [[Sessions.local]].
  *
  * Only functions are injected; the engine deliberately ships no custom
  * optimizer rules or strategies because it owns plan construction
  * (SURVEY §4.3: the LSH rewrites are generated directly, not recovered
  * from user SQL by a rule).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }
}

/** The one registry of SQL-addressable engine functions — shared by the
  * extensions injector above and [[Sessions.registerFunctions]], so the
  * `spark.sql.extensions` path and `Sessions.local()` expose the identical
  * surface.
  */
object GraftExtensions {

  /** Evaluate a foldable int argument (the SQL form of a Scala `Int` param:
    * `graft_minhash(s, 16)`); rejects non-literal shapes up front so the
    * error is "argument must be a literal", not a runtime cast failure.
    */
  private def litInt(e: Expression, fn: String, arg: String): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer")
    e.eval() match {
      case i: Int  => i
      // toIntExact, not toInt: a wrapped 2^32+1 would silently become k=1
      case l: Long => java.lang.Math.toIntExact(l)
      case other   => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
  }

  /** Arity gate: a wrong-argument-count SQL call should say so, not throw
    * IndexOutOfBoundsException from inside the planner.
    */
  private def args(children: Seq[Expression], n: Int, fn: String): Seq[Expression] = {
    require(children.size == n, s"$fn expects $n argument(s), got ${children.size}")
    children
  }

  private def litString(e: Expression, fn: String, arg: String): String = {
    require(e.foldable, s"$fn: $arg must be a literal string")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a string literal, got $other")
    }
  }

  /** (name, usage, builder) for every SQL-addressable function. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float arrays",
      (children: Seq[Expression]) => { val c = args(children, 2, "graft_cosine")
        graft.expr.CosineSimilarity(c(0), c(1)) }),
    ("graft_jaccard", "graft_jaccard(a, b) - Jaccard similarity of two string-array sets",
      (children: Seq[Expression]) => { val c = args(children, 2, "graft_jaccard")
        graft.expr.ArrayJaccard(c(0), c(1)) }),
    ("graft_jaro_winkler",
      "graft_jaro_winkler(a, b) - Jaro-Winkler similarity of two strings (UTF-8 byte-wise)",
      (children: Seq[Expression]) => { val c = args(children, 2, "graft_jaro_winkler")
        graft.expr.JaroWinkler(c(0), c(1)) }),
    ("graft_char_bigram_counts",
      "graft_char_bigram_counts(s) - map of char bigram -> occurrence count",
      (children: Seq[Expression]) => { val c = args(children, 1, "graft_char_bigram_counts")
        graft.expr.CharBigramCounts(c(0)) }),
    ("graft_ngrams", "graft_ngrams(text, n) - space-joined word n-grams (ordered, with dups)",
      (children: Seq[Expression]) => { val c = args(children, 2, "graft_ngrams")
        graft.expr.WordNgrams(c(0), litInt(c(1), "graft_ngrams", "n"), distinct = false) }),
    ("graft_shingles", "graft_shingles(text, n) - distinct word n-gram shingle set",
      (children: Seq[Expression]) => { val c = args(children, 2, "graft_shingles")
        graft.expr.WordNgrams(c(0), litInt(c(1), "graft_shingles", "n"), distinct = true) }),
    ("graft_char_ngrams",
      "graft_char_ngrams(text, n) - character n-grams of lower(text) (ordered, with dups)",
      (children: Seq[Expression]) => { val c = args(children, 2, "graft_char_ngrams")
        graft.expr.CharNgrams(c(0), litInt(c(1), "graft_char_ngrams", "n"), distinct = false) }),
    ("graft_char_shingles",
      "graft_char_shingles(text, n) - distinct character n-gram set of lower(text)",
      (children: Seq[Expression]) => { val c = args(children, 2, "graft_char_shingles")
        graft.expr.CharNgrams(c(0), litInt(c(1), "graft_char_shingles", "n"), distinct = true) }),
    ("graft_simhash", "graft_simhash(shingles, nBits) - SimHash of a string-array set",
      (children: Seq[Expression]) => { val c = args(children, 2, "graft_simhash")
        graft.expr.SimHashOfSet(c(0), litInt(c(1), "graft_simhash", "nBits")) }),
    ("graft_minhash", "graft_minhash(shingles, k) - k-element MinHash signature",
      (children: Seq[Expression]) => { val c = args(children, 2, "graft_minhash")
        graft.expr.MinHashSignature(c(0), litInt(c(1), "graft_minhash", "k")) }),
    ("graft_lsh_buckets",
      "graft_lsh_buckets(vec, nTables, nPlanes) - sign-LSH bucket id per hash table",
      (children: Seq[Expression]) => { val c = args(children, 3, "graft_lsh_buckets")
        graft.expr.SignLshBuckets(c(0),
          litInt(c(1), "graft_lsh_buckets", "nTables"),
          litInt(c(2), "graft_lsh_buckets", "nPlanes")) }),
    ("graft_strip_accents", "graft_strip_accents(s) - accent folding (NFD, drop marks, NFC)",
      (children: Seq[Expression]) => { val c = args(children, 1, "graft_strip_accents")
        graft.expr.StripAccents(c(0)) }),
    ("graft_normalize", "graft_normalize(s, form) - Unicode normal form (NFC/NFD/NFKC/NFKD)",
      (children: Seq[Expression]) => { val c = args(children, 2, "graft_normalize")
        graft.expr.UnicodeNormalize(c(0), litString(c(1), "graft_normalize", "form")) }),
    ("graft_image_dims",
      "graft_image_dims(bin) - struct(width, height) from PNG/JPEG/GIF headers, else NULL",
      (children: Seq[Expression]) => { val c = args(children, 1, "graft_image_dims")
        graft.expr.ImageDims(c(0)) }),
    ("graft_wav_info",
      "graft_wav_info(bin) - struct(sample_rate, channels, bits_per_sample) from RIFF/WAVE, else NULL",
      (children: Seq[Expression]) => { val c = args(children, 1, "graft_wav_info")
        graft.expr.WavInfo(c(0)) }),
    ("graft_top_k",
      "graft_top_k(sim, id, k) - aggregate: best k (sim desc, id asc) pairs, partial map-side",
      (children: Seq[Expression]) => { val c = args(children, 3, "graft_top_k")
        graft.expr.TopKPairs(c(0), c(1), litInt(c(2), "graft_top_k", "k")) }),
    ("graft_masked_variants",
      "graft_masked_variants(s) - all single-position chr(1)-masked variants of s",
      (children: Seq[Expression]) => { val c = args(children, 1, "graft_masked_variants")
        graft.expr.MaskedVariants(c(0), distinct = false) }),
    ("graft_token_chunks",
      "graft_token_chunks(text, width) - consecutive width-token space-joined chunks",
      (children: Seq[Expression]) => { val c = args(children, 2, "graft_token_chunks")
        graft.expr.TokenChunks(c(0), litInt(c(1), "graft_token_chunks", "width")) }),
    ("graft_max_multiplicity",
      "graft_max_multiplicity(arr) - occurrence count of the most frequent array element",
      (children: Seq[Expression]) => { val c = args(children, 1, "graft_max_multiplicity")
        graft.expr.MaxElementMultiplicity(c(0)) }),
    ("graft_char_entropy",
      "graft_char_entropy(s) - character-level Shannon entropy in bits/char",
      (children: Seq[Expression]) => { val c = args(children, 1, "graft_char_entropy")
        graft.expr.CharEntropyBits(c(0)) }))
}
