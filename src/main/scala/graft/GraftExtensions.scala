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
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
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
      (children: Seq[Expression]) => graft.expr.CosineSimilarity(children(0), children(1))),
    ("graft_jaccard", "graft_jaccard(a, b) - Jaccard similarity of two string-array sets",
      (children: Seq[Expression]) => graft.expr.ArrayJaccard(children(0), children(1))),
    ("graft_ngrams", "graft_ngrams(text, n) - space-joined word n-grams (ordered, with dups)",
      (children: Seq[Expression]) =>
        graft.expr.WordNgrams(children(0), litInt(children(1), "graft_ngrams", "n"),
          distinct = false)),
    ("graft_shingles", "graft_shingles(text, n) - distinct word n-gram shingle set",
      (children: Seq[Expression]) =>
        graft.expr.WordNgrams(children(0), litInt(children(1), "graft_shingles", "n"),
          distinct = true)),
    ("graft_simhash", "graft_simhash(shingles, nBits) - SimHash of a string-array set",
      (children: Seq[Expression]) =>
        graft.expr.SimHashOfSet(children(0), litInt(children(1), "graft_simhash", "nBits"))),
    ("graft_minhash", "graft_minhash(shingles, k) - k-element MinHash signature",
      (children: Seq[Expression]) =>
        graft.expr.MinHashSignature(children(0), litInt(children(1), "graft_minhash", "k"))),
    ("graft_lsh_buckets",
      "graft_lsh_buckets(vec, nTables, nPlanes) - sign-LSH bucket id per hash table",
      (children: Seq[Expression]) =>
        graft.expr.SignLshBuckets(children(0),
          litInt(children(1), "graft_lsh_buckets", "nTables"),
          litInt(children(2), "graft_lsh_buckets", "nPlanes"))),
    ("graft_strip_accents", "graft_strip_accents(s) - accent folding (NFD, drop marks, NFC)",
      (children: Seq[Expression]) => graft.expr.StripAccents(children(0))),
    ("graft_normalize", "graft_normalize(s, form) - Unicode normal form (NFC/NFD/NFKC/NFKD)",
      (children: Seq[Expression]) =>
        graft.expr.UnicodeNormalize(children(0),
          litString(children(1), "graft_normalize", "form"))),
    ("graft_image_dims",
      "graft_image_dims(bin) - struct(width, height) from PNG/JPEG/GIF headers, else NULL",
      (children: Seq[Expression]) => graft.expr.ImageDims(children(0))),
    ("graft_wav_info",
      "graft_wav_info(bin) - struct(sample_rate, channels, bits_per_sample) from RIFF/WAVE, else NULL",
      (children: Seq[Expression]) => graft.expr.WavInfo(children(0))),
    ("graft_top_k",
      "graft_top_k(sim, id, k) - aggregate: best k (sim desc, id asc) pairs, partial map-side",
      (children: Seq[Expression]) =>
        graft.expr.TopKPairs(children(0), children(1),
          litInt(children(2), "graft_top_k", "k"))))
}
