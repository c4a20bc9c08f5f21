package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the hot per-document paths.
  *
  * The HOF forms (`transform(sequence(...), i -> concat_ws(' ', slice(...)))`
  * and the md5 minhash lambda) are CodegenFallback and evaluate an
  * interpreted expression tree PER ARRAY ELEMENT — profiled at ~36 µs per
  * shingle, which made shingling alone cost ~10 s at sf0.1. These
  * expressions evaluate once per ROW in compiled JVM code; semantics are
  * bit-identical to the HOF forms and to the DuckDB oracle SQL.
  *
  * Each expression implements REAL `doGenCode` (not `CodegenFallback`): the
  * generated code calls the expression's public `compute` method directly
  * on the referenced instance with the unboxed child value. CodegenFallback
  * would instead exclude the enclosing Project/Filter from whole-stage
  * codegen entirely (`CollapseCodegenStages.supportCodegen` rejects any
  * plan containing one), splitting the scan→project pipeline into separate
  * row-materializing operators for EVERY query that shingles, hashes, or
  * scores — the direct call keeps the stage fused and costs one virtual
  * dispatch per row. `compute` runs on executor-task-private expression
  * instances (task binaries deserialize per task), so per-instance caches
  * are safe; the shared MessageDigest is ThreadLocal regardless.
  */

/** Whitespace-tokenize (trim → lower → split `\s+`) and emit all n-token
  * grams joined by one space; `distinct` keeps first occurrences only
  * (matching `array_distinct`). Equivalent to the SURVEY T3 HOF form.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNgrams", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): ArrayData = {
    val t    = input.toString.trim.toLowerCase(java.util.Locale.ROOT)
    val toks = t.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out =
      if (distinct) {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i <= toks.length - n) {
          seen.add(joinGram(toks, i)); i += 1
        }
        val arr = new Array[Any](seen.size)
        val it  = seen.iterator()
        var j   = 0
        while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
        arr
      } else {
        val arr = new Array[Any](toks.length - n + 1)
        var i = 0
        while (i <= toks.length - n) {
          arr(i) = UTF8String.fromString(joinGram(toks, i)); i += 1
        }
        arr
      }
    new GenericArrayData(out)
  }

  private def joinGram(toks: Array[String], start: Int): String = {
    val sb = new java.lang.StringBuilder(toks(start))
    var k  = 1
    while (k < n) { sb.append(' ').append(toks(start + k)); k += 1 }
    sb.toString
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All overlapping character n-grams of `lower(text)` (no trim — mirrors
  * the `lower → substr` HOF reference form in [[graft.ops.Text.charNgrams]],
  * cited there), one entry per occurrence, in order; `distinct` keeps first
  * occurrences only (matching `array_distinct`). Positions are CODEPOINTS
  * (`substringSQL` semantics), so multi-byte scripts produce n codepoints
  * per gram; texts shorter than n yield the empty array. The HOF form
  * evaluates an interpreted substr lambda PER GRAM — one eval per character
  * of every document — which profiling showed as the dominant cost of the
  * char-trigram language-ID pipeline; this is one compiled pass per row.
  */
case class CharNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charNgrams", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): ArrayData = {
    val lc  = input.toLowerCase
    val len = lc.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out =
      if (distinct) {
        val seen = new java.util.LinkedHashSet[UTF8String]()
        var i = 0
        while (i <= len - n) { seen.add(lc.substringSQL(i + 1, n)); i += 1 }
        val arr = new Array[Any](seen.size)
        val it  = seen.iterator()
        var j   = 0
        while (it.hasNext) { arr(j) = it.next(); j += 1 }
        arr
      } else {
        val arr = new Array[Any](len - n + 1)
        var i = 0
        while (i <= len - n) { arr(i) = lc.substringSQL(i + 1, n); i += 1 }
        arr
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Jaccard similarity |A∩B| / |A∪B| of two `array<string>` columns whose
  * elements are already de-duplicated (the shingle-set invariant). One hash
  * set and two counters per pair — replaces the interpreted
  * `size(array_intersect)/size(array_union)` pair which built four
  * collections per candidate in the verify joins.
  */
case class ArrayJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  // two empty sets yield NULL even when both children are non-nullable;
  // without this override the non-nullable codegen path would NPE on it
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_jaccard expects (array<string>, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("arrayJaccard", this)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("jac")
      s"""
         |java.lang.Double $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  /** null ⟺ both sets empty (0/0, matches SQL NULL division). */
  def compute(x: ArrayData, y: ArrayData): java.lang.Double = {
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx == 0 && ny == 0) return null
    val set = new java.util.HashSet[UTF8String](nx * 2)
    var i = 0
    while (i < nx) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < ny) { if (set.contains(y.getUTF8String(j))) inter += 1; j += 1 }
    inter.toDouble / (nx + ny - inter).toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** SimHash signature (nBits ≤ 60) over an `array<string>` element set: bit b
  * of the output is the sign of Σ_elements (2·bit_b(h(e)) − 1), h = the
  * 60-bit md5 hash. One md5 per element, integer math throughout —
  * bit-exact in any engine (DuckDB oracle replays it with `>>`, `&`,
  * list_sum). Empty array → 0 (every bit-sum is 0, no positive sign).
  */
case class SimHashOfSet(child: Expression, nBits: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 60, "nBits must be in [1, 60]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(arr: ArrayData): Long = {
    val m   = arr.numElements()
    val md  = MinHashSignature.threadMd5()
    val sums = new Array[Int](nBits)
    var j = 0
    while (j < m) {
      md.reset()
      md.update(arr.getUTF8String(j).toString.getBytes("UTF-8"))
      val h = graft.expr.MinHashSignature.first60Bits(md.digest())
      var b = 0
      while (b < nBits) {
        sums(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b   = 0
    while (b < nBits) {
      if (sums(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** k-element MinHash signature over a shingle array.
  *
  * Each shingle is md5-digested ONCE — `h = first60Bits(md5(s)) mod p`,
  * p = 2^31−1 — and the k permutations are derived by integer mixing
  * `(a_i·h + b_i) mod p` with fixed coefficients [[MinHashSignature.coeffA]]/
  * [[MinHashSignature.coeffB]]. All intermediates stay below 2^62, so the
  * identical arithmetic runs overflow-free in 64-bit on any engine and the
  * DuckDB oracle replays it verbatim:
  * `(a_i * (('0x'||substr(md5(s),1,15))::BIGINT % 2147483647) + b_i) % 2147483647`.
  * (The previous scheme digested shingle+"#i" per permutation — k× the md5
  * work for the same signature quality; this is the standard one-hash
  * k-permutation family.) Empty input → k NULLs (the `array_min(empty)`
  * convention of the HOF form).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash expects array<string>, got ${other.simpleString}")
  }

  // permutation coefficients are a pure function of k — computed once per
  // task, not once per ROW (this eval is the corpus-scan hot path)
  @transient private lazy val as = MinHashSignature.coeffA(k)
  @transient private lazy val bs = MinHashSignature.coeffB(k)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHash", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(arr: ArrayData): ArrayData = {
    import MinHashSignature.P
    val m   = arr.numElements()
    if (m == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val md   = MinHashSignature.threadMd5()
    val best = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < m) {
      md.reset()
      md.update(arr.getUTF8String(j).getBytes)
      val h = MinHashSignature.first60Bits(md.digest()) % P
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % P
        if (v < best(i)) best(i) = v
        i += 1
      }
      j += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) { out(i) = best(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All `nTables` sign-LSH bucket ids of a float-vector column in one compiled
  * pass: bucket bit p of table t is `sign(Σ_d v[d]·w(t·100+p, d))`, with the
  * ±1 hyperplane weights derived from md5 exactly like
  * `Similarity.planeWeight` (and the DuckDB oracle). The Column-level form
  * inlines nTables×nPlanes literal-array cosine calls into one generated
  * method — past ~8 KB of bytecode the JVM refuses to JIT it and the whole
  * stage runs interpreted; this expression is a plain nested loop instead.
  * Accumulation is a sequential double fold in index order — bit-identical
  * to the oracle's `list_reduce` form, so `> 0` signs agree exactly.
  */
case class SignLshBuckets(child: Expression, nTables: Int, nPlanes: Int)
    extends UnaryExpression {

  require(nTables >= 1 && nPlanes >= 1 && nPlanes < 64, "bad table/plane counts")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) |
         ArrayType(org.apache.spark.sql.types.DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_buckets expects array<float|double>, got ${other.simpleString}")
  }

  @transient private var cachedDim: Int = -1
  @transient private var weights: Array[Array[Double]] = _

  /** ±1 weights per (table, plane), materialized once per input dimension. */
  private def weightsFor(dim: Int): Array[Array[Double]] = {
    if (cachedDim != dim) {
      weights = Array.tabulate(nTables * nPlanes) { i =>
        val plane = (i / nPlanes) * 100 + (i % nPlanes)
        Array.tabulate(dim) { d =>
          val md  = MessageDigest.getInstance("MD5")
          val hex = md.digest(s"${plane}_$d".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.substring(0, 15)
          if (java.lang.Long.parseLong(hex, 16) % 2 == 1) 1.0 else -1.0
        }
      }
      cachedDim = dim
    }
    weights
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signLsh", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  // resolved once per instance, NOT per row: dataType walks the child tree
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType ==
      org.apache.spark.sql.types.FloatType

  def compute(arr: ArrayData): ArrayData = {
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      v(d) = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      d += 1
    }
    val w   = weightsFor(dim)
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val wv  = w(t * nPlanes + p)
        var acc = 0.0
        var i   = 0
        while (i < dim) { acc += v(i) * wv(i); i += 1 }
        if (acc > 0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  // One MD5 instance per thread, reset per use: getInstance() walks the
  // JCA provider registry and allocates per call — measurable at one call
  // per ROW on the corpus-scan paths (minhash/simhash evaluate per
  // document). Expressions may share a thread after task-thread reuse, so
  // the cache is ThreadLocal rather than per-instance.
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private[expr] def threadMd5(): MessageDigest = {
    val md = md5Local.get()
    md.reset()
    md
  }

  /** Mersenne prime 2^31−1: the permutation modulus. Small enough that
    * a·h + b < 2^62 (no 64-bit overflow in any engine), large enough that
    * hash collisions are negligible against shingle-set sizes.
    */
  val P: Long = 2147483647L

  /** Multiplier for permutation i (Knuth's 2654435761, cycled mod p, forced
    * nonzero so every permutation is a bijection of Z_p).
    */
  def coeffA(k: Int): Array[Long] = Array.tabulate(k) { i =>
    val a = (2654435761L * (i + 1)) % P
    if (a == 0L) 1L else a
  }

  /** Additive constant for permutation i. */
  def coeffB(k: Int): Array[Long] = Array.tabulate(k)(i => (40503L * (i + 1) + 17L) % P)

  /** Value of the first 15 hex digits of an md5 digest (= 60 bits). */
  private[graft] def first60Bits(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}

/** Jaro-Winkler similarity of two strings — the entity-resolution scoring
  * staple (typo-tolerant name matching, stronger at shared prefixes than
  * raw edit distance). Standard parameters: prefix scale 0.1, prefix cap 4,
  * boost only when the Jaro base exceeds 0.7.
  *
  * Operates on UTF-8 BYTES, not code points — deliberately: that is what
  * DuckDB's `jaro_winkler_similarity` computes (verified empirically:
  * 'aé' vs 'aà' scores as the 3-byte sequences), so the oracle replays
  * every score exactly. Both-empty yields 0.0, the DuckDB convention.
  * Per-pair cost is O(len²) worst case on the match window — intended for
  * BLOCKED candidate pairs (see [[graft.ops.Text.nameSimilarityPairs]]),
  * never an unblocked cross join.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.JaroWinkler$$.MODULE$$.similarity($a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinkler {
  /** Byte-wise Jaro-Winkler, matching DuckDB's semantics. */
  def similarity(s: Array[Byte], t: Array[Byte]): Double = {
    val la = s.length
    val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    val window  = math.max(math.max(la, lb) / 2 - 1, 0)
    val sMatch  = new Array[Boolean](la)
    val tMatch  = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: mismatched positions between the two matched streams
    var k = 0
    var mism = 0
    i = 0
    while (i < la) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val md   = m.toDouble
    // transpositions FLOOR to an integer (mism / 2, not mism / 2.0) — the
    // rapidfuzz convention DuckDB follows; the fractional form diverges on
    // every odd mismatch count (fuzz-verified: 1917/20000 random pairs)
    val jaro = (md / la + md / lb + (md - (mism / 2)) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val cap = math.min(4, math.min(la, lb))
    while (l < cap && s(l) == t(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Per-document character-bigram histogram in one compiled pass: the map
  * `bigram → occurrence count` over `substr(i, 2)` windows, i = 1..len−1 —
  * bit-identical to exploding `transform(sequence(1, length(s)−1),
  * i -> substr(s, i, 2))` and counting, but with no per-character row, no
  * hash aggregate, and no shuffle: the "aggregation" happens inside the
  * expression, so a corpus-scale scoring pass ships already-compressed
  * (doc, bigram, count) rows from the scan itself (`Text.bigramLmScore`,
  * reference quality-scoring intent `/root/reference/app.py:267-276`).
  * Windows index CODE POINTS (Column.substr semantics), so multi-byte text
  * matches the HOF form exactly.
  */
case class CharBigramCounts(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_bigram_counts expects a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramCounts", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val n = s.numChars()
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var i = 1
    while (i < n) {
      val bg  = s.substringSQL(i, 2)
      val cur = m.get(bg)
      m.put(bg, if (cur == null) 1L else cur + 1L)
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it   = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue.longValue()
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def withNewChildInternal(newChild: Expression): CharBigramCounts =
    copy(child = newChild)
}

/** All single-position masked variants of a string: entry i (0-based) is the
  * input with codepoint i replaced by the reserved `\u0001` placeholder —
  * the FastSS-style blocking index of
  * [[graft.ops.Text.singleEditNearPairs]]. Bit-identical to the HOF
  * reference form `transform(sequence(1, length(s)), i -> concat(
  * substr(s,1,i-1), chr(1), substr(s,i+1,length(s))))`, which evaluates an
  * interpreted 3-term concat lambda PER CHARACTER of every key (the q106
  * ×100 hot path); this is one compiled pass per row. Codepoint semantics
  * (`substr`), so multi-byte scripts mask whole characters; `distinct`
  * keeps first variant-value occurrences only. Empty string →
  * empty array; NULL → NULL (the HOF form returned `[]`, but every caller
  * explodes, so rows are identical).
  */
case class MaskedVariants(child: Expression, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"masked_variants expects a string column, got ${child.dataType.simpleString}")

  @transient private lazy val mask = UTF8String.fromString("\u0001")

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("maskedVariants", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): ArrayData = {
    val len = s.numChars()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val out =
      if (distinct) {
        // duplicate variant VALUES exist only for mask-char-bearing inputs
        // (masking either position of a double-mask-char run yields the
        // same string); de-duplicating them here is what the exactly-once
        // pair emission in singleEditNearPairs is proved against
        val seen = new java.util.LinkedHashSet[UTF8String]()
        var i = 0
        while (i < len) { seen.add(variantAt(s, i, len)); i += 1 }
        val arr = new Array[Any](seen.size)
        val it  = seen.iterator()
        var j = 0
        while (it.hasNext) { arr(j) = it.next(); j += 1 }
        arr
      } else {
        val arr = new Array[Any](len)
        var i = 0
        while (i < len) { arr(i) = variantAt(s, i, len); i += 1 }
        arr
      }
    new GenericArrayData(out)
  }

  private def variantAt(s: UTF8String, i: Int, len: Int): UTF8String = {
    // substringSQL is 1-based; length-0 prefix/suffix yield empty strings
    val prefix = s.substringSQL(1, i)
    val suffix = s.substringSQL(i + 2, len)
    UTF8String.concat(prefix, mask, suffix)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Consecutive fixed-width token chunks of a text column: tokenize
  * (trim → lower → split `\s+`, the [[WordNgrams]] tokenization) and emit
  * ⌈n/width⌉ space-joined windows — the pseudo-line decomposition of
  * [[graft.ops.Curation.tokenChunks]]. Bit-identical to the HOF form
  * `transform(sequence(0, ceil(n/width)-1), i -> array_join(slice(tk,
  * i*width+1, width), ' '))`, which evaluates an interpreted slice+join
  * lambda per window of every document (the q77 hot path). Empty /
  * whitespace-only text tokenizes to `[""]` (the split convention) and
  * yields one empty chunk, exactly like the HOF form. NULL → NULL (the
  * HOF form's NULL propagates the same way; all callers posexplode).
  */
case class TokenChunks(child: Expression, width: Int)
    extends UnaryExpression {

  require(width >= 1, "width must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_chunks expects a string column, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenChunks", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): ArrayData = {
    val t    = input.toString.trim.toLowerCase(java.util.Locale.ROOT)
    val toks = t.split("\\s+") // never empty: "" splits to [""]
    val n    = toks.length
    val nChunks = (n + width - 1) / width
    val out = new Array[Any](nChunks)
    var j = 0
    while (j < nChunks) {
      val from = j * width
      val to   = math.min(from + width, n)
      val sb   = new java.lang.StringBuilder(toks(from))
      var k = from + 1
      while (k < to) { sb.append(' ').append(toks(k)); k += 1 }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Multiplicity of the most frequent element of an `array<string>` — the
  * numerator of the Gopher-style top-token dominance ratio
  * ([[graft.ops.Text.topTokenRatio]]). Equals the max run length of the
  * sorted array (the HOF reference form's sorted fold, which evaluates an
  * interpreted struct-building lambda per token — the q74 hot path): same
  * integer, one hash-count pass, no sort. Empty array → 0 (the fold's
  * initial `best`).
  */
case class MaxElementMultiplicity(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_element_multiplicity expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("maxMult", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(arr: ArrayData): Int = {
    val n   = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val k = arr.getUTF8String(i)
      val prev = counts.get(k)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(k, c)
      if (c > best) best = c
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Character-level Shannon entropy in bits/char — the native form of
  * [[graft.ops.Curation.charEntropy]]'s sorted-run fold (which evaluates an
  * interpreted struct lambda per CHARACTER of every document — the q79
  * hot path). Bit-identical accumulation: characters are the codepoint
  * entries of `split(s, '')` (empty text → the single `[""]` entry → 0.0),
  * runs close in sorted-codepoint order (UTF-8 byte order ≡ codepoint
  * order), and each closure performs the identical double ops in the
  * identical sequence — `ent − (run/n)·log2(run/n)` with
  * `log2 = StrictMath.log(x)/StrictMath.log(2)`, exactly Spark's Log2
  * (StrictMath, not Math — they differ by 1 ulp on some inputs, which the
  * equivalence spec caught) — so the 4-decimal oracle round agrees exactly.
  */
case class CharEntropyBits(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects a string column, got ${child.dataType.simpleString}")

  private def log2(x: Double): Double =
    java.lang.StrictMath.log(x) / java.lang.StrictMath.log(2.0)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): Double = {
    val s   = input.toString
    val len = s.length // UTF-16 units; codepoints counted below
    if (len == 0) return 0.0 // split('') = [""]: one run, (1/1)*log2(1) = 0
    // collect codepoints and sort — ascending codepoint order is exactly
    // the UTF-8 binary order array_sort applies to the split entries
    val cps = new Array[Int](s.codePointCount(0, len))
    var i = 0
    var j = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      cps(j) = cp; j += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps)
    val n = cps.length.toDouble
    var ent  = 0.0
    var run  = 0.0
    var prev = -1
    var k = 0
    while (k < cps.length) {
      val c = cps(k)
      if (run == 0.0 || c == prev) run += 1.0
      else { ent = ent - (run / n) * log2(run / n); run = 1.0 }
      prev = c
      k += 1
    }
    if (run > 0.0) ent - (run / n) * log2(run / n) else ent
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
