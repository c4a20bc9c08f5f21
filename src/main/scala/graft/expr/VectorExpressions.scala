package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** IVF coarse quantization: the `nProbe` most-cosine-similar codebook cells
  * for an embedding, in rank order (cosine desc, then cell id asc — the
  * DuckDB `row_number() OVER (ORDER BY cos DESC, s_id)` tie-break).
  *
  * The codebook rides along as expression literals (O(nCells·dim) doubles on
  * every executor), so assignment is ONE compiled pass over the corpus —
  * replacing the `corpus × nCells` expand-join + per-vector window that the
  * join formulation plans, which shuffles the whole corpus `nCells`-fold
  * amplified just to run an argmax. At 1000 cells over 100 TB that join
  * shape is a non-starter; this form's cost is `nCells` dot products per
  * row inside the scan stage, no shuffle at all.
  *
  * Cosine accumulation is sequential in index order — bit-identical to
  * [[CosineSimilarity]] and to the oracle's `list_reduce` fold.
  */
case class NearestCells(
    child: Expression,
    seedIds: Seq[Long],
    seedVecs: Seq[Seq[Float]],
    nProbe: Int)
    extends UnaryExpression {

  require(seedIds.nonEmpty && seedIds.length == seedVecs.length,
    "nearest_cells: seedIds and seedVecs must be same-length and non-empty")
  require(nProbe >= 1, "nearest_cells: nProbe must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<float>, got ${other.simpleString}")
  }

  @transient private lazy val ids: Array[Long] = seedIds.toArray
  @transient private lazy val vecs: Array[Array[Float]] = seedVecs.map(_.toArray).toArray
  @transient private lazy val seedNorms: Array[Double] = vecs.map { v =>
    var s = 0.0; var i = 0
    while (i < v.length) { val d = v(i).toDouble; s += d * d; i += 1 }
    math.sqrt(s)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(arr: ArrayData): ArrayData = {
    val m    = ids.length
    // a truncated dot product against full seed norms would produce a
    // silently wrong hybrid "cosine" — dimension mismatch is a data bug
    // that must surface, not re-rank
    require(arr.numElements() == vecs(0).length,
      s"nearest_cells: vector dim ${arr.numElements()} != codebook dim ${vecs(0).length}")
    val dim = vecs(0).length
    // the query vector's norm is cell-independent — compute it once
    var na = 0.0
    var d  = 0
    while (d < dim) { val xi = arr.getFloat(d).toDouble; na += xi * xi; d += 1 }
    val qn = math.sqrt(na)
    // primitive top-nProbe insertion (ordering: cos desc, id asc; NaN ranks
    // first, matching both engines' DESC sort) — the boxed full sort this
    // replaces allocated m Integers and O(m log m) comparisons per corpus
    // row to pick 1–4 cells
    val k       = math.min(nProbe, m)
    val topCos  = new Array[Double](k)
    val topIds  = new Array[Long](k)
    var filled  = 0
    @inline def ranksAbove(c1: Double, i1: Long, c2: Double, i2: Long): Boolean = {
      val cmp = java.lang.Double.compare(c1, c2) // DESC order, NaN greatest
      cmp > 0 || (cmp == 0 && i1 < i2)
    }
    var s = 0
    while (s < m) {
      val sv = vecs(s)
      var dot = 0.0; var i = 0
      while (i < dim) { dot += arr.getFloat(i).toDouble * sv(i).toDouble; i += 1 }
      val c = dot / (qn * seedNorms(s))
      if (filled < k || ranksAbove(c, ids(s), topCos(filled - 1), topIds(filled - 1))) {
        var pos = math.min(filled, k - 1)
        while (pos > 0 && ranksAbove(c, ids(s), topCos(pos - 1), topIds(pos - 1))) {
          topCos(pos) = topCos(pos - 1); topIds(pos) = topIds(pos - 1); pos -= 1
        }
        topCos(pos) = c; topIds(pos) = ids(s)
        if (filled < k) filled += 1
      }
      s += 1
    }
    val out = new Array[Any](filled)
    var j = 0
    while (j < filled) { out(j) = topIds(j); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Product-quantization asymmetric distance: Σ over subspaces of
  * ‖probe_s − codeword(code_s)‖², with the codebooks riding as expression
  * literals — the per-candidate-pair kernel of ADC search
  * ([[graft.ops.Clustering.pqAdcDist]]).
  *
  * Exists for the same reason as [[CosineSimilarity]]: the
  * `aggregate(zip_with(...))` HOF form it replaces is CodegenFallback and
  * evaluates an interpreted lambda tree PER ELEMENT — measured 10×+ slower
  * per pair, and ADC runs per CANDIDATE PAIR, the hottest loop of an index
  * sweep. This is one virtual call into primitive loops.
  *
  * Arithmetic contract (bit-identical to the HOF form and the DuckDB
  * `list_reduce` replay): per subspace the squared differences accumulate
  * in double, sequentially in index order; subspace sums then add in
  * subspace order. Probe may be array<float> or array<double> (an exact
  * widening either way); codes are the array<int> of
  * [[graft.ops.Clustering.pqEncode]].
  */
case class PqAdc(
    left: Expression,
    right: Expression,
    books: Seq[Seq[(Int, Seq[Double])]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(books.nonEmpty && books.forall(_.nonEmpty), "pq_adc: empty codebooks")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true

  @transient private lazy val probeIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | org.apache.spark.sql.types.DoubleType, _),
          ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<float|double> probe, array<int> codes), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  // codeword table indexed [subspace][code] — codes are the stable seed
  // identities of pqTrain, so the table is dense up to the max surviving
  // code; a vanished code's slot stays null and lookup fails loudly
  @transient private lazy val table: Array[Array[Array[Double]]] = books.map { book =>
    val t = new Array[Array[Double]](book.map(_._1).max + 1)
    book.foreach { case (code, c) => t(code) = c.toArray }
    t
  }.toArray
  @transient private lazy val width: Int = books.head.head._2.length

  override protected def nullSafeEval(p: Any, c: Any): Any =
    compute(p.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  def compute(probe: ArrayData, codes: ArrayData): Double = {
    val nSub  = table.length
    require(codes.numElements() == nSub,
      s"pq_adc: ${codes.numElements()} codes for $nSub subspaces")
    require(probe.numElements() == nSub * width,
      s"pq_adc: probe dim ${probe.numElements()} != ${nSub * width}")
    var total = 0.0
    var s = 0
    while (s < nSub) {
      require(!codes.isNullAt(s), s"pq_adc: null code in subspace $s")
      val code = codes.getInt(s)
      require(code >= 0 && code < table(s).length && table(s)(code) != null,
        s"pq_adc: unknown code $code in subspace $s")
      val cw   = table(s)(code)
      val base = s * width
      var acc  = 0.0
      var i    = 0
      while (i < width) {
        val x = if (probeIsFloat) probe.getFloat(base + i).toDouble
                else probe.getDouble(base + i)
        val d = x - cw(i)
        acc += d * d
        i += 1
      }
      // 0.0 + acc is bit-identical to acc (acc is a sum of squares, never
      // -0.0), so plain accumulation keeps the subspace-order contract
      total += acc
      s += 1
    }
    total
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
