package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Clustering and second-moment statistics over embedding columns — the
  * model-fitting half of a training-data pipeline (corpus topic balancing,
  * semantic bucketing, dimensionality reduction before ANN).
  *
  * Scale shape shared by everything here: the MODEL (k centroids, a d×d
  * covariance) is tiny and lives on the driver / in broadcasts; the DATA
  * only ever streams through partial aggregates. No row is ever shuffled —
  * per iteration the corpus is read once, each task reduces to k×d (or
  * d²/2) doubles, and one k-row (or one-row) exchange merges them. That is
  * the same plan at 500 rows and at 100 TB.
  */
object Clustering {

  /** Squared L2 distance between an embedding column and a fixed centroid,
    * accumulated left-to-right in double — the fold order and casts are the
    * replayable contract ([[Similarity.dot]] convention): DuckDB's
    * `list_reduce(list_prepend(0.0, [...]))` reproduces it bit for bit.
    */
  def sqDist(v: Column, centroid: Seq[Double]): Column =
    aggregate(zip_with(v, typedLit(centroid), (x, y) => {
      val d = x.cast("double") - y
      d * d
    }), lit(0.0), (acc, z) => acc + z)

  /** Nearest-centroid id for each row: argmin over the broadcast centroid
    * table, ties to the LOWest centroid id. The argmin is an `array_min`
    * over (distance, cid) structs — lexicographic struct ordering IS the
    * tie-broken argmin, evaluated entirely inside codegen with no join.
    * Distances are rounded to 1e-6 before comparison so an engine replaying
    * the assignment (the DuckDB oracle) cannot flip a near-tie on
    * last-bit float noise.
    */
  def assignClusters(df: DataFrame, vecCol: String,
      centroids: Seq[(Int, Seq[Double])], outCol: String = "cluster"): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val cands = array(centroids.map { case (cid, c) =>
      struct(
        (floor(sqDist(col(vecCol), c) * 1000000 + 0.5) / 1000000).as("d"),
        lit(cid).as("cid"))
    }: _*)
    df.withColumn(outCol, array_min(cands).getField("cid"))
  }

  /** Lloyd's k-means over an embedding column: k deterministic seeds (the
    * rows with the k smallest ids — content-addressed, replayable), then
    * `iters` rounds of assign → recompute means.
    *
    * Each iteration is ONE pass over the corpus: assignment is a broadcast
    * expression (no join, no shuffle of rows) and the centroid update is a
    * partially-aggregated [[Similarity.VectorMean]] — tasks reduce to at
    * most k×d doubles before the exchange, so the shuffle carries k rows
    * regardless of corpus size. The k-row update lands on the driver (the
    * model is driver state by design — same economics as any ML fit);
    * updated centroids are rounded to 1e-4 per element so the next
    * iteration's assignment is replayable cross-engine. A cluster that
    * captures no rows vanishes (with data-point seeds each centroid owns at
    * least its seed row, so this only happens with duplicate seed vectors).
    *
    * @return (assignment DataFrame with `cluster` added, final centroids
    *         (cid, size, mean)) — the assignment reflects the LAST
    *         assignment pass; the centroids are the means of exactly those
    *         clusters.
    */
  /** Deterministic seeding shared by [[kmeans]] and the streaming
    * [[graft.ops.Streaming.kmeansSink]]: the k smallest-id vectors whose
    * dimension matches the FIRST valid vector's (a wrong-dim row among the
    * smallest ids must not become a centroid — its null distances would
    * win every argmin). Over-fetches 4k candidates so a few malformed
    * rows cannot starve the seed set.
    */
  private[graft] def seedCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[Seq[Double]] = {
    val cand = df.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(math.max(4 * k, k)).select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toIndexedSeq)
    cand.headOption match {
      case None    => Seq.empty
      case Some(h) => cand.filter(_.length == h.length).take(k).map(v => v: Seq[Double]).toSeq
    }
  }

  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int)
      : (DataFrame, Seq[(Int, Long, Seq[Double])]) = {
    require(k >= 1 && iters >= 1, "k and iters must be positive")
    val seeds = seedCentroids(df, idCol, vecCol, k)
    require(seeds.nonEmpty, "kmeans needs at least one non-null vector")
    val dim = seeds.head.length
    // NULL or wrong-dimension vectors cannot be assigned (null distances
    // would silently collapse into cluster 0; zip_with would truncate a
    // short vector) — they are EXCLUDED from assignment and means alike
    val clean = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
    var centroids: Seq[(Int, Seq[Double])] = seeds.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    var assigned  = clean
    var stats     = Seq.empty[(Int, Long, Seq[Double])]
    for (_ <- 1 to iters) {
      assigned = assignClusters(clean, vecCol, centroids)
      stats = assigned.groupBy(col("cluster"))
        .agg(Similarity.vectorMean(col(vecCol)).as("c"), count(lit(1)).as("n"))
        .select(col("cluster"),
          transform(col("c"), x => floor(x * 10000 + 0.5) / 10000).as("c"), col("n"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(2), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq
      centroids = stats.map { case (cid, _, c) => (cid, c) }
    }
    (assigned, stats)
  }

  // ---- one-pass covariance --------------------------------------------------

  /** Mutable accumulation state: row count, per-dimension sums, and the
    * upper-triangle (i ≤ j, row-major) cross-product sums.
    */
  case class CovBuf(n: Long, sums: Array[Double], prods: Array[Double])

  /** The one place the covariance arithmetic lives — used by both the
    * one-pass aggregate's finish and [[covFromState]], so a stored-state
    * read can never diverge from the direct computation:
    * cov(i,j) = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/n, upper triangle row-major.
    */
  private def covCells(n: Long, sums: IndexedSeq[Double],
      prods: IndexedSeq[Double]): Seq[(Int, Int, Double)] = {
    if (n == 0L) Seq.empty
    else {
      val d   = sums.length
      val out = Seq.newBuilder[(Int, Int, Double)]
      var i = 0
      var p = 0
      while (i < d) {
        var j = i
        while (j < d) {
          out += ((i, j, (prods(p) - sums(i) * sums(j) / n) / n))
          j += 1; p += 1
        }
        i += 1
      }
      out.result()
    }
  }

  /** One-pass covariance matrix over an embedding column: each task
    * accumulates (n, Σxᵢ, Σxᵢxⱼ) — d + d(d+1)/2 doubles, ~17 kB at d = 64 —
    * and a single merged row yields cov(i,j) = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/n
    * (population covariance). The naive alternative (posexplode twice →
    * groupBy (i,j)) shuffles d²× the corpus; this shuffles tasks × one
    * buffer. Emitted as (i, j, cov) structs for the upper triangle, ready
    * to `explode` into rows; values are exact (un-rounded) — round at the
    * query layer for cross-engine comparison.
    *
    * The d×d result is small by construction, so downstream PCA (eigen
    * decomposition) is legitimate driver-side work — see [[powerIteration]].
    */
  class CovarianceMatrix extends Aggregator[Seq[Float], CovBuf, Seq[(Int, Int, Double)]] {
    override def zero: CovBuf = CovBuf(0L, Array.empty, Array.empty)
    override def reduce(b: CovBuf, v: Seq[Float]): CovBuf = {
      // empty arrays are the other common 'missing vector' encoding — both
      // are skipped, never allowed to seed a zero-dimension buffer
      if (v == null || v.isEmpty) return b
      val d = v.length
      val acc = if (b.n == 0L) CovBuf(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2)) else b
      require(acc.sums.length == d, s"dimension mismatch: ${acc.sums.length} vs $d")
      var i = 0
      var p = 0
      while (i < d) {
        val xi = v(i).toDouble
        acc.sums(i) += xi
        var j = i
        while (j < d) { acc.prods(p) += xi * v(j).toDouble; j += 1; p += 1 }
        i += 1
      }
      CovBuf(acc.n + 1, acc.sums, acc.prods)
    }
    override def merge(x: CovBuf, y: CovBuf): CovBuf = {
      if (x.n == 0L) y
      else if (y.n == 0L) x
      else {
        require(x.sums.length == y.sums.length, "dimension mismatch in merge")
        var i = 0
        while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
        var p = 0
        while (p < x.prods.length) { x.prods(p) += y.prods(p); p += 1 }
        CovBuf(x.n + y.n, x.sums, x.prods)
      }
    }
    override def finish(b: CovBuf): Seq[(Int, Int, Double)] =
      covCells(b.n, b.sums, b.prods)
    override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
    override def outputEncoder: Encoder[Seq[(Int, Int, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Int, Int, Double)]]()
  }

  /** Covariance as a ready-to-explode column aggregate. */
  def covarianceMatrix(c: Column): Column = udaf(new CovarianceMatrix).apply(c)

  // ---- incremental covariance state ----------------------------------------

  /** The raw moment buffer as DATA — the covariance counterpart of
    * [[Summaries.aggState]] / the HLL distinct state: (n, Σxᵢ, Σxᵢxⱼ) is
    * algebraic, so yesterday's corpus state plus today's delta state merge
    * by pure addition and the maintained covariance never re-reads
    * history. `finish` here returns the buffer instead of finishing it;
    * [[covFromState]] derives cov(i,j) at READ time, keeping the stored
    * state mergeable forever.
    */
  class CovarianceState extends Aggregator[Seq[Float], CovBuf, CovStateRow] {
    private val inner = new CovarianceMatrix
    override def zero: CovBuf = inner.zero
    override def reduce(b: CovBuf, v: Seq[Float]): CovBuf = inner.reduce(b, v)
    override def merge(x: CovBuf, y: CovBuf): CovBuf = inner.merge(x, y)
    override def finish(b: CovBuf): CovStateRow =
      CovStateRow(b.n, b.sums.toSeq, b.prods.toSeq)
    override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
    override def outputEncoder: Encoder[CovStateRow] = Encoders.product[CovStateRow]
  }
  case class CovStateRow(n: Long, sums: Seq[Double], prods: Seq[Double])

  /** One-row covariance state over an embedding column. */
  def covState(df: DataFrame, vecCol: String): DataFrame =
    df.agg(udaf(new CovarianceState).apply(col(vecCol)).as("s"))
      .select(col("s.n").as("n"), col("s.sums").as("sums"), col("s.prods").as("prods"))

  /** Merge covariance states (any number of one-row state frames unioned):
    * counts add, both moment vectors add element-wise. The element-wise
    * sum runs through posexplode → sum → ordered rebuild — states are a
    * few kB, so this is metadata-scale work regardless of how much corpus
    * each state summarizes.
    */
  def mergeCovStates(states: DataFrame): DataFrame = {
    // dimension guard: index-wise addition of mismatched dims would emit a
    // plausible-looking hybrid (first dims added, the tail passed through)
    // with no error — the embedding-model-upgrade trap. State frames are
    // tiny; the check is metadata-scale.
    val dims = states.filter(col("n") > 0)
      .select(size(col("sums")).as("d")).distinct().collect().map(_.getInt(0))
    require(dims.length <= 1,
      s"mergeCovStates: mixed embedding dimensions ${dims.mkString(", ")}")
    def addArrays(c: String) = states
      .select(posexplode(col(c)).as(Seq("i", "v")))
      .groupBy(col("i")).agg(sum(col("v")).as("v"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("v")))),
        e => e.getField("v")).as(c))
    states.agg(sum(col("n")).as("n"))
      .crossJoin(addArrays("sums"))
      .crossJoin(addArrays("prods"))
  }

  /** (i, j, cov) rows derived from a state frame — same arithmetic as
    * [[CovarianceMatrix.finish]]: cov = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/n.
    */
  def covFromState(state: DataFrame): Seq[(Int, Int, Double)] = {
    val rows = state.select(col("n"), col("sums"), col("prods")).collect()
    require(rows.length == 1, s"expected one state row, got ${rows.length}")
    val r = rows.head
    covCells(r.getLong(0), r.getSeq[Double](1).toIndexedSeq, r.getSeq[Double](2).toIndexedSeq)
  }

  /** Top principal component of a covariance matrix by power iteration —
    * DRIVER-side on the d×d result of [[covarianceMatrix]] (the matrix is
    * tiny; the corpus-scale work already happened in the one-pass
    * aggregate). Deterministic start vector (1/√d, …); returns a unit
    * vector with a sign convention (first nonzero component positive) so
    * results are comparable across runs.
    */
  def powerIteration(cov: Seq[(Int, Int, Double)], d: Int, steps: Int = 100): Array[Double] = {
    val m = Array.ofDim[Double](d, d)
    cov.foreach { case (i, j, v) => m(i)(j) = v; m(j)(i) = v }
    powerIterationDense(m, d, steps)
  }

  /** Project an embedding column onto a fixed basis (e.g. top principal
    * components): per row, an array of dot products against broadcast
    * basis vectors — pure expression work in the scan stage, no shuffle.
    */
  def project(v: Column, basis: Seq[Seq[Double]]): Column =
    array(basis.map(b => Similarity.dot(v, typedLit(b))): _*)

  /** Top-k principal components by power iteration with deflation: after
    * each component, its rank-one term λ·vvᵀ is subtracted and the next
    * iteration runs on the residual. Driver-side like [[powerIteration]]
    * (the input is the TINY d×d output of [[covarianceMatrix]]); the
    * corpus-scale application is [[project]]ing rows onto the result —
    * the standard embedding-compression step before ANN indexing.
    *
    * @return (component, eigenvalue) pairs, λ descending; components unit,
    *         first-nonzero-positive sign convention.
    */
  def principalComponents(cov: Seq[(Int, Int, Double)], d: Int, k: Int,
      steps: Int = 100): Seq[(Array[Double], Double)] = {
    require(k >= 1 && k <= d, "k must be in [1, d]")
    val m = Array.ofDim[Double](d, d)
    cov.foreach { case (i, j, v) => m(i)(j) = v; m(j)(i) = v }
    (1 to k).map { _ =>
      val v = powerIterationDense(m, d, steps)
      // Rayleigh quotient: v is unit, so lambda = v' M v
      var lambda = 0.0
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += m(i)(j) * v(j); j += 1 }
        lambda += v(i) * acc
        i += 1
      }
      i = 0
      while (i < d) {
        var j = 0
        while (j < d) { m(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      (v, lambda)
    }
  }

  /** PCA whitening: project onto the top components AND rescale each
    * coordinate to unit variance (÷√λ) — decorrelated, equalized features,
    * the standard preprocessing before cosine/L2 retrieval when raw
    * dimensions have wildly different spreads. Pure scan-stage expression
    * like [[project]].
    */
  def whiten(v: Column, pcs: Seq[(Array[Double], Double)]): Column = {
    require(pcs.forall(_._2 > 0), "whitening needs strictly positive eigenvalues")
    array(pcs.map { case (b, lambda) =>
      Similarity.dot(v, typedLit(b.toSeq)) / math.sqrt(lambda)
    }: _*)
  }

  private def powerIterationDense(m: Array[Array[Double]], d: Int, steps: Int): Array[Double] = {
    // deterministic but NON-uniform start: the uniform vector is exactly
    // stationary on any eigenvector it happens to be orthogonal to (e.g.
    // two perfectly anti-correlated features), and symmetric arithmetic
    // never breaks the tie — sin(i+1) components have no such alignment
    val raw  = Array.tabulate(d)(i => math.sin(i + 1.0))
    val rnrm = math.sqrt(raw.map(x => x * x).sum)
    var v    = raw.map(_ / rnrm)
    var s = 0
    while (s < steps) {
      val w = Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += m(i)(j) * v(j); j += 1 }
        acc
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      if (nrm == 0.0) s = steps // residual is zero: keep the current vector
      else { v = w.map(_ / nrm); s += 1 }
    }
    val lead = v.find(math.abs(_) > 1e-12).getOrElse(0.0)
    if (lead < 0) v.map(-_) else v
  }
}
