package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the best `k` (sim desc, id asc) pairs seen so far
  * over DISTINCT ids, kept in ranked order by insertion — O(k) worst-case
  * per offer, O(1) for the common reject (candidate worse than the current
  * k-th).
  *
  * Id-dedup is what lets multi-table LSH feed candidates STRAIGHT into the
  * aggregate: the same (probe, neighbor) pair surfacing from several hash
  * tables (with the same sim, since sim is a function of the pair) would
  * otherwise occupy several of the k slots — the callers previously paid a
  * full candidate-stream `distinct()` exchange to prevent exactly that.
  * If an id re-arrives with a different score, its best entry wins.
  */
final class TopKBuffer(val k: Int) {
  val sims = new Array[Double](k)
  val ids  = new Array[Long](k)
  var n    = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def offer(s: Double, i: Long): Unit = {
    // NaN is unorderable under better() and would wedge the buffer once it
    // reached the last slot; the similarity paths produce NULL (skipped in
    // update), never NaN, for degenerate vectors — drop it defensively
    if (s != s) return
    // common-case O(1) reject BEFORE the O(k) dedup scan: if the candidate
    // is not better than the current k-th, "no change" is correct even when
    // its id is already present (that entry is >= the k-th >= the candidate)
    if (n == k && !better(s, i, sims(n - 1), ids(n - 1))) return
    // in-buffer dedup: drop the worse entry for a repeated id
    var d = 0
    while (d < n) {
      if (ids(d) == i) {
        if (!better(s, i, sims(d), ids(d))) return // existing entry is better
        // remove the existing (worse) entry, then insert the new one below
        var m = d
        while (m < n - 1) { sims(m) = sims(m + 1); ids(m) = ids(m + 1); m += 1 }
        n -= 1
        d = n // exit scan
      } else d += 1
    }
    var pos = math.min(n, k - 1)
    while (pos > 0 && better(s, i, sims(pos - 1), ids(pos - 1))) {
      sims(pos) = sims(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    sims(pos) = s; ids(pos) = i
    if (n < k) n += 1
  }
}

/** Top-k-per-group as a PARTIAL-AGGREGATING bounded heap, replacing the
  * `row_number().over(partitionBy(group).orderBy(sim desc, id asc)) <= k`
  * window in the similarity-ranking paths (kNN, sign-LSH ANN, IVF).
  *
  * The window form shuffles and sorts EVERY candidate row: for IVF at
  * sf0.1 that is a 2.5M-row exchange ranking 6k survivors — and at corpus
  * scale the candidate stream is O(corpus × probed-fraction), which no
  * cluster can globally sort per query batch. This aggregate reduces
  * map-side: each task keeps at most k entries per group, so the exchange
  * carries `partitions × groups × k` entries regardless of candidate
  * volume. Ranking semantics are identical to the window (sim desc, id
  * asc, dense 1..k) over DISTINCT ids — each id ranks once, by its best
  * entry — so the DuckDB oracles are unchanged.
  *
  * Null sims are skipped (the similarity paths never produce one; the
  * window form would rank them last under `desc` ordering — the two agree
  * whenever a group has ≥ k non-null candidates).
  */
case class TopKPairs(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sim", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == DoubleType && id.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top_k expects (double, bigint), got " +
        s"(${ord.dataType.simpleString}, ${id.dataType.simpleString})")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = ord.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) { buf.offer(other.sims(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = new GenericInternalRow(Array[Any](buf.sims(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.sims(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    // entries arrive already ranked; offer() preserves order
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), id = newChildren(1))
}
