package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** d-DIMENSIONAL Hilbert index of a bin tuple — the Iceberg/Delta HILBERT
  * layout generalized past the 2-D quadrant-rotation Column form
  * ([[graft.ops.Storage.hilbertValue]], which stays as the oracle-replayed
  * 2-D surface): Skilling's transpose algorithm ("Programming the Hilbert
  * curve", AIP Conf. Proc. 707, 2004) — the standard compact d-dim form —
  * run as ONE codegen'd expression instead of an unrolled when/bit-op tree
  * (the 2-D tree grows ~3^bits with the unroll depth, which is what capped
  * it at 8 bits and 2 dims; this loop form is O(dims·bits) per row at any
  * supported size).
  *
  * Input: `array<long>` of `dims` bin values, each in `[0, 2^bits)` —
  * anything outside is a caller error and throws loudly (a silently
  * wrapped bin would scatter the layout). NULL array or any NULL element
  * yields NULL. `dims · bits ≤ 62` keeps the index in a positive long.
  *
  * Orientation note: Skilling's curve is a valid Hilbert walk (bijective,
  * unit-step — StorageSpec proves both properties over full grids) but a
  * different ORIENTATION from the 2-D quadrant-rotation form; layouts are
  * self-consistent per writer, so orientation is a convention, not a
  * compatibility surface.
  */
case class HilbertIndex(child: Expression, dims: Int, bits: Int)
    extends UnaryExpression {
  require(dims >= 2 && bits >= 1 && dims * bits <= 62,
    "need dims >= 2, bits >= 1, dims*bits <= 62")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects array<bigint>, got ${other.simpleString}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hilbertIndex", this)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("hidx")
      s"""
         |Object $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
       """.stripMargin
    })
  }

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    require(arr.numElements() == dims,
      s"hilbert_index: expected $dims bins, got ${arr.numElements()}")
    val n = dims
    val X = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getLong(i)
      require(v >= 0 && v < (1L << bits),
        s"hilbert_index: bin $v outside [0, 2^$bits) at dim $i")
      X(i) = v
      i += 1
    }
    // Skilling AxesToTranspose: inverse-undo, then Gray encode
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((X(i) & q) != 0) X(0) ^= p
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    i = 1
    while (i < n) { X(i) ^= X(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((X(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { X(i) ^= t; i += 1 }
    // interleave the transpose: most-significant index bit is bit (bits-1)
    // of X(0), then the same bit of X(1), …, down the bit levels
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) {
        d = (d << 1) | ((X(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    java.lang.Long.valueOf(d)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
