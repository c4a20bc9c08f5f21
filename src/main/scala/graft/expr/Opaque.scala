package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Optimizer fence: a zero-cost identity whose only job is reporting
  * `deterministic = false`, which pins the enclosing predicate/projection
  * where the plan author wrote it (PushDownPredicates moves deterministic
  * expressions only).
  *
  * Why it exists: a null-filter over an EXPENSIVE derived column — e.g.
  * `filter(decode(payload).isNotNull)` above a
  * [[graft.Tables.spread]]-style fan-out exchange — is deterministic, so
  * the optimizer pushes it through the exchange into the source scan,
  * substituting the alias with its defining expression. On an
  * unsplittable single-row-group scan that relocates the WHOLE decode
  * into one task (measured: q208's synthesis + PNG decode ran entirely in
  * the 1-task scan stage, ~2 s of a 2.8 s query, with 31 idle cores).
  * Fencing the predicate keeps the scan cheap and the decode above the
  * exchange, where it runs wide.
  *
  * Runtime cost: none — eval and codegen delegate to the child verbatim.
  * Canonicalization is structural, so identical fenced subplans still
  * unify under ReusedExchange. Use ONLY on predicates/projections whose
  * placement is load-bearing; a fenced expression is invisible to
  * constant folding and pushdown by design.
  */
case class Opaque(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
