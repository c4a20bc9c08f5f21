package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints ("expectations"): assert properties
  * of a table and get back one violation count per rule — the validation
  * gate a pipeline runs before publishing a snapshot.
  *
  * Reference analogue: the failure-keyword mask of `app.py:263-270` is a
  * single hard-coded quality rule; this generalizes to a rule VOCABULARY.
  *
  * Scale shape by rule class:
  *   - row rules (not-null / range / regex) all evaluate in ONE aggregate
  *     pass over the table — no shuffle beyond the one-row partial merge,
  *     however many rules are declared;
  *   - uniqueness is one hash aggregate on the key (the minimum possible —
  *     you cannot certify uniqueness without co-locating the key);
  *   - referential integrity is one left-anti join against the referenced
  *     key set (broadcast when the dimension is small, which is the
  *     standard FK shape).
  * The per-class results are unioned into one tiny (rule, violations)
  * report — every branch's output is O(1) rows.
  *
  * NULL semantics (documented, SQL-standard): a NULL value is not a RANGE or
  * REGEX violation (declare NotNull separately — this keeps each rule
  * orthogonal); NULL foreign keys are not orphans; NULL unique-key parts
  * group together like GROUP BY.
  */
object Constraints {

  sealed trait Rule { def name: String }
  /** `c` must be non-null. */
  final case class NotNull(name: String, c: String) extends Rule
  /** `c` must lie in [lo, hi] (when non-null). */
  final case class InRange(name: String, c: String, lo: Double, hi: Double) extends Rule
  /** `c` must match `regex` (when non-null). Keep the pattern ASCII-simple:
    * it must mean the same thing to every engine that replays the check. */
  final case class Matches(name: String, c: String, regex: String) extends Rule
  /** `cols` must identify rows uniquely; violations = rows beyond the first
    * in each duplicated key group. */
  final case class Unique(name: String, cols: Seq[String]) extends Rule
  /** Every non-null `c` must exist in `ref.refCol`. */
  final case class RefIntegrity(name: String, c: String, ref: DataFrame, refCol: String)
      extends Rule

  /** Violation report: one row per rule, `(rule, violations)`, ordered by
    * rule name for a deterministic report.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules declared")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")
    require(rules.forall(!_.name.contains("`")), "rule names must not contain backticks")
    val rowConds: Seq[(String, Column)] = rules.collect {
      case NotNull(n, c)        => n -> col(c).isNull
      case InRange(n, c, lo, hi) => n -> !(col(c) >= lo && col(c) <= hi)
      case Matches(n, c, r)     => n -> !col(c).rlike(r)
    }
    val parts = Seq.newBuilder[DataFrame]
    if (rowConds.nonEmpty) {
      val aggs = rowConds.map { case (n, cond) => count(when(cond, 1)).as(n) }
      parts += df.agg(aggs.head, aggs.tail: _*)
        // backtick-quote: a rule name containing '.' must stay a single
        // column reference, not parse as a nested-field access
        .unpivot(Array.empty[Column], rowConds.map(p => col(s"`${p._1}`")).toArray,
          "rule", "violations")
    }
    rules.foreach {
      case Unique(n, cols) =>
        parts += df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
          .select(lit(n).as("rule"), col("violations"))
      case RefIntegrity(n, c, ref, refCol) =>
        parts += df.filter(col(c).isNotNull)
          .join(ref.select(col(refCol).as("__ref")), col(c) === col("__ref"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(n).as("rule"), col("violations"))
      case _ => () // row rules handled in the single-pass aggregate above
    }
    parts.result().reduce(_ unionByName _).orderBy(col("rule"))
  }
}
