package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join / set-op surface (SURVEY §2.4–2.5). Most rows are direct Spark —
  * Catalyst picks broadcast vs sort-merge vs shuffled-hash from stats and AQE
  * re-plans at runtime; the value added here is the as-of join, which Spark
  * lacks as a primitive.
  */
object Relational {

  /** J6 — as-of join: for each left row, attach the columns of the latest
    * right row with the same key and `rightTs <= leftTs`.
    *
    * Implementation is the union-and-carry-forward form, NOT a range join:
    * tag both sides, union them, and within each key carry the most recent
    * right-side values forward with `last(_, ignoreNulls = true)` over an
    * ordered window. Cost is ONE hash exchange on the key + an in-partition
    * sort — no candidate-pair blowup, no broadcast of either side — so it
    * holds at 100 TB where a `t1.key = t2.key AND t2.ts <= t1.ts` join would
    * degenerate (per-key cross product before the max).
    *
    * Ties (`rightTs == leftTs`): the right row sorts first, so it IS matched
    * (<= semantics). Multiple right rows at one timestamp: the one latest in
    * `tieBreak` order wins — deterministic.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((keys ++ Seq("__ts", "__side")).map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) ++
        tieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(s"__tb_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((keys ++ Seq("__ts", "__side")).map(col) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        rightCols.map(c => col(c).as(s"__r_$c")) ++
        tieBreak.map(c => col(c).as(s"__tb_$c")): _*)
    val order: Seq[Column] =
      Seq(col("__ts").asc, col("__side").asc) ++ tieBreak.map(c => col(s"__tb_$c").asc)
    val w = Window
      .partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(order.toIndexedSeq: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r).select(
      (keys.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c")) ++
        rightCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"__r_$c")): _*)
    carried
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++
          leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
          rightCols.map(c => col(s"__r_$c").as(s"asof_$c")): _*)
  }
}
