package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY §2.7–2.8). All stock Spark hash aggregates —
  * partial (map-side) + final pairs come free, which is the 100 TB answer:
  * the shuffle carries one partial row per (task, group), not the raw data.
  */
object Summaries {

  /** A1 — category frequency table (reference `app.py:245-261`,
    * `groupby(c, dropna=False).size()`): NULL is its own group, which is
    * Spark GROUP BY semantics already. Sorted by count desc then key for a
    * deterministic total order (oracle requirement, SURVEY §5.2).
    */
  def groupCount(df: DataFrame, key: String, cntName: String = "qtd"): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as(cntName))
      .orderBy(col(cntName).desc, col(key).asc_nulls_first)

  /** A8 — arbitrary GROUPING SETS as a library operator (not just raw SQL):
    * the reference's two PARALLEL summaries over status and OS
    * (`app.py:245-261`) are exactly `GROUPING SETS ((status),(os))` — one
    * pass over the data and one shuffle instead of two separate group-bys
    * scanning the input twice. `grouping_id()` disambiguates which set each
    * output row belongs to.
    */
  def groupingSetsCount(df: DataFrame, sets: Seq[Seq[String]], cntName: String = "qtd"): DataFrame = {
    val keys = sets.flatten.distinct.map(col)
    df.groupingSets(sets.map(_.map(col)), keys: _*)
      .agg(count(lit(1)).as(cntName), grouping_id().as("gid"))
  }

  /** A5/F15 — fixed-width histogram: bin = floor(x / w) * w. */
  def histogram(df: DataFrame, c: String, width: Double): DataFrame =
    df.groupBy((floor(col(c) / width) * width).as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("bin"))

  /** A6/F14 — per-period time series aggregate. */
  def timeSeries(df: DataFrame, ts: String, unit: String, aggs: Seq[Column]): DataFrame =
    df.groupBy(date_trunc(unit, col(ts)).as("period"))
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
      .orderBy(col("period"))

  /** Exact decimal sum of a double column, surfaced as double — the
    * determinism device used throughout the oracle-checked queries: decimal
    * accumulation is exact, hence independent of partial-aggregation order,
    * where a double sum is not (SURVEY §7.5 float pitfall).
    */
  def exactSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(27,$scale)")).cast("double")

  /** Order-insensitive mean built from the exact sum. */
  def exactAvg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(s"decimal(27,$scale)")).cast("double") / count(c))

  /** Deterministic 4-decimal rounding: `floor(x·10⁴ + 0.5)/10⁴`, written the
    * same way in oracle SQL. NOT `round(_, 4)` — Spark rounds half-up while
    * DuckDB rounds half-even, and ratios of small integers (k/32, k/64)
    * land exactly on the .00005 boundary where the two disagree.
    */
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000

  /** Quantile binning (feature discretization): rows are labeled with the
    * index of the quantile bucket their value falls in. The `nBins − 1`
    * exact-percentile cut points are computed IN-PLAN (one aggregate row)
    * and broadcast back onto the corpus — no driver action, one wide scan
    * + one narrow pass, the same shape at any scale. Swap
    * `approx_percentile` in at 100 TB when exact interpolation isn't
    * required; the plan is unchanged.
    */
  def quantileBin(df: DataFrame, valCol: String, nBins: Int,
      binName: String = "bin"): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val ps   = (1 until nBins).map(_.toDouble / nBins)
    val cuts = df.agg(
      expr(s"percentile($valCol, array(${ps.mkString(",")}))").as("__cuts"))
    df.crossJoin(broadcast(cuts))
      .withColumn(binName,
        // NULL value → NULL bin (the HOF filter would silently yield bin 0)
        when(col(valCol).isNull, lit(null))
          .otherwise(size(filter(col("__cuts"), c => c <= col(valCol))))
          .cast("int"))
      .drop("__cuts")
  }

  /** One-pass column profiler: total rows, non-null count, exact distinct
    * count, min/max per named column — one output row per column. Everything
    * folds into a SINGLE aggregate over one scan (Catalyst plans the
    * multi-distinct via Expand), instead of the naive one-scan-per-column
    * loop that costs `cols.size` passes over a 100 TB table. min/max
    * aggregate in native type and cast to string only at the end, so numeric
    * columns order numerically, not lexically.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
          countDistinct(col(c)).as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__mn_$c"),
          max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_val"), col(s"__mx_$c").as("max_val"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
