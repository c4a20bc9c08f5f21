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

  import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

  /** True when `dt` contains a MapType anywhere — such columns cannot feed
    * `xxhash64` (Spark rejects hashing maps: element order is undefined).
    */
  private[graft] def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType      => true
    case a: ArrayType    => containsMap(a.elementType)
    case s: StructType   => s.fields.exists(f => containsMap(f.dataType))
    case _               => false
  }

  /** Skew-safe equi-join: salt the skewed (left) side's key into `salts`
    * sub-keys and replicate the right side once per salt, so one hot key
    * spreads over `salts` reducers instead of melting a single task.
    *
    * The salt is a FULL-ROW content hash mod `salts`: the JOIN RESULT
    * never depends on WHICH salt a left row gets (the right side carries
    * every salt), so the salt only has to spread rows — and it must be
    * DETERMINISTIC under recomputation. A positional id
    * (`monotonically_increasing_id`) is not: on a stage retry / fetch
    * failure, recomputed map tasks can assign different salts than the
    * original attempt, so some reducers see a row twice and others never
    * (the SPARK-23207 class of correctness bug). Hashing every column of
    * the row re-derives the same salt on any attempt. Trade-off: rows that
    * are byte-identical ACROSS ALL COLUMNS share a salt, so a hot key whose
    * duplicates are exact copies still lands on one reducer — if that is
    * the skew shape, pre-aggregate the duplicates to (row, count) first;
    * for the common shape (hot key, varying payload) the spread is uniform.
    * AQE's skew-join handles moderate skew on its own; explicit salting is
    * the tool for the pathological case (one key = 30% of 100 TB) where
    * even a split partition overwhelms memory. Result is identical to the
    * plain join (property-tested).
    *
    * Only left-preserving join types are supported: the right side is
    * replicated once per salt, so a `right_outer`/`full_outer` would emit
    * every UNMATCHED right row `salts` times — diverging from the plain
    * join. (Matched right rows are fine in any type: a right row matches at
    * most one salt value per left row.)
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be positive")
    require(
      Set("inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti", "cross")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports left-preserving join types only, got $joinType")
    // hash every column whose type supports hashing (xxhash64 rejects maps);
    // the join key itself is always hashable (maps cannot be equi-join keys),
    // so the set is never empty
    val hashable = left.schema.fields
      .filterNot(f => graft.ops.Relational.containsMap(f.dataType)).map(f => col(f.name))
    val l = left.withColumn("__salt",
      pmod(xxhash64(hashable.toIndexedSeq: _*), lit(salts.toLong)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    // qualified refs: leftKey and rightKey may share a name
    l.join(r, l("__salt") === r("__salt") && l(leftKey) === r(rightKey), joinType)
      .drop("__salt")
  }

  /** Banded interval join: pairs with the same key whose timestamps lie
    * within `toleranceSec` of each other.
    *
    * NOT the naive `|l.ts - r.ts| <= tol` theta join (which degenerates to a
    * per-key cross product): both sides are bucketed by
    * `floor(epoch / tolerance)` and the right side is exploded into its
    * bucket ±1 — any qualifying pair is then guaranteed to collide on
    * (key, bucket), so the join is a plain equi-join with a cheap residual
    * filter. Cost: 3× the right side's (key, bucket, payload) rows through
    * one hash shuffle; candidates per pair are bounded by band occupancy,
    * never by the key's row count.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      toleranceSec: Long): DataFrame = {
    require(toleranceSec > 0, "tolerance must be positive")
    // microsecond precision end to end: second-truncated epochs would admit
    // sub-second pairs up to ~1 s beyond the tolerance
    val tolUs = toleranceSec * 1000000L
    val l = left.withColumn("__band", floor(unix_micros(col(leftTs)) / tolUs))
    val r = right
      .withColumn("__b0", floor(unix_micros(col(rightTs)) / tolUs))
      .withColumn("__band", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      l("__band") === r("__band") &&
      abs(unix_micros(l(leftTs)) - unix_micros(r(rightTs))) <= tolUs
    val joined = l.join(r, cond).drop(l("__band")).drop(r("__band"))
    keys.foldLeft(joined)((df, k) => df.drop(r(k))) // keep the left copy of each key
  }

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
    *
    * The right columns are carried as ONE struct through a single
    * `last(_, ignoreNulls = true)` — carrying each column independently would
    * stitch values from different right rows whenever a right row holds NULLs
    * in some of `rightCols`, producing a row that never existed; whole-row
    * attachment matches pandas `merge_asof` / DuckDB `ASOF JOIN`.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols    = left.columns.toSeq
    val leftPayload = leftCols.filterNot(keys.contains)
    val rStructType = StructType(rightCols.map(c => right.schema(c)))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftPayload.map(c => col(c).as(s"__l_$c")) ++
        Seq(lit(null).cast(rStructType).as("__r")) ++
        tieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(s"__tb_$c")): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        Seq(struct(rightCols.map(col): _*).as("__r")) ++
        tieBreak.map(c => col(c).as(s"__tb_$c")): _*)
    val order: Seq[Column] =
      Seq(col("__ts").asc, col("__side").asc) ++ tieBreak.map(c => col(s"__tb_$c").asc)
    val w = Window
      .partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(order.toIndexedSeq: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__rc", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++
          leftPayload.map(c => col(s"__l_$c").as(c)) ++
          rightCols.map(c => col(s"__rc.$c").as(s"asof_$c")): _*)
  }

  /** Snapshot diff (CDC validation): classify each key as `added` /
    * `removed` / `changed` / `unchanged` between two table versions, with
    * the list of differing columns for `changed` rows.
    *
    * One full-outer hash join on `keys` — the natural shuffle for the
    * operation and the only one: content comparison is a per-row null-safe
    * equality over `compareCols`, no window, no second pass. At 100 TB the
    * join is the cost floor of any diff; everything else is narrow. For
    * repeated diffs of the same table pair, bucket both snapshots on
    * `keys` ([[Storage.writeBucketed]]) and the exchange disappears.
    *
    * NULL keys: the join is null-safe (`<=>`), so a NULL-keyed row in both
    * snapshots compares as the same entity rather than producing a spurious
    * added+removed pair (standard SQL `=` would never match NULL).
    *
    * PRECONDITION: `keys` must identify rows uniquely in EACH snapshot —
    * duplicate keys make the full-outer join fan out and the report emits
    * one (possibly contradictory) classification per matched pair. Dedup
    * first ([[Dedup.keepLatest]]) or certify with
    * [[Constraints.Unique]] when uniqueness is not structural.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs key columns")
    val o = oldDf.select((keys ++ compareCols).map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select((keys ++ compareCols).map(c => col(c).as(s"__n_$c")): _*)
    val cond = keys.map(k => o(s"__o_$k") <=> n(s"__n_$k")).reduce(_ && _)
    // presence flags must not depend on key nullability — tag each side
    val ot = o.withColumn("__in_old", lit(true))
    val nt = n.withColumn("__in_new", lit(true))
    val j = ot.join(nt, cond, "full_outer")
    val diffs = compareCols.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c)).otherwise(lit(null)))
    val changedCols = concat_ws(",", diffs: _*)
    val changeType = when(col("__in_old").isNull, lit("added"))
      .when(col("__in_new").isNull, lit("removed"))
      .when(changedCols =!= "", lit("changed"))
      .otherwise(lit("unchanged"))
    j.select(
      keys.map(k => coalesce(col(s"__n_$k"), col(s"__o_$k")).as(k)) ++
        Seq(changeType.as("change_type"),
          when(changeType === "changed", changedCols).otherwise(lit("")).as("changed_cols")): _*)
  }

  /** Interval-overlap join: pairs `(a, b)` whose `[aStart, aEnd]` and
    * `[bStart, bEnd]` ranges overlap — sessions × campaign windows,
    * shipments × promotions.
    *
    * NOT the `aStart <= bEnd AND bStart <= aEnd` theta join (a cartesian
    * at scale): both sides explode to the fixed-width grid cells their
    * interval covers and the join is a plain equi-join on the cell. The
    * classic duplicate problem (a pair overlapping k shared cells appears
    * k times) is solved at the JOIN CONDITION, not with a distinct: a pair
    * is emitted only in the FIRST cell both intervals cover,
    * `cell == greatest(floor(aStart/g), floor(bStart/g))` — exactly-once by
    * construction, so there is no dedup shuffle afterwards. Cost: each side
    * is amplified by its interval length in cells (choose `gridSec` near
    * the typical interval length: amplification ~2×), one hash exchange
    * per side, candidates bounded by cell occupancy.
    */
  def overlapJoin(
      a: DataFrame,
      b: DataFrame,
      aStart: String, aEnd: String,
      bStart: String, bEnd: String,
      gridSec: Long): DataFrame = {
    require(gridSec > 0, "gridSec must be positive")
    val g = gridSec
    // degenerate end<start intervals would make sequence() count DOWN and
    // claim cells the interval never covers — drop them (and NULL bounds,
    // which explode() drops for free)
    val ac = a.filter(col(aEnd) >= col(aStart))
      .withColumn("__c0", floor(unix_timestamp(col(aStart)) / g))
      .withColumn("__cell", explode(sequence(col("__c0"), floor(unix_timestamp(col(aEnd)) / g))))
      .drop("__c0")
    val bc = b.filter(col(bEnd) >= col(bStart))
      .withColumn("__c0", floor(unix_timestamp(col(bStart)) / g))
      .withColumn("__cell", explode(sequence(col("__c0"), floor(unix_timestamp(col(bEnd)) / g))))
      .drop("__c0")
    val cond = ac("__cell") === bc("__cell") &&
      ac("__cell") === greatest(
        floor(unix_timestamp(ac(aStart)) / g), floor(unix_timestamp(bc(bStart)) / g)) &&
      unix_timestamp(ac(aStart)) <= unix_timestamp(bc(bEnd)) &&
      unix_timestamp(bc(bStart)) <= unix_timestamp(ac(aEnd))
    ac.join(bc, cond).drop(ac("__cell")).drop(bc("__cell"))
  }

  /** SCD-type-2 history derivation: each key's version rows become validity
    * intervals — `valid_from` = the version's own timestamp, `valid_to` =
    * the NEXT version's (half-open `[from, to)`), NULL-open with
    * `is_current` on the latest. The standard warehouse shape for
    * "what was true as of T" queries (join on `t >= valid_from AND
    * (valid_to IS NULL OR t < valid_to)`).
    *
    * One window per key ordered by (version, tieBreak): parallel across
    * keys, no global sort. `tieBreak` must make the order total (pass the
    * row's unique id); without it, equal-version rows would chain
    * nondeterministically.
    */
  def scd2(df: DataFrame, keys: Seq[String], versionCol: String,
      tieBreak: Seq[String]): DataFrame = {
    require(keys.nonEmpty && tieBreak.nonEmpty, "need keys and a totalizing tieBreak")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((versionCol +: tieBreak).map(col(_).asc): _*)
    df.withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
