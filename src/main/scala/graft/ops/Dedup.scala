package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication — the reference's signature operator family (SURVEY §2.6).
  *
  * D1 keep-most-recent (reference `app.py:233-242`: sort desc by recency then
  * `drop_duplicates(keep="first")`) is deliberately NOT `dropDuplicates`:
  * Spark's `dropDuplicates` keeps an arbitrary plan-dependent row. The
  * distributed-deterministic form is a window `row_number() == 1` with a
  * total ordering (recency desc, then an explicit tie-break) — one hash
  * exchange on the keys followed by an in-partition sort, same asymptotics as
  * the reference's sort-once-scan-once but partitioned, so it scales to any
  * number of executors with no driver involvement.
  */
object Dedup {

  /** D1 — per key keep the single most-recent row.
    *
    * @param keys      dedup key columns (reference default
    *                  `("endpoint_name","endpoint_alias")`, `app.py:221`)
    * @param recency   recency columns, most significant first
    *                  (`app.py:237-239` sorts descending on these)
    * @param tieBreak  deterministic tie-break ordering appended after the
    *                  recency keys — pandas resolves ties by encounter order,
    *                  which has no distributed equivalent (SURVEY §7.5)
    */
  def keepLatest(
      df: DataFrame,
      keys: Seq[String],
      recency: Seq[String],
      tieBreak: Seq[Column]): DataFrame = {
    val order = recency.map(col(_).desc) ++ tieBreak.map(_.asc)
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(order.toIndexedSeq: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** O4 — top-k per group: the k most-recent (or highest-ranked) rows per
    * key; D1 is the k=1 special case.
    */
  def topKPerGroup(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(order.toIndexedSeq: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** D2 — all-columns distinct (reference fallback `app.py:242`). */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** Exact content dedup for document-scale data, two-phase: (1) project to
    * (digest, id) — 32 B + 8 B per row — and `groupBy(digest).agg(min(id))` to
    * pick one winner per distinct content; (2) left-semi join the winners back
    * on the id. The first shuffle carries only digest+id pairs, never the
    * document bodies (the r1 window-on-digest form shuffled full rows); the
    * semi-join hashes rows by id, and AQE turns it into a broadcast when the
    * winner set is small. sha-256, not md5: md5 is collision-broken, and a
    * crafted colliding pair of documents must not silently merge.
    */
  def dedupByDigest(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val winners = df
      .select(sha2(col(contentCol).cast("binary"), 256).as("__digest"), col(idCol).as("__keep"))
      .groupBy(col("__digest"))
      .agg(min(col("__keep")).as("__keep"))
      .select(col("__keep"))
    df.join(winners, col(idCol) === col("__keep"), "left_semi")
  }
}
