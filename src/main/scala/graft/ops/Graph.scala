package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-propagation operators beyond the dedup component machinery
  * ([[Dedup.connectedComponents]]): iterative rank/mass computations
  * expressed as joins + aggregates per round, checkpointed between rounds —
  * the Pregel shape on plain DataFrames.
  */
object Graph {

  /** PageRank with INTEGER micro-mass — deterministic, engine-replayable
    * link analysis for influence/importance scoring (seed-domain weighting,
    * crawl prioritization). Every node starts with 1 000 000 micro-units;
    * each round it keeps `100 − dampingPct` % of the base unit and
    * receives `(m · dampingPct) DIV (100 · out_degree)` from each in-edge.
    * All arithmetic is 64-bit integer division — bit-identical on any
    * engine and any partitioning (a float PageRank's Σ over in-edges is
    * partial-aggregation-order-dependent; this one is exact), which is what
    * lets a SQL oracle replay it term for term.
    *
    * Semantics notes: `edges` must be DISTINCT (src, dst) pairs — dedupe
    * first (multi-edges would double-send mass); integer floor division
    * loses the remainder micro-units and dangling nodes (no out-edges)
    * absorb mass without re-emitting it, so total mass DECAYS rather than
    * being redistributed — fine for ranking (order is what matters), not a
    * probability distribution. Fixed iteration count, no convergence test:
    * rank stabilizes geometrically and a fixed unroll keeps the oracle
    * finite.
    *
    * Scale shape per round: ONE join of the pinned edge table against
    * current ranks on the source key and ONE aggregate on the destination
    * key — the per-node base term rides the aggregate as a unioned
    * constant row per node (ranks' node set is invariant across rounds),
    * so there is no third join back to a node table. The edge table is
    * shuffled ONCE at pin time (the out-degree window hash-partitions it
    * by src, and checkpoint preserves that partitioning); every round
    * reshuffles only the node-sized rank rows. Rounds 1..n−1 are
    * checkpointed ([[Checkpoints]]) so lineage stays O(1); the FINAL round
    * stays lazy — it is consumed exactly once by the caller's action, and
    * an eager checkpoint would materialize it twice.
    *
    * @param checkpointDir reliable-checkpoint directory for cluster-scale
    *        runs (survives executor loss); None = localCheckpoint.
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampingPct: Int = 85,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1 && iterations <= 20, "iterations in [1, 20]")
    require(dampingPct > 0 && dampingPct < 100, "dampingPct in (0, 100)")
    val pin = Checkpoints.pinner(edges.sparkSession, checkpointDir)
    // out-degree is folded INTO the pinned edge table via a window over the
    // source key — ONE pass over the input (an agg+self-join would compute
    // the edge expression twice), one shuffle, then each round needs only
    // the ranks join
    val e = pin(edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .withColumn("d", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src")))))
    val base = 1000000L * (100 - dampingPct) / 100
    // round-0 ranks IS the node set at uniform mass — one pinned artifact
    // (it feeds two consumers per round: the contribution join and the
    // base-term union), not separate nodes + ranks copies
    var ranks = pin(e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v")))
      .distinct()
      .select(col("v"), lit(1000000L).as("m")))
    var last: DataFrame = ranks
    var iter = 0
    while (iter < iterations) {
      val contrib = e.join(ranks, col("src") === col("v"))
        .select(col("dst").as("v"),
          expr(s"(m * $dampingPct) DIV (100 * d)").as("c"))
      val next = contrib.union(ranks.select(col("v"), lit(base).as("c")))
        .groupBy(col("v")).agg(sum(col("c")).as("m"))
      iter += 1
      if (iter < iterations) {
        val pinned = pin(next)
        Checkpoints.release(ranks) // superseded — don't pin O(rounds) copies
        ranks = pinned
        last = pinned
      } else {
        last = next // final round: lazy, single-consumer
      }
    }
    last.select(col("v"), col("m").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("v"))
  }
}
