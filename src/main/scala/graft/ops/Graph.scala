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
    * Scale shape per round: one join of edges against current ranks on the
    * source key, one aggregate on the destination key, one left join back
    * to the node set — all hash exchanges on node ids; each round's result
    * is checkpointed so lineage stays O(1) and the next round reads
    * materialized ranks (same discipline as
    * [[Dedup.connectedComponents]]).
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 20, "iterations in [1, 20]")
    require(dampingPct > 0 && dampingPct < 100, "dampingPct in (0, 100)")
    // out-degree is folded INTO the pinned edge table via a window over the
    // source key — ONE pass over the input (an agg+self-join would compute
    // the edge expression twice), one shuffle, then each round needs only
    // the ranks join
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .withColumn("d", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("v")).union(e.select(col("dst").as("v")))
      .distinct()
      .localCheckpoint(true)
    val base = 1000000L * (100 - dampingPct) / 100
    // round 0 derives trivially from the pinned node set — no checkpoint job
    var ranks = nodes.select(col("v"), lit(1000000L).as("m"))
    var iter = 0
    while (iter < iterations) {
      val inc = e.join(ranks, col("src") === col("v"))
        .select(col("dst").as("v"),
          expr(s"(m * $dampingPct) DIV (100 * d)").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("inc"))
      val next = nodes.join(inc, Seq("v"), "left")
        .select(col("v"), (lit(base) + coalesce(col("inc"), lit(0L))).as("m"))
        .localCheckpoint(true)
      ranks.unpersist() // superseded checkpoint — don't pin O(rounds) copies
      ranks = next
      iter += 1
    }
    ranks.select(col("v"), col("m").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("v"))
  }
}
