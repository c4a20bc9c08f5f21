package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.CheckpointBridge

/** Round-pinning policy for iterative operators (PageRank, connected
  * components): each round's result must be materialized with lineage
  * truncated — otherwise the plan nests one join+agg deeper per round and
  * round N replays rounds 1..N−1.
  *
  * Two pinning modes, chosen per call site:
  *  - `localCheckpoint` (default): executor block storage — no filesystem
  *    round-trip, but an executor loss makes the checkpoint unrecoverable
  *    and fails the job loudly. Right for benchmarks and short jobs.
  *  - reliable `checkpoint(dir)`: survives executor loss — the right trade
  *    on a 1000-executor cluster where losing one machine mid-iteration-10
  *    of a corpus-scale PageRank must not restart the job. Costs one
  *    filesystem write per round.
  */
object Checkpoints {

  /** The pinning function for `dir`: reliable checkpoints into `dir` when
    * set, localCheckpoint otherwise. The checkpoint directory is a
    * SparkContext-level setting — last caller wins, which is fine because
    * the dir only namespaces files.
    *
    * `eager = false` defers materialization to the consumer's first action
    * (no standalone job barrier — setup artifacts that feed exactly the
    * next job want this); `eager = true` materializes NOW, which is the
    * right mode for any artifact that will later be [[release]]d — release
    * semantics on a never-materialized lazy checkpoint would be undefined.
    */
  def pinner(spark: SparkSession, dir: Option[String], eager: Boolean = true)
      : DataFrame => DataFrame =
    dir match {
      case Some(d) =>
        spark.sparkContext.setCheckpointDir(d)
        df => df.checkpoint(eager = eager)
      case None =>
        df => df.localCheckpoint(eager = eager)
    }

  /** Free a SUPERSEDED round's pinned blocks (no-op for reliable
    * checkpoints, whose data lives in files, not the block store). Callers
    * must guarantee the Dataset is never read again — a localCheckpoint
    * cannot recompute.
    *
    * Release walks the WHOLE analyzed plan and unpersists every pinned
    * node it finds, so it also serves as the caller-side cleanup hook for
    * lazy operators that pin internal artifacts (e.g. [[Dedup.upsert]]'s
    * resolved increment, [[Graph.pageRankInt]]'s edge table, the triangle
    * census's canonical edge set): after the terminal action on such an
    * operator's result, `Checkpoints.release(result)` frees everything the
    * plan still references. Long-lived sessions (a streaming foreachBatch
    * loop calling upsert per batch) must do this or accumulate dead
    * blocks until eviction churn sets in; one-shot jobs can skip it.
    */
  def release(ds: org.apache.spark.sql.Dataset[_]): Unit =
    CheckpointBridge.unpersistCheckpoint(ds)
}
