package graft.engine

import org.apache.spark.sql.DataFrame

/** Eager plan-snapshot helper for the iterative operator family
  * (duplicate-cluster pointer doubling, BFS/k-core rounds, BPE merge
  * rounds, the two-pass prefix sums): each round must cut lineage —
  * otherwise the plan, and with it scheduler/codegen cost, grows
  * super-linearly in round count — and must pin ONE materialization
  * wherever a sample-based range partitioning feeds two plan branches.
  *
  * The storage choice is deployment-dependent, so it lives here once:
  *
  *   - `localCheckpoint(eager = true)` keeps blocks on executor local
  *     storage — no configuration, fast, the right call single-node /
  *     in-sandbox. Its weakness at cluster scale: blocks are NOT
  *     replicated, so losing one executor mid-iteration kills the job
  *     (no lineage left to recompute from).
  *   - reliable `checkpoint(eager = true)` writes to the fault-tolerant
  *     checkpoint directory (HDFS/S3) — the production switch for a
  *     1000-executor run, bought with one config call:
  *     `spark.sparkContext.setCheckpointDir(...)`. CLEANUP caveat: unlike
  *     local-checkpoint blocks (freed by the ContextCleaner on GC),
  *     reliable checkpoint FILES are only auto-deleted when
  *     `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
  *     false) — a deployment that sets a checkpoint dir without that flag
  *     accumulates one directory per pinned round per run. Set the flag,
  *     or sweep the checkpoint dir at application boundaries.
  *
  * [[pin]] picks reliable checkpointing exactly when the session has a
  * checkpoint dir configured, so the same operator code is sandbox-fast
  * and cluster-safe with zero call-site changes.
  */
object Snapshot {

  /** Eagerly materializes `df` and returns a plan rooted at the snapshot:
    * reliable `checkpoint()` when `setCheckpointDir` was called on the
    * session's SparkContext, `localCheckpoint()` otherwise. Both forms are
    * eager — callers rely on the materialization happening NOW (placement
    * pinning; round-boundary cost attribution). */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else
      df.localCheckpoint(eager = true)
}
