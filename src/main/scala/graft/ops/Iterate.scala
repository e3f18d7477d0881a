package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage control for iterative fixpoints (connected components, Lloyd
  * iterations): each round's frame must be materialized with its lineage
  * truncated, or round i+1's plan re-derives rounds 1..i.
  */
private[graft] object Iterate {

  /** Materialize `df` eagerly with truncated lineage.
    *
    * With a RELIABLE checkpoint dir configured (`sc.setCheckpointDir`),
    * uses `checkpoint()`: an executor lost mid-fixpoint recovers its
    * blocks from the checkpoint files. The frame is persisted around the
    * checkpoint so the materializing job and the checkpoint-file write
    * don't each recompute the plan (the documented recompute caveat of
    * reliable checkpointing), and unpersisted after — the checkpoint
    * files carry the data from there. Checkpoint files live until
    * application exit unless `spark.cleaner.referenceTracking
    * .cleanCheckpoints` is on — set it for long-lived applications
    * running many fixpoints.
    *
    * Without a checkpoint dir, `localCheckpoint()` — which pins blocks in
    * executor storage AND truncates lineage, so a lost executor restarts
    * the whole computation; acceptable for local/test runs, not for a
    * 1000-executor fixpoint. Zero API change either way: flipping the
    * mode is one `setCheckpointDir` call before the fixpoint. */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val cached = df.persist()
      try cached.checkpoint()
      finally {
        cached.unpersist(blocking = false)
        ()
      }
    } else df.localCheckpoint()
}
