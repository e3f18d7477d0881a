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

  /** Materialize a BOUNDED-by-design frame (trained centroids/codebooks,
    * model metadata — k-row artifacts, never corpus-sized data) as a
    * driver-local relation: one collect job now, then every downstream
    * consumer — broadcast builds, unions into commits, guard reads,
    * counts — plans against a LocalRelation and pays NO cluster jobs.
    * The eager-pin alternatives each keep the rows on executors, so
    * every later broadcast/head/count schedules tasks to fetch them;
    * for the many-small-jobs ANN lifecycle paths that per-consumer job
    * floor (~30-100 ms each at local mode, a scheduler round-trip on a
    * cluster) dominated the train-sized inputs (measured: ann_recell =
    * 69 jobs, none over 0.32 s). Row-identical: the same rows, driver-
    * hosted. Frames larger than `maxRows` fall back to [[pin]] — the
    * bounded contract was violated, keep it distributed. */
  def pinLocal(df: DataFrame, maxRows: Int = 65536): DataFrame = {
    // collect(), not limit(n).collect(): CollectLimitExec fetches the
    // final stage's partitions in incremental rounds (1, 4, 16, …) —
    // extra jobs, the exact floor this pin removes. maxRows is an
    // after-the-fact bounded-contract check on frames that are k-row by
    // design, not memory protection.
    val rows = df.collect()
    if (rows.length > maxRows) pin(df)
    else df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Row count of a [[pinLocal]]-pinned frame without a job, when the
    * pin stayed local (None after the over-cap distributed fallback —
    * callers pay their count() only on that path). */
  def localRowCount(df: DataFrame): Option[Long] =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        Some(lr.data.length.toLong)
      case _ => None
    }
}
