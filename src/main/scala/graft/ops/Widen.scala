package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Work-proportional width for expansion-heavy stages over task-starved
  * inputs — the shuffle-side sibling of [[Similarity.fanOutSmall]]
  * (guide §2.5 "input skew: one huge unsplittable file … repartition
  * immediately after the read", §2.6 idle capacity).
  *
  * The problem it solves: the bench fixtures (and any small dimension /
  * dictionary input at production scale) are single-row-group parquet
  * files, so their scans run as ONE task; AQE then re-coalesces every
  * small shuffle downstream by BYTES (`minPartitionSize`, default 1 MB),
  * which is the right dial for I/O-shaped work but collapses
  * compute-per-byte-heavy stages — pair verification after blocking,
  * high-cardinality aggregation, wide string projection — onto 1-2 of
  * the cluster's cores. Measured at sf0.1/local[32]: the edit-distance
  * verify of `fuzzy_pairs` ran 4.3 s in a 2-task stage, the blocked
  * Jaccard of `ngram_jaccard` 4.3 s in ONE task, `movement_agg`'s
  * 600 k-group partial aggregate 2.5 s in the single scan task.
  *
  * The fix: pin the partitioning of the heavy stage with an EXPLICIT
  * `repartition(width, keys)` (user-specified widths are exempt from AQE
  * coalescing), where width prices the stage's WORK, not its input
  * bytes: width = estBytes · expansion / `spark.graft.fanoutTaskBytes`
  * (default 2 MB), capped at defaultParallelism. `expansion` is the
  * call site's documented work multiplier over its input bytes (e.g.
  * deletion-neighborhood blocking emits ~|value| block keys per value
  * and verifies ~block² candidate pairs).
  *
  * Scale posture: the repartition fires ONLY when the plan-stats
  * estimate of the input is at most `spark.graft.fanoutSmallBytes`
  * (default one scan split, 128 MB — i.e. the scan would run ~1 task).
  * A production-scale input keeps its current plan untouched: its scan
  * is already wide and its shuffles carry enough bytes that AQE sizes
  * them properly. Both knobs are session confs, not constants tuned to
  * this host; at `local[4]` the defaultParallelism cap keeps widths
  * proportional. Row-identical by construction: a repartition only
  * moves rows, and every consumer here aggregates with commutative,
  * order-independent combiners or per-row projections/filters. */
private[graft] object Widen {

  /** The work-priced width for a stage consuming `df` with the given
    * expansion multiplier; 1 means "leave the plan alone". */
  def width(df: DataFrame, expansion: Double): Int = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val cap = spark.conf.getOption("spark.graft.fanoutSmallBytes")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    if (par <= 1 || cap <= 0L) return 1
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est > BigInt(cap)) return 1 // production-scale input: plan untouched
    val taskBytes = spark.conf.getOption("spark.graft.fanoutTaskBytes")
      .map(_.toLong).getOrElse(2L * 1024 * 1024).max(1L)
    val w = (BigDecimal(est) * expansion / BigDecimal(taskBytes)).toBigInt
    w.min(BigInt(par)).max(BigInt(1)).toInt
  }

  /** Hash-pin `df` to (width, keys) ahead of a heavy stage keyed the
    * same way (the downstream groupBy/join then reuses this exchange —
    * no second shuffle); identity when the input is production-scale or
    * the priced width is 1. */
  def byKeys(df: DataFrame, expansion: Double, keys: Column*): DataFrame = {
    val w = width(df, expansion)
    if (w > 1) df.repartition(w, keys: _*) else df
  }

  /** Round-robin fan-out at the priced width — for heavy map-side work
    * with no natural key; identity under the same guards. */
  def rows(df: DataFrame, expansion: Double): DataFrame = {
    val w = width(df, expansion)
    if (w > 1) df.repartition(w) else df
  }
}
