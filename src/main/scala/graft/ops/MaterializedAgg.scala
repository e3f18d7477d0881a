package graft.ops

import graft.io.Versioned
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained aggregate (a minimal materialized view) over a
  * [[Versioned]] table — the pattern that replaces "recompute the world per
  * load" for the reference's nightly report tables (e.g. the weekly-sales
  * rollup rebuilt from scratch in pipelines/etl_weekly_sales.py) once the
  * fact table is append-only at 100 TB.
  *
  * The view is `SELECT keys, count(*) AS cnt, sum(m) AS sum_m... GROUP BY
  * keys` — count and sum are distributive, so the state after new commits is
  * `merge(state, agg(delta))`, computed without touching already-folded
  * batches: each refresh reads ONLY the files appended since the last covered
  * version (`Versioned.readChanges`), aggregates that delta, and merges it
  * with the prior state by re-summing. Sums are carried as DECIMAL(38,6), so
  * folding batch-by-batch is bit-identical to one aggregation over the full
  * table on any partitioning — the refresh path and the recompute path agree
  * exactly, which is what makes the view trustworthy.
  *
  * The state itself lives in a second Versioned table, committed with
  * `replace = true` and a `src-vN` tag recording the covered source version:
  * the commit is atomic (readers see the old state or the new, never a mix),
  * a crashed refresh leaves the old state intact and is simply re-run, and a
  * replayed refresh is a no-op (tag check) — exactly-once view maintenance
  * from at-least-once scheduling. Work per refresh is O(delta + |state|);
  * state size is |distinct keys|, the view's own output, so the rewrite is
  * the cheapest possible materialization short of a partitioned upsert (the
  * natural upgrade if the key space itself outgrows one rewrite:
  * UpsertWriter.upsertPartitioned on a key prefix).
  */
object MaterializedAgg {

  /** Fold any source commits newer than the state's covered version into the
    * state table. `sumCols` are measure columns summed as `sum_<name>`;
    * `cnt` counts rows. Returns the now-covered source version. */
  def refresh(spark: SparkSession, sourceRoot: String, stateRoot: String,
              keys: Seq[String], sumCols: Seq[String]): Long = {
    val srcVersions = Versioned.versions(spark, sourceRoot)
    require(srcVersions.nonEmpty, s"no committed versions at $sourceRoot")
    val target = srcVersions.last
    val covered = Versioned.committedTag(spark, stateRoot)
      .filter(_.startsWith("src-v")).map(_.stripPrefix("src-v").toLong)
    if (covered.contains(target)) return target
    covered.foreach { c =>
      require(srcVersions.contains(c),
        s"state covers source v$c which no longer exists at $sourceRoot " +
          "(vacuumed past the state's high-water mark?)")
      // delta folding is only sound over append-only history: a replace
      // commit (including compactLatest) rewrites rows the state already
      // folded, and readChanges would re-deliver them as "new" — silent
      // double counting. Detect it by files the covered snapshot lost.
      val before = Versioned.snapshotFiles(spark, sourceRoot, Some(c)).toSet
      val now = Versioned.snapshotFiles(spark, sourceRoot, Some(target)).toSet
      val removed = before.diff(now)
      require(removed.isEmpty,
        s"source history since v$c is not append-only (${removed.size} file(s) " +
          s"replaced/compacted away at $sourceRoot); folding the delta would " +
          "double-count. Rebuild the state (delete it) or refresh before compacting.")
      // a merge-on-read delete is the same violation without a file-list
      // change: rows the state already folded went dead, and no delta
      // will ever re-deliver them — the state would stay silently stale
      require(Versioned.dvEntries(spark, sourceRoot, Some(c)) ==
          Versioned.dvEntries(spark, sourceRoot, Some(target)),
        s"source history since v$c changed deletion vectors at $sourceRoot; " +
          "delta folding cannot subtract vector-deleted rows. Rebuild the " +
          "state, or materialize vectors (dvMaterialize) and rebuild.")
    }

    val delta = covered match {
      case Some(c) => Versioned.readChanges(spark, sourceRoot, c, Some(target))
      case None    => Versioned.read(spark, sourceRoot, Some(target))
    }
    val deltaAgg = aggregate(delta, keys, sumCols)
    val newState = covered match {
      case None => deltaAgg
      case Some(_) =>
        val prior = Versioned.read(spark, stateRoot)
        merge(prior.unionByName(deltaAgg), keys, sumCols)
    }
    Versioned.commit(spark, newState, stateRoot, replace = true,
      tag = Some(s"src-v$target"))
    target
  }

  /** The full-recompute form of the view — what `refresh`'s folded state
    * must equal exactly (property-tested, and the DuckDB oracle of the
    * registered `incr_agg` query). */
  def aggregate(df: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(col(c).cast(DecimalType(38, 6))).as(s"sum_$c")): _*)

  // state ⊎ delta: counts add, decimal sums add — both distributive
  private def merge(unioned: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    unioned.groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).cast("long").as("cnt"),
        sumCols.map(c => sum(col(s"sum_$c")).cast(DecimalType(38, 6)).as(s"sum_$c")): _*)
}
