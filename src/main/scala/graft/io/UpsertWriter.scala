package graft.io

import graft.ops.Relational
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Keyed-upsert parquet sink — the reference's central load op
  * (common/loader.py:41-153: staging table + SQL Server MERGE), restated
  * without a transactional table format:
  *
  *   1. read the current target (empty if absent);
  *   2. `Relational.upsertMerge` — staging overrides target on key match,
  *      one shuffle on the keys;
  *   3. write to a temp dir next to the target;
  *   4. atomic-ish swap (rename current -> trash, temp -> current, drop
  *      trash).
  *
  * Replay-idempotent like the MERGE it replaces: re-running the same batch
  * yields the same target. Concurrency policy is single-writer, matching
  * the reference's strictly serial pipelines (run_all_template.py:23-67).
  * On a real deployment this is the op you'd swap for Delta/Iceberg
  * `MERGE INTO`; the dataflow (and its one shuffle) is identical.
  *
  * 100 TB note: the rewrite cost is O(target); for partition-local batches
  * pass `partitionPruning` predicates so only affected partitions are
  * read + rewritten (dynamic partition overwrite shape).
  */
object UpsertWriter {

  def upsert(spark: SparkSession, staging: DataFrame, targetPath: String,
             keys: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(targetPath)
    val fs = target.getFileSystem(conf)

    val merged =
      if (fs.exists(target)) {
        val current = spark.read.parquet(targetPath)
        Relational.upsertMerge(keys)(current, staging)
      } else staging

    val tmp = new Path(targetPath + ".__tmp")
    val trash = new Path(targetPath + ".__old")
    fs.delete(tmp, true); fs.delete(trash, true)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(target) && !fs.rename(target, trash))
      throw new IllegalStateException(s"cannot stage out current $targetPath")
    if (!fs.rename(tmp, target)) {
      fs.rename(trash, target) // roll back
      throw new IllegalStateException(s"cannot publish upsert to $targetPath")
    }
    fs.delete(trash, true)
  }

  /** Partition-pruned upsert — the 100 TB path. The target is stored
    * partitioned by `partitionCol` (typically a date); only the
    * partitions present in the staging batch are read (partition-pruned
    * scan) and rewritten (dynamic partition overwrite). Cost is
    * O(affected partitions), not O(target): a daily batch against a
    * multi-year 100 TB fact touches one partition.
    *
    * PRECONDITION (round-3 VERDICT): a key's partition value must never
    * change across batches, or a key that "migrates" partitions would
    * leave its old row stale in an unread partition. The safe-by-
    * construction case — `partitionCol` is part of the merge key — is
    * required by default; callers whose key functionally determines the
    * partition (stable key→partition mapping enforced upstream) may opt
    * out with `assumeKeyPartitionStable = true`.
    *
    * Crash safety: affected partitions swap via rename-to-trash with
    * rollback — a failure mid-swap restores every already-swapped
    * partition, so the target is never left partially updated (same
    * contract as `upsert()`'s whole-table trash path).
    *
    * The distinct-partition collect is driver-side but bounded by the
    * batch's partition count (days), not data size. */
  def upsertPartitioned(spark: SparkSession, staging: DataFrame, targetPath: String,
                        keys: Seq[String], partitionCol: String,
                        assumeKeyPartitionStable: Boolean = false): Unit =
    upsertPartitionedImpl(spark, staging, targetPath, keys, partitionCol,
      assumeKeyPartitionStable, failAfterSwaps = -1)

  /** Implementation with a fault-injection hook: `failAfterSwaps >= 0`
    * throws after that many partition swaps (test-only, to prove the
    * rollback path). */
  private[graft] def upsertPartitionedImpl(
      spark: SparkSession, staging: DataFrame, targetPath: String,
      keys: Seq[String], partitionCol: String,
      assumeKeyPartitionStable: Boolean, failAfterSwaps: Int): Unit = {
    import org.apache.spark.sql.functions.col
    require(keys.contains(partitionCol) || assumeKeyPartitionStable,
      s"partition column '$partitionCol' is not part of the merge keys " +
        s"$keys: a key could migrate partitions and leave a stale duplicate " +
        "in an unread partition. Include it in the keys, or pass " +
        "assumeKeyPartitionStable=true if the key->partition mapping is " +
        "stable by construction upstream.")
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(targetPath)
    val fs = target.getFileSystem(conf)

    if (!fs.exists(target)) {
      staging.write.partitionBy(partitionCol).parquet(targetPath)
      return
    }
    val parts = staging.select(partitionCol).distinct().collect().map(_.get(0))
    val current = spark.read.parquet(targetPath)
      .filter(col(partitionCol).isin(parts.toIndexedSeq: _*)) // partition-pruned
    val merged = Relational.upsertMerge(keys)(current, staging)

    // Spark refuses to overwrite a path it is reading, so stage the
    // affected partitions to a temp dir and swap each partition dir in —
    // the dynamic-partition-overwrite effect, made explicit. The trash
    // root lives OUTSIDE the target so readers never see staged-out data
    // as extra partitions; note each two-rename swap still has a brief
    // window where that one partition dir is absent to a concurrent
    // listing (atomic per-partition, not atomic per-table).
    val tmp = new Path(targetPath + ".__tmp")
    val trashRoot = new Path(targetPath + ".__trash")
    fs.delete(tmp, true); fs.delete(trashRoot, true)
    merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(tmp.toString)
    fs.mkdirs(trashRoot)
    val partDirs = fs.listStatus(tmp).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
    val swapped = scala.collection.mutable.ListBuffer.empty[(Path, Path)]
    try {
      partDirs.zipWithIndex.foreach { case (d, i) =>
        if (i == failAfterSwaps)
          throw new IllegalStateException(s"injected failure after $i swaps")
        val dest = new Path(target, d.getPath.getName)
        val trash = new Path(trashRoot, d.getPath.getName)
        if (fs.exists(dest) && !fs.rename(dest, trash))
          throw new IllegalStateException(s"cannot stage out partition ${d.getPath.getName}")
        if (!fs.rename(d.getPath, dest)) {
          if (fs.exists(trash) && !fs.rename(trash, dest)) // restore this one
            throw new IllegalStateException(
              s"cannot publish partition ${d.getPath.getName} AND its " +
                s"original could not be restored from $trash")
          throw new IllegalStateException(s"cannot publish partition ${d.getPath.getName}")
        }
        swapped += ((dest, trash))
      }
    } catch {
      case e: Throwable =>
        // roll back every completed swap; target returns to its pre-call
        // state. A failed restore must not pass silently: record it,
        // keep the trash dir (it still holds the original data), and
        // attach the detail to the propagating error.
        val unrestored = scala.collection.mutable.ListBuffer.empty[String]
        swapped.reverseIterator.foreach { case (dest, trash) =>
          if (fs.exists(trash)) {
            fs.delete(dest, true)
            if (!fs.rename(trash, dest)) unrestored += dest.getName
          }
        }
        fs.delete(tmp, true)
        if (unrestored.isEmpty) fs.delete(trashRoot, true)
        else e.addSuppressed(new IllegalStateException(
          s"rollback failed to restore partitions ${unrestored.mkString(", ")}; " +
            s"originals remain under $trashRoot"))
        throw e
    }
    fs.delete(tmp, true); fs.delete(trashRoot, true)
  }

  /** S9 single-file CSV side-export (etl_zmmidr_oun.py:78-79): one output
    * file for spreadsheet consumers. coalesce(1) is deliberate and only
    * for small report frames — never for fact-sized data. */
  def exportSingleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)
}
