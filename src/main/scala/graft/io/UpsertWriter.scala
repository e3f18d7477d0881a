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
    * The distinct-partition collect is driver-side but bounded by the
    * batch's partition count (days), not data size. */
  def upsertPartitioned(spark: SparkSession, staging: DataFrame, targetPath: String,
                        keys: Seq[String], partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
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
    // the dynamic-partition-overwrite effect, made explicit.
    val tmp = new Path(targetPath + ".__tmp")
    fs.delete(tmp, true)
    merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(tmp.toString)
    val partDirs = fs.listStatus(tmp).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
    partDirs.foreach { d =>
      val dest = new Path(target, d.getPath.getName)
      fs.delete(dest, true)
      if (!fs.rename(d.getPath, dest))
        throw new IllegalStateException(s"cannot publish partition ${d.getPath.getName}")
    }
    fs.delete(tmp, true)
  }

  /** S9 single-file CSV side-export (etl_zmmidr_oun.py:78-79): one output
    * file for spreadsheet consumers. coalesce(1) is deliberate and only
    * for small report frames — never for fact-sized data. */
  def exportSingleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)
}
