package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the maintenance op every streaming/incremental
  * sink needs at scale. Each micro-batch (or partitioned upsert) writes at
  * least one file per touched partition dir, so a day of minute-batches
  * turns a partition into thousands of tiny files whose per-file
  * open/footer overhead dominates scan cost long before the bytes do.
  * Compaction rewrites a directory into ceil(bytes / targetFileBytes)
  * files — optionally range-sorted for min/max pruning — and publishes
  * with the same two-rename swap the upsert writer uses, so readers see
  * either the old or the new layout, never a mix.
  */
object Compact {

  /** Streaming file sinks write a `_spark_metadata` commit log that batch
    * readers treat as the source of truth — compacting underneath it
    * strands every reader on the old file list (FileNotFound). Refuse
    * unless the caller opts in to retiring the log, which converts the
    * directory into a plain parquet table; only do that once the writing
    * stream is permanently stopped (a resumed query would corrupt the
    * now-logless dir). */
  private def retireStreamingMetadata(fs: org.apache.hadoop.fs.FileSystem,
                                      dir: Path, optIn: Boolean): Unit = {
    val meta = new Path(dir, "_spark_metadata")
    if (fs.exists(meta)) {
      require(optIn,
        s"$dir is a streaming file-sink output (_spark_metadata present); " +
          "batch readers resolve files through the sink log, so compaction " +
          "would strand them. Stop the writing stream permanently and pass " +
          "retireMetadata=true to convert it to a plain parquet table.")
      fs.delete(meta, true)
    }
  }

  /** Rewrite one parquet directory into ~targetFileBytes-sized files.
    * `sortCols`, when given, range-partitions and sorts within files so
    * parquet min/max stats prune scans on those columns (the poor man's
    * clustering; at 100 TB this is what keeps point-lookups off full
    * scans). Returns the resulting file count.
    *
    * `stagingRoot` places the tmp/trash dirs; the default (siblings of
    * `path`) is ONLY safe when `path`'s parent is not itself a
    * partitioned-table root — for a `part=` dir inside a table, staging
    * siblings would appear to concurrent readers as phantom partitions
    * (and a crash would leave a duplicate-data `part=x.__old` dir that
    * partition discovery picks up). compactPartitioned always passes a
    * staging root OUTSIDE the table. */
  def compactDir(spark: SparkSession, path: String,
                 targetFileBytes: Long = 128L * 1024 * 1024,
                 sortCols: Seq[String] = Nil,
                 retireMetadata: Boolean = false,
                 stagingRoot: String = ""): Int = {
    import org.apache.spark.sql.functions.col
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    retireStreamingMetadata(fs, dir, retireMetadata)
    val dataFiles = fs.listStatus(dir).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    require(dataFiles.nonEmpty, s"$path holds no parquet files to compact")
    val totalBytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt

    val df = spark.read.parquet(path)
    val shaped =
      if (sortCols.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)

    val (tmp, trash) =
      if (stagingRoot.isEmpty)
        (new Path(path + ".__compact"), new Path(path + ".__old"))
      else {
        fs.mkdirs(new Path(stagingRoot))
        (new Path(stagingRoot, dir.getName + ".__compact"),
          new Path(stagingRoot, dir.getName + ".__old"))
      }
    fs.delete(tmp, true); fs.delete(trash, true)
    shaped.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (!fs.rename(dir, trash))
      throw new IllegalStateException(s"cannot stage out $dir for compaction")
    if (!fs.rename(tmp, dir)) {
      // restore: the original data is intact in trash
      if (!fs.rename(trash, dir))
        throw new IllegalStateException(
          s"cannot publish compacted $dir AND the original could not be " +
            s"restored from $trash — restore it manually")
      throw new IllegalStateException(s"cannot publish compacted $dir; original restored")
    }
    fs.delete(trash, true)
    nFiles
  }

  /** Table form: compact every `partitionCol=` child dir currently holding
    * more than `maxFilesPerPartition` files. Partition dirs are rewritten
    * independently (each with its own atomic swap), so a long compaction
    * run never blocks readers and can be resumed after interruption. */
  def compactPartitioned(spark: SparkSession, tablePath: String,
                         targetFileBytes: Long = 128L * 1024 * 1024,
                         maxFilesPerPartition: Int = 8,
                         sortCols: Seq[String] = Nil,
                         retireMetadata: Boolean = false): Map[String, Int] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(tablePath)
    val fs = dir.getFileSystem(conf)
    retireStreamingMetadata(fs, dir, retireMetadata)
    // stage OUTSIDE the table root: in-root staging dirs would surface to
    // concurrent readers as phantom partitions, and a crash would leave a
    // duplicate-data `part=x.__old` dir that partition discovery (and the
    // next compaction run) picks up
    val stagingRoot = tablePath.stripSuffix("/") + ".__compactstage"
    val partDirs = fs.listStatus(dir).filter(s =>
      s.isDirectory && s.getPath.getName.contains("=") &&
        !s.getPath.getName.contains(".__")) // defensive: skip staging litter
    val out = partDirs.flatMap { p =>
      val files = fs.listStatus(p.getPath).count(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
      if (files > maxFilesPerPartition)
        Some(p.getPath.getName ->
          compactDir(spark, p.getPath.toString, targetFileBytes, sortCols,
            stagingRoot = stagingRoot))
      else None
    }.toMap
    fs.delete(new Path(stagingRoot), true)
    out
  }
}
