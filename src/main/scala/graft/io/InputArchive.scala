package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** S10 processed-file archival (pipelines/etl_zmb51.py:107-115,
  * etl_zstpromo.py:92-100): after a batch of input exports is loaded, the
  * reference moves each consumed file into a `processed/` directory,
  * suffixing `_yyyyMMddHHmm` before the extension when a same-named file
  * is already archived.
  *
  * Restated over the Hadoop FileSystem API so the same op works on any
  * Spark-reachable store (local, HDFS, object stores with a FS adapter).
  * Renames are per-file metadata ops — no data is copied on rename-capable
  * stores, so archival cost is O(files), not O(bytes), at any scale. The
  * clock is injectable for deterministic tests and replay.
  */
object InputArchive {

  private def defaultStamp(): String =
    new java.text.SimpleDateFormat("yyyyMMddHHmm").format(new java.util.Date)

  /** Move `files` into `processedDir` (created if absent). On a name
    * collision the incoming file gets `stem_<stamp><suffix>`; if that
    * name is also taken the move fails loudly rather than overwriting —
    * an archive must never lose a prior version silently. Returns the
    * (source, destination) pairs actually moved. */
  def archiveInputs(spark: SparkSession, files: Seq[String], processedDir: String,
                    stamp: () => String = defaultStamp _): Seq[(String, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(processedDir)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    files.map { f =>
      val src = new Path(f)
      val name = src.getName
      val plain = new Path(dir, name)
      val dest =
        if (!fs.exists(plain)) plain
        else {
          val (stem, suffix) = name.lastIndexOf('.') match {
            case -1 => (name, "")
            case i  => (name.substring(0, i), name.substring(i))
          }
          new Path(dir, s"${stem}_${stamp()}$suffix")
        }
      if (fs.exists(dest) || !fs.rename(src, dest))
        throw new IllegalStateException(
          s"cannot archive $src to $dest (destination exists or rename failed)")
      (src.toString, dest.toString)
    }
  }

  /** Glob variant: archive every file currently matching `glob` — the
    * "everything this batch read" form the pipelines use. */
  def archiveGlob(spark: SparkSession, glob: String, processedDir: String,
                  stamp: () => String = defaultStamp _): Seq[(String, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(glob)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isFile).map(_.getPath.toString)
    archiveInputs(spark, matched, processedDir, stamp)
  }
}
