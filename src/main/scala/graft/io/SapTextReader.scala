package graft.io

import graft.clean.Clean
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

/** Reader for SAP GUI "Text with Tabs" exports (SURVEY.md §2.1 S1):
  * two junk physical rows (report title + blank), then a header row with a
  * blank first column, then tab-separated data
  * (reference: pipelines/etl_zmb51.py:51-55 `skiprows=2` + `.iloc[:, 1:]`).
  *
  * Distributed-safe design: physical row positions don't exist in a
  * parallel scan, so the junk prefix is removed by *marker predicates*
  * instead of offsets —
  *   - title/blank rows parse with every non-first field null;
  *   - the header row equals the header names themselves.
  * Only the header names are read driver-side (first 3 lines of one file,
  * a few hundred bytes); the data scan is a plain parallel CSV read that
  * partition-splits like any other, so a 1000-file 100 GB export dir
  * scales as a normal Spark scan.
  */
object SapTextReader {

  /** Read the RAW header cells from the 3rd line of the first matching
    * file — exactly as they appear in the export, padding and all. The
    * header-row marker predicate in [[read]] must compare against these
    * raw strings (a padded `" Pstng  Date "` cell would never equal its
    * normalized name, and the header row would leak into the data). */
  def readHeaderRaw(spark: SparkSession, glob: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(glob)
    val fs = p.getFileSystem(conf)
    val first = fs.globStatus(p).headOption
      .getOrElse(throw new IllegalArgumentException(s"no files match $glob"))
    val in = new BufferedReader(new InputStreamReader(fs.open(first.getPath), StandardCharsets.UTF_8))
    try {
      in.readLine(); in.readLine() // junk prefix
      val header = Option(in.readLine())
        .getOrElse(throw new IllegalArgumentException(s"${first.getPath}: no header row"))
      header.split("\t", -1).toSeq
    } finally in.close()
  }

  /** Normalized header names (trim + collapse inner whitespace, the
    * reference's `df.columns.str.strip().str.replace(r"\s+"," ")`,
    * pipelines/etl_zmb51.py:55). */
  def readHeader(spark: SparkSession, glob: String): Seq[String] =
    readHeaderRaw(spark, glob).map(Clean.normalizeName)

  /** Guard against silently mis-mapped columns: the scan takes its layout
    * from the FIRST matching file, so a file whose export used a
    * different column order would bind values to the wrong names. This
    * check reads the 3 header lines of EVERY matching file (driver-side
    * metadata pass, a few hundred bytes per file — bounded by file count,
    * not data size) and fails fast on any normalized-header mismatch. */
  def validateHeaders(spark: SparkSession, glob: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(glob)
    val fs = p.getFileSystem(conf)
    val files = fs.globStatus(p)
    if (files.isEmpty) throw new IllegalArgumentException(s"no files match $glob")
    var expected: Seq[String] = null
    files.foreach { st =>
      val in = new BufferedReader(new InputStreamReader(fs.open(st.getPath), StandardCharsets.UTF_8))
      try {
        in.readLine(); in.readLine()
        val names = Option(in.readLine()).getOrElse("")
          .split("\t", -1).toSeq.map(Clean.normalizeName)
        if (expected == null) expected = names
        else if (names != expected)
          throw new IllegalStateException(
            s"${st.getPath}: header $names differs from ${files.head.getPath}'s " +
              s"$expected — exports with different layouts must not share a glob")
      } finally in.close()
    }
  }

  /** Read a SAP tab-text export dir/glob into an all-string DataFrame with
    * trimmed header names, junk rows and the blank first column removed.
    * Include the source file via `withFileName` for order-dependent ops.
    * Pass `checkHeaders = true` to fail fast if any file in the glob has
    * a different layout than the first (see [[validateHeaders]]). */
  def read(spark: SparkSession, glob: String, withFileName: Boolean = false,
           checkHeaders: Boolean = false): DataFrame = {
    if (checkHeaders) validateHeaders(spark, glob)
    val rawNames = readHeaderRaw(spark, glob) // rawNames.head is the blank first col
    val names = rawNames.map(Clean.normalizeName)
    val schema = StructType(names.indices.map(i => StructField(s"_c$i", StringType)))
    val raw = spark.read
      .option("sep", "\t")
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(glob)

    val dataCols = names.indices.drop(1)
    val notJunk = dataCols.map(i => col(s"_c$i").isNotNull).reduce(_ || _)
    // Header-row marker: normalize each scanned cell the same way header
    // names are normalized, then compare to the normalized names. This
    // catches the header row of EVERY file in the glob even when files
    // pad their headers differently (comparing raw cells against the
    // first file's raw header — or normalized names, round-3 ADVICE —
    // would each leak some padding variant). A data row would need every
    // column to simultaneously equal its column name to be dropped.
    def norm(c: org.apache.spark.sql.Column) =
      regexp_replace(trim(c), "\\s+", " ")
    val notHeader = dataCols.map(i => norm(col(s"_c$i")) <=> lit(names(i))).reduce(_ && _).unary_!

    val base = raw.filter(notJunk && notHeader)
    val selected = dataCols.map(i => col(s"_c$i").as(names(i)))
    if (withFileName)
      base.select(selected :+ input_file_name().as("_source_file"): _*)
    else
      base.select(selected: _*)
  }

  /** S3 totals-row drop: SAP grand-total rows carry a null key column —
    * the positional `df.drop(df.index[-1])` (etl_zmmidr_oun.py:28)
    * restated as a marker predicate. */
  def dropTotalsRows(df: DataFrame, keyCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull)

  /** S4 filename-derived columns: extract regex groups from the source
    * file path into data columns (etl_zmmidr_oun.py:39-51). */
  def fileNameColumn(pattern: String, group: Int): org.apache.spark.sql.Column =
    regexp_extract(input_file_name(), pattern, group)
}
