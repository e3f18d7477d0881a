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

  /** Read a SAP tab-text export dir/glob into an all-string DataFrame with
    * trimmed header names, junk rows and the blank first column removed.
    * Include the source file via `withFileName` for order-dependent ops. */
  def read(spark: SparkSession, glob: String, withFileName: Boolean = false): DataFrame = {
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
    // Compare against the RAW header cells: the scan sees the header row
    // exactly as exported, so a padded header would fail a match against
    // its normalized name and leak through as a data row (round-3 ADVICE).
    val notHeader = dataCols.map(i => col(s"_c$i") <=> lit(rawNames(i))).reduce(_ && _).unary_!

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
