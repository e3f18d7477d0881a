package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cleaning / coercion functions mirroring the reference's pandas cleaners,
  * expressed as compositions of built-in Column expressions so every one of
  * them stays inside whole-stage codegen and survives predicate pushdown.
  *
  * Reference semantics (cited at /root/reference):
  *   - `clean_number` / `fast_numeric` (pipelines/etl_utils.py:18-34): strip
  *     commas and spaces, SAP trailing-minus `"1,234.5-" -> -1234.5`, anything
  *     unparseable -> null (pandas errors="coerce").
  *   - date parse MM/dd/yyyy (pipelines/etl_zmb51.py:56), lenient-null parse
  *     (pipelines/etl_zmachk.py:78).
  *   - dash-as-null (pipelines/etl_zmachk.py:79-80, etl_StoreRP.py:52-54).
  *   - leading-zero strip on article numbers (pipelines/etl_zmmidr_oun.py:29).
  *   - column-name normalization (pipelines/etl_zmb51.py:55).
  *   - schema-align coercion (pipelines/etl_utils.py:86-142).
  */
object Clean {

  /** SAP number parse: "1,234.56-" -> -1234.56; garbage -> null.
    * try_cast keeps null-on-failure semantics under ANSI mode.
    */
  def sapNumber(c: Column, dt: DataType = DecimalType(18, 6)): Column = {
    val stripped = regexp_replace(regexp_replace(trim(c), ",", ""), " ", "")
    val signFixed =
      regexp_replace(stripped, "^(\\d+\\.?\\d*)-$", "-$1")
    signFixed.try_cast(dt)
  }

  /** Strict variant: unparseable -> 0.0 instead of null (the ZMMIDR-dry
    * cleaner, pipelines/etl_zmmidr_dry.py:9-18). */
  def sapNumberZero(c: Column, dt: DataType = DecimalType(18, 6)): Column =
    coalesce(sapNumber(c, dt), lit(0).cast(dt))

  /** Vectorized form: apply sapNumber to many columns at once
    * (fast_numeric over a column list, pipelines/etl_utils.py:29-34). */
  def sapNumberAll(df: DataFrame, cols: Seq[String], dt: DataType = DecimalType(18, 6)): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, sapNumber(col(c), dt)))

  /** Strict date parse MM/dd/yyyy -> DateType, null on failure. */
  def sapDate(c: Column, fmt: String = "MM/dd/yyyy"): Column =
    try_to_timestamp(c, lit(fmt)).cast(DateType)

  /** `'-'` means "no value" in SAP numeric exports. */
  def dashNull(c: Column, dt: DataType = DecimalType(10, 4)): Column =
    when(trim(c) === "-", lit(null)).otherwise(c).try_cast(dt)

  /** Leading-zero strip on zero-padded article numbers. */
  def stripLeadingZeros(c: Column): Column = {
    val s = regexp_replace(trim(c), "^0+", "")
    // all-zero input means article "0", not empty
    when(trim(c).rlike("^0+$"), lit("0")).otherwise(s)
  }

  /** Trailing ".0" artifact strip (etl_zin_mch.py:23-26). */
  def stripDotZero(c: Column): Column = regexp_replace(trim(c), "\\.0$", "")

  /** Normalize column names: trim + collapse inner whitespace
    * (pipelines/etl_zmb51.py:55, etl_zrssale.py:52). */
  def normalizeName(n: String): String = n.trim.replaceAll("\\s+", " ")

  def normalizeColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeName).toIndexedSeq: _*)

  /** Bulk rename via map; missing sources are ignored (pandas rename
    * semantics, pipelines/etl_zmb51.py:63-68). */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** Schema-align: coerce a DataFrame to a declared StructType the way
    * clean_df_by_sql_schema does (pipelines/etl_utils.py:86-142):
    * strings get null->"" fill, numerics/dates coerce with null-on-failure,
    * columns absent from the schema are dropped, schema order is imposed.
    */
  def schemaAlign(df: DataFrame, schema: StructType): DataFrame = {
    val cols = schema.fields.map { f =>
      // backtick-quote so names with dots (pandas duplicate-column
      // artifacts like "Article Description.1") resolve as plain names
      val src = if (df.columns.contains(f.name)) col(s"`${f.name}`") else lit(null)
      val coerced = f.dataType match {
        case StringType      => coalesce(src.cast(StringType), lit(""))
        case _: NumericType  => src.cast(StringType).try_cast(f.dataType)
        case DateType        => src.try_cast(DateType)
        case TimestampType   => src.try_cast(TimestampType)
        case dt              => src.cast(dt)
      }
      coerced.as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
