package graft.pipelines

import graft.clean.Clean
import graft.io.{SapTextReader, UpsertWriter}
import graft.ops.Relational
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The remaining reference pipelines (SURVEY.md §7.2 item 4) as pure
  * DataFrame transforms + upsert keys. Each mirrors its pandas original's
  * semantics (cited) while staying one lazy Catalyst plan. File-format
  * specifics (FIXTURES.md): tab-text via SapTextReader; spreadsheet-shaped
  * sources arrive as CSV with identical columns.
  */
object ZstpromoPipeline {

  /** pipelines/etl_zstpromo.py:37-85 — promo/billing sales. */
  val renames = Map(
    "Payer" -> "Site", "Bill. Date" -> "Date", "Bill.qty" -> "Quantity",
    "Sales Amou" -> "Amt", "SU" -> "SUn")
  val upsertKeys = Seq("Article", "Site", "Date")

  def transform(raw: DataFrame): DataFrame =
    Clean.renameAll(raw, renames)
      .withColumn("Date", Clean.sapDate(col("Date")))
      .na.drop(Seq("Article", "Site", "Date"))
      .withColumn("Amt", Clean.sapNumber(col("Amt")))
      .withColumn("Quantity", Clean.sapNumber(col("Quantity")))
      .withColumn("Cost", Clean.sapNumber(col("Cost")))
      .groupBy(col("Article"), col("Site"), col("Date"))
      .agg(sum(col("Amt")).as("Amt"), sum(col("Quantity")).as("Quantity"),
        sum(col("Cost")).as("Cost"), min(col("SUn")).as("SUn"))

  def run(spark: SparkSession, inputGlob: String, targetPath: String): Unit =
    UpsertWriter.upsert(spark, transform(SapTextReader.read(spark, inputGlob)),
      targetPath, upsertKeys)
}

object ZrssalePipeline {

  /** pipelines/etl_zrssale.py:43-219 — wholesale billing lines (subset of
    * the 24-entry rename map; full line-level grain, keys Bill_Doc+Item). */
  val renames = Map(
    "Bill.Doc." -> "Bill_Doc", "Billing Date" -> "Date",
    "Sold-to pt" -> "Sold_To", "Bill. Qty" -> "Quantity",
    "Net Value" -> "Amt", "Material" -> "Article")
  val numericCols = Seq("Quantity", "Amt", "Cost")
  val upsertKeys = Seq("Bill_Doc", "Item")

  /** Line-level clean: rename, ZTTG article filter
    * (etl_zrssale.py:107), SAP-number parse, date parse, key dropna. */
  def transform(raw: DataFrame): DataFrame = {
    val cleaned = Clean.sapNumberAll(
      Clean.renameAll(raw, renames)
        .filter(col("Article_Type") === "ZTTG")
        .withColumn("Date", Clean.sapDate(col("Date"))),
      numericCols)
    cleaned.na.drop(Seq("Bill_Doc", "Item"))
  }

  /** The D1 dedup side path (etl_zrssale.py:63): one row per Article,
    * deterministic keeper. */
  def articleMaster(lines: DataFrame): DataFrame =
    Relational.dedupKeepFirst(Seq("Article"), Seq(col("Bill_Doc"), col("Item")))(lines)
}

object ZmmidrOunPipeline {

  /** pipelines/etl_zmmidr_oun.py — daily DC inventory snapshot from
    * spreadsheet-shaped exports whose FILENAMES carry dept/DC
    * (Zmmidr_oun_{dept}_{dc}_{date}). */
  val filenamePattern = ".*[Zz]mmidr_oun_(\\d{3})_(\\d{4})_\\d{8}\\.\\w+$"
  val upsertKeys = Seq("DC", "Article", "Date")

  /** Region groupings (etl_zmmidr_oun.py:142-167): DC id sets rolled up
    * under a region label. */
  val regionDCs: Seq[(String, String)] = Seq(
    "9891" -> "SCA", "9801" -> "SCA", "9802" -> "EC", "9803" -> "EC",
    "9804" -> "NCA")

  /** Per-file clean: filename-derived dept/DC, zero-strip Article,
    * SAP-number stocks, totals-row drop, snapshot date stamp.
    * `snapshotDate` is a parameter (the reference stamps `today`,
    * etl_zmmidr_oun.py:70 — injectable for deterministic tests/replays). */
  def transform(raw: DataFrame, snapshotDate: Column = current_date()): DataFrame =
    raw
      .withColumn("Dept", SapTextReader.fileNameColumn(filenamePattern, 1))
      .withColumn("DC", SapTextReader.fileNameColumn(filenamePattern, 2))
      .withColumnRenamed("Article No", "Article")
      .withColumn("Article", Clean.stripLeadingZeros(col("Article")))
      .filter(col("Article").isNotNull && col("Article") =!= "") // totals row
      .withColumn("Unrestricted-Use Stock", Clean.sapNumber(col("Unrestricted-Use Stock"), DecimalType(14, 6)))
      .withColumn("On order Stock", Clean.sapNumber(col("On order Stock"), DecimalType(14, 6)))
      .withColumn("Date", snapshotDate)
      .withColumn("Article NoDC", concat(col("DC"), col("Article")))

  /** Keep-last dedup on the snapshot key with explicit file order
    * (etl_zmmidr_oun.py:72-76 keep='last'). */
  def dedupSnapshots(df: DataFrame): DataFrame =
    Relational.dedupKeepLast(Seq("Date", "DC", "Article"),
      Seq(col("_source_file")))(df)

  /** A2 regional rollup: single-shuffle broadcast-membership variant. */
  def regionRollup(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    Relational.regionRollup(regionDCs.toDF("DC", "region"), "DC", "Article",
      Seq(sum(col("Unrestricted-Use Stock")).as("stock"),
        sum(col("On order Stock")).as("on_order")))(df)
  }
}

object WeeklySalesPipeline {

  /** pipelines/etl_weekly_sales.py:19-51 — the flagship merge, as a
    * reusable transform over any pair of keyed measure streams:
    * calendar-join both facts, week-range filter, pre-aggregate,
    * full-outer merge with COALESCE keys + zero fill, site-range filter.
    * Upsert keys: Article, AcctWk, Site (etl_weekly_sales.py:88-93). */
  val upsertKeys = Seq("Article", "AcctWk", "Site")

  def report(zmb51: DataFrame, zstpromo: DataFrame, calendar: DataFrame,
             minWk: Int, maxWk: Int): DataFrame = {
    def weekly(fact: DataFrame, aggs: Seq[Column]) =
      fact.join(broadcast(calendar), Seq("Date"))
        .filter(col("AcctWk").between(minWk, maxWk))
        .groupBy(col("AcctWk"), col("Article"), col("Site"))
        .agg(aggs.head, aggs.tail: _*)
    val m = weekly(zmb51, Seq(sum(col("Quantity")).as("Qty"), sum(col("Cost")).as("Cost")))
    val z = weekly(zstpromo, Seq(sum(col("Amt")).as("Amt")))
    Relational.coalescedFullOuterMerge(
      Seq("AcctWk", "Article", "Site"), Seq("Qty", "Cost", "Amt"))(m, z)
      .filter(col("Site").cast(IntegerType) < 5999)
  }
}

object StoreRpPipeline {

  /** pipelines/etl_StoreRP.py:107-201 — the 5-CTE replenishment report:
    * weekly base -> conditional aggregates -> latest RP snapshot ->
    * threshold CASE/CEILING -> change flag + filter. */
  def report(weeklyFact: DataFrame, rpSnapshot: DataFrame,
             minWk: Int, maxWk: Int, wksThreshold: Int = 38,
             diffThreshold: Double = 2.0): DataFrame = {
    val base = weeklyFact
      .filter(col("AcctWk").between(minWk, maxWk))
      .groupBy(col("Article"), col("Site"), col("AcctWk"))
      .agg(sum(col("Qty")).as("Qty"))
    val sales = base.groupBy(col("Article"), col("Site"))
      .agg(
        Relational.countWhere(col("Qty") > 0).as("Wks"),
        round(Relational.avgWhere(col("Qty") > 0, col("Qty")), 1).as("Wkly_Avg"))
    val main = sales.join(rpSnapshot, Seq("Article", "Site"), "inner")
      .withColumn("Sugg_RP",
        when(col("Rounding") * 0.5 > col("Wkly_Avg") * 1.25, ceil(col("Rounding") * 0.5))
          .otherwise(ceil(col("Wkly_Avg") * 1.25)))
    main
      .withColumn("RP_Diff", abs(col("Sugg_RP") - col("RP")))
      .withColumn("Change",
        when(col("Wks") > wksThreshold && col("RP_Diff") > diffThreshold, "YES")
          .otherwise("NO"))
      .filter(col("Change") === "YES")
      .orderBy(col("Article"), col("Site"))
  }
}

object ZmachkPipeline {

  /** pipelines/etl_zmachk.py — article master data: 31-col rename (subset
    * here), active-status filter, dash-as-null numerics, lenient dates,
    * new-article detection vs the existing dimension (anti-join J4),
    * upsert on Article. */
  val renames = Map(
    "Material" -> "Article", "Material Description" -> "Article_Description",
    "Matl Group" -> "MCH", "Valid From" -> "Valid_From_Date",
    "Gross Weight" -> "Gross_Weight")
  val upsertKeys = Seq("Article")

  def transform(raw: DataFrame): DataFrame =
    Clean.renameAll(raw, renames)
      .filter(col("Status") === "Y") // P9 equality filter (etl_zmachk.py:32)
      .drop("Status")
      .withColumn("Gross_Weight", Clean.dashNull(col("Gross_Weight")))
      .withColumn("Valid_From_Date",
        coalesce(Clean.sapDate(col("Valid_From_Date")),
          Clean.sapDate(col("Valid_From_Date"), "yyyy-MM-dd"))) // lenient parse
      .na.drop(Seq("Article"))

  /** New articles not yet in the dimension (etl_zmachk.py:113-117). */
  def newArticles(batch: DataFrame, existingDim: DataFrame): DataFrame =
    Relational.antiJoinNewKeys(
      existingDim.select(col("Article")), Seq("Article"))(batch)
}

object ZmmidrDryPipeline {

  /** pipelines/etl_zmmidr_dry.py — dry-goods DC inventory: dept filter
    * via MCH prefix, strict zero-on-failure numeric clean, snapshot
    * stamp; 17-col rollup shape shares ZmmidrOunPipeline.regionRollup. */
  def transform(raw: DataFrame, snapshotDate: Column = current_date()): DataFrame =
    raw
      .withColumn("Dept", substring(col("MCH"), 1, 3)) // P7 substring-derived
      .filter(col("Dept") === "106")                   // P9 (etl_zmmidr_dry.py:81)
      .withColumn("Article", Clean.stripLeadingZeros(col("Article No")))
      .drop("Article No")
      .filter(col("Article").isNotNull && col("Article") =!= "")
      .withColumn("Unrestricted-Use Stock",
        Clean.sapNumberZero(col("Unrestricted-Use Stock"), DecimalType(14, 6)))
      .withColumn("Snapshot Date", snapshotDate)
      .withColumn("Article NoDC", concat(col("DC"), col("Article")))
}

object DimLoader {

  /** pipelines/etl_upload_excel.py:12-139 — dimension upload configs:
    * (source file, declared schema, PK) per dim; load -> schema-align ->
    * keyed upsert. Spreadsheets arrive as CSV with identical columns. */
  case class DimConfig(name: String, schema: StructType, keys: Seq[String])

  val dims: Seq[DimConfig] = Seq(
    DimConfig("dim_Calendar", StructType(Seq(
      StructField("Date", DateType), StructField("AcctWk", IntegerType),
      StructField("Period", StringType))), Seq("Date")),
    DimConfig("dim_Store", StructType(Seq(
      StructField("Site", StringType), StructField("Name", StringType),
      StructField("Region", StringType))), Seq("Site")),
    DimConfig("dim_Article", StructType(Seq(
      StructField("Article", StringType), StructField("Description", StringType),
      StructField("MCH", StringType))), Seq("Article")))

  def load(spark: SparkSession, cfg: DimConfig, csvPath: String, targetPath: String): Unit = {
    val raw = spark.read.option("header", "true").csv(csvPath)
    UpsertWriter.upsert(spark, Clean.schemaAlign(raw, cfg.schema), targetPath, cfg.keys)
  }
}
