package graft.pipelines

import graft.clean.{Clean, SchemaContracts}
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

  /** pipelines/etl_zrssale.py:73-101 — the FULL shared rename map for both
    * export branches (D2/D3), wholesale billing lines at line grain,
    * upsert keys Bill_Doc+Item (etl_zrssale.py:219). */
  val renames = Map(
    "SOrg." -> "SOrg", "Sold-to" -> "Sold_To", "Ship-to" -> "Ship_To",
    "Name 1" -> "Name", "Bill.Doc." -> "Bill_Doc", "Bill. Date" -> "Date",
    "Mdse Cat." -> "MCH", "Bill.qty" -> "Quantity_SUn", "SU" -> "SUn",
    "BillQtySKU" -> "Quantity", "Sales Amou" -> "Amt", "Curr." -> "Curr",
    "SAP Tax" -> "SAP_Tax", "Sales Doc." -> "Sales_Doc",
    "Ship-to st" -> "Ship_To_State", "Ship-to Ci" -> "Ship_To_City",
    "TaxRate %" -> "Tax_Rate", "Net Value" -> "Net", "Reg" -> "DlvState",
    "Search Ter" -> "Search_Ter", "Postal Cod" -> "Postal_Code",
    "N Weight" -> "N_Weight", "Inco. 2" -> "Inco_2",
    "MTyp" -> "Article_Type", "Art.type descr." -> "Article_Type_Description",
    "POS Tax" -> "POS_Tax", "Net Sale" -> "Net_Sale")

  /** The 14 fast_numeric columns (etl_zrssale.py:104-107). */
  val numericCols = Seq("Quantity_SUn", "Quantity", "Amt", "Cost", "SAP_Tax",
    "ArtTax", "Tax_Rate", "CRVRate", "Net", "N_Weight", "Discount", "WSale",
    "POS_Tax", "Net_Sale")
  val upsertKeys = Seq("Bill_Doc", "Item")

  /** D2 per-file pre-rename (etl_zrssale.py:54-56): the D2 tab layout
    * labels the article-type description column "Descript.". */
  val d2PreRenames = Map("Descript." -> "Art.type descr.")

  /** Line-level clean shared by both branches: date parse MM/dd/yyyy
    * (etl_zrssale.py:53), Article dropna (etl_zrssale.py:54), rename,
    * SAP-number parse, ZTTG article filter (etl_zrssale.py:108), key
    * dropna. Only columns present are touched — pandas-rename semantics. */
  def transform(raw: DataFrame): DataFrame = {
    val renamed = Clean.renameAll(raw.na.drop(Seq("Article")), renames)
      .withColumn("Date", Clean.sapDate(col("Date")))
    val present = numericCols.filter(renamed.columns.contains)
    Clean.sapNumberAll(renamed, present)
      .filter(col("Article_Type") === "ZTTG")
      .na.drop(upsertKeys)
  }

  /** D2 branch: pre-rename, then the reference's MAIN-flow Article dedup
    * (etl_zrssale.py:63-64) folded in at its reference position: after
    * concatenating the batch, drop_duplicates(subset=['Article'])
    * keep-FIRST in concat order, and only THEN trim Article — so the D2
    * target holds one billing line per Article, the keeper is chosen
    * BEFORE the rename/ZTTG filter, and dedup compares untrimmed values.
    * Distributed keep-first needs an explicit total order; callers supply
    * the columns defining "concat order" (default: the source file name
    * attached by SapTextReader's withFileName — add a per-file row index
    * if within-file duplicates are possible). */
  def transformD2(raw: DataFrame,
                  firstOrder: Seq[Column] = Seq(col("_source_file"))): DataFrame = {
    val pre = Clean.renameAll(raw, d2PreRenames).na.drop(Seq("Article"))
    val deduped = Relational.dedupKeepFirst(Seq("Article"), firstOrder)(pre)
    transform(deduped.withColumn("Article", trim(col("Article"))))
  }

  /** D2 end-to-end: read with the source-file column (the dedup's concat
    * order), transform, upsert on the shared keys. Within one file,
    * `_source_file` alone is not a total order, so the billing-document
    * key (Bill.Doc., Item) breaks ties — deterministic at any
    * parallelism, and SAP exports are emitted in document order so it
    * coincides with the reference's keep-first-in-file-order on real
    * data. */
  def runD2(spark: SparkSession, inputGlob: String, targetPath: String): Unit =
    UpsertWriter.upsert(spark,
      transformD2(SapTextReader.read(spark, inputGlob, withFileName = true),
        firstOrder = Seq(col("_source_file"), col("`Bill.Doc.`"), col("Item")))
        .drop("_source_file"),
      targetPath, upsertKeys)

  /** Standalone article-master derivation from already-cleaned lines —
    * one row per Article with a deterministic keeper on (Bill_Doc, Item).
    * The reference's main-flow dedup is in [[transformD2]]; this op is for
    * re-deriving a master from line-grain data kept by other branches. */
  def articleMaster(lines: DataFrame): DataFrame =
    Relational.dedupKeepFirst(Seq("Article"), Seq(col("Bill_Doc"), col("Item")))(lines)
}

object ZrssaleD3Pipeline {

  /** pipelines/etl_zrssale.py:262-318 — the SECOND export format: same
    * target table and keys, but the D3 tab layout spells two headers
    * differently ("Descript.", "Ship-to City") and skips the Article
    * drop_duplicates. Pre-rename to the shared shape, then the shared
    * clean — one transform, two source layouts. */
  val preRenames = Map(
    "Descript." -> "Art.type descr.",
    "Ship-to City" -> "Ship-to Ci")

  def transform(raw: DataFrame): DataFrame =
    ZrssalePipeline.transform(Clean.renameAll(raw, preRenames))
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

  /** pipelines/etl_upload_excel.py:12-139 — the COMPLETE dimension/fact
    * upload config table: (source workbook, target table, declared
    * schema, PK) per entry, mirroring every `excel_configs` entry, plus
    * dim_Article whose load lives in the ZMACHK pipeline
    * (etl_zmachk.py:113-117). Load -> schema-align -> PK enforcement ->
    * keyed upsert. Spreadsheets arrive as CSV with identical columns
    * (FIXTURES.md substitution). */
  /** `widths`: the reference's declared per-column NVARCHAR(n) lengths
    * (etl_upload_excel.py dtype maps) — enforced pre-write by [[load]]
    * via [[Clean]]'s SchemaContracts so an over-width value fails the
    * load exactly as the reference's SQL Server target would. */
  case class DimConfig(source: String, table: String, schema: StructType,
                       keys: Seq[String], widths: Map[String, Int] = Map.empty)

  private def nv(n: String)   = StructField(n, StringType)
  private def dec(n: String)  = StructField(n, DecimalType(18, 6))
  private def intF(n: String) = StructField(n, IntegerType)
  private def dt(n: String)   = StructField(n, DateType)

  val dims: Seq[DimConfig] = Seq(
    // etl_upload_excel.py:13-27
    DimConfig("Calendar", "dim_Calendar", StructType(Seq(
      dt("Date"), nv("Wkday"), nv("Week"), nv("Period"), intF("Month"),
      nv("Quarter"), intF("Year"), nv("AcctWk"), nv("PromWk"))), Seq("Date"),
      Map("Wkday" -> 7, "Week" -> 5, "Period" -> 3, "Quarter" -> 2,
        "AcctWk" -> 6, "PromWk" -> 6)),
    // etl_upload_excel.py:29-37
    DimConfig("WeekPeriod", "dim_WeekPeriod", StructType(Seq(
      nv("AcctWk"), nv("Period"), nv("Quarter"), intF("Year"))), Seq("AcctWk"),
      Map("AcctWk" -> 6, "Period" -> 3, "Quarter" -> 2)),
    // etl_upload_excel.py:38-50
    DimConfig("MCH_CM", "dim_MCH_CM", StructType(Seq(
      nv("MCH"), nv("MCH_Description"), nv("Class"), nv("Class_Description"),
      nv("Dept"), nv("Dept_EN"), nv("CM"))), Seq("MCH"),
      Map("MCH" -> 8, "MCH_Description" -> 100, "Class" -> 6,
        "Class_Description" -> 50, "Dept" -> 4, "Dept_EN" -> 25, "CM" -> 25)),
    // etl_upload_excel.py:52-61
    DimConfig("DC", "dim_DC", StructType(Seq(
      nv("DC"), nv("Region"), nv("DC_Type"), nv("Company"))), Seq("DC"),
      Map("DC" -> 4, "Region" -> 5, "DC_Type" -> 20, "Company" -> 10)),
    // etl_upload_excel.py:63-76
    DimConfig("Site", "dim_Store", StructType(Seq(
      nv("Site"), nv("Region"), nv("Region2"), nv("Region3"), nv("State"),
      nv("Company_Code"), nv("Store_Name"), dt("Open_Date"))), Seq("Site"),
      Map("Site" -> 4, "Region" -> 5, "Region2" -> 12, "Region3" -> 12,
        "State" -> 2, "Company_Code" -> 7, "Store_Name" -> 20)),
    // etl_upload_excel.py:78-89 — composite PK
    DimConfig("Customer", "dim_WLChannel", StructType(Seq(
      nv("Sales_Group"), nv("Sold_To"), nv("Customer_Name"), nv("Channel"),
      nv("Sales_District"), nv("Sales_Office"))), Seq("Sales_Group", "Sold_To"),
      Map("Sales_Group" -> 10, "Sold_To" -> 10, "Customer_Name" -> 100,
        "Channel" -> 20, "Sales_District" -> 20, "Sales_Office" -> 10)),
    // etl_upload_excel.py:91-111 — decimal-heavy fact shape
    DimConfig("Tawa_Fcst", "fact_Forecast", StructType(Seq(
      nv("Site"), nv("Article"), dec("Tawa_Fsct"), dec("Tawa_Fsct_Inlcude_Promo"),
      dec("Tawa_On_Order"), nv("Qty_Oun"), dec("Walong_Fcst"),
      dec("Walong_Fcst_Include_promo"), dec("Lead_Time"), dec("Order_Interval"),
      dec("Safety_Stock"), dec("Fina_Order_Qty"), nv("Dept"),
      nv("Article_NoDC"), dt("Date"))), Seq("Article_NoDC"),
      Map("Site" -> 10, "Article" -> 20, "Qty_Oun" -> 10, "Dept" -> 50,
        "Article_NoDC" -> 20)),
    // etl_upload_excel.py:113-126 — second feed into dim_MCH_CM
    DimConfig("MCH-Dept head", "dim_MCH_CM", StructType(Seq(
      nv("MCH"), nv("Dept_EN"), nv("Dept_CN"), nv("MCH_Section"),
      nv("MCH_Group"), nv("Dept_Head"), nv("Current_CM"), nv("New_CM"))), Seq("MCH"),
      Map("MCH" -> 8, "Dept_EN" -> 25, "Dept_CN" -> 20, "MCH_Section" -> 100,
        "MCH_Group" -> 30, "Dept_Head" -> 25, "Current_CM" -> 25, "New_CM" -> 25)),
    // etl_upload_excel.py:128-135
    DimConfig("Division", "Map_Division", StructType(Seq(
      intF("Division"), nv("Description"))), Seq("Division"),
      Map("Description" -> 20)),
    // etl_zmachk.py:113-128 — article master dimension
    DimConfig("Article", "dim_Article", StructType(Seq(
      nv("Article"), nv("Article_Description"), nv("MCH"),
      dt("Valid_From_Date"), dec("Gross_Weight"))), Seq("Article"),
      Map("Article" -> 20, "Article_Description" -> 255, "MCH" -> 20)))

  def config(source: String): DimConfig = dims.find(_.source == source)
    .getOrElse(throw new IllegalArgumentException(s"no dim config for $source"))

  /** PK enforcement — the Spark analog of the reference's
    * `ALTER COLUMN ... NOT NULL` + `ADD CONSTRAINT ... PRIMARY KEY`
    * (etl_upload_excel.py:180-215): one aggregate pass over the staged
    * batch rejects null or duplicate keys before anything publishes.
    * A SQL Server MERGE would likewise fail on either; failing BEFORE the
    * write keeps the target untouched. */
  def assertPrimaryKey(df: DataFrame, keys: Seq[String]): Unit = {
    val anyNull = keys.map(col(_).isNull).reduce(_ || _)
    val r = df.agg(
      count(lit(1)).as("n"),
      count(when(anyNull, 1)).as("nulls"),
      countDistinct(keys.head, keys.tail: _*).as("dk")).head()
    if (r.getLong(1) > 0)
      throw new IllegalStateException(
        s"PK violation: ${r.getLong(1)} rows with null key ${keys.mkString(",")}")
    if (r.getLong(2) != r.getLong(0))
      throw new IllegalStateException(
        s"PK violation: ${r.getLong(0) - r.getLong(2)} duplicate keys ${keys.mkString(",")}")
  }

  def load(spark: SparkSession, cfg: DimConfig, csvPath: String, targetPath: String): Unit = {
    val raw = spark.read.option("header", "true").csv(csvPath)
    val aligned = Clean.schemaAlign(raw, cfg.schema)
    assertPrimaryKey(aligned, cfg.keys)
    // declared NVARCHAR(n) widths enforce pre-write — the reference's SQL
    // Server refuses over-width values at upload; the parquet sink must too
    SchemaContracts.assertLengths(aligned, cfg.widths)
    UpsertWriter.upsert(spark, aligned, targetPath, cfg.keys)
  }
}

object ZinMchPipeline {

  /** pipelines/etl_zin_mch.py:23-48 — the Zmmidr_9801 assortment
    * snapshot: strip the spreadsheet ".0" numeric-as-string artifact on
    * five string-typed columns, align to the declared table schema
    * (including the pandas duplicate-column name "Article
    * Description.1"), and full-replace the target (S7 replace sink,
    * `upload_to_sql(..., 'replace')`). */
  val stringCols = Seq("Article No", "MCH", "Pack size", "SCA Assortment",
    "Assortment grade")

  val schema: StructType = StructType(Seq(
    StructField("Article No", StringType), StructField("MCH", StringType),
    StructField("Article Description", StringType),
    StructField("Article Description.1", StringType),
    StructField("Pack size", StringType),
    StructField("D/C MAP", DecimalType(10, 2)),
    StructField("Unrestricted-Use Stock", IntegerType),
    StructField("Allocation Qty", IntegerType),
    StructField("On order Stock", IntegerType),
    StructField("Unrestricted Stock Value", DecimalType(14, 2)),
    StructField("PTD MVMT", IntegerType), StructField("YTD MVMT", IntegerType),
    StructField("SCA Assortment", StringType),
    StructField("Assortment grade", StringType),
    StructField("Asrt.Grade Description", StringType)))

  def transform(raw: DataFrame): DataFrame =
    Clean.schemaAlign(
      stringCols.foldLeft(raw)((d, c) =>
        if (d.columns.contains(c)) d.withColumn(c, Clean.stripDotZero(col(s"`$c`")))
        else d),
      schema)

  /** Full-replace sink (the reference's if_exists='replace'). */
  def run(spark: SparkSession, csvPath: String, targetPath: String): Unit =
    transform(spark.read.option("header", "true").csv(csvPath))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(targetPath)
}

object ZmmidrBUnPipeline {

  /** pipelines/etl_zmmidr_bun.py:17-105 — the BUn (base-unit) DC
    * inventory snapshot: same shape family as ZmmidrOunPipeline (filename
    * carries dept/DC, leading-zero strip, clean_number stocks, snapshot
    * date stamp, keep-last dedup on (Date, DC, Article)) with its own
    * filename pattern and a DC-group rollup side output. */
  val filenamePattern = ".*[Zz]mmidr_bun_(\\d{3})_(\\d{4})_\\d{8}\\.\\w+$"
  val upsertKeys = Seq("DC", "Article", "Date")

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

  /** Keep-last on the snapshot key, file order as the tiebreak
    * (etl_zmmidr_bun.py:64-68 keep='last'). */
  def dedupSnapshots(df: DataFrame): DataFrame =
    Relational.dedupKeepLast(Seq("Date", "DC", "Article"),
      Seq(col("_source_file")))(df)

  /** Process_Dry_Zmmidr (etl_zmmidr_bun.py:126-168): roll SCA
    * {9891,9801} up under 9891 and EC {9790,9901} under 9790; 9900 and
    * 9793 pass through; other DCs drop out (the isin filters). One
    * broadcast membership join + one groupBy — not one shuffle per
    * region. */
  val dcGroups: Seq[(String, String)] = Seq(
    "9891" -> "9891", "9801" -> "9891",
    "9790" -> "9790", "9901" -> "9790",
    "9900" -> "9900", "9793" -> "9793")

  def dcRollup(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.na.drop(Seq("Article"))
      .join(broadcast(dcGroups.toDF("DC", "DC_Group")), Seq("DC"))
      .groupBy(col("DC_Group"), col("Article"))
      .agg(sum(col("Unrestricted-Use Stock")).as("Unrestricted-Use Stock"),
        sum(col("On order Stock")).as("On order Stock"))
      .select(
        concat(col("DC_Group"), col("Article")).as("Article NoDC"),
        col("DC_Group").as("DC"), col("Article"),
        col("Unrestricted-Use Stock"), col("On order Stock"))
  }
}
