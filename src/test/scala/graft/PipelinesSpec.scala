package graft

import graft.pipelines._
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelinesSpec extends SparkSpecBase {
  import spark.implicits._

  test("ZstpromoPipeline aggregates promo sales per (Article, Site, Date)") {
    val raw = Seq(
      ("A1", "P9", "03/15/1996", "10.0", "1,000.00", "5.00", "EA"),
      ("A1", "P9", "03/15/1996", "2.0", "250.50-", "1.00", "EA"),
      ("A2", "P9", "bad-date", "9.0", "9.00", "9.00", "EA"))
      .toDF("Article", "Payer", "Bill. Date", "Bill.qty", "Sales Amou", "Cost", "SU")
    val out = ZstpromoPipeline.transform(raw)
      .select(col("Article"), col("Amt").cast("double"),
        col("Quantity").cast("double"), col("SUn"))
      .as[(String, Double, Double, String)].collect().toSet
    assert(out == Set(("A1", 749.5, 12.0, "EA"))) // bad date row dropped
  }

  test("Zrssale D2: main-flow Article dedup before rename/filter, then trim") {
    val raw = Seq(
      // two lines share Article A1 (one with padding — dedup compares the
      // UNTRIMMED value, so " A1 " is a distinct article until post-dedup trim)
      ("B1", "10", "A1", "ZTTG", "tax goods", "03/01/1996", "5.0", "100.00", "1,250.50-", "2.0"),
      ("B1", "20", "A1", "ZTTG", "tax goods", "03/01/1996", "2.0", "40.00", "10.00", "1.0"),
      ("B3", "10", " A1 ", "ZTTG", "tax goods", "03/02/1996", "7.0", "70.00", "7.00", "1.0"),
      // keeper for A2 is the FIRST in concat order (B2/10, type OTHER), so
      // the later ZTTG line for A2 must NOT survive via the filter
      ("B2", "10", "A2", "OTHER", "other", "03/01/1996", "9.0", "90.00", "9.00", "1.0"),
      ("B2", "20", "A2", "ZTTG", "tax goods", "03/01/1996", "4.0", "44.00", "4.00", "1.0"))
      .toDF("Bill.Doc.", "Item", "Article", "MTyp", "Descript.", "Bill. Date",
        "BillQtySKU", "Sales Amou", "Net Value", "Cost")
    val lines = ZrssalePipeline.transformD2(raw,
      firstOrder = Seq(col("`Bill.Doc.`"), col("Item"))) // explicit concat order
    // survivors: A1's first line (B1/10) and the trimmed " A1 " keeper (B3/10);
    // A2's keeper is the OTHER row, dropped by the ZTTG filter
    val got = lines.select(col("Article"), col("Bill_Doc"), col("Item"),
        col("Quantity").cast("double"), col("Net").cast("double"))
      .as[(String, String, String, Double, Double)].collect().toSet
    assert(got == Set(("A1", "B1", "10", 5.0, -1250.5), ("A1", "B3", "10", 7.0, 7.0)))
    // renames landed and types parsed on the kept line
    val r = lines.filter(col("Bill_Doc") === "B1")
      .select(col("Article_Type"), col("Article_Type_Description"), col("Date").cast("string"))
      .as[(String, String, String)].head()
    assert(r == ("ZTTG", "tax goods", "1996-03-01"))
    val master = ZrssalePipeline.articleMaster(lines)
      .select("Article", "Bill_Doc", "Item").as[(String, String, String)].collect().toSeq
    assert(master == Seq(("A1", "B1", "10"))) // keep-first on (Bill_Doc, Item)
  }

  test("Zrssale D3: second tab layout pre-renames into the shared transform") {
    val raw = Seq(
      ("B9", "10", "A9", "ZTTG", "d3 desc", "Los Angeles", "04/01/1996", "3.0", "30.00"),
      ("B9", "20", "A9", "OTHER", "d3 desc", "Irvine", "04/01/1996", "1.0", "10.00"))
      .toDF("Bill.Doc.", "Item", "Article", "MTyp", "Descript.", "Ship-to City",
        "Bill. Date", "BillQtySKU", "Sales Amou")
    val lines = ZrssaleD3Pipeline.transform(raw)
    val r = lines
      .select(col("Bill_Doc"), col("Item"), col("Article_Type_Description"),
        col("Ship_To_City"), col("Quantity").cast("double"))
      .as[(String, String, String, String, Double)].collect().toSeq
    assert(r == Seq(("B9", "10", "d3 desc", "Los Angeles", 3.0)))
  }

  test("ZmmidrOunPipeline: filename-derived DC, zero-strip, dedup keep-last, rollup") {
    val dir = Files.createTempDirectory("zmmidr").toFile
    def write(name: String, rows: Seq[String]): Unit =
      Files.write(new java.io.File(dir, name).toPath,
        (Seq("Article No,MCH,Unrestricted-Use Stock,On order Stock") ++ rows)
          .mkString("\n").getBytes("UTF-8"))
    // same DC snapshot twice: later file must win keep-last
    write("Zmmidr_oun_106_9891_03151996.csv", Seq("000123,M1,\"1,000.00\",5.00", ",,0,0"))
    write("Zmmidr_oun_106_9801_03151996.csv", Seq("000123,M1,200.00,1.00"))

    val raw = spark.read.option("header", "true")
      .csv(dir.getAbsolutePath + "/Zmmidr_oun_*.csv")
      .withColumn("_source_file", input_file_name())
    val t = ZmmidrOunPipeline.transform(raw, to_date(lit("1996-03-15")))
    val rows = t.select(col("DC"), col("Article"), col("Dept"),
        col("Unrestricted-Use Stock").cast("double"), col("Article NoDC"))
      .as[(String, String, String, Double, String)].collect().toSet
    assert(rows == Set(
      ("9891", "123", "106", 1000.0, "9891123"),
      ("9801", "123", "106", 200.0, "9801123"))) // totals row dropped

    val deduped = ZmmidrOunPipeline.dedupSnapshots(t)
    assert(deduped.count() == 2) // distinct DCs -> both kept

    val rollup = ZmmidrOunPipeline.regionRollup(spark, t)
      .select(col("region"), col("Article"), col("stock").cast("double"))
      .as[(String, String, Double)].collect().toSet
    assert(rollup == Set(("SCA", "123", 1200.0)))
  }

  test("WeeklySalesPipeline merges the two streams with zero fill") {
    val cal = Seq(("1996-03-15", 11), ("1996-03-22", 12))
      .toDF("Date", "AcctWk")
    val zmb51 = Seq(("A1", "1000", "1996-03-15", 5.0, 50.0))
      .toDF("Article", "Site", "Date", "Quantity", "Cost")
    val zstpromo = Seq(
      ("A1", "1000", "1996-03-15", 100.0), // overlaps zmb51 key
      ("A2", "1001", "1996-03-22", 70.0),  // promo-only key
      ("A3", "9999", "1996-03-22", 1.0))   // filtered: site >= 5999
      .toDF("Article", "Site", "Date", "Amt")
    val out = WeeklySalesPipeline.report(zmb51, zstpromo, cal, 11, 12)
      .select(col("AcctWk"), col("Article"), col("Site"), col("Qty"),
        col("Cost"), col("Amt"))
      .as[(Int, String, String, Double, Double, Double)].collect().toSet
    assert(out == Set(
      (11, "A1", "1000", 5.0, 50.0, 100.0),
      (12, "A2", "1001", 0.0, 0.0, 70.0)))
  }

  test("StoreRpPipeline flags articles whose suggested RP drifted") {
    val weeks = (1 to 40).map(w => ("A1", "S1", w, 10.0)) ++
      (1 to 40).map(w => ("A2", "S1", w, 10.0))
    val fact = weeks.toDF("Article", "Site", "AcctWk", "Qty")
    val rp = Seq(("A1", "S1", 1.0, 2.0), ("A2", "S1", 13.0, 2.0))
      .toDF("Article", "Site", "RP", "Rounding")
    val out = StoreRpPipeline.report(fact, rp, 1, 40)
      .select("Article", "Wks", "Sugg_RP", "RP_Diff")
      .as[(String, Long, Double, Double)].collect().toSeq
    // Wkly_Avg=10 -> Sugg_RP=ceil(12.5)=13; A1 |13-1|=12 flagged, A2 |13-13|=0 not
    assert(out == Seq(("A1", 40L, 13.0, 12.0)))
  }

  test("ZmachkPipeline cleans master data and detects new articles") {
    val raw = Seq(
      ("A1", "Widget", "M10", "03/15/1996", "1.5", "Y"),
      ("A2", "Gadget", "M11", "1996-04-01", "-", "Y"),
      ("A3", "Retired", "M12", "03/15/1996", "2.0", "N"))
      .toDF("Material", "Material Description", "Matl Group", "Valid From",
        "Gross Weight", "Status")
    val t = ZmachkPipeline.transform(raw)
    val rows = t.select(col("Article"), col("Valid_From_Date").cast("string"),
        col("Gross_Weight").cast("double"))
      .as[(String, String, Option[Double])].collect().toSet
    assert(rows == Set(
      ("A1", "1996-03-15", Some(1.5)),
      ("A2", "1996-04-01", None))) // status N dropped; dash -> null; both date formats parse
    val existing = Seq("A1").toDF("Article")
    val fresh = ZmachkPipeline.newArticles(t, existing)
      .select("Article").as[String].collect().toSeq
    assert(fresh == Seq("A2"))
  }

  test("ZmmidrDryPipeline filters dept by MCH prefix with zero-on-failure numerics") {
    val raw = Seq(
      ("000123", "106AB", "9891", "1,000.00"),
      ("000124", "106AB", "9891", "garbage"),
      ("000125", "107XX", "9891", "5.00"))
      .toDF("Article No", "MCH", "DC", "Unrestricted-Use Stock")
    val out = ZmmidrDryPipeline.transform(raw, to_date(lit("1996-03-15")))
      .select(col("Article"), col("Unrestricted-Use Stock").cast("double"),
        col("Article NoDC"))
      .as[(String, Double, String)].collect().toSet
    assert(out == Set(
      ("123", 1000.0, "9891123"),
      ("124", 0.0, "9891124"))) // dept 107 dropped; garbage -> 0.0 (dry-variant cleaner)
  }

  test("DimLoader covers every reference upload config") {
    // one config per excel_configs entry (etl_upload_excel.py:12-139)
    // plus dim_Article from the ZMACHK load
    assert(DimLoader.dims.map(_.source).toSet == Set(
      "Calendar", "WeekPeriod", "MCH_CM", "DC", "Site", "Customer",
      "Tawa_Fcst", "MCH-Dept head", "Division", "Article"))
    assert(DimLoader.config("Customer").keys == Seq("Sales_Group", "Sold_To"))
    assert(DimLoader.config("Tawa_Fcst").table == "fact_Forecast")
    assert(DimLoader.config("Tawa_Fcst").schema.fields.length == 15)
  }

  test("DimLoader schema-aligns, enforces the PK, and upserts (typed-dim shape)") {
    val dir = Files.createTempDirectory("dim").toFile
    val csv = new java.io.File(dir, "calendar.csv")
    Files.write(csv.toPath,
      ("Date,Wkday,Week,Period,Month,Quarter,Year,AcctWk,PromWk\n" +
        "1996-03-15,Fri,W11,P3,3,Q1,1996,199611,199611\n" +
        "1996-03-22,Fri,W12,P3,bad-month,Q1,1996,199612,199612\n").getBytes)
    val target = dir.getAbsolutePath + "/dim_Calendar"
    DimLoader.load(spark, DimLoader.config("Calendar"), csv.getAbsolutePath, target)
    val out = spark.read.parquet(target)
      .select(col("Date").cast("string"), col("Month"), col("AcctWk"))
      .as[(String, Option[Int], String)].collect().toSet
    assert(out == Set(
      ("1996-03-15", Some(3), "199611"),
      ("1996-03-22", None, "199612"))) // unparseable month -> null (coerce)
  }

  test("DimLoader composite-PK shape loads; PK violations abort before publish") {
    val dir = Files.createTempDirectory("dim2").toFile
    def write(name: String, body: String) = {
      val f = new java.io.File(dir, name)
      Files.write(f.toPath, body.getBytes); f.getAbsolutePath
    }
    val ok = write("cust.csv",
      "Sales_Group,Sold_To,Customer_Name,Channel,Sales_District,Sales_Office\n" +
        "G1,C1,Acme,WH,West,LA\nG1,C2,Bravo,WH,West,LA\n")
    val target = dir.getAbsolutePath + "/dim_WLChannel"
    DimLoader.load(spark, DimLoader.config("Customer"), ok, target)
    assert(spark.read.parquet(target).count() == 2)

    // duplicate composite key -> abort, target untouched
    val dup = write("cust_dup.csv",
      "Sales_Group,Sold_To,Customer_Name,Channel,Sales_District,Sales_Office\n" +
        "G1,C1,Acme,WH,West,LA\nG1,C1,AcmeAgain,WH,West,LA\n")
    val e = intercept[IllegalStateException] {
      DimLoader.load(spark, DimLoader.config("Customer"), dup, target)
    }
    assert(e.getMessage.contains("duplicate"))
    assert(spark.read.parquet(target).count() == 2)

    // unparseable int PK -> coerced to null -> abort
    val badInt = write("div.csv", "Division,Description\nnot-a-number,West\n")
    val e3 = intercept[IllegalStateException] {
      DimLoader.load(spark, DimLoader.config("Division"), badInt,
        dir.getAbsolutePath + "/Map_Division")
    }
    assert(e3.getMessage.contains("null key"))
  }

  test("ZinMchPipeline strips .0 artifacts, aligns dotted-name schema, replace sink") {
    val dir = Files.createTempDirectory("zinmch").toFile
    def write(name: String, body: String) = {
      val f = new java.io.File(dir, name)
      Files.write(f.toPath, body.getBytes); f.getAbsolutePath
    }
    val header = "Article No,MCH,Article Description,Article Description.1," +
      "Pack size,D/C MAP,Unrestricted-Use Stock,SCA Assortment,Assortment grade\n"
    val v1 = write("zin1.csv", header + "123.0,106AB.0,Widget,WidgetCN,12.0,1.55,10,Y.0,A\n")
    val target = dir.getAbsolutePath + "/Zmmidr_9801"
    ZinMchPipeline.run(spark, v1, target)
    val r = spark.read.parquet(target)
      .select(col("`Article No`"), col("MCH"), col("`Article Description.1`"),
        col("`Pack size`"), col("`D/C MAP`").cast("double"),
        col("`Unrestricted-Use Stock`"), col("`SCA Assortment`"))
      .as[(String, String, String, String, Double, Int, String)].head()
    assert(r == ("123", "106AB", "WidgetCN", "12", 1.55, 10, "Y"))
    assert(spark.read.parquet(target).schema.fieldNames.length == 15) // full declared schema

    // replace sink: a second load fully supersedes the first
    val v2 = write("zin2.csv", header + "999.0,106XY,Other,OtherCN,6,2.00,5,N,B\n")
    ZinMchPipeline.run(spark, v2, target)
    val arts = spark.read.parquet(target).select(col("`Article No`"))
      .as[String].collect().toSeq
    assert(arts == Seq("999"))
  }

  test("ZmmidrBUnPipeline: filename-derived DC, clean, keep-last, DC-group rollup") {
    val dir = Files.createTempDirectory("zmmidrbun").toFile
    def write(name: String, rows: Seq[String]): Unit =
      Files.write(new java.io.File(dir, name).toPath,
        (Seq("Article No,MCH,Unrestricted-Use Stock,On order Stock") ++ rows)
          .mkString("\n").getBytes("UTF-8"))
    write("Zmmidr_bun_106_9891_03151996.csv", Seq("000123,M1,\"1,000.00\",5.00", ",,0,0"))
    write("Zmmidr_bun_106_9801_03151996.csv", Seq("000123,M1,200.00,1.00"))
    write("Zmmidr_bun_106_9900_03151996.csv", Seq("000123,M1,50.00,2.00"))
    write("Zmmidr_bun_106_9777_03151996.csv", Seq("000123,M1,7.00,0.00")) // not in any group

    val raw = spark.read.option("header", "true")
      .csv(dir.getAbsolutePath + "/Zmmidr_bun_*.csv")
      .withColumn("_source_file", input_file_name())
    val t = ZmmidrBUnPipeline.transform(raw, to_date(lit("1996-03-15")))
    assert(t.count() == 4) // totals row dropped
    assert(ZmmidrBUnPipeline.dedupSnapshots(t).count() == 4) // distinct DCs

    val rollup = ZmmidrBUnPipeline.dcRollup(spark, t)
      .select(col("DC"), col("Article"), col("Article NoDC"),
        col("Unrestricted-Use Stock").cast("double"))
      .as[(String, String, String, Double)].collect().toSet
    assert(rollup == Set(
      ("9891", "123", "9891123", 1200.0), // SCA = 9891 + 9801
      ("9900", "123", "9900123", 50.0)))  // passthrough; 9777 dropped
  }

  test("DoneLog: pending anti-join is replay-idempotent and order-insensitive") {
    val dir = Files.createTempDirectory("donelog").toFile.getAbsolutePath
    val ledgerPath = dir + "/ledger"
    val units = (1 to 10).map(i => (s"u$i", s"payload$i")).toDF("unit", "body")

    val ledger0 = graft.io.DoneLog.readLedger(spark, ledgerPath, units, Seq("unit"))
    assert(graft.io.DoneLog.pending(units, ledger0, Seq("unit")).count() == 10)

    // process the first 4, twice (replay) — ledger reads stay idempotent
    val batch1 = units.filter(col("unit").isin("u1", "u2", "u3", "u4"))
    graft.io.DoneLog.recordDone(batch1, Seq("unit"), ledgerPath)
    graft.io.DoneLog.recordDone(batch1, Seq("unit"), ledgerPath)
    val ledger1 = graft.io.DoneLog.readLedger(spark, ledgerPath, units, Seq("unit"))
    val p1 = graft.io.DoneLog.pending(units, ledger1, Seq("unit"))
    assert(p1.count() == 6)

    // finish the rest in arbitrary split order; pending converges to zero
    graft.io.DoneLog.recordDone(p1.filter(col("unit") > "u7"), Seq("unit"), ledgerPath)
    graft.io.DoneLog.recordDone(p1.filter(col("unit") <= "u7"), Seq("unit"), ledgerPath)
    val ledger2 = graft.io.DoneLog.readLedger(spark, ledgerPath, units, Seq("unit"))
    assert(graft.io.DoneLog.pending(units, ledger2, Seq("unit")).count() == 0)
    // done-key rendering matches the reference's "_".join
    val dk = units.limit(1).select(
      graft.io.DoneLog.doneKey(Seq(col("unit"), col("body"))).as("k"))
      .as[String].head()
    assert(dk == "u1_payload1")
  }
}
