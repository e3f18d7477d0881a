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

  test("ZrssalePipeline filters ZTTG and keeps line grain; articleMaster dedups") {
    val raw = Seq(
      ("B1", "10", "A1", "ZTTG", "03/01/1996", "5.0", "100.00", "1.0"),
      ("B1", "20", "A1", "ZTTG", "03/01/1996", "2.0", "40.00", "1.0"),
      ("B2", "10", "A2", "OTHER", "03/01/1996", "9.0", "90.00", "1.0"))
      .toDF("Bill.Doc.", "Item", "Material", "Article_Type", "Billing Date",
        "Bill. Qty", "Net Value", "Cost")
    val lines = ZrssalePipeline.transform(raw)
    assert(lines.count() == 2) // OTHER filtered out
    val master = ZrssalePipeline.articleMaster(lines)
      .select("Article", "Bill_Doc", "Item").as[(String, String, String)].collect().toSeq
    assert(master == Seq(("A1", "B1", "10"))) // keep-first on (Bill_Doc, Item)
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

  test("DimLoader schema-aligns and upserts a dimension") {
    val dir = Files.createTempDirectory("dim").toFile
    val csv = new java.io.File(dir, "calendar.csv")
    Files.write(csv.toPath,
      "Date,AcctWk,Period\n1996-03-15,11,P3\n1996-03-22,twelve,P3\n".getBytes)
    val target = dir.getAbsolutePath + "/dim_Calendar"
    DimLoader.load(spark, DimLoader.dims.head, csv.getAbsolutePath, target)
    val out = spark.read.parquet(target)
      .select(col("Date").cast("string"), col("AcctWk"), col("Period"))
      .as[(String, Option[Int], String)].collect().toSet
    assert(out == Set(
      ("1996-03-15", Some(11), "P3"),
      ("1996-03-22", None, "P3"))) // unparseable week -> null (coerce)
  }
}
