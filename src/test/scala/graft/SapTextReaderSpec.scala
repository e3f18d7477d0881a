package graft

import graft.clean.Clean
import graft.io.{SapTextReader, UpsertWriter}
import graft.pipelines.Zmb51Pipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SapTextReaderSpec extends SparkSpecBase {
  import spark.implicits._

  /** A faithful SAP "Text with Tabs" export: title row, blank row, header
    * with blank first column, data with SAP-formatted numbers, and a
    * trailing grand-total row with a null key. */
  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("saptxt").toFile
    val f = new java.io.File(dir, "ZMB51_0001.txt")
    val content = Seq(
      "Material Document List",
      "",
      "\tSite\tArticle\tQuantity i\tAmount LC\tPstng Date\tBUn",
      "\t1000\t000123\t5.000\t1,234.50-\t03/15/1996\tEA",
      "\t1000\t000123\t2.000\t200.00\t03/15/1996\tEA",
      "\t1001\t000777\t1.000-\t50.25\t03/16/1996\tCS",
      "\t\t\t8.000\t1,084.25\t\t" // grand-total row: null keys
    ).mkString("\n")
    Files.write(f.toPath, content.getBytes("UTF-8"))
    dir.getAbsolutePath
  }

  test("reads header, drops junk prefix and blank first column") {
    val df = SapTextReader.read(spark, writeFixture() + "/ZMB51_*.txt")
    assert(df.columns.toSeq ==
      Seq("Site", "Article", "Quantity i", "Amount LC", "Pstng Date", "BUn"))
    assert(df.count() == 4) // 3 data rows + totals row; no junk/header rows
    val totalsDropped = SapTextReader.dropTotalsRows(df, "Article")
    assert(totalsDropped.count() == 3)
  }

  test("padded / multi-space header cells: names normalize, header row does not leak") {
    val dir = Files.createTempDirectory("saptxtpad").toFile
    val f = new java.io.File(dir, "ZMB51_0002.txt")
    // header cells carry leading/trailing padding and doubled inner spaces,
    // the exact shape normalizeName exists for (etl_zmb51.py:55)
    val content = Seq(
      "Material Document List",
      "",
      "\t Site \tArticle\tQuantity  i\t Pstng  Date ",
      "\t1000\t000123\t5.000\t03/15/1996",
      "\t1001\t000777\t2.000\t03/16/1996"
    ).mkString("\n")
    Files.write(f.toPath, content.getBytes("UTF-8"))
    val df = SapTextReader.read(spark, dir.getAbsolutePath + "/ZMB51_*.txt")
    assert(df.columns.toSeq == Seq("Site", "Article", "Quantity i", "Pstng Date"))
    // 2 data rows only — the padded header row must not survive as data
    assert(df.count() == 2)
    assert(df.filter(col("Site") === " Site " || col("Site") === "Site").count() == 0)
  }

  test("header validation rejects a glob mixing different export layouts") {
    val dir = Files.createTempDirectory("saptxtmix").toFile
    def write(name: String, header: String): Unit =
      Files.write(new java.io.File(dir, name).toPath,
        Seq("Title", "", header, "\t1\t2").mkString("\n").getBytes("UTF-8"))
    write("ZX_0001.txt", "\tSite\tArticle")
    write("ZX_0002.txt", "\t Site \tArticle") // padding only: same normalized layout
    SapTextReader.validateHeaders(spark, dir.getAbsolutePath + "/ZX_*.txt") // ok
    assert(SapTextReader.read(spark, dir.getAbsolutePath + "/ZX_*.txt",
      checkHeaders = true).count() == 2)

    write("ZX_0003.txt", "\tArticle\tSite") // different column ORDER
    val e = intercept[IllegalStateException] {
      SapTextReader.read(spark, dir.getAbsolutePath + "/ZX_*.txt", checkHeaders = true)
    }
    assert(e.getMessage.contains("differs"))
  }

  test("full Zmb51 pipeline: scan -> clean -> aggregate -> upsert, replay-idempotent") {
    val in = writeFixture() + "/ZMB51_*.txt"
    val target = Files.createTempDirectory("upsert").toFile.getAbsolutePath + "/zmb51"

    Zmb51Pipeline.run(spark, in, target)
    val r1 = spark.read.parquet(target)
      .select(col("Article"), col("Site"), col("Quantity").cast("double"),
        col("Cost").cast("double"), col("BUn"))
      .as[(String, String, Double, Double, String)].collect().toSet
    // 000123@1000: qty -(5+2)=-7, cost -(-1234.50+200)=1034.50 (trailing minus)
    assert(r1 == Set(
      ("000123", "1000", -7.0, 1034.5, "EA"),
      ("000777", "1001", 1.0, -50.25, "CS")))

    Zmb51Pipeline.run(spark, in, target) // replay: MERGE semantics, same state
    val r2 = spark.read.parquet(target)
      .select(col("Article"), col("Site"), col("Quantity").cast("double"),
        col("Cost").cast("double"), col("BUn"))
      .as[(String, String, Double, Double, String)].collect().toSet
    assert(r2 == r1)
  }

  test("upsert writer overrides matched keys and keeps unmatched rows") {
    val target = Files.createTempDirectory("upsert2").toFile.getAbsolutePath + "/t"
    UpsertWriter.upsert(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), target, Seq("k"))
    UpsertWriter.upsert(spark, Seq((2, "B"), (3, "c")).toDF("k", "v"), target, Seq("k"))
    val out = spark.read.parquet(target).as[(Int, String)].collect().toSet
    assert(out == Set((1, "a"), (2, "B"), (3, "c")))
  }

  test("partitioned upsert rewrites only the partitions present in the batch") {
    val target = Files.createTempDirectory("pupsert").toFile.getAbsolutePath + "/fact"
    UpsertWriter.upsertPartitioned(spark,
      Seq((1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c")).toDF("k", "day", "v"),
      target, Seq("k", "day"), "day")

    val d2FilesBefore = new java.io.File(target, "day=d2").listFiles().map(_.getName).toSet
    // batch touches day=d1 only: update k=1, insert k=4
    UpsertWriter.upsertPartitioned(spark,
      Seq((1, "d1", "A"), (4, "d1", "d")).toDF("k", "day", "v"),
      target, Seq("k", "day"), "day")

    val out = spark.read.parquet(target).select("k", "day", "v")
      .as[(Int, String, String)].collect().toSet
    assert(out == Set((1, "d1", "A"), (2, "d1", "b"), (3, "d2", "c"), (4, "d1", "d")))
    // untouched partition's files were not rewritten
    val d2FilesAfter = new java.io.File(target, "day=d2").listFiles().map(_.getName).toSet
    assert(d2FilesAfter == d2FilesBefore)
  }

  test("partitioned upsert refuses a partition column outside the merge keys") {
    val target = Files.createTempDirectory("pupsert3").toFile.getAbsolutePath + "/fact"
    val e = intercept[IllegalArgumentException] {
      UpsertWriter.upsertPartitioned(spark,
        Seq((1, "d1", "a")).toDF("k", "day", "v"), target, Seq("k"), "day")
    }
    assert(e.getMessage.contains("migrate"))
  }

  test("partitioned upsert mid-swap crash rolls back to the pre-call state") {
    val target = Files.createTempDirectory("pupsert4").toFile.getAbsolutePath + "/fact"
    UpsertWriter.upsertPartitioned(spark,
      Seq((1, "d1", "a"), (2, "d2", "b"), (3, "d3", "c")).toDF("k", "day", "v"),
      target, Seq("k", "day"), "day")
    val before = spark.read.parquet(target).select("k", "day", "v")
      .as[(Int, String, String)].collect().toSet

    // batch touches all three partitions; crash injected after one swap
    val e = intercept[IllegalStateException] {
      UpsertWriter.upsertPartitionedImpl(spark,
        Seq((1, "d1", "A"), (2, "d2", "B"), (3, "d3", "C")).toDF("k", "day", "v"),
        target, Seq("k", "day"), "day",
        assumeKeyPartitionStable = false, failAfterSwaps = 1)
    }
    assert(e.getMessage.contains("injected"))
    // target is readable and byte-for-byte back to its previous content
    val after = spark.read.parquet(target).select("k", "day", "v")
      .as[(Int, String, String)].collect().toSet
    assert(after == before)
    // no trash/tmp litter left behind
    val parent = new java.io.File(target).getParentFile
    assert(!parent.listFiles().exists(f =>
      f.getName.endsWith(".__tmp") || f.getName.endsWith(".__trash")))
  }

  test("fileNameColumn extracts regex groups from the source path") {
    val df = SapTextReader.read(spark, writeFixture() + "/ZMB51_*.txt", withFileName = true)
      .withColumn("shard", SapTextReader.fileNameColumn("ZMB51_(\\d+)\\.txt", 1))
    assert(df.select("shard").distinct().as[String].collect().toSeq == Seq("0001"))
  }

  test("archiveInputs moves consumed files to processed/ with collision timestamp") {
    import graft.io.InputArchive
    val dir = Files.createTempDirectory("archive").toFile
    def touch(name: String): String = {
      val f = new java.io.File(dir, name)
      Files.write(f.toPath, "x".getBytes("UTF-8")); f.getAbsolutePath
    }
    val processed = new java.io.File(dir, "processed").getAbsolutePath
    val a = touch("ZMB51_0001.txt")

    // first archival: plain name
    val moved1 = InputArchive.archiveInputs(spark, Seq(a), processed, () => "199603150000")
    assert(moved1.map(m => new java.io.File(m._2).getName) == Seq("ZMB51_0001.txt"))
    assert(!new java.io.File(a).exists())
    assert(new java.io.File(processed, "ZMB51_0001.txt").exists())

    // same-named file consumed again: collision -> stem_<stamp>.suffix
    val b = touch("ZMB51_0001.txt")
    val moved2 = InputArchive.archiveInputs(spark, Seq(b), processed, () => "199603160000")
    assert(moved2.map(m => new java.io.File(m._2).getName) == Seq("ZMB51_0001_199603160000.txt"))
    assert(new java.io.File(processed, "ZMB51_0001_199603160000.txt").exists())

    // third collision with the SAME stamp must fail loudly, never overwrite
    val c = touch("ZMB51_0001.txt")
    val e = intercept[IllegalStateException] {
      InputArchive.archiveInputs(spark, Seq(c), processed, () => "199603160000")
    }
    assert(e.getMessage.contains("cannot archive"))
    assert(new java.io.File(c).exists()) // source untouched on failure

    // glob form archives exactly the current matches (c still pending from
    // the failed attempt, plus a new promo file), not the processed dir
    val d = touch("ZSTPROMO_01.txt")
    val moved3 = InputArchive.archiveGlob(spark, s"$dir/*.txt", processed, () => "0")
    assert(moved3.map(m => new java.io.File(m._1).getName).toSet ==
      Set("ZMB51_0001.txt", "ZSTPROMO_01.txt"))
    assert(new java.io.File(processed, "ZMB51_0001_0.txt").exists()) // c collided -> stamped
    assert(new java.io.File(processed, "ZSTPROMO_01.txt").exists())
    assert(!new java.io.File(d).exists())
  }
}
