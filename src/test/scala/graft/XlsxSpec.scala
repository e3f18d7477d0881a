package graft

import graft.io.{XlsxReader, XlsxWriter}

/** The JDK-only xlsx reader/writer pair: writer output must round-trip
  * through the reader (escaping, types, absent cells), the reader must
  * handle the parts a foreign producer emits (shared strings with
  * rich-text runs, sparse cell references, multi-sheet workbooks with
  * workbook-order resolution through the rels), and the directory form
  * must parse files on executors against one schema.
  */
class XlsxSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_xlsx").toFile
    d.deleteOnExit()
    d
  }

  test("writer -> reader round trip: types, escaping, absent cells") {
    val dir = tmpDir()
    val f = new java.io.File(dir, "t.xlsx").getAbsolutePath
    XlsxWriter.writeFile(f, Seq("id", "name", "bal", "flag"),
      Iterator(
        Seq(1L, "Ann & Bob <AG>", 12.5, true),
        Seq(2L, "\"quoted\" ünïcôde", -3.25, false),
        Seq(3L, null, 7.0, null),
        Seq(4L, "", 0.0, true)))
    val df = XlsxReader.read(spark, f)
    assert(df.columns.toSeq == Seq("id", "name", "bal", "flag"))
    val rows = df.as[(String, String, String, String)].collect().sortBy(_._1)
    assert(rows(0) == (("1", "Ann & Bob <AG>", "12.5", "true")))
    assert(rows(1) == (("2", "\"quoted\" ünïcôde", "-3.25", "false")))
    assert(rows(2) == (("3", null, "7.0", null)))
    // empty string cell survives as empty, not null
    assert(rows(3) == (("4", "", "0.0", "true")))
  }

  test("reader handles shared strings, rich text, sparse cells, sheet choice") {
    // hand-built workbook the writer never produces: sharedStrings with a
    // rich-text item split across <t> runs, cells skipping columns, two
    // sheets listed in workbook order that DIFFERS from part numbering
    def zip(entries: (String, String)*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (n, body) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n))
        z.write(body.getBytes("UTF-8"))
        z.closeEntry()
      }
      z.close()
      bos.toByteArray
    }
    val wb = zip(
      "xl/workbook.xml" ->
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets>
          |<sheet name="Main" sheetId="1" r:id="rId7"/>
          |<sheet name="Other" sheetId="2" r:id="rId8"/>
          |</sheets></workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId8" Type="w" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId7" Type="w" Target="worksheets/sheet2.xml"/>
          |</Relationships>""".stripMargin,
      "xl/sharedStrings.xml" ->
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
          |<si><t>plain</t></si>
          |<si><r><t>rich </t></r><r><t>text</t></r></si>
          |<si><t xml:space="preserve"> padded </t></si>
          |</sst>""".stripMargin,
      // sheet2.xml IS the first workbook sheet ("Main")
      "xl/worksheets/sheet2.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>
          |<row r="2"><c r="A2"><v>42</v></c><c r="B2" t="s"><v>2</v></c><c r="C2" t="inlineStr"><is><t>inline</t></is></c></row>
          |<row r="3"><c r="C3" t="b"><v>1</v></c></row>
          |</sheetData></worksheet>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="inlineStr"><is><t>otherHdr</t></is></c></row>
          |<row r="2"><c r="A2"><v>9</v></c></row>
          |</sheetData></worksheet>""".stripMargin)

    val rows = XlsxReader.parseSheet(wb, None) // default = first WORKBOOK sheet
    assert(rows == Vector(
      Vector("plain", null, "rich text"),
      Vector("42", " padded ", "inline"),
      Vector(null, null, "true")))
    val other = XlsxReader.parseSheet(wb, Some("Other"))
    assert(other == Vector(Vector("otherHdr"), Vector("9")))
    val err = intercept[IllegalArgumentException](
      XlsxReader.parseSheet(wb, Some("nope")))
    assert(err.getMessage.contains("not found"))
    // selection by 0-based WORKBOOK-order index: 0 = "Main" (which lives
    // in sheet2.xml — part numbering is not authoritative), 1 = "Other"
    assert(XlsxReader.parseSheet(wb, None, Some(0)) == rows)
    assert(XlsxReader.parseSheet(wb, None, Some(1)) == other)
    val oob = intercept[IllegalArgumentException](
      XlsxReader.parseSheet(wb, None, Some(2)))
    assert(oob.getMessage.contains("out of range"))
    intercept[IllegalArgumentException](
      XlsxReader.parseSheet(wb, Some("Other"), Some(1))) // name XOR index
    // the full file-level read of sheet 2, by name and by index
    val f = java.io.File.createTempFile("graft_2sheet", ".xlsx")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, wb)
    val byName = XlsxReader.read(spark, f.getAbsolutePath, sheet = Some("Other"))
    assert(byName.columns.toSeq == Seq("otherHdr"))
    assert(byName.collect().map(_.getString(0)).toSeq == Seq("9"))
    val byIdx = XlsxReader.read(spark, f.getAbsolutePath, sheetIndex = Some(1))
    assert(byIdx.columns.toSeq == Seq("otherHdr"))
    assert(byIdx.collect().map(_.getString(0)).toSeq == Seq("9"))
  }

  test("readDir parses workbooks on executors against one schema") {
    val dir = tmpDir()
    XlsxWriter.writeFile(new java.io.File(dir, "a.xlsx").getAbsolutePath,
      Seq("k", "v"), Iterator(Seq(1L, "x"), Seq(2L, "y")))
    XlsxWriter.writeFile(new java.io.File(dir, "b.xlsx").getAbsolutePath,
      Seq("k", "v"), Iterator(Seq(3L, "z")))
    val df = XlsxReader.readDir(spark, dir.getAbsolutePath)
    assert(df.columns.toSeq == Seq("k", "v"))
    assert(df.as[(String, String)].collect().toSet
      == Set(("1", "x"), ("2", "y"), ("3", "z")))

    // a file with a different header fails loudly, naming the file
    XlsxWriter.writeFile(new java.io.File(dir, "c.xlsx").getAbsolutePath,
      Seq("wrong", "hdr"), Iterator(Seq(9L, "q")))
    val err = intercept[org.apache.spark.SparkException](
      XlsxReader.readDir(spark, dir.getAbsolutePath).count())
    assert(err.getMessage.contains("does not match") ||
      Option(err.getCause).exists(_.getMessage.contains("does not match")))
  }

  test("control chars and _x literals round-trip via ST_Xstring escaping") {
    val dir = tmpDir()
    val f = new java.io.File(dir, "x.xlsx").getAbsolutePath
    //  is illegal in XML 1.0 even as a reference; \r is normalized
    // away by conformant parsers unless escaped; a literal "_x0041_"
    // lookalike must survive as TEXT, not decode to 'A'
    XlsxWriter.writeFile(f, Seq("v"), Iterator(
      Seq("ab"), Seq("line1\r\nline2"), Seq("_x0041_ raw"),
      Seq(Double.NaN), Seq(Double.PositiveInfinity)))
    val got = XlsxReader.read(spark, f).as[String].collect().toSeq
    assert(got(0) == "ab")
    assert(got(1) == "line1\r\nline2")
    assert(got(2) == "_x0041_ raw")
    assert(got(3) == "NaN" && got(4) == "Infinity")
    // and a foreign producer's escape decodes
    assert(XlsxReader.unescapeX("_x000D_") == "\r")
    assert(XlsxReader.unescapeX("_x005F_x0041_") == "_x0041_")
    assert(XlsxReader.unescapeX("_xZZZZ_") == "_xZZZZ_") // not an escape
  }

  test("phonetic rPh runs are hints, not data") {
    def zip(entries: (String, String)*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (n, body) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n))
        z.write(body.getBytes("UTF-8"))
        z.closeEntry()
      }
      z.close()
      bos.toByteArray
    }
    val wb = zip(
      "xl/sharedStrings.xml" ->
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<si><t>値</t><rPh sb="0" eb="1"><t>アタイ</t></rPh><phoneticPr fontId="1"/></si>
          |</sst>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    assert(XlsxReader.parseSheet(wb, None) == Vector(Vector("値")))
  }

  test("rows wider than the header are refused loudly") {
    def zip(entries: (String, String)*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (n, body) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n))
        z.write(body.getBytes("UTF-8"))
        z.closeEntry()
      }
      z.close()
      bos.toByteArray
    }
    val dir = tmpDir()
    val wb = zip("xl/worksheets/sheet1.xml" ->
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    val f = new java.io.File(dir, "wide.xlsx")
    java.nio.file.Files.write(f.toPath, wb)
    val err = intercept[IllegalArgumentException](
      XlsxReader.read(spark, f.getAbsolutePath).collect())
    assert(err.getMessage.contains("wider than"))
  }

  test("readDir on an empty directory names the dir and glob") {
    val dir = tmpDir()
    val err = intercept[IllegalArgumentException](
      XlsxReader.readDir(spark, dir.getAbsolutePath))
    assert(err.getMessage.contains("no workbooks match"))
  }

  test("column name <-> index are inverse (property)") {
    (0 until 1000).foreach { i =>
      assert(XlsxReader.colOf(XlsxWriter.colName(i) + "1") == i, s"i=$i")
    }
    assert(XlsxWriter.colName(0) == "A" && XlsxWriter.colName(25) == "Z" &&
      XlsxWriter.colName(26) == "AA" && XlsxWriter.colName(701) == "ZZ" &&
      XlsxWriter.colName(702) == "AAA")
  }
}
