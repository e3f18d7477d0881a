package graft.io

import java.io.OutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal single-sheet XLSX export — the write half of the reference's
  * Excel side-exports (pipelines/etl_utils.py to_excel paths), JDK-only
  * like [[XlsxReader]]. Strings go as inline strings (no shared-string
  * table: simplest valid form, and the reader handles both), numbers as
  * number cells with their Java lexical form (Long without a decimal
  * point, Double via Double.toString — both round-trip exactly through
  * [[XlsxReader]] + a cast). One sheet, one header row; an xlsx is
  * inherently a single in-memory unit, so the caller streams rows in
  * (Iterator — a large export never materializes twice) and the natural
  * Spark hookup is `df.toLocalIterator` for the same reasons the
  * single-file CSV export exists (SURVEY S9).
  */
object XlsxWriter {

  def write(out: OutputStream, header: Seq[String],
            rows: Iterator[Seq[Any]], sheetName: String = "Sheet1"): Unit = {
    val zip = new ZipOutputStream(out)
    def entry(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(body.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    try {
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      entry("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${escape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      // the worksheet is streamed row by row into the zip entry
      zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      def w(s: String): Unit = zip.write(s.getBytes(StandardCharsets.UTF_8))
      w("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      var rowNum = 1
      def writeRow(cells: Seq[Any]): Unit = {
        w(s"""<row r="$rowNum">""")
        cells.zipWithIndex.foreach { case (v, i) =>
          val ref = s"${colName(i)}$rowNum"
          v match {
            case null => // absent cell
            // NaN/Infinity are not SpreadsheetML numbers (Excel would
            // flag the file corrupt): store their lexical form as a
            // string — Spark's string->double cast round-trips it
            case d: Double if d.isNaN || d.isInfinite =>
              w(s"""<c r="$ref" t="inlineStr"><is><t>$d</t></is></c>""")
            case f: Float if f.isNaN || f.isInfinite =>
              w(s"""<c r="$ref" t="inlineStr"><is><t>$f</t></is></c>""")
            case n @ (_: Long | _: Int | _: Short | _: Byte | _: Double |
                      _: Float | _: java.math.BigDecimal | _: BigDecimal) =>
              w(s"""<c r="$ref"><v>$n</v></c>""")
            case b: Boolean =>
              w(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
            case other =>
              w(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${escape(other.toString)}</t></is></c>""")
          }
        }
        w("</row>")
        rowNum += 1
      }
      writeRow(header)
      rows.foreach(writeRow)
      w("</sheetData></worksheet>")
      zip.closeEntry()
    } finally zip.close()
  }

  /** Write to a local path (creates parent dirs). */
  def writeFile(path: String, header: Seq[String],
                rows: Iterator[Seq[Any]]): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val out = java.nio.file.Files.newOutputStream(p)
    try write(out, header, rows) finally out.close()
  }

  /** XML-escape plus OOXML ST_Xstring escaping: control characters are
    * ILLEGAL in XML 1.0 even as character references, so SpreadsheetML
    * stores them as `_xHHHH_` (CR included — a raw CR survives the XML
    * but the parser normalizes it away on read). A literal `_x` in the
    * data gets its underscore escaped as `_x005F_` so it can never be
    * misread as an escape; [[XlsxReader]] reverses both. */
  private def escape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '&' => b.append("&amp;")
        case '<' => b.append("&lt;")
        case '>' => b.append("&gt;")
        case '"' => b.append("&quot;")
        case '\t' | '\n' => b.append(c)
        case '_' if i + 1 < s.length && s.charAt(i + 1) == 'x' =>
          b.append("_x005F_")
        case _ if c < 0x20 => b.append(f"_x${c.toInt}%04X_")
        case _ => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** 0 -> A, 25 -> Z, 26 -> AA ... (inverse of XlsxReader.colOf). */
  private[graft] def colName(idx: Int): String = {
    var i = idx + 1
    val b = new StringBuilder
    while (i > 0) {
      val r = (i - 1) % 26
      b.insert(0, ('A' + r).toChar)
      i = (i - 1) / 26
    }
    b.toString
  }
}
