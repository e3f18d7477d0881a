package graft.io

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX ingestion — the reference reads Excel everywhere
  * (pipelines/etl_zmmidr_oun.py:26-33, etl_upload_excel.py:143); this
  * closes that input format with ZERO dependencies: an .xlsx file is a
  * zip of XML parts, and the JDK ships both the zip codec
  * (java.util.zip) and a streaming XML parser (javax.xml.stream).
  *
  * Bounded scope, stated plainly:
  *   - cell values surface as STRINGS (shared strings, inline strings,
  *     formula caches, booleans, and numbers as their stored lexical
  *     form) — exactly the `dtype=str` posture the engine's SAP text
  *     reader takes, with [[graft.clean.Clean]] owning typing;
  *   - date cells surface as their stored serial number (styling is
  *     presentation, not data);
  *   - no formula EVALUATION (the cached `<v>` is used, as pandas does).
  *
  * Scale: one .xlsx is inherently one in-memory unit (the zip central
  * directory sits at the END of the stream — there is no row-streaming
  * a remote xlsx without reading it all), so the unit of parallelism is
  * the FILE: [[readDir]] distributes parsing across executors via the
  * binaryFile source, one workbook per task, which is the right shape
  * for the reference's many-small-dimension-uploads workload. Parsing
  * itself is StAX streaming — no DOM materialization — and external
  * entities/DTDs are disabled (untrusted workbook ≠ file read on the
  * executor).
  */
object XlsxReader {

  /** Read ONE workbook file into string cells: first row = header,
    * remaining rows = data, columns named by the header (empty header
    * cells become _c<i>). `sheet` selects by name, `sheetIndex` by
    * 0-based workbook-order position (at most one of the two); default
    * first sheet. */
  def read(spark: SparkSession, path: String,
           sheet: Option[String] = None,
           sheetIndex: Option[Int] = None): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val rows = parseSheet(bytes, sheet, sheetIndex)
    require(rows.nonEmpty, s"$path: sheet has no rows")
    val schema = headerSchema(rows.head)
    val data = rows.tail.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(pad(r, schema.size, s"$path row ${i + 2}"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, math.max(1, data.size / 10000)),
      schema)
  }

  /** Read a DIRECTORY of same-schema workbooks, parsed in parallel
    * across executors (one file per task — the xlsx unit of work). The
    * schema comes from the first file's header; every file's header row
    * is dropped and must match (mismatches fail loudly per file, naming
    * it). The source glob + modifiedAfter pruning and non-driver file
    * listing come from Spark's binaryFile source. */
  def readDir(spark: SparkSession, dir: String, glob: String = "*.xlsx",
              sheet: Option[String] = None,
              sheetIndex: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").option("pathGlobFilter", glob)
      .load(dir).select("path", "content")
    // schema file = FIRST BY PATH (binaryFile orders by size — an
    // arbitrary 'first' would blame the wrong files on mismatch), and an
    // empty directory fails naming the dir, not with an empty-iterator
    val firstRows = files.orderBy("path").limit(1).collect()
    require(firstRows.nonEmpty, s"$dir: no workbooks match glob '$glob'")
    val header = parseSheet(firstRows(0).getAs[Array[Byte]]("content"), sheet, sheetIndex)
      .headOption.getOrElse(throw new IllegalArgumentException(
        s"${firstRows(0).getAs[String]("path")}: sheet has no rows"))
    val schema = headerSchema(header)
    val n = schema.size
    val sheetName = sheet // serializable capture
    val sheetIdx = sheetIndex
    val parsed = files.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      val rows = parseSheet(bytes, sheetName, sheetIdx)
      val fileHeader = rows.headOption.getOrElse(
        throw new IllegalArgumentException(s"$path: sheet has no rows"))
      if (fileHeader != header)
        throw new IllegalArgumentException(
          s"$path: header ${fileHeader.mkString("|")} does not match " +
            s"the directory schema ${header.mkString("|")}")
      rows.tail.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(pad(r, n, s"$path row ${i + 2}"))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    parsed.toDF(schema.fieldNames.toSeq: _*)
  }

  private def headerSchema(header: Vector[String]): StructType =
    StructType(header.zipWithIndex.map { case (h, i) =>
      StructField(if (h == null || h.isEmpty) s"_c$i" else h, StringType)
    })

  /** Right-pad a row to the schema width. A WIDER row is refused loudly
    * (silently dropping trailing cells would lose data; the reference's
    * totals/junk-row handling belongs to the cleaning layer, not here). */
  private[graft] def pad(r: Vector[String], n: Int, what: => String): Vector[String] = {
    require(r.size <= n,
      s"$what has ${r.size} cells, wider than the $n-column header")
    if (r.size == n) r else r ++ Vector.fill(n - r.size)(null)
  }

  // ---------------------------------------------------------------- parse

  /** All rows of the chosen sheet as string cells (null for absent
    * cells inside a row; trailing absent cells omitted). Select by name
    * OR by 0-based workbook-order index, never both. */
  private[graft] def parseSheet(bytes: Array[Byte],
                             sheet: Option[String],
                             sheetIndex: Option[Int] = None): Vector[Vector[String]] = {
    require(sheet.isEmpty || sheetIndex.isEmpty,
      "select a sheet by name OR by index, not both")
    val parts = zipEntries(bytes)
    def part(name: String): Option[Array[Byte]] = parts.get(name)
    val shared = part("xl/sharedStrings.xml").map(parseSharedStrings)
      .getOrElse(Vector.empty)
    val sheetPath = (sheet, sheetIndex) match {
      case (None, None) =>
        // first sheet in WORKBOOK order (not zip order): resolve via rels
        val (names, rels) = workbookSheets(parts)
        names.headOption.map(n => rels(n)).getOrElse("xl/worksheets/sheet1.xml")
      case (Some(name), _) =>
        val (names, rels) = workbookSheets(parts)
        require(names.contains(name),
          s"sheet '$name' not found (have ${names.mkString(", ")})")
        rels(name)
      case (None, Some(idx)) =>
        val (names, rels) = workbookSheets(parts)
        require(idx >= 0 && idx < names.size,
          s"sheet index $idx out of range (workbook has ${names.size} " +
            s"sheet(s): ${names.mkString(", ")})")
        rels(names(idx))
    }
    val sheetBytes = part(sheetPath).getOrElse(throw new IllegalArgumentException(
      s"workbook part $sheetPath missing"))
    parseWorksheet(sheetBytes, shared)
  }

  /** Every zip entry we may need, streamed once (ZipInputStream reads the
    * local headers sequentially — fine for whole-file byte arrays). */
  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .filter { e =>
          val n = e.getName
          !e.isDirectory && (n == "xl/workbook.xml" ||
            n == "xl/_rels/workbook.xml.rels" || n == "xl/sharedStrings.xml" ||
            n.startsWith("xl/worksheets/"))
        }
        .map(e => e.getName -> zin.readAllBytes())
        .toMap
    } finally zin.close()
  }

  /** Hardened StAX reader: no DTDs, no external entities — a workbook is
    * untrusted input and must not be able to read executor-local files. */
  private def xmlReader(bytes: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** Sheet names in workbook order plus name -> worksheet part path
    * (through xl/_rels: sheet order in the zip is NOT authoritative). */
  private def workbookSheets(parts: Map[String, Array[Byte]])
      : (Vector[String], Map[String, String]) = {
    val relTargets: Map[String, String] = parts.get("xl/_rels/workbook.xml.rels")
      .map { b =>
        val r = xmlReader(b)
        try {
          val m = Map.newBuilder[String, String]
          while (r.hasNext) {
            if (r.next() == XMLStreamConstants.START_ELEMENT &&
                r.getLocalName == "Relationship") {
              val id = r.getAttributeValue(null, "Id")
              val target = r.getAttributeValue(null, "Target")
              if (id != null && target != null)
                m += id -> (if (target.startsWith("/")) target.drop(1)
                            else "xl/" + target)
            }
          }
          m.result()
        } finally r.close()
      }.getOrElse(Map.empty)
    parts.get("xl/workbook.xml").map { b =>
      val r = xmlReader(b)
      try {
        val names = Vector.newBuilder[String]
        val byName = Map.newBuilder[String, String]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "sheet") {
            val name = r.getAttributeValue(null, "name")
            // the r:id attribute lives in the officeDocument
            // relationships namespace; match by local name
            val rid = (0 until r.getAttributeCount)
              .find(i => r.getAttributeLocalName(i) == "id")
              .map(r.getAttributeValue)
            val target = rid.flatMap(relTargets.get)
            if (name != null && target.isDefined) {
              names += name
              byName += name -> target.get
            }
          }
        }
        (names.result(), byName.result())
      } finally r.close()
    }.getOrElse((Vector.empty, Map.empty))
  }

  /** sharedStrings.xml: one concatenated string per `<si>` (rich-text
    * items split one logical string across several `<t>` runs). */
  private[graft] def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = xmlReader(bytes)
    try {
      val out = Vector.newBuilder[String]
      var cur: java.lang.StringBuilder = null
      var inT = false
      var inPhonetic = false // <rPh>/<phoneticPr> runs are hints, not data
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "si" => cur = new java.lang.StringBuilder()
            case "rPh" => inPhonetic = true
            case "t" if cur != null && !inPhonetic => inT = true
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "t" => inT = false
            case "rPh" => inPhonetic = false
            case "si" => out += unescapeX(cur.toString); cur = null
            case _ =>
          }
          case _ =>
        }
      }
      out.result()
    } finally r.close()
  }

  /** One worksheet: `<row>` elements with `<c r="B3" t="...">` cells.
    * Cell types: `s` shared-string index, `inlineStr` nested `<is><t>`,
    * `b` boolean (0/1 -> false/true), everything else (numbers, `str`
    * formula caches) the raw `<v>` text. Absent cells inside a row are
    * null — the `r` attribute carries the true column. */
  private[graft] def parseWorksheet(bytes: Array[Byte],
                                 shared: Vector[String]): Vector[Vector[String]] = {
    val r = xmlReader(bytes)
    try {
      val rows = Vector.newBuilder[Vector[String]]
      var cells: scala.collection.mutable.ArrayBuffer[String] = null
      var colIdx = -1 // current cell's column
      var cellType: String = null
      var text: java.lang.StringBuilder = null
      var capture = false
      var inIs = false
      var inPhonetic = false

      def put(idx: Int, v: String): Unit = {
        while (cells.size <= idx) cells += null
        cells(idx) = v
      }

      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" =>
              cells = scala.collection.mutable.ArrayBuffer.empty[String]
            case "c" if cells != null =>
              val ref = r.getAttributeValue(null, "r")
              colIdx = if (ref != null) colOf(ref) else cells.size
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              text = null
            case "is" => inIs = true
            case "rPh" => inPhonetic = true
            case "v" => text = new java.lang.StringBuilder(); capture = true
            case "t" if inIs && !inPhonetic =>
              if (text == null) text = new java.lang.StringBuilder()
              capture = true
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (capture) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "v" | "t" => capture = false
            case "rPh" => inPhonetic = false
            case "is" => inIs = false
            case "c" if cells != null && colIdx >= 0 =>
              val raw = if (text == null) null else text.toString
              val v = (cellType, raw) match {
                case (_, null) => null
                case ("s", s) => shared(s.trim.toInt) // already unescaped
                case ("b", s) => if (s.trim == "1") "true" else "false"
                case ("inlineStr" | "str", s) => unescapeX(s)
                case (_, s) => s
              }
              if (v != null) put(colIdx, v)
              colIdx = -1
            case "row" =>
              rows += cells.toVector
              cells = null
            case _ =>
          }
          case _ =>
        }
      }
      rows.result()
    } finally r.close()
  }

  /** Reverse OOXML ST_Xstring escaping: `_xHHHH_` -> the character
    * (control characters are illegal in XML 1.0 even as references, so
    * producers store them this way; `_x005F_` is an escaped underscore).
    * No-op for strings without the marker. */
  private[graft] def unescapeX(s: String): String = {
    if (!s.contains("_x")) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (i + 7 <= s.length && s.charAt(i) == '_' &&
          s.charAt(i + 1) == 'x' && s.charAt(i + 6) == '_' &&
          (2 to 5).forall(k => Character.digit(s.charAt(i + k), 16) >= 0)) {
        b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
        i += 7
      } else {
        b.append(s.charAt(i))
        i += 1
      }
    }
    b.toString
  }

  /** "BC12" -> zero-based column index (A=0, Z=25, AA=26, ...). */
  private[graft] def colOf(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }
}
