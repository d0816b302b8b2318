package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** XLSX sheet scan (SURVEY §2.1 S2; reference
  * src/gomus/_utils/fetch_report_helper.py:62-68 `csv_from_excel`: xlrd
  * sheet-by-index extraction of the downloaded gomus report workbooks).
  *
  * An .xlsx file is a zip of XML parts; this reader uses only the JDK
  * (java.util.zip + the StAX pull parser), no external library. Parity
  * points with the reference's xlrd path:
  *  - sheets are resolved by WORKBOOK ORDER (xl/workbook.xml declaration
  *    order through the relationship targets), which is what xlrd's
  *    `sheet_by_index` does — not by worksheet file name;
  *  - shared strings, inline strings, cached formula strings, and
  *    rich-text runs (concatenated `<t>` runs) all yield their text;
  *  - sparse rows/cells (OOXML omits empty cells and rows) surface as
  *    nulls at their proper grid position, like xlrd's empty cells;
  *  - date cells stay raw Excel serial numbers (decoded downstream by the
  *    P7 serial-date expression, exactly like the reference decodes the
  *    CSV'd serials in orders.py:86-87).
  * All cell values are emitted as strings (numbers keep their literal
  * `<v>` text, booleans become "true"/"false", error cells null); typing
  * is the downstream schema's job, mirroring Sources.typedCsv.
  *
  * Scale: [[readSheet]] scans a DIRECTORY of workbooks via Spark's
  * `binaryFile` source — one task per file, so a capture of thousands of
  * per-day report workbooks parses in parallel across executors; only the
  * header row of the first file is touched on the driver. A workbook is
  * one report (MBs at most), so per-task memory is bounded.
  *
  * Security: the StAX factory disables DTDs and external entities — a
  * hostile workbook cannot trigger XXE or entity-expansion blowup.
  */
object Xlsx {

  private def inputFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f
  }

  /** All zip entries we may need, keyed by normalized path. Bounded: only
    * workbook/worksheet/sharedStrings/rels parts are retained. */
  private def parts(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val keep = mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/workbook.xml" || name == "xl/sharedStrings.xml" ||
          name == "xl/_rels/workbook.xml.rels" ||
          (name.startsWith("xl/worksheets/") && name.endsWith(".xml"))) {
          val buf = new ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
          keep(name) = buf.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    keep.toMap
  }

  /** Worksheet part paths in workbook declaration order (xlrd's
    * sheet_by_index order): workbook.xml lists `<sheet r:id=…>` in order;
    * the rels part maps each r:id to its worksheet target. Falls back to
    * numeric sheetN.xml order when either part is missing. */
  private def sheetPaths(p: Map[String, Array[Byte]]): Vector[String] = {
    val resolved = for {
      wb <- p.get("xl/workbook.xml")
      rels <- p.get("xl/_rels/workbook.xml.rels")
    } yield {
      val ridToTarget = mutable.Map.empty[String, String]
      val rr = inputFactory().createXMLStreamReader(new ByteArrayInputStream(rels))
      try {
        while (rr.hasNext) {
          if (rr.next() == XMLStreamConstants.START_ELEMENT &&
            rr.getLocalName == "Relationship") {
            val id = rr.getAttributeValue(null, "Id")
            val target = rr.getAttributeValue(null, "Target")
            if (id != null && target != null) ridToTarget(id) = target
          }
        }
      } finally rr.close()
      val order = mutable.ArrayBuffer.empty[String]
      val wr = inputFactory().createXMLStreamReader(new ByteArrayInputStream(wb))
      try {
        while (wr.hasNext) {
          if (wr.next() == XMLStreamConstants.START_ELEMENT &&
            wr.getLocalName == "sheet") {
            // r:id lives in the officeDocument relationships namespace;
            // match by local name to tolerate prefix variations.
            var rid: String = null
            var i = 0
            while (i < wr.getAttributeCount) {
              if (wr.getAttributeLocalName(i) == "id")
                rid = wr.getAttributeValue(i)
              i += 1
            }
            ridToTarget.get(if (rid == null) "" else rid).foreach { t =>
              val norm =
                if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t"
              order += norm
            }
          }
        }
      } finally wr.close()
      order.toVector.filter(p.contains)
    }
    resolved.filter(_.nonEmpty).getOrElse {
      p.keys.filter(_.startsWith("xl/worksheets/")).toVector
        .sortBy(n => (n.replaceAll("\\D", "") match {
          case "" => Long.MaxValue
          case d => d.toLong
        }, n))
    }
  }

  /** Shared-string table: one entry per `<si>`, rich-text runs
    * concatenated (all descendant `<t>` text). */
  private def sharedStrings(p: Map[String, Array[Byte]]): IndexedSeq[String] =
    p.get("xl/sharedStrings.xml") match {
      case None => IndexedSeq.empty
      case Some(bytes) =>
        val out = mutable.ArrayBuffer.empty[String]
        val r = inputFactory().createXMLStreamReader(new ByteArrayInputStream(bytes))
        try {
          var sb: StringBuilder = null
          var inT = false
          while (r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                r.getLocalName match {
                  case "si" => sb = new StringBuilder
                  case "t" => inT = true
                  case _ =>
                }
              case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
                if (inT && sb != null) sb.append(r.getText)
              case XMLStreamConstants.END_ELEMENT =>
                r.getLocalName match {
                  case "si" => out += sb.toString; sb = null
                  case "t" => inT = false
                  case _ =>
                }
              case _ =>
            }
          }
        } finally r.close()
        out.toIndexedSeq
    }

  /** "BC" → 55 (1-based column index from an A1-style reference's letter
    * prefix). */
  private def colIndex(ref: String): Int = {
    var i = 0
    var n = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      n = n * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    n
  }

  /** Parse one sheet of an xlsx byte array into a dense row-major grid of
    * cell strings (null = empty cell), INCLUDING the header row. Grid
    * height/width = last occupied row/column, like xlrd's nrows/ncols. */
  def sheetRows(bytes: Array[Byte], sheetIndex: Int = 0): Vector[Array[String]] = {
    val p = parts(bytes)
    val paths = sheetPaths(p)
    require(sheetIndex >= 0 && sheetIndex < paths.length,
      s"sheet index $sheetIndex out of range (${paths.length} sheets)")
    val shared = sharedStrings(p)
    val grid = mutable.Map.empty[Int, mutable.Map[Int, String]]
    var maxRow = 0
    var maxCol = 0
    val r = inputFactory().createXMLStreamReader(
      new ByteArrayInputStream(p(paths(sheetIndex))))
    try {
      var row = 0 // current 1-based row
      var colC = 0 // current 1-based column of the open cell
      var cellType: String = null
      var inV = false
      var inIs = false
      var inT = false
      val text = new StringBuilder
      var hasText = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                val ra = r.getAttributeValue(null, "r")
                row = if (ra != null) ra.toInt else row + 1
                colC = 0
              case "c" =>
                val ref = r.getAttributeValue(null, "r")
                colC = if (ref != null && colIndex(ref) > 0) colIndex(ref)
                  else colC + 1
                cellType = r.getAttributeValue(null, "t")
                text.setLength(0)
                hasText = false
              case "v" => inV = true
              case "is" => inIs = true
              case "t" => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV || (inIs && inT)) { text.append(r.getText); hasText = true }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => inV = false
              case "is" => inIs = false
              case "t" => inT = false
              case "c" =>
                val raw = text.toString
                val value: String =
                  if (!hasText) null
                  else cellType match {
                    case "s" =>
                      val i = raw.trim.toInt
                      if (i >= 0 && i < shared.length) shared(i) else null
                    case "inlineStr" => raw
                    case "str" => raw
                    case "b" => if (raw.trim == "1") "true" else "false"
                    case "e" => null
                    case _ => raw // numeric: keep the literal digits
                  }
                if (value != null && row > 0 && colC > 0) {
                  grid.getOrElseUpdate(row, mutable.Map.empty)(colC) = value
                  if (row > maxRow) maxRow = row
                  if (colC > maxCol) maxCol = colC
                }
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    Vector.tabulate(maxRow) { r0 =>
      val cells = grid.getOrElse(r0 + 1, mutable.Map.empty[Int, String])
      Array.tabulate(maxCol)(c0 => cells.getOrElse(c0 + 1, null))
    }
  }

  /** S2: distributed sheet scan over a directory of .xlsx workbooks.
    * Column names come from the header row of the (path-)first workbook;
    * every workbook's sheet `sheetIndex` contributes its data rows. All
    * columns are StringType — apply typed casts downstream (P7 serial
    * dates, longs, `=== "true"` booleans), mirroring Sources.typedCsv. */
  def readSheet(spark: SparkSession, path: String, sheetIndex: Int = 0): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .load(path)
      .select(col("path"), col("content"))
    val first = bin.orderBy("path").limit(1)
      .as[(String, Array[Byte])].collect()
    require(first.nonEmpty, s"no .xlsx files under $path")
    val header = sheetRows(first(0)._2, sheetIndex).headOption
      .getOrElse(Array.empty[String])
    val names = header.zipWithIndex.map { case (h, i) =>
      if (h == null || h.isEmpty) s"_c$i" else h
    }
    val parsed = bin.as[(String, Array[Byte])]
      .flatMap { case (_, content) => sheetRows(content, sheetIndex).drop(1) }
    parsed.select(names.zipWithIndex.map { case (nm, i) =>
      col("value").getItem(i).as(nm)
    }.toSeq: _*)
  }

  // ----------------------------------------------------------------------
  // Writer — deterministic workbook emission for fixtures and tests (the
  // production system DOWNLOADS workbooks; the engine's tests must mint
  // them). Bytes are reproducible: fixed zip entry timestamps, no
  // randomness.

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def colLetters(i1: Int): String = {
    var n = i1
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  /** Excel serial day number (1899-12-30 epoch, P7). */
  def dateSerial(d: java.time.LocalDate): Long =
    java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1899, 12, 30), d)

  private[graft] def zipBytes(entries: Seq[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(315532800000L) // fixed: deterministic bytes
      z.putNextEntry(e)
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** Sheet-part XML for one grid of rows. Cell encoding: String → shared
    * (index into `sharedIdx`) or inline; Boolean → b-cell; LocalDate → P7
    * serial number; numbers → literal `<v>`; null → cell omitted (sparse,
    * like real producers). */
  private[sources] def sheetXml(
      rows: Seq[Seq[Any]],
      sharedIdx: Map[String, Int]): String = {
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    rows.zipWithIndex.foreach { case (cells, r0) =>
      val rn = r0 + 1
      sb.append(s"""<row r="$rn">""")
      cells.zipWithIndex.foreach { case (v, c0) =>
        val ref = colLetters(c0 + 1) + rn
        v match {
          case null => // sparse
          case s: String =>
            sharedIdx.get(s) match {
              case Some(i) =>
                sb.append(s"""<c r="$ref" t="s"><v>$i</v></c>""")
              case None =>
                sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(s)}</t></is></c>""")
            }
          case b: Boolean =>
            sb.append(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
          case d: java.time.LocalDate =>
            sb.append(s"""<c r="$ref"><v>${dateSerial(d)}</v></c>""")
          case d: Double =>
            sb.append(s"""<c r="$ref"><v>${BigDecimal(d).toString}</v></c>""")
          case n => // Int, Long, BigDecimal …
            sb.append(s"""<c r="$ref"><v>$n</v></c>""")
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  /** Write a single-sheet workbook. `useSharedStrings` switches the
    * string-cell encoding (real producers emit either; the reader must
    * handle both). */
  def write(file: File, rows: Seq[Seq[Any]], useSharedStrings: Boolean = true): Unit = {
    val strings: Seq[String] =
      if (!useSharedStrings) Seq.empty
      else rows.flatten.collect { case s: String => s }.distinct
    val sharedIdx = strings.zipWithIndex.toMap
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"rels\" ContentType=\"application/vnd.openxmlformats-package.relationships+xml\"/>" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
        "<Override PartName=\"/xl/workbook.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml\"/>" +
        "<Override PartName=\"/xl/worksheets/sheet1.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml\"/>" +
        (if (strings.nonEmpty)
          "<Override PartName=\"/xl/sharedStrings.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml\"/>"
        else "") +
        "</Types>"
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\" Target=\"xl/workbook.xml\"/>" +
        "</Relationships>"
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" " +
        "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\">" +
        "<sheets><sheet name=\"Sheet1\" sheetId=\"1\" r:id=\"rId1\"/></sheets></workbook>"
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet\" Target=\"worksheets/sheet1.xml\"/>" +
        (if (strings.nonEmpty)
          "<Relationship Id=\"rId2\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings\" Target=\"sharedStrings.xml\"/>"
        else "") +
        "</Relationships>"
    val sst =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.length}" uniqueCount="${strings.length}">""" +
        strings.map(s => s"<si><t>${xmlEscape(s)}</t></si>").mkString +
        "</sst>"
    val entries =
      Seq(
        "[Content_Types].xml" -> contentTypes,
        "_rels/.rels" -> rootRels,
        "xl/workbook.xml" -> workbook,
        "xl/_rels/workbook.xml.rels" -> wbRels,
        "xl/worksheets/sheet1.xml" -> sheetXml(rows, sharedIdx)) ++
        (if (strings.nonEmpty) Seq("xl/sharedStrings.xml" -> sst) else Seq.empty)
    val out = new FileOutputStream(file)
    try out.write(zipBytes(entries)) finally out.close()
  }
}
