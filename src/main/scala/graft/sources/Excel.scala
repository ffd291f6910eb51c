package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free .xlsx ingestion (reference parity:
  * /root/reference/main.py:402,410 reads Excel uploads).
  *
  * An xlsx is a zip of XML parts; this reader uses only
  * `java.util.zip` + the JDK StAX parser. Supported cell kinds:
  * shared strings (t="s"), inline strings (t="inlineStr"), formula
  * string results (t="str"), booleans (t="b"), and numbers. Dates
  * surface as their raw Excel serial numbers (style-table date
  * detection is out of scope).
  *
  * Scale note: xlsx is an inherently single-file, driver-parsed
  * format — it exists for upload parity, not as a lake format. The
  * reader parses on the driver (uploads are MB-scale) and hands Spark
  * a typed DataFrame; convert to parquet (`Ingest.writeParquet`)
  * before any serious processing. A directory of many xlsx files
  * should be exported to CSV/parquet upstream instead.
  */
object Excel {

  /** Read one sheet of an Excel workbook into a typed DataFrame —
    * BOTH formats, like the reference's pd.read_excel (main.py:409):
    * .xlsx (zip magic `PK`) via the StAX reader below, legacy .xls
    * (CFB magic D0 CF 11 E0) via the dependency-free BIFF8 reader
    * ([[Biff]], round 15 — previously a documented rejection). The
    * two parsers share this method's inference/DataFrame tail, so a
    * workbook round-tripped between formats types identically.
    *
    * `sheet` = None → the workbook's first sheet. With `header`,
    * row 1 names the columns; names are normalized like
    * `Ingest.normalizeColumns`. With `inferTypes`, each column
    * becomes long/double/boolean when every non-null cell parses as
    * one (CSV-inference ergonomics); otherwise everything is string. */
  def read(s: SparkSession, path: String, sheet: Option[String] = None,
      header: Boolean = true, inferTypes: Boolean = true): DataFrame = {
    val rows =
      if (isCfb(path)) Biff.readRows(path, sheet)
      else {
        val zip = new ZipFile(path)
        try {
          val shared = readSharedStrings(zip)
          val sheetPath = resolveSheetPath(zip, sheet)
          readSheetRows(zip, sheetPath, shared)
        } finally zip.close()
      }
    rowsToDataFrame(s, rows, header, inferTypes)
  }

  /** Shared tail of both Excel parsers: raw string rows → normalized
    * names → per-column type inference → typed DataFrame. */
  private[sources] def rowsToDataFrame(s: SparkSession, rows: Seq[Array[String]],
      header: Boolean, inferTypes: Boolean): DataFrame = {
    if (rows.isEmpty) return s.emptyDataFrame
    val width = rows.map(_.length).max
    val padded = rows.map(r => r.padTo(width, null: String))
    val names =
      if (header) padded.head.zipWithIndex.map { case (n, i) =>
        if (n == null || n.trim.isEmpty) s"_c$i"
        else n.trim.toLowerCase.replaceAll("\\s+", "_")
      }
      else (0 until width).map(i => s"_c$i").toArray
    val data = if (header) padded.tail else padded
    val types: Array[DataType] =
      if (!inferTypes) Array.fill(width)(StringType)
      else (0 until width).map { i =>
        val vals = data.flatMap(r => Option(r(i)))
        if (vals.isEmpty) StringType
        else if (vals.forall(v => v.matches("-?\\d+") &&
          scala.util.Try(v.toLong).isSuccess)) LongType
        else if (vals.forall(v => scala.util.Try(v.toDouble).isSuccess)) DoubleType
        else if (vals.forall(v => v == "true" || v == "false")) BooleanType
        else StringType
      }.toArray
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val converted = data.map { r =>
      Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(r.zip(types).map {
        case (null, _) => null
        case (v, LongType) => v.toLong
        case (v, DoubleType) => v.toDouble
        case (v, BooleanType) => v == "true"
        case (v, _) => v
      }))
    }
    s.createDataFrame(java.util.Arrays.asList(converted: _*), schema)
  }

  /** CFB/OLE2 magic (D0 CF 11 E0 ...) marks a legacy .xls workbook. */
  private def isCfb(path: String): Boolean = {
    val in = new java.io.FileInputStream(path)
    try {
      val b = new Array[Byte](4)
      in.read(b) == 4 && b.sameElements(Biff.CfbMagic.take(4))
    } finally in.close()
  }

  /** Hard ceiling for [[write]]: one under Excel's own 1,048,576-row
    * sheet limit (one row is the header). The real protection is for
    * the DRIVER — write() collects, and without a cap a caller
    * pointing it at a fact table OOMs the driver long before Excel
    * complains. */
  val MaxWriteRows: Int = 1048575

  /** Write a DataFrame to a single .xlsx (driver-side collect — for
    * report-scale exports, the inverse of the upload path; big tables
    * belong in parquet). Strings are written inline, numerics as
    * numbers, everything else via toString. Refuses more than
    * `maxRows` (default [[MaxWriteRows]], Excel's sheet limit):
    * the check is limit(maxRows+1) BEFORE the collect, so an
    * over-limit frame costs a bounded scan, not a driver OOM. */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1",
      maxRows: Int = MaxWriteRows): Unit = {
    require(maxRows > 0 && maxRows <= MaxWriteRows,
      s"maxRows must be in [1, $MaxWriteRows], got $maxRows")
    val rows = df.limit(maxRows + 1).collect()
    if (rows.length > maxRows)
      throw new IllegalArgumentException(
        s"Excel.write: DataFrame exceeds $maxRows rows — a single .xlsx sheet " +
          s"holds at most ${MaxWriteRows + 1} rows including the header, and " +
          "driver-side collect of a larger frame risks OOM. Write parquet/CSV " +
          "instead, or pass a smaller frame.")
    val names = df.columns
    val out = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def part(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    def esc(v: String): String = v.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    def cellXml(v: Any): String = v match {
      case null => ""
      case n: Byte => s"<c><v>$n</v></c>"
      case n: Short => s"<c><v>$n</v></c>"
      case n: Int => s"<c><v>$n</v></c>"
      case n: Long => s"<c><v>$n</v></c>"
      case n: Float => s"<c><v>$n</v></c>"
      case n: Double => s"<c><v>$n</v></c>"
      case n: java.math.BigDecimal => s"<c><v>$n</v></c>"
      case b: Boolean => s"""<c t="b"><v>${if (b) 1 else 0}</v></c>"""
      case x => s"""<c t="inlineStr"><is><t xml:space="preserve">${esc(x.toString)}</t></is></c>"""
    }
    val sheetXml = {
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      sb.append("<row>" + names.map(n => cellXml(n)).mkString + "</row>")
      rows.foreach { r =>
        sb.append("<row>" + r.toSeq.map(cellXml).mkString + "</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }
    try {
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>""")
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>""")
      part("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          s"""<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>""")
      part("xl/worksheets/sheet1.xml", sheetXml)
    } finally out.close()
  }

  // ------------------------------------------------------------------
  // zip/XML plumbing

  private def entryStream(zip: ZipFile, name: String) =
    Option(zip.getEntry(name)).map(zip.getInputStream)

  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] =
    entryStream(zip, "xl/sharedStrings.xml").map { in =>
      val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
      val strs = ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inSi = false
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
              inSi = true; sb.clear()
            case XMLStreamConstants.START_ELEMENT if inSi && r.getLocalName == "t" =>
              sb.append(r.getElementText) // concatenates rich-text runs
            case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
              inSi = false; strs += sb.toString
            case _ => ()
          }
        }
      } finally r.close()
      strs.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** Map the requested sheet name (or the first sheet) to its part
    * path via workbook.xml + its rels. */
  private def resolveSheetPath(zip: ZipFile, sheet: Option[String]): String = {
    val sheets = ArrayBuffer.empty[(String, String)] // (name, rId)
    entryStream(zip, "xl/workbook.xml").foreach { in =>
      val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
            val name = r.getAttributeValue(null, "name")
            val rid = (0 until r.getAttributeCount)
              .find(i => r.getAttributeLocalName(i) == "id")
              .map(r.getAttributeValue).getOrElse("")
            sheets += ((name, rid))
          }
        }
      } finally r.close()
    }
    val rels = ArrayBuffer.empty[(String, String)] // (rId, target)
    entryStream(zip, "xl/_rels/workbook.xml.rels").foreach { in =>
      val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
            rels += ((r.getAttributeValue(null, "Id"), r.getAttributeValue(null, "Target")))
          }
        }
      } finally r.close()
    }
    val chosen = sheet match {
      case Some(n) => sheets.find(_._1 == n).getOrElse(
        throw new IllegalArgumentException(
          s"sheet '$n' not found; workbook has: ${sheets.map(_._1).mkString(", ")}"))
      case None => sheets.headOption.getOrElse(
        throw new IllegalArgumentException("workbook has no sheets"))
    }
    val target = rels.find(_._1 == chosen._2).map(_._2)
      .getOrElse("worksheets/sheet1.xml")
    if (target.startsWith("/")) target.drop(1) else s"xl/$target"
  }

  /** Column index of a cell ref like "BC23" → 54 (0-based). */
  private def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def readSheetRows(zip: ZipFile, sheetPath: String,
      shared: IndexedSeq[String]): Seq[Array[String]] = {
    val in = entryStream(zip, sheetPath).getOrElse(
      throw new IllegalArgumentException(s"missing sheet part $sheetPath"))
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val rows = ArrayBuffer.empty[Array[String]]
    val cells = ArrayBuffer.empty[(Int, String)]
    var nextCol = 0          // implicit position when a cell has no r=
    var cellType: String = null
    var cellCol = 0
    var value: String = null
    var inIs = false
    val isText = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" =>
              cells.clear(); nextCol = 0
            case "c" =>
              cellType = r.getAttributeValue(null, "t")
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(nextCol)
              nextCol = cellCol + 1
              value = null; isText.clear()
            case "v" =>
              value = r.getElementText
            case "is" => inIs = true
            case "t" if inIs =>
              isText.append(r.getElementText)
            case _ => ()
          }
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "is" => inIs = false
            case "c" =>
              val str = cellType match {
                case "s" =>
                  Option(value).map(v => shared(v.toInt)).orNull
                case "inlineStr" => isText.toString
                case "b" =>
                  Option(value).map(v => if (v == "1") "true" else "false").orNull
                case _ => value // numbers, formula caches (t="str" included)
              }
              if (str != null) cells += ((cellCol, str))
            case "row" =>
              if (cells.nonEmpty) {
                val width = cells.map(_._1).max + 1
                val arr = new Array[String](width)
                cells.foreach { case (i, v) => arr(i) = v }
                rows += arr
              } else rows += Array.empty[String]
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally { r.close(); in.close() }
    rows.toSeq
  }
}
