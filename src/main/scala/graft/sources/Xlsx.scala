package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Real .xlsx source/sink (S6), JDK-native: an xlsx is a ZIP of ECMA-376
  * SpreadsheetML parts, so `java.util.zip` + StAX cover the reference's
  * whole Excel surface — `pd.read_excel(file, sheet_name=..., usecols=...)`
  * (/root/reference/dags/Funciones_CotyData.py:349) and the 15 `to_excel`
  * dead-letter sites — without any new dependency.
  *
  * Read side is DISTRIBUTED: files land as `binaryFile` rows and each task
  * parses its own workbooks (named-sheet resolution via workbook.xml +
  * rels, shared/inline/formula-cached strings, sparse cells by `r=`
  * reference). Values surface as strings with the header row as column
  * names — the engine's schema-drift stance (explicit cast beats silent
  * inference); `useCols` prunes like pandas' usecols. Only the header peek
  * reads one file on the driver.
  *
  * Write side is the dead-letter shape (bounded, like every reference
  * `to_excel` call): rows are capped and written as one workbook with
  * inline strings — nulls become empty cells, round-tripping as null.
  */
object Xlsx {

  /** Parse one workbook's sheet into rows of nullable strings (sparse
    * cells null-filled, rows padded to the widest row). `sheet` = None
    * picks the first sheet; Some(name) resolves via workbook.xml.
    */
  private[sources] def parseRows(bytes: Array[Byte], sheet: Option[String]): Seq[Seq[String]] = {
    val parts = readParts(bytes)
    val sheetPath = resolveSheetPath(parts, sheet)
    val sheetXml = parts.getOrElse(sheetPath,
      throw new IllegalArgumentException(s"xlsx: missing worksheet part $sheetPath"))
    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(Vector.empty)
    parseSheet(sheetXml, shared)
  }

  /** S6 scan: distributed parse of every .xlsx under `path`. All columns
    * are strings named by the header row of the (lexicographically) first
    * file; each file's own header row is skipped.
    */
  def read(spark: SparkSession, path: String, sheet: Option[String] = None,
           useCols: Seq[String] = Nil): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    // header peek: resolve the first path from the (pruned, content-free)
    // listing, then read just that file — ordering (path, content) rows
    // would drag every workbook's bytes through the sort
    val firstPath = bin.select("path").orderBy("path").head().getString(0)
    val firstBytes = bin.filter(col("path") === firstPath)
      .select("content").head().getAs[Array[Byte]](0)
    val header = parseRows(firstBytes, sheet).headOption.getOrElse(
      throw new IllegalArgumentException(s"xlsx: empty sheet in $path"))
    val n = header.length
    // messy workbooks repeat header names; disambiguate like pandas'
    // mangle_dupe_cols (a, a -> a, a_2) so the schema stays addressable
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val names = header.map { c =>
      val base = Option(c).getOrElse("")
      val k = seen.updateWith(base)(o => Some(o.getOrElse(0) + 1)).get
      if (k == 1) base else s"${base}_$k"
    }
    val schema = StructType(names.map(StructField(_, StringType)))
    val sheetName = sheet // stable reference for task serialization
    val parsed = bin.select("content").mapPartitions { it =>
      it.flatMap { fileRow =>
        parseRows(fileRow.getAs[Array[Byte]](0), sheetName).drop(1).map { r =>
          Row.fromSeq(r.padTo(n, null).take(n))
        }
      }
    }(Encoders.row(schema))
    if (useCols.isEmpty) parsed else parsed.select(useCols.map(parsed.col): _*)
  }

  /** Dead-letter sink: one bounded workbook. Numeric/boolean values write
    * as Excel numbers/booleans, everything else as inline strings; null
    * cells are omitted (sparse), reading back as null.
    */
  def write(df: DataFrame, path: String, sheet: String = "Sheet1",
            maxRows: Int = 100000): Unit = {
    val rows = df.take(maxRows + 1)
    require(rows.length <= maxRows,
      s"Xlsx.write is a bounded (dead-letter) sink: more than $maxRows rows; " +
        "write parquet/csv for large outputs")
    val cols = df.columns
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cellRef(c: Int, r: Int): String = {
      var n = c + 1; val b = new StringBuilder
      while (n > 0) { b.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      b.append((r + 1).toString).toString
    }
    def inline(ref: String, s: String): String =
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${escape(s)}</t></is></c>"""
    sb.append("""<row r="1">""")
    cols.zipWithIndex.foreach { case (c, i) => sb.append(inline(cellRef(i, 0), c)) }
    sb.append("</row>")
    rows.zipWithIndex.foreach { case (row, ri) =>
      sb.append(s"""<row r="${ri + 2}">""")
      cols.indices.foreach { ci =>
        if (!row.isNullAt(ci)) {
          val ref = cellRef(ci, ri + 1)
          row.get(ci) match {
            case n: Byte    => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case n: Short   => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case n: Int     => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case n: Long    => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case n: Float   => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case n: Double  => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case n: java.math.BigDecimal => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case b: Boolean => sb.append(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
            case v          => sb.append(inline(ref, v.toString))
          }
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")

    val zipBytes = {
      val bos = new ByteArrayOutputStream()
      val zip = new ZipOutputStream(bos)
      def entry(name: String, content: String): Unit = {
        zip.putNextEntry(new ZipEntry(name))
        zip.write(content.getBytes("UTF-8"))
        zip.closeEntry()
      }
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>""")
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        s"""<sheets><sheet name="${escape(sheet)}" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>""")
      entry("xl/worksheets/sheet1.xml", sb.toString)
      zip.close()
      bos.toByteArray
    }
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, zipBytes)
  }

  // ---- parsing internals -------------------------------------------------

  private def readParts(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zip = new ZipInputStream(new ByteArrayInputStream(bytes))
    val parts = Map.newBuilder[String, Array[Byte]]
    var e = zip.getNextEntry
    while (e != null) {
      val name = e.getName
      if (name == "xl/workbook.xml" || name == "xl/_rels/workbook.xml.rels" ||
          name == "xl/sharedStrings.xml" || name.startsWith("xl/worksheets/")) {
        parts += name -> zip.readAllBytes()
      }
      e = zip.getNextEntry
    }
    parts.result()
  }

  /** workbook.xml sheet name -> r:id, rels r:id -> target path. */
  private def resolveSheetPath(parts: Map[String, Array[Byte]], sheet: Option[String]): String = {
    val wb = parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("xlsx: no xl/workbook.xml — not a workbook"))
    val sheets = ArrayBuffer.empty[(String, String)] // (name, rId)
    withReader(wb) { r =>
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          var (nm, rid) = ("", "")
          (0 until r.getAttributeCount).foreach { i =>
            r.getAttributeLocalName(i) match {
              case "name" => nm = r.getAttributeValue(i)
              case "id"   => rid = r.getAttributeValue(i)
              case _ => ()
            }
          }
          sheets += ((nm, rid))
        }
      }
    }
    val (name, rId) = sheet match {
      case Some(want) => sheets.find(_._1 == want).getOrElse(
        throw new IllegalArgumentException(
          s"xlsx: no sheet named '$want' (has: ${sheets.map(_._1).mkString(", ")})"))
      case None => sheets.headOption.getOrElse(
        throw new IllegalArgumentException("xlsx: workbook has no sheets"))
    }
    val rels = parts.get("xl/_rels/workbook.xml.rels")
    val target = rels.flatMap { bytes =>
      var found: Option[String] = None
      withReader(bytes) { r =>
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
            var (id, tgt) = ("", "")
            (0 until r.getAttributeCount).foreach { i =>
              r.getAttributeLocalName(i) match {
                case "Id" => id = r.getAttributeValue(i)
                case "Target" => tgt = r.getAttributeValue(i)
                case _ => ()
              }
            }
            if (id == rId) found = Some(tgt)
          }
        }
      }
      found
    }
    target.map(t => if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t")
      .getOrElse("xl/worksheets/sheet1.xml")
  }

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val out = Vector.newBuilder[String]
    withReader(bytes) { r =>
      var inSi = false
      var phonetic = false // <rPh> furigana guides are NOT cell content
      var cur: StringBuilder = null
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
            inSi = true; cur = new StringBuilder
          case XMLStreamConstants.START_ELEMENT if inSi && r.getLocalName == "rPh" =>
            phonetic = true
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "rPh" =>
            phonetic = false
          case XMLStreamConstants.START_ELEMENT
              if inSi && !phonetic && r.getLocalName == "t" =>
            cur.append(r.getElementText) // rich-text runs concatenate
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
            inSi = false; out += cur.toString
          case _ => ()
        }
      }
    }
    out.result()
  }

  private def parseSheet(bytes: Array[Byte], shared: Vector[String]): Seq[Seq[String]] = {
    val rows = ArrayBuffer.empty[ArrayBuffer[String]]
    var width = 0
    withReader(bytes) { r =>
      var row: ArrayBuffer[String] = null
      var nextCol = 0
      var cellCol = 0
      var cellType = ""
      var pendingInline = false
      var phonetic = false
      var inline: StringBuilder = null
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => row = ArrayBuffer.empty[String]; nextCol = 0
            case "c" if row != null =>
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(colOf).getOrElse(nextCol)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              nextCol = cellCol + 1
              pendingInline = cellType == "inlineStr"
              inline = if (pendingInline) new StringBuilder else null
            case "v" if row != null =>
              val raw = r.getElementText
              val value = cellType match {
                case "s" => shared.lift(raw.trim.toInt).orNull
                case "b" => if (raw.trim == "1") "true" else "false"
                case _   => raw // number, "str" formula cache, plain
              }
              setCell(row, cellCol, value)
            case "rPh" => phonetic = true
            case "t" if pendingInline && !phonetic =>
              inline.append(r.getElementText) // rich-text runs concatenate
            case _ => ()
          }
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "row" =>
              width = math.max(width, row.length)
              rows += row; row = null
            case "rPh" => phonetic = false
            case "c" =>
              // a present inlineStr cell is "" when its runs are empty —
              // only absent cells read as null
              if (pendingInline && row != null) setCell(row, cellCol, inline.toString)
              pendingInline = false; inline = null
            case _ => ()
          }
          case _ => ()
        }
      }
    }
    rows.map(r => r.padTo(width, null).toSeq).toSeq
  }

  private def setCell(row: ArrayBuffer[String], col: Int, v: String): Unit = {
    while (row.length <= col) row += null
    row(col) = v
  }

  /** Column index of an A1-style reference: A=0, Z=25, AA=26... */
  private def colOf(ref: String): Int = {
    var i = 0; var n = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      n = n * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    n - 1
  }

  private def withReader(bytes: Array[Byte])(f: javax.xml.stream.XMLStreamReader => Unit): Unit = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val reader = factory.createXMLStreamReader(new ByteArrayInputStream(bytes))
    try f(reader) finally reader.close()
  }

  /** XML-escape, dropping characters that are ILLEGAL in XML 1.0 even when
    * escaped (C0 controls except tab/newline/CR, and lone surrogates) —
    * Excel itself refuses such files; values carrying them belong in
    * parquet, not a spreadsheet.
    */
  private def escape(s: String): String =
    s.flatMap {
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '&' => "&amp;"
      case '"' => "&quot;"
      case c if c == '\t' || c == '\n' || c == '\r' => c.toString
      case c if c < 0x20 || (c >= 0xd800 && c <= 0xdfff) || c == 0xfffe || c == 0xffff => ""
      case c => c.toString
    }
}
