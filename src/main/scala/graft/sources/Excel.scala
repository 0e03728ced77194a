package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.io.{InputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal XLSX reader/writer (reference reads Excel via pandas
  * `read_excel`, yaetos/pandas_utils.py:53-82 — a small-lookup-table use
  * case). No POI on the zero-egress classpath, so this parses the OOXML
  * subset directly: shared strings, inline strings, numbers, booleans,
  * sparse rows. First row = header; all values land as strings (the
  * engine's CSV philosophy — explicit casts downstream, so SQL semantics
  * match the reference's string-typed frames).
  *
  * Excel inputs are config/lookup sized; parsing happens on the driver and
  * the result distributes via createDataFrame — not a path for big data.
  */
object Excel {

  private val xmlIn = XMLInputFactory.newInstance()
  xmlIn.setProperty(XMLInputFactory.SUPPORT_DTD, false)
  xmlIn.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)

  /** "B3" → 0-based column index (1 for B). */
  private[sources] def colIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  private def entryBytes(zin: ZipInputStream): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    var n = zin.read(tmp)
    while (n >= 0) { buf.write(tmp, 0, n); n = zin.read(tmp) }
    buf.toByteArray
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val r = xmlIn.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    var cur: StringBuilder = null
    var inT = false
    var phoneticDepth = 0 // skip <rPh> phonetic-guide runs — not cell text
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "rPh" => phoneticDepth += 1
            case "t" if phoneticDepth == 0 => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "rPh" => phoneticDepth -= 1
            case "si" => out += cur.toString; cur = null
            case _ =>
          }
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  /** Zip path of the workbook's FIRST sheet in displayed (workbook.xml)
    * order, resolved through the rels file — sheetN.xml file numbering
    * does not track tab order after a user reorders sheets.
    */
  private def firstSheetPath(workbook: Array[Byte], rels: Array[Byte]): Option[String] = {
    def attr(r: javax.xml.stream.XMLStreamReader, local: String): Option[String] =
      (0 until r.getAttributeCount)
        .find(i => r.getAttributeLocalName(i) == local)
        .map(r.getAttributeValue)
    var rid: Option[String] = None
    val wb = xmlIn.createXMLStreamReader(new java.io.ByteArrayInputStream(workbook))
    while (wb.hasNext && rid.isEmpty) {
      if (wb.next() == XMLStreamConstants.START_ELEMENT && wb.getLocalName == "sheet")
        rid = attr(wb, "id")
    }
    rid.flatMap { id =>
      var target: Option[String] = None
      val rl = xmlIn.createXMLStreamReader(new java.io.ByteArrayInputStream(rels))
      while (rl.hasNext && target.isEmpty) {
        if (rl.next() == XMLStreamConstants.START_ELEMENT &&
            rl.getLocalName == "Relationship" && attr(rl, "Id").contains(id))
          target = attr(rl, "Target")
      }
      target.map(t => "xl/" + t.stripPrefix("/xl/").stripPrefix("xl/"))
    }
  }

  /** Parse one worksheet into sparse rows of (colIndex -> text). */
  private def parseSheet(bytes: Array[Byte],
                         shared: IndexedSeq[String]): Seq[Map[Int, String]] = {
    val rows = mutable.ArrayBuffer.empty[Map[Int, String]]
    val r = xmlIn.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    var row: mutable.Map[Int, String] = null
    var cellCol = -1
    var cellType = ""
    var text: StringBuilder = null
    var sawText = false
    var collecting = false
    var phoneticDepth = 0 // <rPh> runs are pronunciation guides, not text
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.Map.empty; cellCol = -1
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(cellCol + 1)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              text = new StringBuilder
              sawText = false
            case "rPh" => phoneticDepth += 1
            // multiple <t> runs (rich inline text) accumulate into one cell
            case "v" | "t" if phoneticDepth == 0 => collecting = true; sawText = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if collecting =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "rPh" => phoneticDepth -= 1
            case "v" | "t" => collecting = false
            case "c" if row != null && cellCol >= 0 && sawText =>
              val raw = text.toString
              row(cellCol) = cellType match {
                case "s" => shared(raw.trim.toInt)
                case "b" => if (raw.trim == "1") "true" else "false"
                case _ => raw // n, str, inlineStr (concatenated runs)
              }
            case "row" => rows += row.toMap; row = null
            case _ =>
          }
        case _ =>
      }
    }
    rows.toSeq
  }

  /** Read the first worksheet of an .xlsx into a DataFrame of strings.
    * Header = row `headerRow` (0-based; rows above are skipped — the
    * reference's `read_kwargs: {header: 1}` pattern,
    * reference conf/jobs_metadata.yml:224); sparse cells become nulls.
    */
  def read(spark: SparkSession, path: String, headerRow: Int = 0): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val in: InputStream = fs.open(new org.apache.hadoop.fs.Path(path))
    try readStream(spark, in, headerRow) finally in.close()
  }

  def readStream(spark: SparkSession, in: InputStream, headerRow: Int = 0): DataFrame = {
    val zin = new ZipInputStream(in)
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var workbook: Array[Byte] = null
    var rels: Array[Byte] = null
    var entry = zin.getNextEntry
    val sheets = mutable.SortedMap.empty[String, Array[Byte]]
    while (entry != null) {
      entry.getName match {
        case "xl/sharedStrings.xml" => shared = parseSharedStrings(entryBytes(zin))
        case "xl/workbook.xml" => workbook = entryBytes(zin)
        case "xl/_rels/workbook.xml.rels" => rels = entryBytes(zin)
        case n if n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml") =>
          sheets(n) = entryBytes(zin)
        case _ =>
      }
      entry = zin.getNextEntry
    }
    require(sheets.nonEmpty, "xlsx contains no worksheets")
    // first sheet per workbook.xml tab order (via rels); fall back to
    // numeric filename order (lexicographic would put sheet10 before sheet2)
    val byWorkbook =
      if (workbook != null && rels != null)
        firstSheetPath(workbook, rels).flatMap(sheets.get)
      else None
    val SheetNum = """.*sheet(\d+)\.xml""".r
    val sheetBytes = byWorkbook.getOrElse(sheets.toSeq.sortBy {
      case (SheetNum(n), _) => n.toInt
      case _ => Int.MaxValue
    }.head._2)
    val allRows = parseSheet(sheetBytes, shared)
    val rows = allRows.drop(headerRow)
    require(rows.nonEmpty, s"xlsx sheet has no rows at/after header row $headerRow")
    val width = rows.map(m => if (m.isEmpty) 0 else m.keys.max + 1).max
    val header = (0 until width).map(i =>
      rows.head.getOrElse(i, s"_c$i"))
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val data = rows.tail.map { m =>
      Row.fromSeq((0 until width).map(i => m.get(i).orNull))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)
  }

  /** Hard ceiling for [[write]]: the xlsx format caps a sheet at 1,048,576
    * rows; we reserve one for the header. Also the driver-OOM guard — the
    * writer collects, so anything bigger must fail loudly, not OOM.
    */
  val MaxWriteRows: Int = 1048575

  /** Write a (small) DataFrame as a single-sheet .xlsx with inline
    * strings — collect-to-driver by design, lookup-table sized.
    * Fails loudly (before materializing past the limit) on frames larger
    * than `maxRows`.
    */
  def write(df: DataFrame, path: String, maxRows: Int = MaxWriteRows): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out: OutputStream = fs.create(new org.apache.hadoop.fs.Path(path), true)
    val zout = new ZipOutputStream(out)
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    // Explicit r= refs: without them, a skipped (null) interior cell would
    // shift every later value one column left on read-back.
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def cell(v: Any, row: Int, ci: Int): String = v match {
      case null => ""
      case _ =>
        s"""<c r="${colRef(ci)}$row" t="inlineStr"><is><t>${esc(v.toString)}</t></is></c>"""
    }
    val header = df.columns.zipWithIndex.map { case (c, i) => cell(c, 1, i) }.mkString
    // take(maxRows + 1) bounds driver memory: one extra row proves overflow
    // without ever pulling the whole oversized frame onto the driver.
    val collected = df.take(maxRows + 1)
    require(collected.length <= maxRows,
      s"Excel.write: frame exceeds $maxRows rows (xlsx sheet limit is " +
        s"${MaxWriteRows + 1} incl. header); write parquet/csv instead or " +
        "pre-aggregate — the xlsx writer materializes on the driver.")
    val body = collected.zipWithIndex.map { case (r, ri) =>
      s"""<row r="${ri + 2}">${r.toSeq.zipWithIndex.map { case (v, ci) =>
        cell(v, ri + 2, ci) }.mkString}</row>"""
    }.mkString
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
      put("_rels/.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
      put("xl/workbook.xml",
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
      put("xl/worksheets/sheet1.xml",
        s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row>$header</row>$body</sheetData></worksheet>""")
    } finally { zout.close() }
  }
}
