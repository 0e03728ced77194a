package graft.sources

import graft.SparkSpec
import graft.core.model.DatasetSpec
import java.nio.file.Files

class ExcelSpec extends SparkSpec {
  import spark.implicits._

  test("xlsx write/read round-trip preserves header, values, and nulls") {
    val dir = Files.createTempDirectory("graft_xlsx").toString
    val df = Seq(("a", "1", "x&<y>"), ("b", "2", null)).toDF("k", "n", "s")
    Excel.write(df, s"$dir/t.xlsx")
    val back = Excel.read(spark, s"$dir/t.xlsx")
    assert(back.columns.toSeq == Seq("k", "n", "s"))
    val rows = back.orderBy("k").collect()
    assert(rows(0).toSeq == Seq("a", "1", "x&<y>"))
    assert(rows(1).toSeq == Seq("b", "2", null))
  }

  test("interior null cells keep later values in their columns") {
    val dir = Files.createTempDirectory("graft_xlsx_null").toString
    val df = Seq(("a", null.asInstanceOf[String], "c")).toDF("x", "y", "z")
    Excel.write(df, s"$dir/n.xlsx")
    val back = Excel.read(spark, s"$dir/n.xlsx").head()
    assert(back.toSeq == Seq("a", null, "c"))
  }

  test("reader dispatches type: excel and parses shared strings + sparse cells") {
    val dir = Files.createTempDirectory("graft_xlsx2").toString
    // hand-rolled xlsx with sharedStrings, a numeric cell, and a gap at B2
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/s.xlsx"))
    def put(n: String, c: String): Unit = {
      zout.putNextEntry(new java.util.zip.ZipEntry(n))
      zout.write(c.getBytes("UTF-8")); zout.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>id</t></si><si><t>name</t></si><si><t>city</t></si><si><t>bo</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2"><v>7</v></c><c r="C2" t="s"><v>3</v></c></row>
        |<row r="3"><c r="A3"><v>8.5</v></c><c r="B3" t="b"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zout.close()
    val df = graft.core.io.Reader.read(spark,
      DatasetSpec(path = s"$dir/s.xlsx", format = "excel"))
    assert(df.columns.toSeq == Seq("id", "name", "city"))
    val rows = df.collect()
    assert(rows(0).toSeq == Seq("7", null, "bo"))   // sparse B2 -> null
    assert(rows(1).toSeq == Seq("8.5", "true", null)) // bool + trailing gap
  }

  test("header row offset skips leading rows (reference header:1 pattern)") {
    val dir = Files.createTempDirectory("graft_xlsx3").toString
    val df = Seq(("title row", "", ""), ("k", "n", "s"), ("a", "1", "z")).toDF("x", "y", "z")
    // write without header so row0 = title, row1 = real header
    Excel.write(df.limit(0), s"$dir/ignore.xlsx") // exercise empty-body write
    val zdf = Seq(("junk", "junk2"), ("k", "n"), ("a", "1")).toDF("c1", "c2")
    Excel.write(zdf, s"$dir/h.xlsx")
    // file has writer header (c1,c2) at row0, junk at row1, header at row2
    val back = graft.core.io.Reader.read(spark, graft.core.model.DatasetSpec(
      path = s"$dir/h.xlsx", format = "excel",
      readOptions = Map("header" -> "2")))
    assert(back.columns.toSeq == Seq("k", "n"))
    assert(back.head().toSeq == Seq("a", "1"))
  }

  test("first sheet follows workbook tab order, not filename number") {
    val dir = Files.createTempDirectory("graft_xlsx4").toString
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/o.xlsx"))
    def put(n: String, c: String): Unit = {
      zout.putNextEntry(new java.util.zip.ZipEntry(n))
      zout.write(c.getBytes("UTF-8")); zout.closeEntry()
    }
    // workbook lists sheet2.xml (rId2) FIRST in tab order
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Front" sheetId="2" r:id="rId2"/><sheet name="Back" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>""" +
        """<Relationship Id="rId2" Target="worksheets/sheet2.xml"/></Relationships>""")
    def sheet(v: String) =
      s"""<?xml version="1.0"?><worksheet><sheetData><row><c t="inlineStr"><is><t>col</t></is></c></row><row><c t="inlineStr"><is><t>$v</t></is></c></row></sheetData></worksheet>"""
    put("xl/worksheets/sheet1.xml", sheet("from_sheet1"))
    put("xl/worksheets/sheet2.xml", sheet("from_sheet2"))
    zout.close()
    val df = Excel.read(spark, s"$dir/o.xlsx")
    assert(df.head().getString(0) == "from_sheet2") // tab order wins
  }

  test("inline rich-text runs concatenate; phonetic runs are skipped") {
    val dir = Files.createTempDirectory("graft_xlsx5").toString
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/r.xlsx"))
    zout.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    zout.write(
      ("""<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row><c t="inlineStr"><is><t>h</t></is></c></row>""" +
        """<row><c t="inlineStr"><is><r><t>Hello </t></r><r><t>World</t></r><rPh><t>IGNORED</t></rPh></is></c></row>""" +
        """</sheetData></worksheet>""").getBytes("UTF-8"))
    zout.closeEntry(); zout.close()
    val df = Excel.read(spark, s"$dir/r.xlsx")
    assert(df.head().getString(0) == "Hello World")
  }

  test("write fails loudly past maxRows instead of collecting the frame") {
    val dir = Files.createTempDirectory("graft_xlsx6").toString
    val df = Seq.tabulate(10)(i => (i.toString, s"v$i")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Excel.write(df, s"$dir/big.xlsx", maxRows = 5)
    }
    assert(e.getMessage.contains("exceeds 5 rows"))
    // at the boundary it still writes
    Excel.write(df.limit(5), s"$dir/ok.xlsx", maxRows = 5)
    assert(Excel.read(spark, s"$dir/ok.xlsx").count() == 5) // header row excluded
  }

  test("colIndex decodes multi-letter refs") {
    assert(Excel.colIndex("A1") == 0)
    assert(Excel.colIndex("Z9") == 25)
    assert(Excel.colIndex("AA12") == 26)
    assert(Excel.colIndex("AB3") == 27)
  }
}
