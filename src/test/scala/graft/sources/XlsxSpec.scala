package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class XlsxSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir() = java.nio.file.Files.createTempDirectory("graft-xlsx").toString

  test("write -> read round-trip: values as strings, nulls preserved") {
    val dir = tmpDir()
    val df = Seq(
      (1L, Some("widget"), Some(9.5), Some(true)),
      (2L, None, Some(0.25), Some(false)),
      (3L, Some("a<b&\"c\">"), None, None) // XML-hostile text
    ).toDF("id", "name", "price", "flag")
    Xlsx.write(df, s"$dir/out.xlsx")
    val back = Xlsx.read(spark, s"$dir/out.xlsx").orderBy(col("id").cast("long"))
    assert(back.columns.toSeq == Seq("id", "name", "price", "flag"))
    val rows = back.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1", "2", "3"))
    assert(rows.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("widget"), None, Some("a<b&\"c\">")))
    assert(rows.map(r => Option(r.getString(2))).toSeq ==
      Seq(Some("9.5"), Some("0.25"), None))
    assert(rows.map(r => Option(r.getString(3))).toSeq ==
      Seq(Some("true"), Some("false"), None))
  }

  test("read resolves named sheets, shared strings, and sparse cells") {
    // hand-built workbook per ECMA-376 (NOT our writer's markup): two
    // sheets resolved through workbook.xml + rels, shared-string table
    // with a rich-text (two-run) entry, sparse row via r= references
    val dir = tmpDir()
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name)); zip.write(content.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
      """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      """<sheets><sheet name="Resumen" sheetId="1" r:id="rId1"/>""" +
      """<sheet name="Gastos" sheetId="2" r:id="rId2"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>""" +
      """<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>""" +
      """</Relationships>""")
    entry("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">""" +
      """<si><t>CODIGO_GASTO</t></si><si><t>Sucursal</t></si>""" +
      """<si><r><t>rich </t></r><r><t>text</t></r></si>""" +
      // phonetic furigana guide — must NOT leak into the cell value
      """<si><t>S9</t><rPh sb="0" eb="1"><t>ignored</t></rPh></si></sst>""")
    entry("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>wrong sheet</t></is></c></row>""" +
      """</sheetData></worksheet>""")
    entry("xl/worksheets/sheet2.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>Extra</t></is></c></row>""" +
      """<row r="2"><c r="A2"><v>101</v></c><c r="B2" t="s"><v>3</v></c><c r="C2" t="s"><v>2</v></c></row>""" +
      // C3: multi-run INLINE rich text (runs must concatenate, not
      // last-run-wins); A3/B3 absent -> null
      """<row r="3"><c r="C3" t="inlineStr"><is><r><t>in</t></r><r><t>line</t></r></is></c></row>""" +
      """</sheetData></worksheet>""")
    zip.close()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/gastos.xlsx"), bos.toByteArray)

    val df = Xlsx.read(spark, s"$dir/gastos.xlsx", sheet = Some("Gastos"),
      useCols = Seq("CODIGO_GASTO", "Sucursal"))
    assert(df.columns.toSeq == Seq("CODIGO_GASTO", "Sucursal")) // usecols pruning
    val rows = df.orderBy(col("CODIGO_GASTO").asc_nulls_last).collect()
    assert(rows.map(r => Option(r.getString(0))).toSeq == Seq(Some("101"), None))
    assert(rows.map(r => Option(r.getString(1))).toSeq == Seq(Some("S9"), None))
    // full read sees the rich-text shared string AND the multi-run inline
    // string (concatenated, phonetic guides excluded)
    val full = Xlsx.read(spark, s"$dir/gastos.xlsx", sheet = Some("Gastos"))
    val byExtra = full.select("Extra").collect().map(r => Option(r.getString(0))).toSet
    assert(byExtra == Set(Some("rich text"), Some("inline")))
    // missing sheet fails loudly with the available names
    val e = intercept[IllegalArgumentException] {
      Xlsx.read(spark, s"$dir/gastos.xlsx", sheet = Some("Nope"))
    }
    assert(e.getMessage.contains("Resumen") && e.getMessage.contains("Gastos"))
  }

  test("directory scan parses files distributed, skipping each header") {
    val dir = tmpDir()
    Xlsx.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), s"$dir/part1.xlsx")
    Xlsx.write(Seq((3, "c")).toDF("k", "v"), s"$dir/part2.xlsx")
    val all = Xlsx.read(spark, dir)
    assert(all.count() == 3) // headers of BOTH files skipped
    assert(all.select("k").collect().map(_.getString(0)).toSet == Set("1", "2", "3"))
  }

  test("round-trip property: arbitrary text/nulls survive write -> read") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // XML-legal text (the writer documents dropping chars illegal in XML
    // 1.0 even escaped); exercises quoting, unicode, whitespace edges.
    // Generators sampled directly — no scalatest bridge in the offline
    // cache (same pattern as PropertiesSpec).
    val cell: Gen[Option[String]] = Gen.option(Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf('<', '>', '&', '"', '\'', ' ', '=', '/', 'ß', 'é', '中', '\t'),
      1 -> Gen.choose(0x20.toChar, 0x7e.toChar)
    )).map(_.mkString))
    val table: Gen[List[(Option[String], Option[String])]] =
      Gen.listOfN(8, Gen.zip(cell, cell))
    val dir = tmpDir()
    (1 to 15).foreach { i =>
      val rows = table.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val f = s"$dir/prop$i.xlsx"
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => org.apache.spark.sql.Row(r._1.orNull, r._2.orNull)), 2),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType))))
      Xlsx.write(df, f)
      val back = Xlsx.read(spark, f).collect()
        .map(r => (Option(r.getString(0)), Option(r.getString(1)))).toList
      // order is not part of the contract; compare as multisets
      assert(back.groupBy(identity).view.mapValues(_.size).toMap ==
        rows.groupBy(identity).view.mapValues(_.size).toMap,
        s"seed $i: ${rows.take(3)}...")
    }
  }

  test("duplicate header names are mangled like pandas") {
    val dir = tmpDir()
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row("1", "2", "3"))),
      org.apache.spark.sql.types.StructType(Seq("k", "k", "v").map(n =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType))))
    Xlsx.write(df, s"$dir/dup.xlsx")
    val back = Xlsx.read(spark, s"$dir/dup.xlsx")
    assert(back.columns.toSeq == Seq("k", "k_2", "v"))
    assert(back.select("k_2").head().getString(0) == "2")
  }

  test("write is a bounded dead-letter sink") {
    val dir = tmpDir()
    val big = spark.range(100).selectExpr("id", "cast(id as string) s")
    intercept[IllegalArgumentException] { Xlsx.write(big, s"$dir/cap.xlsx", maxRows = 50) }
    Xlsx.write(big, s"$dir/ok.xlsx", maxRows = 100)
    assert(Xlsx.read(spark, s"$dir/ok.xlsx").count() == 100)
  }
}
