package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{CsvIngest, Xlsx}

class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private val tmp = "target/tmp/xlsx-spec"

  test("column ref codec round-trips (A..Z, AA.., BC7-style refs)") {
    assert(Xlsx.colName(0) == "A" && Xlsx.colName(25) == "Z")
    assert(Xlsx.colName(26) == "AA" && Xlsx.colName(27) == "AB")
    assert(Xlsx.colOf("BC7") == 54)
    (0 until 1000).foreach { i =>
      assert(Xlsx.colOf(Xlsx.colName(i) + "1") == i, s"col $i")
    }
  }

  test("write → read staging → promote round-trips types, nulls, and hostile strings") {
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("score", DoubleType),
      StructField("flag", BooleanType),
      StructField("note", StringType)))
    val rows = Seq(
      Row(1L, 3.25, true, "plain"),
      Row(2L, -0.125, false, "<tag>&amp; \"quotes\""),
      Row(3L, 1.23456789e8, null, "  padded  "),     // xml:space=preserve
      Row(4L, null, true, "multi\nline\twith unicode ẞ→"),
      Row(5L, 0.1, false, ""),                        // empty ≠ null
      Row(6L, Double.NaN, null, null))                // NaN survives as string
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), target)
    val out = s"$tmp/roundtrip"
    val parts = Xlsx.writeSharded(df, out)
    assert(parts.size == 2, "one shard per partition")
    val (good, bad) = CsvIngest.splitCorrupt(
      Xlsx.readStaging(spark, out, target), runId = "t")
    assert(bad.count() == 0)
    // NaN fails the double try_cast? No — Spark parses "NaN"; check below
    val (typed, errs) = CsvIngest.promote(good, target, runId = "t")
    assert(errs.count() == 0)
    val got = typed.collect().map(r => (r.getLong(0), r)).toMap
    assert(got(1L) == Row(1L, 3.25, true, "plain"))
    assert(got(2L) == Row(2L, -0.125, false, "<tag>&amp; \"quotes\""))
    assert(got(3L).getDouble(1) == 1.23456789e8)
    assert(got(3L).getString(3) == "  padded  ")
    assert(got(4L).getString(3) == "multi\nline\twith unicode ẞ→")
    assert(got(5L).getString(3) == "", "empty string cell survives as empty, not null")
    assert(got(4L).isNullAt(1) && got(6L).isNullAt(3), "omitted cells read as null")
    assert(got(6L).getDouble(1).isNaN, "non-finite doubles fall back to string cells and re-cast")
  }

  test("reads a foreign workbook: shared strings, rich-text runs, sparse cells, formula values") {
    // hand-built by a DIFFERENT code path than the writer: shared
    // strings (our writer never emits them), rich-text <si> with two
    // runs, cells missing `r` refs, a formula's cached <v>, sparse rows
    val sst =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">""" +
        """<si><t>alpha</t></si>""" +
        """<si><r><t>ri</t></r><r><rPr><b/></rPr><t>ch</t></r></si>""" +
        """<si><t xml:space="preserve"> sp </t></si></sst>"""
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>v</t></is></c><c r="C1" t="inlineStr"><is><t>w</t></is></c></row>""" +
        """<row r="2"><c t="s"><v>1</v></c><c><v>42</v></c><c t="b"><v>1</v></c></row>""" + // no r refs: sequential
        """<row r="3"><c r="A3" t="s"><v>2</v></c><c r="C3" t="str"><v>7.5</v></c></row>""" + // sparse: B3 absent
        """<row r="4"/>""" + // empty row
        """</sheetData></worksheet>"""
    val dir = Paths.get(s"$tmp/foreign")
    Files.createDirectories(dir)
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    Seq("xl/sharedStrings.xml" -> sst, "xl/worksheets/sheet1.xml" -> sheet)
      .foreach { case (n, c) =>
        zip.putNextEntry(new ZipEntry(n)); zip.write(c.getBytes("UTF-8")); zip.closeEntry()
      }
    zip.finish()
    Files.write(dir.resolve("book.xlsx"), bos.toByteArray)
    val target = StructType(Seq(
      StructField("alpha", StringType),
      StructField("v", LongType),
      StructField("w", StringType)))
    val (good, bad) = CsvIngest.splitCorrupt(
      Xlsx.readStaging(spark, dir.toString, target), runId = "t")
    assert(bad.count() == 0)
    val (typed, errs) = CsvIngest.promote(good, target, runId = "t")
    assert(errs.count() == 0)
    val got = typed.orderBy(col("alpha")).collect()
    assert(got.length == 2, "header consumed, empty row 4 contributes nothing")
    assert(got(0) == Row(" sp ", null, "7.5"), "sparse row keeps NULL for the absent cell; xml:space text survives")
    assert(got(1) == Row("rich", 42L, "true"), "rich-text runs concatenate; bare cells take sequential refs")
  }

  test("an unreadable file quarantines as one corrupt row; good files survive") {
    val dir = Paths.get(s"$tmp/mixed")
    Files.createDirectories(dir)
    val target = StructType(Seq(StructField("id", LongType)))
    Xlsx.write(Seq(1L, 2L).toDF("id"), s"$dir/good.xlsx")
    Files.write(dir.resolve("bad.xlsx"), "this is not a zip".getBytes)
    val (good, bad) = CsvIngest.splitCorrupt(
      Xlsx.readStaging(spark, dir.toString, target), runId = "t")
    assert(good.count() == 2)
    val q = bad.collect()
    assert(q.length == 1 && q(0).getString(0).contains("bad.xlsx"))
  }

  test("a partition exceeding the sheet cap refuses with the repartition remedy") {
    val schema = StructType(Seq(StructField("id", LongType)))
    val it = (0L until 10L).iterator.map(i => Row(i))
    val e = intercept[IllegalStateException] {
      Xlsx.writeWorkbook(new ByteArrayOutputStream(), schema, "s", it, maxRows = 5)
    }
    assert(e.getMessage.contains("repartition"))
  }
}
