package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Excel (.xlsx) source + sink (SURVEY S6; reference: …/Глава 05…md:30
  * lists Excel among the flat-file connection managers, …/Глава
  * 13…md:36 advises converting Excel to delimited text first). The
  * reference's own advice is the reason this stayed out of scope for
  * five rounds — but a user of the reference DOES have .xlsx landing
  * in their inbox, so the engine now reads and writes it natively.
  *
  * Zero new dependencies: an .xlsx is a ZIP of SpreadsheetML XML
  * parts, and the JDK ships both halves (`java.util.zip` + StAX
  * `javax.xml.stream`). The subset implemented is the data-intechange
  * core: one worksheet of typed cells — numbers, booleans, shared
  * strings, inline strings, formula cached values — with sparse-cell
  * and rich-text handling. NOT implemented (documented, refused or
  * ignored rather than misread): cell styles (so date cells surface
  * as their raw day-number serial, the honest form — interpreting
  * them needs the styles part's number-format table), merged ranges,
  * and multiple sheets per file (the first sheet is read).
  *
  * Scale posture: a single .xlsx is format-bounded (1,048,576 rows
  * per sheet) — there is no 100 TB Excel file, there are MANY SMALL
  * ones. The reader therefore rides `binaryFile` (one row per file,
  * many files per task — Spark packs small files by
  * `maxPartitionBytes`) and parses inside the executors; the writer
  * shards one .xlsx PER PARTITION into a directory (the part-file
  * convention), so export parallelism equals partition count. Driver
  * never touches cell data in either direction.
  */
object Xlsx {

  /** Format-inherent sheet capacity (rows, including the header). */
  val MaxRowsPerSheet: Int = 1048576

  // ---------------------------------------------------------------- read

  /** Read a directory/glob of .xlsx files into the all-string staging
    * shape of `target` (same contract as [[CsvIngest.readStaging]]:
    * every target column as a string, plus `_corrupt_record`), mapping
    * header names to target fields per file. Files whose ZIP/XML is
    * unreadable become ONE quarantine row each (never a task failure);
    * a header missing a target field yields NULLs for that column.
    * Downstream is the shared staging discipline: [[CsvIngest
    * .splitCorrupt]] → [[CsvIngest.enforceBudget]] → [[CsvIngest
    * .promote]].
    */
  def readStaging(
      spark: SparkSession, path: String, target: StructType,
      header: Boolean = true): DataFrame = {
    val names = target.fields.map(_.name).toSeq
    val staging = StructType(
      target.fields.map(f => StructField(f.name, StringType, true)) :+
        StructField(CsvIngest.CorruptCol, StringType, true))
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    bin.mapPartitions { files =>
      files.flatMap { f =>
        val fPath = f.getString(0)
        try {
          val rows = parseWorkbook(f.getAs[Array[Byte]](1))
          val (hdr, data) =
            if (header && rows.nonEmpty) (rows.head, rows.tail)
            else (names.zipWithIndex.map { case (n, i) => (i, n) }, rows)
          // header name -> sheet column index (first wins on dup names)
          val byName = hdr.reverse.map { case (i, v) => (v, i) }.toMap
          val slots = names.map(byName.get)
          // completely empty <row/> elements are formatting residue,
          // not data — skip them rather than emit all-NULL rows
          data.iterator.filter(_.nonEmpty).map { cells =>
            val m = cells.toMap
            Row.fromSeq(slots.map(_.flatMap(m.get).orNull) :+ null)
          }
        } catch {
          case e: Exception =>
            Iterator.single(Row.fromSeq(
              Seq.fill[Any](names.size)(null) :+ s"$fPath: ${e.getMessage}"))
        }
      }
    }(org.apache.spark.sql.Encoders.row(staging))
      .cache() // callers immediately split on the corrupt column
  }

  /** One worksheet as sparse rows: per row, the (columnIndex ->
    * stringValue) cells that are present. Pure function of the file
    * bytes — runs inside executor tasks.
    */
  private[sources] def parseWorkbook(bytes: Array[Byte]): Seq[Seq[(Int, String)]] = {
    val parts = neededParts(bytes)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Vector.empty)
    val sheet = parts.collectFirst {
      // resolving via workbook rels buys nothing for single-sheet
      // interchange files; take the conventional first sheet
      case (name, b) if name == "xl/worksheets/sheet1.xml" => b
    }.orElse(parts.collectFirst {
      case (name, b) if name.startsWith("xl/worksheets/") => b
    }).getOrElse(throw new IllegalArgumentException("no worksheet part found"))
    parseSheet(sheet, shared)
  }

  /** Extract only the ZIP entries the parse needs (worksheets + shared
    * strings); everything else streams past unbuffered.
    */
  private def neededParts(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val out = mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml" || name.startsWith("xl/worksheets/")) {
          val buf = new ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
          out(name) = buf.toByteArray
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  /** Hardened StAX reader: DTDs and external entities off (untrusted
    * input — a spreadsheet from an inbox must not be an XXE vector).
    */
  private def xmlReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** sharedStrings.xml → string table. Each `<si>` concatenates ALL
    * its `<t>` runs (rich-text items split one logical string across
    * formatting runs).
    */
  private[sources] def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = xmlReader(bytes)
    val items = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => cur.clear()
              case "t" => inT = true
              case _ =>
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
            cur.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => items += cur.result()
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    items.result()
  }

  /** sheetN.xml → sparse rows. Cell value semantics by the `t` attr:
    * `s` = shared-string index, `inlineStr` = nested `<is><t>` runs,
    * `b` = boolean 0/1, `str` = formula cached string, `e` = error
    * literal, absent = number (or a date serial — styles are not
    * interpreted, see the object doc). Cells without an `r` ref take
    * the position after the previous cell, per the spec's default.
    */
  private[sources] def parseSheet(
      bytes: Array[Byte], shared: Vector[String]): Seq[Seq[(Int, String)]] = {
    val r = xmlReader(bytes)
    val rows = Seq.newBuilder[Seq[(Int, String)]]
    var cells: mutable.ArrayBuffer[(Int, String)] = null
    var colIdx = -1          // index of the CURRENT cell
    var cellType = ""
    var text = new StringBuilder
    var capture = false      // inside <v> or an inline <t>
    var inRow = false
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                inRow = true
                cells = mutable.ArrayBuffer.empty
                colIdx = -1
              case "c" if inRow =>
                val ref = r.getAttributeValue(null, "r")
                colIdx = if (ref != null) colOf(ref) else colIdx + 1
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                text = new StringBuilder
              case "v" if inRow => capture = true
              case "t" if inRow && cellType == "inlineStr" => capture = true
              case _ =>
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if capture =>
            text.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => capture = false
              case "t" if cellType == "inlineStr" => capture = false
              case "c" if inRow =>
                val raw = text.result()
                val value = cellType match {
                  case "s" =>
                    val i = raw.trim.toInt
                    if (i < 0 || i >= shared.size)
                      throw new IllegalArgumentException(
                        s"shared string index $i out of range (${shared.size})")
                    shared(i)
                  case "b" => if (raw.trim == "1") "true" else "false"
                  case _ => raw // inlineStr runs, numbers, str, e
                }
                // empty untyped cells (<c r="A1"/>) carry no value
                if (value.nonEmpty || cellType == "s" || cellType == "inlineStr")
                  cells += ((colIdx, value))
              case "row" =>
                inRow = false
                rows += cells.toSeq
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.result()
  }

  /** "BC7" → 0-based column index 54. */
  private[graft] def colOf(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** 0-based column index → "A".."Z","AA".. */
  private[graft] def colName(idx: Int): String = {
    var i = idx + 1
    val sb = new StringBuilder
    while (i > 0) {
      val rem = (i - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      i = (i - 1) / 26
    }
    sb.result()
  }

  // --------------------------------------------------------------- write

  /** Export one .xlsx per partition into `dir` (part-file convention:
    * `part-NNNNN.xlsx`) — the parallel-export shape (S15): each task
    * streams its own ZIP straight to the target FileSystem, driver
    * handles only paths. Numeric and boolean columns become native
    * Excel cell types; everything else is an inline string (no shared-
    * string table — interchange files are written once and read once,
    * so dictionary-encoding strings buys nothing and costs a second
    * pass). NULLs are omitted cells. A partition exceeding the sheet
    * cap fails loudly with the repartition remedy.
    */
  def writeSharded(df: DataFrame, dir: String, sheetName: String = "data"): Seq[String] = {
    val schema = df.schema
    val conf = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new Path(dir)
    val fs0 = out.getFileSystem(conf.value)
    fs0.delete(out, true)
    fs0.mkdirs(out)
    // one (path) row per partition comes back — metadata-bounded
    df.rdd.mapPartitionsWithIndex { (pid, iter) =>
      val part = new Path(dir, f"part-$pid%05d.xlsx")
      val fs = part.getFileSystem(conf.value)
      val os = fs.create(part, true)
      try writeWorkbook(os, schema, sheetName, iter)
      finally os.close()
      Iterator.single(part.toString)
    }.collect().toSeq
  }

  /** Single-file convenience: ONE task writes `path` (the "send me an
    * Excel" shape). Same sheet cap; same cell typing.
    */
  def write(df: DataFrame, path: String, sheetName: String = "data"): Unit = {
    val schema = df.schema
    val conf = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.coalesce(1).rdd.mapPartitionsWithIndex { (_, iter) =>
      val p = new Path(path)
      val fs = p.getFileSystem(conf.value)
      val os = fs.create(p, true)
      try writeWorkbook(os, schema, sheetName, iter)
      finally os.close()
      Iterator.single(path)
    }.collect()
    ()
  }

  /** Stream one workbook: fixed package scaffolding, then the sheet
    * rows straight from the iterator — nothing is buffered beyond the
    * current row, so memory is O(row), not O(partition).
    */
  private[graft] def writeWorkbook(
      os: java.io.OutputStream, schema: StructType, sheetName: String,
      rows: Iterator[Row], maxRows: Int = MaxRowsPerSheet): Unit = {
    val isNum = schema.fields.map(_.dataType match {
      case _: NumericType => true
      case _ => false
    })
    val isBool = schema.fields.map(_.dataType == BooleanType)
    val zip = new ZipOutputStream(os)
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
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        s"""<sheets><sheet name="${escapeXml(sheetName)}" sheetId="1" r:id="rId1"/></sheets>""" +
        """</workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>""")
    zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(zip, "UTF-8"))
    w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    var rowNum = 1
    def startRow(): Unit = { w.write(s"""<row r="$rowNum">"""); rowNum += 1 }
    def endRow(): Unit = w.write("</row>")
    def strCell(c: Int, v: String): Unit = {
      w.write(s"""<c r="${colName(c)}${rowNum - 1}" t="inlineStr"><is><t xml:space="preserve">""")
      w.write(escapeXml(v))
      w.write("</t></is></c>")
    }
    // header row: column names as inline strings
    startRow()
    schema.fields.zipWithIndex.foreach { case (f, i) => strCell(i, f.name) }
    endRow()
    rows.foreach { row =>
      if (rowNum > maxRows)
        throw new IllegalStateException(
          s"partition exceeds the .xlsx sheet cap ($maxRows rows incl. " +
            "header); repartition the DataFrame into more output shards")
      startRow()
      var i = 0
      while (i < schema.length) {
        if (!row.isNullAt(i)) {
          val finite = !isNum(i) || (row.get(i) match {
            case d: Double => !d.isNaN && !d.isInfinite
            case f: Float => !f.isNaN && !f.isInfinite
            case _ => true
          })
          if (isNum(i) && finite)
            w.write(s"""<c r="${colName(i)}${rowNum - 1}"><v>${row.get(i)}</v></c>""")
          else if (isBool(i))
            w.write(s"""<c r="${colName(i)}${rowNum - 1}" t="b"><v>${if (row.getBoolean(i)) 1 else 0}</v></c>""")
          else strCell(i, String.valueOf(row.get(i)))
        }
        i += 1
      }
      endRow()
    }
    w.write("</sheetData></worksheet>")
    w.flush()
    zip.closeEntry()
    zip.finish()
  }

  /** XML 1.0 text escape; invalid-in-XML control chars are dropped
    * (they cannot be represented — documented lossy edge, same policy
    * as every spreadsheet writer).
    */
  private[sources] def escapeXml(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c if c >= 0x20 || c == '\t' || c == '\n' || c == '\r' => sb.append(c)
      case _ =>
    }
    sb.result()
  }
}

/** Minimal serializable Hadoop-conf carrier for task-side FileSystem
  * resolution (Spark's own equivalent is `private[spark]`).
  */
final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
