package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** XML source (SURVEY S7; reference: …/Глава 05…md:34, …/Глава
  * 13…md:62-68 — XML rows with an XSD-declared schema).
  *
  * Spark 4 ships a native XML datasource (the former spark-xml),
  * so this is a thin composition: explicit schema — declared directly
  * as a StructType or derived from an XSD document
  * ([[schemaFromXsd]]), the reference's schema-from-XSD story —
  * PERMISSIVE corrupt capture (same quarantine discipline as the CSV
  * path), plus `from_xml` for XML-typed columns embedded in other
  * tables.
  */
object XmlIngest {

  /** Read an XML file of repeated `rowTag` elements against a declared
    * schema; malformed elements land in `_corrupt_record`.
    */
  def read(
      spark: SparkSession, path: String, rowTag: String,
      schema: StructType): DataFrame = {
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(
        CsvIngest.CorruptCol, org.apache.spark.sql.types.StringType, true))
    spark.read
      .format("xml")
      .option("rowTag", rowTag)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CsvIngest.CorruptCol)
      .schema(withCorrupt)
      .load(path)
      .cache() // same corrupt-record-only query restriction as CSV
  }

  /** Parse an XML-typed STRING column into a struct (the per-column
    * `from_xml` form for XML payloads embedded in relational rows).
    */
  def parseColumn(c: Column, schema: StructType): Column =
    from_xml(c, schema)

  /** [[read]] with the row schema declared by an XSD document instead
    * of a hand-built StructType (…/Глава 13…md:62-68: "работа с XML
    * почти всегда требует XSD-схемы").
    */
  def readWithXsd(
      spark: SparkSession, path: String, rowTag: String,
      xsd: String): DataFrame =
    read(spark, path, rowTag, schemaFromXsd(xsd, rowTag))

  private val XsNs = "http://www.w3.org/2001/XMLSchema"

  /** Derive the row StructType from an XSD: the subset the reference's
    * generated schemas use — a (possibly named) complexType holding an
    * `xs:sequence`/`xs:all` of typed elements, nested complex types
    * (→ nested structs), `maxOccurs="unbounded"` (→ arrays),
    * `minOccurs="0"`/`nillable` (→ nullable), and attributes (→ the
    * datasource's `_`-prefixed fields). Unknown simple types degrade
    * to string — the PERMISSIVE read surfaces them rather than
    * failing, mirroring the reference's "generate, then fix types by
    * hand" advice. DTDs are refused (no entity expansion from an
    * untrusted schema document).
    */
  def schemaFromXsd(xsd: String, rowTag: String): StructType = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    val doc = f.newDocumentBuilder().parse(
      new org.xml.sax.InputSource(new java.io.StringReader(xsd)))
    val schemaEl = doc.getDocumentElement
    require(schemaEl.getLocalName == "schema" &&
      schemaEl.getNamespaceURI == XsNs,
      s"not an XSD document: root <${schemaEl.getTagName}>")
    val namedTypes = children(schemaEl, "complexType")
      .flatMap(ct => Option(ct.getAttribute("name")).filter(_.nonEmpty)
        .map(_ -> ct)).toMap
    val rowEl = children(schemaEl, "element")
      .find(_.getAttribute("name") == rowTag)
      .getOrElse(throw new IllegalArgumentException(
        s"XSD declares no top-level <xs:element name=\"$rowTag\">"))
    complexTypeOf(rowEl, namedTypes) match {
      case Some(st) => st
      case None => throw new IllegalArgumentException(
        s"row element <$rowTag> has a simple type — row tags need a complexType")
    }
  }

  /** The inverse — emit an XSD for a row StructType, mirroring the
    * reference's "Generate XSD" affordance (schema inference writes a
    * schema document a downstream consumer can validate against).
    * Array element types emit `maxOccurs="unbounded"`; `_`-prefixed
    * fields emit as attributes.
    */
  def generateXsd(rowTag: String, schema: StructType): String = {
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= s"""<xs:schema xmlns:xs="$XsNs">\n"""
    def emitComplex(st: StructType, indent: String): Unit = {
      val (attrs, elems) = st.fields.partition(_.name.startsWith("_"))
      sb ++= s"$indent<xs:complexType>\n"
      sb ++= s"$indent  <xs:sequence>\n"
      elems.foreach(f => emitField(f, s"$indent    "))
      sb ++= s"$indent  </xs:sequence>\n"
      attrs.foreach { a =>
        sb ++= s"""$indent  <xs:attribute name="${a.name.drop(1)}" """ +
          s"""type="${simpleName(a.dataType)}"""" +
          (if (!a.nullable) " use=\"required\"" else "") + "/>\n"
      }
      sb ++= s"$indent</xs:complexType>\n"
    }
    def emitField(f: StructField, indent: String): Unit = {
      val (dt, occurs) = f.dataType match {
        case ArrayType(et, _) => (et, " maxOccurs=\"unbounded\"")
        case other => (other, "")
      }
      val min = if (f.nullable) " minOccurs=\"0\"" else ""
      dt match {
        case st: StructType =>
          sb ++= s"""$indent<xs:element name="${f.name}"$min$occurs>\n"""
          emitComplex(st, indent + "  ")
          sb ++= s"$indent</xs:element>\n"
        case simple =>
          sb ++= s"""$indent<xs:element name="${f.name}" """ +
            s"""type="${simpleName(simple)}"$min$occurs/>\n"""
      }
    }
    sb ++= s"""  <xs:element name="$rowTag">\n"""
    emitComplex(schema, "    ")
    sb ++= "  </xs:element>\n</xs:schema>\n"
    sb.result()
  }

  private def children(
      e: org.w3c.dom.Element, local: String): Seq[org.w3c.dom.Element] = {
    val out = Seq.newBuilder[org.w3c.dom.Element]
    var n = e.getFirstChild
    while (n != null) {
      n match {
        case el: org.w3c.dom.Element
            if el.getLocalName == local && el.getNamespaceURI == XsNs =>
          out += el
        case _ =>
      }
      n = n.getNextSibling
    }
    out.result()
  }

  /** The element's complexType (inline or named), or None when simple.
    * `visiting` holds the NAMED types on the current resolution stack:
    * a self- or mutually-recursive complexType is valid XSD but has no
    * finite relational schema, so it must fail loudly as a validation
    * error, not blow the stack.
    */
  private def complexTypeOf(
      el: org.w3c.dom.Element,
      named: Map[String, org.w3c.dom.Element],
      visiting: Set[String] = Set.empty): Option[StructType] = {
    val typeName = stripPrefix(el.getAttribute("type"))
    children(el, "complexType").headOption
      .map(structOf(_, named, visiting))
      .orElse(named.get(typeName).map { ct =>
        require(!visiting(typeName),
          s"recursive complexType '$typeName' (cycle through " +
            s"${(visiting + typeName).toSeq.sorted.mkString(" -> ")}): " +
            "XSD type recursion cannot map to a finite Spark schema")
        structOf(ct, named, visiting + typeName)
      })
  }

  private def structOf(
      ct: org.w3c.dom.Element,
      named: Map[String, org.w3c.dom.Element],
      visiting: Set[String] = Set.empty): StructType = {
    val body = (children(ct, "sequence") ++ children(ct, "all")).headOption
    val elemFields = body.toSeq.flatMap(children(_, "element"))
      // maxOccurs="0" PROHIBITS the element — no field, not a 0-ary array
      .filterNot(_.getAttribute("maxOccurs") == "0")
      .map { el =>
      val name = el.getAttribute("name")
      val nullable = el.getAttribute("minOccurs") == "0" ||
        el.getAttribute("nillable") == "true"
      val base = complexTypeOf(el, named, visiting)
        .getOrElse(simpleType(stripPrefix(el.getAttribute("type"))))
      val max = el.getAttribute("maxOccurs")
      val dt =
        if (max == "unbounded" || max.exists(_.isDigit) && max != "1")
          ArrayType(base, containsNull = nullable)
        else base
      StructField(name, dt, nullable)
    }
    // attributes land as the datasource's `_`-prefixed fields
    val attrFields = children(ct, "attribute").map { at =>
      StructField("_" + at.getAttribute("name"),
        simpleType(stripPrefix(at.getAttribute("type"))),
        at.getAttribute("use") != "required")
    }
    StructType(elemFields ++ attrFields)
  }

  private def stripPrefix(t: String): String =
    t.substring(t.indexOf(':') + 1)

  private def simpleType(local: String): DataType = local match {
    case "int" => IntegerType
    case "integer" | "long" | "positiveInteger" | "nonNegativeInteger" =>
      LongType
    case "short" => ShortType
    case "byte" => ByteType
    case "decimal" => DecimalType(38, 18)
    case "double" => DoubleType
    case "float" => FloatType
    case "boolean" => BooleanType
    case "date" => DateType
    case "dateTime" => TimestampType
    case _ => StringType // string and the "fix by hand" remainder
  }

  private def simpleName(dt: DataType): String = dt match {
    case IntegerType => "xs:int"
    case LongType => "xs:long"
    case ShortType => "xs:short"
    case ByteType => "xs:byte"
    case _: DecimalType => "xs:decimal"
    case DoubleType => "xs:double"
    case FloatType => "xs:float"
    case BooleanType => "xs:boolean"
    case DateType => "xs:date"
    case TimestampType => "xs:dateTime"
    case _ => "xs:string"
  }
}
