package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{CsvIngest, XmlIngest}

class XmlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, true),
    StructField("name", StringType, true),
    StructField("amount", DoubleType, true)))

  test("XML rows read against a declared schema; malformed quarantined") {
    val dir = Files.createDirectories(
      Paths.get(s"target/tmp/xml_${System.nanoTime()}")).toString
    Files.writeString(Paths.get(s"$dir/rows.xml"),
      """<rows>
        |  <row><id>1</id><name>alice</name><amount>10.5</amount></row>
        |  <row><id>2</id><name>bob</name><amount>20.0</amount></row>
        |  <row><id>notanumber</id><name>bad</name><amount>1.0</amount></row>
        |</rows>""".stripMargin)
    val df = XmlIngest.read(spark, s"$dir/rows.xml", "row", schema)
    val good = df.filter(col(CsvIngest.CorruptCol).isNull)
    val bad = df.filter(col(CsvIngest.CorruptCol).isNotNull)
    assert(good.count() + bad.count() == 3)
    assert(bad.count() == 1)
    val got = good.select("id", "name", "amount")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "alice", 10.5), (2L, "bob", 20.0)))
  }

  test("schemaFromXsd: XSD-declared schema drives the read (S7 schema-from-XSD)") {
    val dir = Files.createDirectories(
      Paths.get(s"target/tmp/xsd_${System.nanoTime()}")).toString
    // the shape the reference's "Generate XSD" produces: named row
    // element, sequence of typed leaves, optional element, attribute,
    // a nested complex type, and an unbounded repeat
    val xsd =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="row">
        |    <xs:complexType>
        |      <xs:sequence>
        |        <xs:element name="id" type="xs:long"/>
        |        <xs:element name="name" type="xs:string" minOccurs="0"/>
        |        <xs:element name="amount" type="xs:double" minOccurs="0"/>
        |        <xs:element name="when" type="xs:date" minOccurs="0"/>
        |        <xs:element name="tag" type="xs:string" minOccurs="0"
        |                    maxOccurs="unbounded"/>
        |        <xs:element name="addr" minOccurs="0">
        |          <xs:complexType>
        |            <xs:sequence>
        |              <xs:element name="city" type="xs:string" minOccurs="0"/>
        |              <xs:element name="zip" type="xs:int" minOccurs="0"/>
        |            </xs:sequence>
        |          </xs:complexType>
        |        </xs:element>
        |      </xs:sequence>
        |      <xs:attribute name="src" type="xs:string"/>
        |    </xs:complexType>
        |  </xs:element>
        |</xs:schema>""".stripMargin
    val derived = XmlIngest.schemaFromXsd(xsd, "row")
    assert(derived == StructType(Seq(
      StructField("id", LongType, false),
      StructField("name", StringType, true),
      StructField("amount", DoubleType, true),
      StructField("when", DateType, true),
      StructField("tag", ArrayType(StringType, true), true),
      StructField("addr", StructType(Seq(
        StructField("city", StringType, true),
        StructField("zip", IntegerType, true))), true),
      StructField("_src", StringType, true))), s"derived: $derived")
    Files.writeString(Paths.get(s"$dir/rows.xml"),
      """<rows>
        |  <row src="feed"><id>1</id><name>alice</name><amount>10.5</amount>
        |    <when>2024-03-01</when><tag>a</tag><tag>b</tag>
        |    <addr><city>Riga</city><zip>1010</zip></addr></row>
        |  <row><id>2</id><name>bob</name></row>
        |</rows>""".stripMargin)
    val df = XmlIngest.readWithXsd(spark, s"$dir/rows.xml", "row", xsd)
    assert(df.filter(col(CsvIngest.CorruptCol).isNotNull).count() == 0)
    val r1 = df.filter(col("id") === 1).head
    assert(r1.getAs[String]("_src") == "feed")
    assert(r1.getSeq[String](r1.fieldIndex("tag")).toList == List("a", "b"))
    assert(r1.getAs[org.apache.spark.sql.Row]("addr").getAs[Int]("zip") == 1010)
    assert(r1.getAs[java.sql.Date]("when").toString == "2024-03-01")
    val r2 = df.filter(col("id") === 2).head
    assert(r2.isNullAt(r2.fieldIndex("addr")) && r2.isNullAt(r2.fieldIndex("amount")))
    // the inverse: generateXsd → schemaFromXsd is the identity on the
    // datasource-facing schema (the "Generate XSD" affordance)
    val regen = XmlIngest.generateXsd("row", derived)
    assert(XmlIngest.schemaFromXsd(regen, "row") == derived,
      s"roundtrip drifted:\n$regen")
    // DTDs are refused — no entity expansion from an untrusted schema
    intercept[Exception] {
      XmlIngest.schemaFromXsd(
        "<!DOCTYPE x [<!ENTITY e \"v\">]>" + xsd.dropWhile(_ != '\n'), "row")
    }
  }

  test("schemaFromXsd: recursive complexTypes fail loudly; maxOccurs=0 omits the field") {
    // mutually-recursive named types — valid XSD, no finite relational
    // schema: must be a clear validation error, not a StackOverflowError
    val recursive =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="NodeT">
        |    <xs:sequence>
        |      <xs:element name="label" type="xs:string" minOccurs="0"/>
        |      <xs:element name="next" type="LinkT" minOccurs="0"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |  <xs:complexType name="LinkT">
        |    <xs:sequence>
        |      <xs:element name="node" type="NodeT" minOccurs="0"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |  <xs:element name="row" type="NodeT"/>
        |</xs:schema>""".stripMargin
    val err = intercept[IllegalArgumentException] {
      XmlIngest.schemaFromXsd(recursive, "row")
    }
    assert(err.getMessage.contains("recursive complexType"), err.getMessage)

    // maxOccurs="0" prohibits the element: no field at all (and in
    // particular not an array), per the XSD occurrence semantics
    val prohibited =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="row">
        |    <xs:complexType>
        |      <xs:sequence>
        |        <xs:element name="keep" type="xs:long"/>
        |        <xs:element name="gone" type="xs:string" maxOccurs="0"/>
        |      </xs:sequence>
        |    </xs:complexType>
        |  </xs:element>
        |</xs:schema>""".stripMargin
    assert(XmlIngest.schemaFromXsd(prohibited, "row") ==
      StructType(Seq(StructField("keep", LongType, false))))

    // a named type USED TWICE without recursion is fine (diamond ≠ cycle)
    val diamond =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:complexType name="AddrT">
        |    <xs:sequence>
        |      <xs:element name="city" type="xs:string" minOccurs="0"/>
        |    </xs:sequence>
        |  </xs:complexType>
        |  <xs:element name="row">
        |    <xs:complexType>
        |      <xs:sequence>
        |        <xs:element name="home" type="AddrT" minOccurs="0"/>
        |        <xs:element name="work" type="AddrT" minOccurs="0"/>
        |      </xs:sequence>
        |    </xs:complexType>
        |  </xs:element>
        |</xs:schema>""".stripMargin
    val twice = XmlIngest.schemaFromXsd(diamond, "row")
    assert(twice.fieldNames.toSeq == Seq("home", "work"))
  }

  test("from_xml parses embedded XML payload columns") {
    val df = Seq(
      (1L, "<item><name>widget</name><amount>5.5</amount></item>")
    ).toDF("id", "payload")
    val inner = StructType(Seq(
      StructField("name", StringType, true),
      StructField("amount", DoubleType, true)))
    val parsed = df.select(
      col("id"),
      XmlIngest.parseColumn(col("payload"), inner).as("p"))
    val row = parsed.select("p.name", "p.amount").head
    assert(row.getString(0) == "widget" && row.getDouble(1) == 5.5)
  }
}
