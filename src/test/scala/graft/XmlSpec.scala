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
