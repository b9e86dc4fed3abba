package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** XML source (SURVEY S7; reference: …/Глава 05…md:34, …/Глава
  * 13…md:62-68 — XML rows with an XSD-declared schema).
  *
  * Spark 4 ships a native XML datasource (the former spark-xml),
  * so this is a thin composition: explicit schema (the XSD analog),
  * PERMISSIVE corrupt capture — same quarantine discipline as the CSV
  * path — plus `from_xml` for XML-typed columns embedded in other
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
}
