package graft.sources

import org.apache.spark.sql.types._

/** The reference's canonical scalar type lattice (SURVEY §1.2), defined
  * twice in the migration scripts — bash CASE and Python dict,
  * Integration/Scripts/Перелив данных из PostgreSQL в ClickHouse.md:29-45,
  * 171-197 and Integration/Scripts/Скрипт для миграции….md:31-52 — here
  * as data: PostgreSQL information_schema type names → Spark types.
  */
object TypeMatrix {

  /** Column metadata row, mirroring `information_schema.columns`
    * (FIXTURES §4).
    */
  final case class ColMeta(
      name: String,
      dataType: String,
      nullable: Boolean = true,
      precision: Option[Int] = None,
      scale: Option[Int] = None,
      maxLen: Option[Int] = None,
      ordinal: Int = 0)

  /** PG type name → Spark type. Unknown types land as StringType, the
    * reference's own fallback ("ClickHouse не имеет точного аналога" →
    * String, …Скрипт….md:42).
    */
  def sparkType(pgType: String, precision: Option[Int] = None,
      scale: Option[Int] = None): DataType =
    pgType.toLowerCase match {
      case "smallint"                      => ShortType
      case "integer" | "int" | "int4"      => IntegerType
      case "bigint" | "int8"               => LongType
      case "real" | "float4"               => FloatType
      case "double precision" | "float8"   => DoubleType
      case "numeric" | "decimal"           =>
        DecimalType(precision.getOrElse(38), scale.getOrElse(18))
      case "boolean"                       => BooleanType
      case "date"                          => DateType
      case "timestamp" | "timestamptz" |
           "timestamp without time zone" |
           "timestamp with time zone"      => TimestampType
      case "bytea"                         => BinaryType
      case "text" | "character varying" | "varchar" | "character" |
           "char" | "json" | "jsonb" | "uuid" | "time" => StringType
      case _                               => StringType
    }

  def structType(cols: Seq[ColMeta]): StructType =
    StructType(cols.sortBy(_.ordinal).map(c =>
      StructField(c.name, sparkType(c.dataType, c.precision, c.scale), c.nullable)))

  /** All-`String` staging twin of a schema — the `_str` landing table
    * pattern (…Скрипт….md:64-65,84-96): land everything as nullable
    * text, promote with typed casts afterwards.
    */
  def stagingType(cols: Seq[ColMeta]): StructType =
    StructType(cols.sortBy(_.ordinal).map(c => StructField(c.name, StringType, true)))

  /** Spark SQL DDL for the typed target table — the generator the
    * reference builds with STRING_AGG ORDER BY ordinal_position
    * (…Скрипт….md:29-55). Sort key ≈ the MergeTree ORDER BY derived
    * from the PG primary key (…Перелив….md:27-46).
    */
  def createTableSql(table: String, cols: Seq[ColMeta], sortKey: Seq[String] = Nil): String = {
    val colDefs = cols.sortBy(_.ordinal).map { c =>
      val t = sparkType(c.dataType, c.precision, c.scale).sql
      val nn = if (c.nullable) "" else " NOT NULL"
      s"  ${c.name} $t$nn"
    }.mkString(",\n")
    val cluster =
      if (sortKey.nonEmpty) s"\nCLUSTERED BY (${sortKey.mkString(", ")}) SORTED BY (${sortKey.mkString(", ")}) INTO 32 BUCKETS"
      else ""
    s"CREATE TABLE $table (\n$colDefs\n) USING PARQUET$cluster"
  }

  /** The typed-promote `INSERT … SELECT CAST(...)` statement from the
    * staging table (…Скрипт….md:84-96).
    */
  def insertSelectSql(target: String, staging: String, cols: Seq[ColMeta]): String = {
    val casts = cols.sortBy(_.ordinal).map { c =>
      val t = sparkType(c.dataType, c.precision, c.scale).sql
      s"CAST(${c.name} AS $t) AS ${c.name}"
    }.mkString(", ")
    s"INSERT INTO $target SELECT $casts FROM $staging"
  }

  /** Introspect a Spark schema back into ColMeta rows (the engine-side
    * `information_schema` scan, SURVEY S2).
    */
  def introspect(schema: StructType): Seq[ColMeta] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val (pg, p, sc) = f.dataType match {
        case ShortType          => ("smallint", None, None)
        case IntegerType        => ("integer", None, None)
        case LongType           => ("bigint", None, None)
        case FloatType          => ("real", None, None)
        case DoubleType         => ("double precision", None, None)
        case d: DecimalType     => ("numeric", Some(d.precision), Some(d.scale))
        case BooleanType        => ("boolean", None, None)
        case DateType           => ("date", None, None)
        case TimestampType      => ("timestamp", None, None)
        case BinaryType         => ("bytea", None, None)
        case _                  => ("text", None, None)
      }
      ColMeta(f.name, pg, f.nullable, p, sc, None, i + 1)
    }.toSeq
}
