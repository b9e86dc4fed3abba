package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver-generated star schema
  * (`/root/testdata/sf*` — see TESTDATA.md). Every operator in the
  * engine takes DataFrames; this is just the canonical loader so query
  * entries stay one-liners.
  *
  * Scale posture: these are plain parquet scans — Catalyst pushes
  * filters and prunes columns into the scan, so callers should chain
  * `.select`/`.filter` directly rather than caching wide tables.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` normalized to session-zoned TimestampType however the
    * generator wrote it. TIMESTAMP(NANOS) parquet (which Spark 4
    * refuses to read as a timestamp) arrives as a nanos long under the
    * legacy flag and integer-divides to micros (a double division
    * would lose precision above 2^53 ns); TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false arrives as TIMESTAMP_NTZ and reinterprets
    * in the UTC session zone — the same instants either way.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
