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
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read as a timestamp. Read nanos as long (legacy flag) and convert
    * to microsecond TimestampType with integer division (a double
    * division would lose precision above 2^53 ns).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
