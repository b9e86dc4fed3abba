package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) ingest with the same quarantine +
  * error-budget contract as [[CsvIngest]] (SURVEY S3/S4/P10 applied
  * to the interchange format a training-data pipeline actually
  * receives — web-scraped corpora, API dumps, and annotation exports
  * all arrive as JSONL).
  *
  * Unlike the delimited path, JSON self-describes its values, so
  * there is no all-string staging hop: the read lands directly in the
  * TYPED target schema, and a line that fails to parse OR whose
  * values do not fit a declared type is captured whole in
  * `_corrupt_record` (PERMISSIVE — never dropped, same error-table
  * contract as CsvIngest; reference: …/Глава 17…md:88-93 on
  * quarantine-not-drop, …Перелив….md:126-128 on the error budget).
  * [[CsvIngest.splitCorrupt]] and [[CsvIngest.enforceBudget]] apply
  * unchanged — the corrupt-column protocol is shared.
  */
object JsonIngest {

  /** Read JSONL into `target` + `_corrupt_record`, PERMISSIVE.
    * The cache barrier is REQUIRED for the same reason as CsvIngest:
    * Spark refuses queries touching only the internal corrupt-record
    * column of a raw JSON scan; callers immediately split on it.
    */
  def readStaging(
      spark: SparkSession, path: String, target: StructType): DataFrame = {
    val staged = StructType(
      target.fields :+ StructField(CsvIngest.CorruptCol, StringType, true))
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CsvIngest.CorruptCol)
      .schema(staged)
      .json(path)
      .cache()
  }

  /** Export as JSONL — the `COPY TO` side of the interchange. */
  def writeInterchange(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
