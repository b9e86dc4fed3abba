package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Error-tolerant delimited ingest + all-string staging promote
  * (SURVEY S1/S3/S4/S14, P10; reference: Integration/Scripts/Перелив
  * данных из PostgreSQL в ClickHouse.md:76-129 — `COPY … DELIMITER '^'
  * NULL 'NULL'` export, import with
  * `input_format_allow_errors_num/ratio` budget; …/Глава 23…md:24-29 —
  * error-row redirect with ErrorCode/ErrorColumn).
  *
  * Shape: PERMISSIVE parse lands everything (good rows typed/stringly,
  * bad rows quarantined with metadata — never dropped, …/Глава
  * 17…md:88-93), an explicit error budget fails the load when the bad
  * fraction exceeds the reference's tolerance, and the promote step
  * casts the all-string staging into the typed target, redirecting
  * rows whose casts fail. All single-pass scans; the budget check is
  * one count.
  */
object CsvIngest {

  val CorruptCol = "_corrupt_record"

  final case class ErrorBudgetExceeded(bad: Long, total: Long, maxBad: Long, maxRatio: Double)
    extends RuntimeException(
      s"CSV error budget exceeded: $bad bad rows of $total " +
        s"(allowed: $maxBad rows or ${maxRatio * 100}% )")

  /** Read a delimited file into the all-string staging shape of
    * `target`, PERMISSIVE, with corrupt rows captured in
    * `_corrupt_record` (arity overflows, unparseable quoting, …).
    */
  def readStaging(
      spark: SparkSession, path: String, target: StructType,
      sep: String = "^", nullValue: String = "NULL",
      header: Boolean = false): DataFrame = {
    val staging = StructType(
      target.fields.map(f => StructField(f.name, StringType, true)) :+
        StructField(CorruptCol, StringType, true))
    // The cache barrier is REQUIRED: Spark refuses queries that touch
    // only the internal corrupt-record column of a raw CSV scan
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); callers
    // immediately split on that column.
    spark.read
      .option("sep", sep)
      .option("nullValue", nullValue)
      .option("header", header)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(staging)
      .csv(path)
      .cache()
  }

  /** Split parsed staging into (good, quarantine). Quarantine rows keep
    * the raw record plus error metadata (error_code, run_id, load_ts) —
    * the reference's error-table shape (…/Глава 08…md:62-73).
    */
  def splitCorrupt(df: DataFrame, runId: String): (DataFrame, DataFrame) = {
    val good = df.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = df.filter(col(CorruptCol).isNotNull)
      .select(
        col(CorruptCol).as("raw_record"),
        lit("MALFORMED_ROW").as("error_code"),
        lit(runId).as("run_id"),
        current_timestamp().as("load_ts"))
    (good, bad)
  }

  /** Enforce the reference's error budget: ≤ maxBad rows AND ≤ maxRatio
    * of the load (…Перелив….md:126-128: 1000 rows / 10%).
    */
  def enforceBudget(
      goodCount: Long, badCount: Long,
      maxBad: Long = 1000L, maxRatio: Double = 0.1): Unit = {
    val total = goodCount + badCount
    if (badCount > maxBad ||
        (total > 0 && badCount.toDouble / total > maxRatio))
      throw ErrorBudgetExceeded(badCount, total, maxBad, maxRatio)
  }

  /** Typed promote from all-string staging: CAST per the target
    * schema; rows where any non-null source value fails its cast are
    * redirected with the offending column name (ErrorColumn semantics).
    * Returns (typed, castErrors).
    */
  def promote(staging: DataFrame, target: StructType, runId: String): (DataFrame, DataFrame) = {
    // try_cast: ANSI mode (Spark 4 default) makes plain CAST throw on
    // malformed input; the operator's contract is redirect-not-fail.
    val casted = target.fields.foldLeft(staging) { (df, f) =>
      df.withColumn(s"__t_${f.name}",
        expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})"))
    }
    val failCols = target.fields.map(f =>
      when(col(f.name).isNotNull && col(s"__t_${f.name}").isNull, f.name))
    val firstFail = coalesce(failCols :+ lit(null).cast("string"): _*)
    val flagged = casted.withColumn("__err_col", firstFail)
    val typed = flagged.filter(col("__err_col").isNull)
      .select(target.fields.map(f => col(s"__t_${f.name}").as(f.name)): _*)
    val errors = flagged.filter(col("__err_col").isNotNull)
      .select(
        concat_ws("|", target.fields.map(f => coalesce(col(f.name), lit("NULL"))): _*)
          .as("raw_record"),
        lit("CAST_FAILED").as("error_code"),
        col("__err_col").as("error_col"),
        lit(runId).as("run_id"),
        current_timestamp().as("load_ts"))
    (typed, errors)
  }

  /** Export a DataFrame as the reference's interchange CSV
    * (sep '^', literal NULL, no header) — the `COPY TO` side.
    */
  def writeInterchange(df: DataFrame, path: String, sep: String = "^"): Unit =
    df.write.mode("overwrite")
      .option("sep", sep)
      .option("nullValue", "NULL")
      .option("header", "false")
      .csv(path)
}
