package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Fixed-width / ragged-right flat-file ingest — the S5 residue
  * (reference: the Flat File source's Fixed width and Ragged right
  * formats plus code-page selection, Integration/SSIS/Professional…/
  * Глава 05…md:32, …/Pro…/004.md:44-48).
  *
  * Shape: one single-column text scan (with an explicit `encoding` for
  * the code-page semantics), then pure `substring` slices per the
  * column spec — all codegen'd projections fused into the scan stage,
  * so the parse is a zero-shuffle map at any scale. Values are sliced
  * into the all-string staging shape and promoted through the same
  * typed-cast/redirect path as delimited CSV (§1.2 `_str` idiom), so
  * fixed-width files get the identical error-budget machinery.
  */
object FixedWidth {

  /** One column: 1-based `start`, `len` in characters. `len = -1`
    * means "rest of the line" — the RAGGED-RIGHT last column, whose
    * final delimiter is the row terminator.
    */
  final case class Field(name: String, start: Int, len: Int)

  /** Derive a field layout from consecutive widths. */
  def layout(widths: (String, Int)*): Seq[Field] = {
    var pos = 1
    widths.map { case (n, w) =>
      val f = Field(n, pos, w); pos += w; f
    }
  }

  /** Read a fixed-width file into all-string staging columns. Values
    * are right-trimmed (fixed-width pads with spaces); fields starting
    * beyond a short line become empty strings, surfaced as NULL so the
    * promote path treats them like missing values.
    */
  def readStaging(
      spark: SparkSession, path: String, fields: Seq[Field],
      encoding: String = "UTF-8"): DataFrame = {
    val lines = spark.read
      .option("encoding", encoding)
      .text(path)
    lines.select(fields.map { f =>
      val sliced =
        if (f.len < 0) substring(col("value"), f.start, Int.MaxValue)
        else substring(col("value"), f.start, f.len)
      val trimmed = rtrim(sliced)
      when(trimmed === "", lit(null)).otherwise(trimmed).as(f.name)
    }: _*)
  }

  /** Fixed-width read + typed promote (same redirect semantics as
    * CsvIngest.promote). Returns (typed, castErrors).
    */
  def readTyped(
      spark: SparkSession, path: String, fields: Seq[Field],
      target: StructType, runId: String,
      encoding: String = "UTF-8"): (DataFrame, DataFrame) =
    CsvIngest.promote(readStaging(spark, path, fields, encoding), target, runId)

  /** Export a DataFrame as a fixed-width text file (the inverse, for
    * interchange round-trips): each column formatted left-aligned and
    * space-padded to its width; values longer than the width fail
    * loudly rather than silently truncate.
    */
  def writeFixed(
      df: DataFrame, path: String, widths: Seq[(String, Int)]): Unit = {
    val line = concat(widths.map { case (n, w) =>
      val s = col(n).cast("string")
      when(length(s) > w,
        raise_error(concat(lit(s"fixed-width overflow in $n: "), s)))
        .otherwise(rpad(coalesce(s, lit("")), w, " "))
    }: _*)
    df.select(line.as("value"))
      .write.mode("overwrite").text(path)
  }
}
