package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational (JDBC) source/sink — SURVEY S9/S12 (reference: the OLE
  * DB / ADO.NET source reading a table, view or SQL command incl.
  * parameterized `?`, Integration/SSIS/Professional…/Глава 05…md:30,35;
  * …/Pro…/004.md:5-12; fast-load batching …/Pro…/004.md:15-23).
  *
  * Exercised for real against embedded Apache Derby (in-process, ships
  * with the Spark jars) — the same `spark.read.jdbc` surface works
  * unchanged against PostgreSQL/MySQL/SQL Server URLs.
  *
  * Scale posture: a plain JDBC read is ONE partition (one cursor).
  * `readPartitioned` is the 100 TB shape — numPartitions parallel
  * cursors over disjoint ranges of a numeric column, which is how a
  * 1000-executor cluster drains a relational source without a single
  * choke connection. Filters and column pruning push into the source
  * SQL (P9: "WHERE is your friend", …/Глава 12…md:22-31).
  */
object Jdbc {

  /** Derby writes its log relative to `derby.system.home`; pin it
    * under target/ so runs don't litter the repo root.
    */
  def ensureDerbyHome(): Unit =
    if (System.getProperty("derby.system.home") == null) {
      val dir = new java.io.File("target/derby")
      dir.mkdirs()
      System.setProperty("derby.system.home", dir.getAbsolutePath)
    }

  /** In-memory embedded Derby URL (per-JVM; ideal for specs and the
    * catalog round-trip).
    */
  def memoryUrl(db: String): String = {
    ensureDerbyHome()
    s"jdbc:derby:memory:$db;create=true"
  }

  /** Bulk write (S12 fast load): per-partition parallel INSERTs in
    * `batchsize` batches — the `Rows per batch` tuning surface
    * (…/Pro…/004.md:20-23).
    */
  def write(
      df: DataFrame, url: String, table: String,
      batchsize: Int = 10000, mode: String = "overwrite",
      createTableColumnTypes: Option[String] = None): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchsize)
      .mode(mode)
    // e.g. "name VARCHAR(64)": Derby's default StringType mapping is
    // CLOB, which its engine refuses to compare/filter on — columns
    // that need predicates should be created as VARCHAR
    createTableColumnTypes.fold(w)(t =>
      w.option("createTableColumnTypes", t)).save()
  }

  /** Full-table read (`dbtable` — table or view). */
  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .load()

  /** SQL-command read (`query` — the "SQL command" source mode;
    * parameters are interpolated by the caller, as the driver program
    * owns them).
    */
  def readQuery(spark: SparkSession, url: String, sql: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
      .load()

  /** Range-partitioned parallel read — `numPartitions` concurrent
    * cursors over `[lower, upper]` strides of `partitionColumn`.
    */
  def readPartitioned(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()
}
