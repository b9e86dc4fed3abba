package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{CsvIngest, TypeMatrix}
import graft.sources.TypeMatrix.ColMeta

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq(
    ColMeta("id", "bigint", nullable = false, ordinal = 1),
    ColMeta("name", "text", ordinal = 2),
    ColMeta("amount", "numeric", precision = Some(10), scale = Some(2), ordinal = 3),
    ColMeta("born", "date", ordinal = 4),
    ColMeta("active", "boolean", ordinal = 5))

  test("type matrix maps the PG lattice per SURVEY §1.2") {
    assert(TypeMatrix.sparkType("smallint") == ShortType)
    assert(TypeMatrix.sparkType("integer") == IntegerType)
    assert(TypeMatrix.sparkType("bigint") == LongType)
    assert(TypeMatrix.sparkType("real") == FloatType)
    assert(TypeMatrix.sparkType("double precision") == DoubleType)
    assert(TypeMatrix.sparkType("numeric", Some(10), Some(2)) == DecimalType(10, 2))
    assert(TypeMatrix.sparkType("boolean") == BooleanType)
    assert(TypeMatrix.sparkType("date") == DateType)
    assert(TypeMatrix.sparkType("timestamp") == TimestampType)
    assert(TypeMatrix.sparkType("bytea") == BinaryType)
    assert(TypeMatrix.sparkType("uuid") == StringType)
    assert(TypeMatrix.sparkType("time") == StringType) // no exact analog
    assert(TypeMatrix.sparkType("jsonb") == StringType)
  }

  test("structType/stagingType honor ordinal order and nullability") {
    val st = TypeMatrix.structType(cols.reverse)
    assert(st.fieldNames.toSeq == Seq("id", "name", "amount", "born", "active"))
    assert(!st("id").nullable && st("name").nullable)
    val stg = TypeMatrix.stagingType(cols)
    assert(stg.fields.forall(f => f.dataType == StringType && f.nullable))
  }

  test("DDL + insert-select codegen") {
    val ddl = TypeMatrix.createTableSql("t", cols, sortKey = Seq("id"))
    assert(ddl.contains("id BIGINT NOT NULL"))
    assert(ddl.contains("amount DECIMAL(10,2)"))
    assert(ddl.contains("CLUSTERED BY (id)"))
    val ins = TypeMatrix.insertSelectSql("t", "t_str", cols)
    assert(ins.contains("CAST(id AS BIGINT) AS id"))
    // the generated DDL must be valid Spark SQL
    spark.sql("DROP TABLE IF EXISTS t")
    spark.sql(TypeMatrix.createTableSql("t", cols).replace("CREATE TABLE t",
      s"CREATE TABLE t"))
    spark.sql("DROP TABLE IF EXISTS t")
  }

  test("introspect round-trips through the matrix") {
    val schema = TypeMatrix.structType(cols)
    val back = TypeMatrix.introspect(schema)
    assert(TypeMatrix.structType(back) == schema)
  }

  test("dirty CSV: lossless good/bad split, budget, typed promote") {
    val dir = Files.createDirectories(
      Paths.get(s"target/tmp/csv_${System.nanoTime()}")).toString
    val csv =
      """1^alice^10.50^2020-01-01^true
        |2^bob^NULL^2021-06-15^false
        |3^has^too^many^fields^extra^boom
        |4^carol^notanumber^2022-01-01^true
        |5^dave^7.25^2023-03-03^yes_invalid
        |""".stripMargin
    Files.writeString(Paths.get(s"$dir/data.csv"), csv)
    val target = TypeMatrix.structType(cols)
    val staged = CsvIngest.readStaging(spark, s"$dir/data.csv", target)
    val (good, bad) = CsvIngest.splitCorrupt(staged, "run1")
    assert(good.count() + bad.count() == 5, "good+bad = input (lossless)")
    assert(bad.count() == 1, "only the arity-overflow row is malformed at staging")
    assert(bad.head.getAs[String]("error_code") == "MALFORMED_ROW")
    // 1 of 5 = 20%: over the default 10% ratio budget
    intercept[CsvIngest.ErrorBudgetExceeded] {
      CsvIngest.enforceBudget(good.count(), bad.count())
    }
    CsvIngest.enforceBudget(good.count(), bad.count(), maxRatio = 0.3)
  }

  test("dirty JSONL: typed landing, quarantine keeps raw lines, budget") {
    import graft.sources.JsonIngest
    import org.apache.spark.sql.types._
    val dir = Files.createDirectories(
      Paths.get(s"target/tmp/jsonl_${System.nanoTime()}")).toString
    val jsonl =
      """{"id": 1, "name": "alice", "amount": 10.5}
        |{"id": 2, "name": "bob", "amount": null}
        |{"id": 3, "name": "broken line no close
        |{"id": "not_a_number", "name": "carol", "amount": 1.0}
        |""".stripMargin
    Files.writeString(Paths.get(s"$dir/data.jsonl"), jsonl)
    val target = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("amount", DoubleType)))
    val staged = JsonIngest.readStaging(spark, s"$dir/data.jsonl", target)
    val (good, bad) = CsvIngest.splitCorrupt(staged, "jrun")
    assert(good.count() + bad.count() == 4, "good+bad = input (lossless)")
    // both the unparseable line AND the type-mismatch line quarantine
    assert(bad.count() == 2)
    val raws = bad.select("raw_record").as[String].collect()
    assert(raws.exists(_.contains("broken line")), "raw line preserved")
    assert(raws.exists(_.contains("not_a_number")), "type mismatch preserved")
    assert(bad.select("error_code").as[String].collect()
      .forall(_ == "MALFORMED_ROW"))
    // typed values land typed — no promote hop for JSON
    assert(good.filter($"id" === 1).head.getAs[Double]("amount") == 10.5)
    assert(good.filter($"id" === 2).head.isNullAt(2), "explicit null stays null")
    // 2 of 4 = 50%: over the default 10% ratio budget
    intercept[CsvIngest.ErrorBudgetExceeded] {
      CsvIngest.enforceBudget(good.count(), bad.count())
    }
    CsvIngest.enforceBudget(good.count(), bad.count(), maxRatio = 0.5)
  }

  test("budget enforcement raises on ratio violation") {
    intercept[CsvIngest.ErrorBudgetExceeded] {
      CsvIngest.enforceBudget(goodCount = 4, badCount = 1) // 20% > 10%
    }
    CsvIngest.enforceBudget(goodCount = 99, badCount = 1) // 1% ok
    intercept[CsvIngest.ErrorBudgetExceeded] {
      CsvIngest.enforceBudget(goodCount = 2000000, badCount = 1001) // rows cap
    }
  }

  test("promote redirects cast failures with the offending column") {
    val target = TypeMatrix.structType(cols)
    val staging = Seq(
      ("1", "alice", "10.50", "2020-01-01", "true"),
      ("x", "bad_id", "1.00", "2020-01-01", "true"),
      ("3", "carol", "oops", "2020-01-01", "false"),
      ("4", "dave", null, "2020-01-01", "true") // null stays null: not an error
    ).toDF("id", "name", "amount", "born", "active")
    val (typed, errors) = CsvIngest.promote(staging, target, "run1")
    assert(typed.count() == 2)
    assert(typed.schema("id").dataType == LongType)
    assert(typed.schema("amount").dataType == DecimalType(10, 2))
    val errCols = errors.select("error_col").as[String].collect().sorted
    assert(errCols.toSeq == Seq("amount", "id"))
  }

  test("interchange CSV round-trips customer through staging+promote") {
    val dir = s"target/tmp/roundtrip_${System.nanoTime()}"
    val cust = Tables.customer(spark, sf)
    CsvIngest.writeInterchange(cust, dir)
    val meta = TypeMatrix.introspect(cust.schema)
    val target = TypeMatrix.structType(meta)
    val staged = CsvIngest.readStaging(spark, dir, target)
    val (good, bad) = CsvIngest.splitCorrupt(staged, "rt")
    assert(bad.count() == 0)
    val (typed, errs) = CsvIngest.promote(good, target, "rt")
    assert(errs.count() == 0)
    assert(typed.count() == cust.count())
    // values survive the text round-trip exactly
    val a = cust.agg(sum(col("c_acctbal")).cast("string")).head.getString(0)
    val b = typed.agg(sum(col("c_acctbal")).cast("string")).head.getString(0)
    assert(a.toDouble == b.toDouble)
  }
}
