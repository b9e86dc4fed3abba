package graft

import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** S9 relational source exercised against embedded Derby: dbtable and
  * query reads, filter pushdown into the source SQL, range-partitioned
  * parallel read, and batched writes — the full `spark.read.jdbc`
  * surface a PG/MySQL/SQL Server URL would use.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = Jdbc.memoryUrl("graftspec")

  private def people = Seq(
    (1L, "alice", 10.5), (2L, "bob", 20.0), (3L, "carol", -3.25),
    (4L, "dave", 7.75), (5L, "erin", 0.0))
    .toDF("id", "name", "bal")

  test("write + dbtable read round-trips rows and types") {
    Jdbc.write(people, url, "people", batchsize = 2)
    val back = Jdbc.readTable(spark, url, "people")
    assert(back.count() == 5)
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("bal").dataType.typeName == "double")
    val rows = back.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (1L, "alice", 10.5), (2L, "bob", 20.0), (3L, "carol", -3.25),
      (4L, "dave", 7.75), (5L, "erin", 0.0)))
  }

  test("query read executes a SQL command in the source") {
    Jdbc.write(people, url, "people_q")
    // Spark's JDBC writer creates quoted (case-exact) identifiers;
    // Derby folds unquoted ones to uppercase, so the command quotes
    val q = Jdbc.readQuery(spark, url,
      """SELECT "id", "bal" FROM people_q WHERE "bal" > 5""")
    assert(q.columns.toSeq == Seq("id", "bal"))
    assert(q.select(col("id")).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
  }

  test("filters push into the JDBC source (P9)") {
    Jdbc.write(people, url, "people_f",
      createTableColumnTypes = Some("name VARCHAR(64)"))
    val filtered = Jdbc.readTable(spark, url, "people_f")
      .filter(col("bal") > 5 && col("name") =!= "dave")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThan"), s"filter not pushed:\n$plan")
    assert(filtered.select(col("id")).as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("range-partitioned read opens parallel cursors") {
    Jdbc.write(people, url, "people_p")
    val part = Jdbc.readPartitioned(spark, url, "people_p",
      partitionColumn = "id", lower = 1L, upper = 5L, numPartitions = 3)
    assert(part.rdd.getNumPartitions == 3)
    assert(part.select(col("id")).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("append mode accumulates batches; overwrite resets") {
    Jdbc.write(people, url, "people_a")
    Jdbc.write(people.filter(col("id") <= 2), url, "people_a", mode = "append")
    assert(Jdbc.readTable(spark, url, "people_a").count() == 7)
    Jdbc.write(people, url, "people_a") // overwrite
    assert(Jdbc.readTable(spark, url, "people_a").count() == 5)
  }
}
