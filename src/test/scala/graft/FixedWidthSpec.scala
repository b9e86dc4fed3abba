package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.FixedWidth

class FixedWidthSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) = s"target/tmp/fw_${tag}_${System.nanoTime()}"

  test("layout derives 1-based consecutive starts") {
    val l = FixedWidth.layout("a" -> 3, "b" -> 5, "c" -> 2)
    assert(l == Seq(
      FixedWidth.Field("a", 1, 3),
      FixedWidth.Field("b", 4, 5),
      FixedWidth.Field("c", 9, 2)))
  }

  test("write + staging read round-trips values, pads, and nulls") {
    val dir = tmp("rt")
    val df = Seq((1L, "ab", Some(2.5)), (22L, "c", None))
      .toDF("id", "name", "x")
    FixedWidth.writeFixed(df, dir, Seq("id" -> 4, "name" -> 4, "x" -> 6))
    val back = FixedWidth.readStaging(spark, dir,
      FixedWidth.layout("id" -> 4, "name" -> 4, "x" -> 6))
    val rows = back.orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("1", "ab", "2.5"), ("22", "c", null)))
  }

  test("ragged-right last column (len = -1) takes the rest of the line") {
    val dir = tmp("rr")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/f.txt"),
      "001alpha beta gamma\n002x\n")
    val back = FixedWidth.readStaging(spark, dir, Seq(
      FixedWidth.Field("id", 1, 3),
      FixedWidth.Field("rest", 4, -1)))
    val rows = back.orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("001", "alpha beta gamma"), ("002", "x")))
  }

  test("typed promote redirects rows whose casts fail") {
    val dir = tmp("err")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/f.txt"),
      "007   3.5\nBAD   1.0\n008  oops\n")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType)))
    val (typed, errors) = FixedWidth.readTyped(spark, dir,
      FixedWidth.layout("id" -> 3, "x" -> 6), target, runId = "t")
    assert(typed.select("id").as[Long].collect().toSet == Set(7L))
    assert(errors.count() == 2)
    assert(errors.select("error_col").as[String].collect().toSet == Set("id", "x"))
  }

  test("writeFixed fails loudly on column overflow") {
    val dir = tmp("ovf")
    val df = Seq(("toolongvalue", 1L)).toDF("s", "id")
    val e = intercept[Exception] {
      FixedWidth.writeFixed(df, dir, Seq("s" -> 4, "id" -> 4))
    }
    assert(e.getMessage != null)
  }
}
