package graft

import org.apache.spark.sql.functions._
import graft.operators.{Fuzzy, Rules, Scd}

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("Fuzzy.similarity matches the reference examples' intuition") {
    val df = Seq(
      ("Micosoft Corp", "Microsoft Corporation"),
      ("Microsoft", "Microsoft Corporation"),
      ("MSFT", "Microsoft Corporation")
    ).toDF("dirty", "clean")
    val sims = df.select(Fuzzy.similarity($"dirty", $"clean")).as[Double].collect()
    assert(sims(0) > sims(2) && sims(1) > sims(2), "MSFT is the off-match")
  }

  test("Fuzzy.lookup finds best match and drops below-threshold rows") {
    val stream = Seq((1L, "Jon Smith"), (2L, "Zzz Qqq Vvv")).toDF("sid", "s")
    val ref = Seq((10L, "John Smith"), (11L, "Jane Smythe")).toDF("rid", "r")
    val got = Fuzzy.lookup(stream, ref, "sid", "s", "rid", "r", tau = 0.8)
      .select("sid", "rid").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L), "only Jon→John clears 0.8; Zzz has no match")
  }

  test("Fuzzy.lookupEdit (PassJoin) equals gram-blocked lookup") {
    val cust = Tables.customer(spark, sf)
    val stream = cust.filter($"c_custkey" < 50).select(
      $"c_custkey".as("sid"),
      concat(substring($"c_name", 1, 8), substring($"c_name", 10, 100)).as("dirty"))
    val ref = cust.select($"c_custkey".as("rid"), $"c_name")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("sid", "rid").as[(Long, Long)].collect().toSet
    val grams = pairs(Fuzzy.lookup(stream, ref, "sid", "dirty", "rid", "c_name", 0.8))
    val passj = pairs(Fuzzy.lookupEdit(stream, ref, "sid", "dirty", "rid", "c_name", 0.8))
    assert(passj == grams)
  }

  test("Fuzzy.group clusters mangles to the canonical min-id") {
    val df = Seq(
      (1L, "John Smith, 123 Main St."),
      (2L, "Jon Smith, 123 Main St."),
      (3L, "totally unrelated row xyz")
    ).toDF("id", "name")
    val got = Fuzzy.group(df, "id", "name", tau = 0.8)
      .select("_key_in", "_key_out").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 3L)
  }

  test("Scd.scd2 classifies unchanged/changed/new/absent") {
    val dim = Seq(
      (1L, "a", true, "2020-01-01", null.asInstanceOf[String]),
      (2L, "b", true, "2020-01-01", null.asInstanceOf[String]),
      (3L, "c", true, "2020-01-01", null.asInstanceOf[String]),
      (1L, "a0", false, "2019-01-01", "2020-01-01") // existing history
    ).toDF("bk", "attr", "is_current", "start_date", "end_date")
      .withColumn("start_date", $"start_date".cast("date"))
      .withColumn("end_date", $"end_date".cast("date"))
    val staging = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("bk", "attr")
    val out = Scd.scd2(dim, staging, "bk", Seq("attr"), "2024-06-01")
      .select($"bk", $"attr", $"is_current", $"end_date".cast("string"))
      .as[(Long, String, Boolean, String)].collect().toSet
    assert(out == Set(
      (1L, "a0", false, "2020-01-01"),  // untouched history
      (1L, "a", true, null),            // unchanged
      (2L, "b", false, "2024-06-01"),   // closed old version
      (2L, "B2", true, null),           // new version
      (3L, "c", true, null),            // absent from staging: untouched
      (4L, "d", true, null)))           // insert
  }

  test("scd2 is idempotent for an unchanged staging") {
    val dim = Seq((1L, "a", true, "2020-01-01", null.asInstanceOf[String]))
      .toDF("bk", "attr", "is_current", "start_date", "end_date")
      .withColumn("start_date", $"start_date".cast("date"))
      .withColumn("end_date", $"end_date".cast("date"))
    val staging = Seq((1L, "a")).toDF("bk", "attr")
    val once = Scd.scd2(dim, staging, "bk", Seq("attr"), "2024-06-01")
    val twice = Scd.scd2(once, staging, "bk", Seq("attr"), "2024-07-01")
    assert(twice.count() == 1 && twice.filter($"is_current").count() == 1)
  }

  test("Scd.scd1 overwrites in place without history") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("bk", "attr")
    val staging = Seq((2L, "B2"), (3L, "c")).toDF("bk", "attr")
    val got = Scd.scd1(dim, staging, "bk", Seq("attr"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("Rules.validate: valid/corrected/invalid with pre-fix classification") {
    val df = Seq(
      (1L, "AUTOMOBILE", 100.0),
      (2L, "WEIRD", 100.0),    // correctable
      (3L, "AUTOMOBILE", 99999.0), // invalid (no fix)
      (4L, "WEIRD", 99999.0)   // invalid wins over correctable
    ).toDF("id", "seg", "bal")
    val out = Rules.validate(df, Seq(
      Rules.Rule("seg", $"seg".isin("AUTOMOBILE"), Some(lit("OTHER"))),
      Rules.Rule("bal", $"bal" < 1000, None)))
    val by = out.select("id", "dq_status", "seg").as[(Long, String, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(by(1L) == (("valid", "AUTOMOBILE")))
    assert(by(2L) == (("corrected", "OTHER")))
    assert(by(3L) == (("invalid", "AUTOMOBILE")))
    assert(by(4L) == (("invalid", "OTHER")))
  }

  test("unknownMember keeps orphan fact rows with sk=-1") {
    val fact = Seq((100L, 1L), (101L, 99L)).toDF("okey", "fk")
    val dim = Seq((1L, 10L)).toDF("dk", "sk")
    val got = Scd.unknownMember(fact, dim, "fk", "dk", "sk")
      .select("okey", "sk").as[(Long, Long)].collect().toMap
    assert(got == Map(100L -> 10L, 101L -> -1L))
  }
}
