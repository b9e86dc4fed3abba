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
    val out = Fuzzy.group(df, "id", "name", tau = 0.8)
      .select("_key_in", "_key_out", "_score")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 3L)
    // _score: exactly 1.0 for canonical rows, the canonical-text
    // similarity (≥ τ by construction) for members
    assert(out(1L)._2 == 1.0 && out(3L)._2 == 1.0)
    assert(out(2L)._2 >= 0.8 && out(2L)._2 < 1.0)
  }

  test("group is one-level, groupConnected closes the chain (§7.4 risk 1)") {
    // sim(A,B) = sim(B,C) = 0.9, sim(A,C) = 0.8 < τ=0.85: a 3-chain
    // whose endpoints only connect through the middle row
    val df = Seq(
      (1L, "aaaaaaaaaa"),
      (2L, "baaaaaaaaa"),
      (3L, "bbaaaaaaaa"),
      (9L, "zzzzzzzzzz") // isolated
    ).toDF("id", "name")
    // documented single-level contract: C's neighborhood is {B} only,
    // so it canonicalizes to 2 while A,B pick 1 — the split this
    // operator accepts by design
    val oneLevel = Fuzzy.group(df, "id", "name", tau = 0.85)
      .select("_key_in", "_key_out").as[(Long, Long)].collect().toMap
    assert(oneLevel == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 9L -> 9L))
    // transitive contract: one component {A,B,C} under min id 1
    val cc = Fuzzy.groupConnected(df, "id", "name", tau = 0.85)
      .select("_key_in", "_key_out").as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("groupConnected equals a driver-side union-find on real names") {
    val cust = Tables.customer(spark, sf).filter($"c_custkey" < 120)
    val mangled = cust.select(
      $"c_custkey".as("id"),
      when($"c_custkey" % 3 === 0,
        concat(substring($"c_name", 1, 8), substring($"c_name", 10, 100)))
        .otherwise($"c_name").as("name"))
    val rows = mangled.as[(Long, String)].collect()

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val cur = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      d(a.length)
    }
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      if 1.0 - lev(sa, sb).toDouble / math.max(sa.length, sb.length) >= 0.85
    } {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = rows.map(r => r._1 -> find(r._1)).toMap

    val got = Fuzzy.groupConnected(mangled, "id", "name", tau = 0.85)
      .select("_key_in", "_key_out").as[(Long, Long)].collect().toMap
    assert(got == expected)
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

  test("Rules.validateSuggest: suggestions ride alongside untouched originals") {
    val df = Seq(
      (1L, "AUTOMOBILE", 100.0),
      (2L, "WEIRD", 100.0),    // suggestable
      (3L, "AUTOMOBILE", 99999.0), // invalid (no fix)
      (4L, "WEIRD", 99999.0)   // invalid wins; suggestion still emitted
    ).toDF("id", "seg", "bal")
    val out = Rules.validateSuggest(df, Seq(
      Rules.Rule("seg", $"seg".isin("AUTOMOBILE"), Some(lit("OTHER"))),
      Rules.Rule("bal", $"bal" < 1000, None)))
    val by = out.select("id", "dq_status", "seg", "seg_suggested")
      .as[(Long, String, String, Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(by(1L) == (("valid", "AUTOMOBILE", None)))
    assert(by(2L) == (("suggested", "WEIRD", Some("OTHER"))),
      "original value untouched, fix proposed in the suggestion column")
    assert(by(3L) == (("invalid", "AUTOMOBILE", None)))
    assert(by(4L) == (("invalid", "WEIRD", Some("OTHER"))))
  }

  test("unknownMember keeps orphan fact rows with sk=-1") {
    val fact = Seq((100L, 1L), (101L, 99L)).toDF("okey", "fk")
    val dim = Seq((1L, 10L)).toDF("dk", "sk")
    val got = Scd.unknownMember(fact, dim, "fk", "dk", "sk")
      .select("okey", "sk").as[(Long, Long)].collect().toMap
    assert(got == Map(100L -> 10L, 101L -> -1L))
  }

  test("Rules.outliers flags planted extremes per group; NaN/null excluded") {
    import graft.operators.Rules
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      ("b", 10.0), ("b", 11.0), ("b", 12.0), ("b", 13.0),
      ("b", Double.NaN),
      ("c", Double.NaN) // group with NO valid values: no fences
    ).toDF("g", "v")
      .unionByName(Seq(("b", null.asInstanceOf[java.lang.Double]))
        .toDF("g", "v"))
    val got = Rules.outliers(df, col("g"), col("v"))
      .select(col("g"), col("v"), col("is_outlier"))
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getBoolean(2)))
    // group a: quartiles of (1,2,3,4,100) make 100 the lone outlier
    assert(got.filter(_._1 == "a").count(_._3) == 1)
    assert(got.find(r => r._1 == "a" && r._2.contains(100.0)).exists(_._3))
    // group b: tight cluster — nothing flagged, NaN/null land false
    assert(got.filter(_._1 == "b").forall(!_._3))
    // group c (all NaN): left-join miss coalesces to false, not null
    assert(got.filter(_._1 == "c").forall(!_._3))
    // fences come back per-row via a BROADCAST of the tiny stats side
    val plan = Rules.outliers(df, col("g"), col("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("Rules.outliers: high-cardinality group falls back off the forced broadcast") {
    import graft.operators.Rules
    val df = (1L to 200L).map(i =>
        (s"g${i % 5}", if (i % 50 == 0) i.toDouble * 100 else (i % 20).toDouble))
      .toDF("g", "v")
    def flags(maxGroups: Int): Set[(String, Double, Boolean)] =
      Rules.outliers(df, col("g"), col("v"), maxBroadcastGroups = maxGroups)
        .select(col("g"), col("v"), col("is_outlier"))
        .as[(String, Double, Boolean)].collect().toSet
    val viaBroadcast = flags(Rules.MaxBroadcastGroups)
    val viaShuffle = flags(2) // 5 groups > 2 → guard trips
    assert(viaBroadcast == viaShuffle, "fallback must not change answers")
    assert(viaBroadcast.exists(_._3), "planted extremes must still flag")
    // with size-based auto-broadcast off, only the FORCED hint could
    // broadcast — the tripped guard genuinely plans a non-broadcast join
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(thr)
    try {
      spark.conf.set(thr, "-1")
      val forced = Rules.outliers(df, col("g"), col("v"))
        .queryExecution.executedPlan.toString
      val guarded = Rules.outliers(df, col("g"), col("v"), maxBroadcastGroups = 2)
        .queryExecution.executedPlan.toString
      assert(forced.contains("BroadcastHashJoin"), forced)
      assert(!guarded.contains("BroadcastHashJoin"), guarded)
    } finally spark.conf.set(thr, old)
    graft.CacheScope.release()
  }
}
