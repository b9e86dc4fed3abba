package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Funnel, Lookup, Profile, RangeJoin, Split}

class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("funnel chains first-touch strictly: out-of-order steps don't count") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "view", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // user 2: purchase BEFORE view — reaches view only
      (2L, "signup", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 10:30:00")),
      (2L, "view", ts("2024-01-01 11:00:00")),
      // user 3: no signup — never enters the funnel
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "purchase", ts("2024-01-01 11:00:00")),
      // user 4: view at EXACTLY the signup instant — strict > excludes
      (4L, "signup", ts("2024-01-01 10:00:00")),
      (4L, "view", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, "user_id", "event_type", "ts",
        Seq("signup", "view", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("1_signup" -> 3L, "2_view" -> 2L, "3_purchase" -> 1L))
  }

  test("pack: budget boundaries, oversize rows, shard independence") {
    import graft.operators.Pack
    val df = Seq(
      (0L, 60L), (2L, 60L), (4L, 60L), // shard 0: cum 60,120,180
      (1L, 250L), (3L, 10L)            // shard 1: oversize then small
    ).toDF("id", "toks")
    val got = Pack.pack(df, "id", col("toks"), budget = 100L, numShards = 2)
      .select("id", "shard", "pack_id").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // shard 0: doc 0 starts at 0 → pack 0; doc 2 starts at 60 → pack 0
    // (overflows to 120 — at most one doc over budget); doc 4 starts
    // at 120 → pack 1
    assert(got(0L) == ((0L, 0L)) && got(2L) == ((0L, 0L)) && got(4L) == ((0L, 1L)))
    // shard 1: oversize doc 1 starts at 0 → pack 0 alone spans past
    // the budget; doc 3 starts at 250 → pack 2 (packs 1 skipped — ids
    // are ⌊offset/budget⌋, not dense ranks, by contract)
    assert(got(1L) == ((1L, 0L)) && got(3L) == ((1L, 2L)))
  }

  test("chunkWindows: layout, covered-tail drop, short doc, empty doc, no shuffle") {
    import graft.operators.Pack
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, ten),            // 10 tokens
      (2L, "w1 w2 w3"),     // shorter than one window
      (3L, "   "),          // zero tokens -> no chunks
      (4L, "")              // zero tokens -> no chunks
    ).toDF("doc_id", "text")
    val got = Pack.chunkWindows(df, "doc_id", "text", window = 4, overlap = 1)
      .select("doc_id", "chunk_id", "n_tok", "chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    // doc 1, stride 3: starts 0,3,6 kept; start 9 dropped — its single
    // token is already covered by the window at 6 (tokens 7..10)
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._3, r._4)).toSeq == Seq(
      (0L, 4L, "w1 w2 w3 w4"), (1L, 4L, "w4 w5 w6 w7"),
      (2L, 4L, "w7 w8 w9 w10")))
    assert(got.filter(_._1 == 2L).map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 3L, "w1 w2 w3")))
    assert(!got.exists(r => r._1 == 3L || r._1 == 4L), "empty docs chunk-free")
    // per-row expressions only: the chunker must not shuffle
    val plan = Pack.chunkWindows(df, "doc_id", "text", 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("cohortRetention counts a user once per active week from their cohort") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: signs up week of Jan 1 (Mon), active weeks 0 and 2,
      // with TWO events in week 2 (must count once)
      (1L, "signup", ts("2024-01-02 10:00:00")),
      (1L, "click", ts("2024-01-16 10:00:00")),
      (1L, "view", ts("2024-01-17 10:00:00")),
      // user 2: same cohort week, pre-signup activity ignored
      (2L, "view", ts("2023-12-26 10:00:00")),
      (2L, "signup", ts("2024-01-03 10:00:00")),
      // user 3: no signup — in no cohort
      (3L, "click", ts("2024-01-02 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.cohortRetention(ev, "user_id", "event_type", "ts", "signup")
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_active"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01 00:00:00", 0L, 2L), // both cohort members active week 0
      ("2024-01-01 00:00:00", 2L, 1L))) // user 1 active week 2, counted once
  }

  test("as-of join attaches the latest at-or-before value per key") {
    val left = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
      (2L, 15L, 200L), (3L, 5L, 300L))
      .toDF("k", "t", "eid")
    val right = Seq(
      (1L, 10L, 900L), (1L, 25L, 901L), // same-instant (t=10) visible
      (2L, 20L, 902L))                  // after 2's only event -> null
      .toDF("k", "t", "v")
    val got = AsOf.joinAsOf(left, right, "k", "t", "k", "t", "v", "asof_v")
      .select(col("eid"), col("asof_v"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(got == Set(
      (100L, 900L), (101L, 900L), (102L, 901L),
      (200L, -1L), (300L, -1L)))
  }

  test("bucket-blocked range join equals the plain non-equi join") {
    val pts = Seq(
      (1L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-01 11:30:00", 2L),
      (1L, "2024-01-01 12:00:00", 3L), (2L, "2024-01-01 10:10:00", 4L))
      .toDF("k", "pt", "pid")
      .withColumn("pt", col("pt").cast("timestamp"))
    val ivs = Seq(
      (1L, "2024-01-01 09:30:00", "2024-01-01 11:00:00", 10L), // pid 1
      (1L, "2024-01-01 11:30:00", "2024-01-01 12:00:00", 11L), // pid 2 (start incl, end excl)
      (2L, "2024-01-01 10:00:00", "2024-01-01 10:00:00", 12L)) // empty
      .toDF("ik", "s", "e", "iid")
      .withColumn("s", col("s").cast("timestamp"))
      .withColumn("e", col("e").cast("timestamp"))
    val blocked = RangeJoin.pointInInterval(pts, ivs, "k", "pt", "ik", "s", "e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val plain = pts.join(ivs,
        col("k") === col("ik") && col("pt") >= col("s") && col("pt") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(blocked == plain)
    assert(blocked == Set((1L, 10L), (2L, 11L)))
  }

  test("Lookup: match and no-match streams partition the input losslessly") {
    val stream = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val ref = Seq((1, "x"), (3, "y")).toDF("rk", "rv")
    val looked = Lookup(stream, ref, "k", "rk")
    val (hit, miss) = Lookup.split(looked)
    assert(hit.count() + miss.count() == stream.count())
    assert(hit.select("k").as[Int].collect().sorted.toList == List(1, 3))
    assert(miss.select("k").as[Int].collect().toList == List(2))
    // no-match rows carry null ref columns (unknown-member input shape)
    assert(miss.filter($"rv".isNotNull).count() == 0)
  }

  test("Split.tag applies first-match semantics") {
    val df = Seq(5, 50, 500).toDF("x")
    val tagged = Split.tag(df, Seq(
      "small" -> ($"x" < 10),
      "medium" -> ($"x" < 100)))
    val got = tagged.orderBy($"x").select("route").as[String].collect().toList
    assert(got == List("small", "medium", "default"))
  }

  test("Split.outputs partitions the input losslessly") {
    val df = (1 to 100).toDF("x")
    val outs = Split.outputs(df, Seq("even" -> ($"x" % 2 === 0)))
    assert(outs("even").count() + outs("default").count() == 100)
  }

  test("Profile counts rows, nulls, distincts in one pass") {
    val df = Seq(
      (Some(1), "a"), (None, "a"), (Some(3), "b")
    ).toDF("num", "s")
    val p = Profile(df, Seq("num", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(p("num") == ((3L, 1L, 2L)))
    assert(p("s") == ((3L, 0L, 2L)))
  }

  test("seeded sampling is deterministic and lands near the fraction") {
    val o = Tables.orders(spark, sf)
    val a = o.sample(false, 0.1, 42L).count()
    val b = o.sample(false, 0.1, 42L).count()
    assert(a == b, "same seed, same partitioning -> same sample")
    val frac = a.toDouble / o.count()
    assert(frac > 0.05 && frac < 0.15, s"fraction $frac out of band")
  }

  test("approx_count_distinct lands within rsd of exact (profiling at scale)") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct($"l_partkey")).head.getLong(0)
    val approx = li.select(approx_count_distinct($"l_partkey", 0.05)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }

  test("Profile.keyCandidates finds unique non-null columns") {
    val df = Seq((1, "a", "x"), (2, "b", "x"), (3, "c", "x")).toDF("id", "u", "c")
    assert(Profile.keyCandidates(df, Seq("id", "u", "c")).toSet == Set("id", "u"))
  }
}
