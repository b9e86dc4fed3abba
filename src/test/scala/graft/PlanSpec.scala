package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** Physical-plan regression tests: the scale-critical plan properties
  * (scan pushdown/pruning, broadcast dimension joins, window-group
  * limits, top-k) asserted continuously, not just snapshotted in
  * PLANS_r*.txt.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter and projection push into the parquet scan (P9)") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 30)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = planOf(df)
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThan(l_quantity,30"), plan)
    // pruned scan: only the two referenced columns reach the reader
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), plan)
  }

  test("lookup cascade joins broadcast, probe side never shuffles (J2/J6)") {
    val plan = planOf(Catalog.queries("q_lookup_cascade")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("LIMIT BY plans as a window group limit, not a full sort (W1/A7)") {
    val plan = planOf(Catalog.queries("q_limit_by")(spark, sf))
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("global top-k plans as TakeOrderedAndProject (W5)") {
    val plan = planOf(Catalog.queries("q_token_topk")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("jaccard_pruned plans without a Window and aggregates the gram lists once") {
    // r3 wins, pinned: set sizes come from a partial-aggregated
    // groupBy (a Window here would sort every gram row). r19: the pair
    // kernel is ONE maxDf-bounded aggregation on the gram
    // (collect_list → ObjectHashAggregate) feeding the pair explode —
    // the former gram self-join (two full exchanges of the gram table)
    // must not come back, and nothing may broadcast-build the full
    // gram table.
    val plan = formatted(Catalog.queries("q_jaccard_pruned")(spark, sf))
    assert(!plan.contains("Window"), plan.linesIterator.take(40).mkString("\n"))
    assert(plan.contains("ObjectHashAggregate"),
      plan.linesIterator.take(40).mkString("\n"))
    assert(!plan.contains("SortMergeJoin"),
      plan.linesIterator.take(40).mkString("\n"))
  }

  test("ngram_jaccard shuffle-hashes the gram self-join, no Window") {
    val plan = formatted(Catalog.queries("q_ngram_jaccard")(spark, sf))
    assert(!plan.contains("Window"), plan.linesIterator.take(40).mkString("\n"))
    assert(plan.contains("ShuffledHashJoin"),
      plan.linesIterator.take(40).mkString("\n"))
  }

  test("knn_ann evaluates the hyperplane literal once per join side") {
    // r3 win, pinned: the SRP plane table is a single typedlit whose
    // dot products materialize ONCE per side (query + corpus caches).
    // Before the fix, project collapse inlined it into the Generate
    // child and the plan carried one copy per probe/band expansion.
    val plan = formatted(Catalog.queries("q_knn_ann")(spark, sf))
    // the first plane's leading sign pattern identifies the literal
    val p0 = graft.operators.Knn.portablePlanes(8, 6, 64).head.head
    val marker = "[[[" + p0.take(12).mkString(",")
    val n = plan.sliding(marker.length).count(_ == marker)
    assert(n == 2, s"hyperplane literal appears $n times (want 2: qD + cB)")
  }

  test("decontaminate broadcasts the benchmark and partial-aggregates before its only exchange") {
    val emb = Tables.embeddings(spark, sf)
    val df = graft.operators.Knn.decontaminate(
      emb.filter(col("vec_id") % 20 =!= 0),
      emb.filter(col("vec_id") % 20 === 0),
      "vec_id", "embedding", 0.4)
    val plan = formatted(df)
    // the join is non-equi (id inequality over a broadcast benchmark),
    // so the right shape is a broadcast nested-loop with the BENCH
    // side built — each corpus row scans the broadcast bench rows once
    assert(plan.contains("BroadcastNestedLoopJoin Inner BuildRight"),
      plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.contains("SortMergeJoin"), "pair set must never sort-merge")
    // map-side combine: a HashAggregate below the shuffle (partial)
    // and one above (final) — the pair set itself never shuffles
    val aggs = plan.sliding("HashAggregate".length).count(_ == "HashAggregate")
    assert(aggs >= 2, s"want partial+final HashAggregate, saw $aggs")
  }

  test("funnel steps reuse ONE cached co-partitioned events projection") {
    val df = graft.operators.Funnel.funnel(
      Tables.events(spark, sf), "user_id", "event_type", "ts",
      Seq("signup", "view", "click", "purchase"))
    val plan = formatted(df)
    // every step reads the persisted projection, so the whole funnel
    // carries exactly ONE underlying parquet scan node (FormattedMode
    // re-prints the cached subtree per usage but keeps its node id)
    assert(plan.contains("InMemoryTableScan"), plan.take(2000))
    val scanIds = "Scan parquet\\s+\\((\\d+)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(scanIds.size == 1,
      s"events parquet must be scanned via one node, saw ids $scanIds")
    graft.CacheScope.release()
  }

  test("corpus_select legs share ONE cached documents projection") {
    // the capstone's four legs (dedup clusters, quality, language,
    // decontamination) all derive from the same narrow (doc_id, text,
    // lang) projection — persisted once in the query, so the
    // documents parquet contributes exactly one scan node to the
    // whole composed plan
    val df = Catalog.queries("q_corpus_select")(spark, sf)
    val plan = formatted(df)
    assert(plan.contains("InMemoryTableScan"), plan.take(2000))
    val scanIds = "Scan parquet\\s+\\((\\d+)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(scanIds.size <= 1,
      s"documents parquet must be scanned via one node, saw ids $scanIds")
    graft.CacheScope.release()
  }

  test("sketch/histogram aggregates partial-aggregate before their exchange") {
    // the scale contract of every TypedImperativeAggregate here: a
    // map-side partial (ObjectHashAggregate) combines per-partition
    // states BEFORE the shuffle, so the exchange carries one
    // fixed-size state per (partition, key) — not one row per input
    for (q <- Seq("q_freq_tokens", "q_drift_psi", "q_sketch_mv")) {
      val plan = formatted(Catalog.queries(q)(spark, sf))
      assert(plan.contains("ObjectHashAggregate") ||
        plan.contains("HashAggregate"), s"$q: ${plan.take(1500)}")
      assert(plan.contains("partial_"), s"$q lacks a partial phase")
    }
  }

  test("co-bucketed join (q_bucket_join) carries zero exchanges below the join") {
    // VERDICT r6 item 3: the zero-shuffle claim pinned in the spec
    // layer, not only in the query's own runtime REQUIRE — both sides
    // scan one split per bucket id and the join zips them locally.
    val df = Catalog.queries("q_bucket_join")(spark, sf)
    val joins = df.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, df.queryExecution.executedPlan.toString)
    val below = joins.flatMap(_.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    })
    assert(below.isEmpty,
      s"bucket join must be shuffle-free below the join:\n" +
        df.queryExecution.executedPlan)
  }

  test("storage-partitioned join (q_spj_join) plans with at most the final sort exchange") {
    // Same pin for the value-partitioned layout: each side reads one
    // split per (o_orderpriority) partition and Spark zips matching
    // groups; only the 5-row ORDER BY range exchange may remain.
    val df = Catalog.queries("q_spj_join")(spark, sf)
    val ex = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(ex.size <= 1, df.queryExecution.executedPlan.toString)
    val joins = df.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty &&
      joins.forall(_.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }.isEmpty),
      s"SPJ must be shuffle-free below the join:\n" +
        df.queryExecution.executedPlan)
  }

  test("no unintended CartesianProduct/BNLJ anywhere in the catalog") {
    // the live form of the PLANS_r*.txt dump check (graft.tools.Plans
    // runs the same `violations` scan when writing the artifact): every
    // catalog query's physical plan, including ones added after the
    // last dump, is screened on every test run — the check cannot go
    // stale with the artifact
    val bad = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val qe = Catalog.queries(name)(spark, sf).queryExecution
      // same pass, both checks (VERDICT r17 item 2): the BNLJ/cartesian
      // text scan and the window-group-limit plan-class pin
      graft.tools.Plans.violations(name, qe.executedPlan.toString) ++
        graft.tools.Plans.windowViolations(name, qe.optimizedPlan)
    }
    assert(bad.isEmpty, bad.mkString("\n"))
    graft.CacheScope.release()
  }

  test("window-group-limit pin fires on a deliberately broken global window") {
    // the check's own negative control (VERDICT r17 item 2): a global
    // rank window WITHOUT the rank filter has no group-limit rewrite
    // to save it — every corpus row would funnel through one task
    val broken = Tables.documents(spark, sf).withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("doc_id"))))
    val fired = graft.tools.Plans.windowViolations(
      "broken_fixture", broken.queryExecution.optimizedPlan)
    assert(fired.nonEmpty, "the pin must fire on an unbounded global window")
    // and the SAFE shape — the same window rank-cut by a filter —
    // compiles to a group-limit below the window and passes the pin
    val safe = broken.filter(col("rn") <= 50)
    assert(graft.tools.Plans.windowViolations(
      "safe_fixture", safe.queryExecution.optimizedPlan).isEmpty,
      safe.queryExecution.optimizedPlan.toString)
  }

  test("pre-aggregation sits below the join in the flagship mart (J5)") {
    val df = Catalog.queries("q_datamart_customer")(spark, sf)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    // the detail side of the join must already be an Aggregate —
    // the structural property that shrinks the shuffle to 1 row/key
    val hasAggBelowJoin = joins.exists(_.right.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isDefined)
    assert(hasAggBelowJoin, df.queryExecution.optimizedPlan.toString)
  }
}
