package graft.tools

import org.apache.spark.sql.SparkSession

/** Catalog-wide plan dump + self-check — the `EXPLAIN PIPELINE`
  * discipline of the reference's datamart guidance (…/Datamarts/
  * Правильное построение витрины с множественными агрегациями.md:141)
  * applied to every query in the catalog: review scan pruning,
  * pushdown, broadcast choice, shuffle count, and enforce the
  * no-unintended-cartesian invariant in the SAME pass, so the dump
  * artifact can never drift from the check (`PlanSpec` runs
  * [[violations]] over the full catalog on every `sbt test` too).
  *
  * Usage: `runMain graft.tools.Plans all --out PLANS_rN.txt` writes
  * the dump and exits nonzero on any violation; with query names it
  * prints just those plans to stdout.
  */
object Plans {

  /** The documented BroadcastNestedLoopJoin allowlist. These four are
    * the only catalog plans allowed a nested-loop join, each by
    * design:
    *   - q_embed_cosine_pairs / q_knn_brute — the intentionally O(n²)
    *     exact-similarity ORACLE BASELINES the bucketed/ANN scale
    *     paths are verified against (their whole point is all-pairs);
    *   - q_embed_decontaminate — non-equi join (id inequality) over a
    *     BROADCAST benchmark side: each corpus row scans the small
    *     broadcast bench exactly once, which is the right shape for
    *     "corpus × small contamination set";
    *   - q_sketch_overlap — pairwise theta-sketch overlap of a
    *     handful of AGGREGATED sketch states (k rows, not data rows).
    * A CartesianProduct is never allowed anywhere.
    */
  val BnljAllowlist: Set[String] = Set(
    "q_embed_cosine_pairs", "q_knn_brute",
    "q_embed_decontaminate", "q_sketch_overlap")

  /** Scan one query's physical-plan text for scale-killer joins. */
  def violations(name: String, plan: String): Seq[String] = {
    val v = Seq.newBuilder[String]
    if (plan.contains("CartesianProduct"))
      v += s"$name: CartesianProduct — unbounded all-pairs, never intended"
    if (plan.contains("BroadcastNestedLoopJoin") && !BnljAllowlist(name))
      v += s"$name: BroadcastNestedLoopJoin outside the documented allowlist " +
        s"(${BnljAllowlist.mkString(", ")})"
    v.result()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val outIdx = args.indexOf("--out")
    if (outIdx >= 0 && outIdx + 1 >= args.length) {
      System.err.println(
        "usage: graft.tools.Plans [all | query names…] [--out <path>]")
      sys.exit(2)
    }
    val outPath = if (outIdx >= 0) Some(args(outIdx + 1)) else None
    val rest = args.zipWithIndex
      .filterNot { case (_, i) => i == outIdx || i == outIdx + 1 }.map(_._1)
    val names =
      if (rest.sameElements(Array("all"))) graft.SparkEntry.queries.keys.toSeq.sorted
      else if (rest.nonEmpty) rest.toSeq
      else Seq(
        "q_pricing_summary", "q_datamart_customer", "q_lookup_cascade",
        "q_limit_by", "q_embed_cosine_pairs")
    val sink = outPath.map(p => new java.io.PrintWriter(p, "UTF-8"))
    def emit(s: String): Unit = sink match {
      case Some(w) => w.println(s)
      case None => println(s)
    }
    val bad = Seq.newBuilder[String]
    var bnljAllowed = 0
    for (n <- names) {
      emit(s"\n========== $n ==========")
      val plan = graft.SparkEntry.queries(n)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      emit(plan)
      bad ++= violations(n, plan)
      if (plan.contains("BroadcastNestedLoopJoin") && BnljAllowlist(n))
        bnljAllowed += 1
    }
    val violationsFound = bad.result()
    val summary =
      s"PLANCHECK n=${names.size} violations=${violationsFound.size} " +
        s"bnlj_allowlisted=$bnljAllowed"
    emit(s"\n$summary")
    violationsFound.foreach(v => emit(s"VIOLATION $v"))
    sink.foreach(_.close())
    println(summary)
    violationsFound.foreach(v => println(s"VIOLATION $v"))
    spark.stop()
    if (violationsFound.nonEmpty) sys.exit(1)
  }
}
