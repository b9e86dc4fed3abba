package graft.queries

import org.apache.spark.sql.functions._
import graft.CacheScope.TrackedDataFrame
import graft.Tables
import graft.functions.ExactAgg

/** Scalar-function surface (SURVEY §2.8), set ops (§2.6) and the
  * event-time bucketing that backs the streaming module (§2.9).
  */
object Scalar {

  def all: Seq[Q] = Seq(stringParse, dateBuckets, eventsHourly, unionDistinct,
    arrayFuncs, dictLookup, jsonExtract, intersectExcept, percentiles,
    slidingWindow)

  /** JSON payload extraction (SURVEY §1.2 json/jsonb → String +
    * `get_json_object` on demand): typed promote of the events `props`
    * column, aggregated per type.
    */
  val jsonExtract: Q = Q(
    "q_json_extract",
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(k).as("sum_k"),
        countDistinct(k).as("n_distinct_k"))
      .orderBy(col("event_type"))
  }

  /** Array lambda surface (SURVEY §2.8: arrayMap/arrayFilter/arraySum/
    * arrayZip): per-order price array → transform (discounted cents),
    * filter (cheap lines), aggregate (sequential sum) — each
    * replayed in DuckDB list lambdas with identical semantics.
    */
  val arrayFuncs: Q = Q(
    "q_array_funcs",
    """WITH arr AS (
      |  SELECT l_orderkey,
      |    list(CAST(round(l_extendedprice*100) AS BIGINT) ORDER BY l_linenumber) AS cents
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT l_orderkey,
      |  CAST(len(list_filter(cents, x -> x < 100000)) AS BIGINT) AS n_cheap,
      |  CAST(list_reduce(list_transform(cents, x -> x * 95), (a,b) -> a+b) AS DOUBLE)/10000.0 AS disc_total
      |FROM arr
      |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
    import graft.functions.{ExactAgg, OrderedAgg}
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(OrderedAgg.sortedList(
        ExactAgg.cents(col("l_extendedprice")), col("l_linenumber")).as("cents"))
      .select(
        col("l_orderkey"),
        size(filter(col("cents"), x => x < 100000L)).cast("long").as("n_cheap"),
        (aggregate(transform(col("cents"), x => x * 95L), lit(0L),
          (acc, x) => acc + x).cast("double") / 10000.0).as("disc_total"))
      .orderBy(col("l_orderkey"))
  }

  /** Dictionary lookup inside a projection (SURVEY J6 `dictGet`):
    * region names resolved through a literal-map dictionary, with an
    * unknown-member default. Oracle replays it as a plain join.
    */
  val dictLookup: Q = Q(
    "q_dict_lookup",
    """SELECT n.n_nationkey, n.n_name,
      |  COALESCE(r.r_name, 'UNKNOWN') AS region_name
      |FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      |ORDER BY n.n_nationkey""".stripMargin) { (s, dir) =>
    val dict = graft.operators.Dict.asMap(
      Tables.region(s, dir), "r_regionkey", "r_name")
    Tables.nation(s, dir)
      .select(
        col("n_nationkey"), col("n_name"),
        graft.operators.Dict.dictGet(dict, col("n_regionkey"), lit("UNKNOWN"))
          .as("region_name"))
      .orderBy(col("n_nationkey"))
  }

  /** Derived Column string kernel (SURVEY P1/Q1 — …/Глава 11…md:17-22
    * name parsing): substring/locate/length/upper/trim/concat, with
    * numeric promote from text — all codegen'd built-ins.
    */
  val stringParse: Q = Q(
    "q_string_parse",
    """SELECT c_custkey,
      |  CAST(substring(c_name, 10, 9) AS BIGINT) AS cust_id,
      |  upper(c_name) AS name_up,
      |  CAST(length(c_name) AS BIGINT) AS name_len,
      |  substring(c_mktsegment, 1, 3) AS seg3,
      |  concat(c_mktsegment, '-', c_name) AS seg_name,
      |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos
      |FROM customer
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        substring(col("c_name"), 10, 9).cast("long").as("cust_id"),
        upper(col("c_name")).as("name_up"),
        length(col("c_name")).cast("long").as("name_len"),
        substring(col("c_mktsegment"), 1, 3).as("seg3"),
        concat(col("c_mktsegment"), lit("-"), col("c_name")).as("seg_name"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"))
      .orderBy(col("c_custkey"))
  }

  /** Date kernel (SURVEY §2.8 GETDATE/DATEPART family): calendar
    * bucketing of order dates; grouping on derived year/month pushes a
    * two-column scan.
    */
  val dateBuckets: Q = Q(
    "q_date_buckets",
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
      |  EXTRACT(MONTH FROM o_orderdate) AS o_month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total
      |FROM orders
      |GROUP BY o_year, o_month
      |ORDER BY o_year, o_month""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        ExactAgg.dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_year"), col("o_month"))
  }

  /** Event-time tumbling buckets over the `events` stream table — the
    * batch shape of the streaming windowed aggregate (SURVEY §2.9).
    * `date_trunc` keeps nanosecond source timestamps comparable across
    * engines (both truncate to the hour).
    */
  val eventsHourly: Q = Q(
    "q_events_hourly",
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
      |FROM events
      |GROUP BY hour_ts, event_type
      |ORDER BY hour_ts, event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_ts"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        ExactAgg.dsum(col("value")).as("total_value"))
      .orderBy(col("hour_ts"), col("event_type"))
  }

  /** Set ops (SURVEY U1/§2.6): distinct union of two key streams,
    * resolved through a semi join against the dimension.
    */
  val unionDistinct: Q = Q(
    "q_union_distinct",
    """SELECT n_nationkey, n_name FROM nation
      |WHERE n_nationkey IN (SELECT c_nationkey FROM customer
      |                      UNION SELECT s_nationkey FROM supplier)
      |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
    val keys = Tables.customer(s, dir).select(col("c_nationkey").as("k"))
      .unionByName(Tables.supplier(s, dir).select(col("s_nationkey").as("k")))
      .distinct()
    val n = Tables.nation(s, dir)
    n.join(keys, n("n_nationkey") === keys("k"), "left_semi")
      .select(col("n_nationkey"), col("n_name"))
      .orderBy(col("n_nationkey"))
  }

  /** Exact interpolated percentiles (A9 profiling depth): median and
    * p90 account balance per segment. Both engines interpolate
    * identically on the sorted values — proven bit-exact.
    */
  val percentiles: Q = Q(
    "q_percentile",
    """SELECT c_mktsegment,
      |  quantile_cont(c_acctbal, 0.5) AS med_bal,
      |  quantile_cont(c_acctbal, 0.9) AS p90_bal
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        percentile(col("c_acctbal"), lit(0.5)).as("med_bal"),
        percentile(col("c_acctbal"), lit(0.9)).as("p90_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Sliding event-time windows (1 h length, 30 min slide): every
    * event lands in exactly two windows; the oracle unrolls the two
    * window starts per event explicitly.
    */
  val slidingWindow: Q = Q(
    "q_sliding_window",
    """WITH w AS (
      |  SELECT event_type,
      |    unnest([w0, w0 - INTERVAL 30 MINUTE]) AS win_start
      |  FROM (SELECT event_type,
      |          date_trunc('hour', CAST(ts AS TIMESTAMP)) +
      |            INTERVAL 30 MINUTE * CAST(floor(minute(ts)/30) AS INT) AS w0
      |        FROM events WHERE ts IS NOT NULL) t)
      |SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type,
      |  COUNT(*) AS n
      |FROM w
      |GROUP BY win_start, event_type
      |ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
    // NULL ts pinned out on BOTH sides: Spark's window() rewrite
    // null-rejects, the oracle's unnest would emit NULL groups
    Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("win_start"), col("event_type"), col("n"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** INTERSECT / EXCEPT (§2.6 "free if needed" row, exercised):
    * customers ordering in both 1995 and 1996, and in 1995 only.
    */
  val intersectExcept: Q = Q(
    "q_intersect_except",
    """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
      |             WHERE year(o_orderdate) = 1995),
      |y96 AS (SELECT DISTINCT o_custkey FROM orders
      |        WHERE year(o_orderdate) = 1996)
      |SELECT 'both' AS tag, o_custkey FROM (
      |  SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
      |UNION ALL
      |SELECT 'only95' AS tag, o_custkey FROM (
      |  SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
      |ORDER BY tag, o_custkey""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    // each year-set feeds BOTH the intersect and the except branch —
    // persisted, orders scans+distincts once per year (2 total) instead
    // of once per branch reference (4)
    def inYear(y: Int) = orders
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct().persistTracked()
    val (y95, y96) = (inYear(1995), inYear(1996))
    y95.intersect(y96).withColumn("tag", lit("both"))
      .unionByName(y95.except(y96).withColumn("tag", lit("only95")))
      .select(col("tag"), col("o_custkey"))
      .orderBy(col("tag"), col("o_custkey"))
  }
}
