package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** Analytic-surface extensions beyond the reference's endpoints:
  * running windows, rollup grouping sets, anti joins, semi-structured
  * JSON extraction — the rest of the OLAP toolbox a reference user
  * would expect from a complete engine. */
object ExtraQueries {

  /** Per-customer running revenue (window running sum over exact
    * cents; customers < 100 keep the dump bounded). */
  private val qRunningRevenue = BoundQuery("q_running_revenue", (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d).where(col("o_custkey") < 100)
      .withColumn("run_c", sum(cents(col("o_totalprice"))).over(w))
      .select(col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        money(col("run_c")).as("running_revenue"))
      .orderBy("custkey", "orderkey")
  }, Some("""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
             AS running_revenue
    FROM orders WHERE o_custkey < 100
    ORDER BY custkey, orderkey
  """))

  /** ROLLUP(year, status) revenue/count — hierarchical grouping sets
    * with subtotal rows (sentinel-coalesced for deterministic output). */
  private val qRollupRevenue = BoundQuery("q_rollup_revenue", (s, d) => {
    Tables.orders(s, d).where(col("o_orderdate").isNotNull)
      .rollup(year(col("o_orderdate")).cast("long").as("year"), col("o_orderstatus"))
      .agg(sumCents(col("o_totalprice")).as("rc"), count(lit(1)).as("cnt"))
      .select(
        coalesce(col("year"), lit(-1L)).as("year_g"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status_g"),
        money(col("rc")).as("revenue"), col("cnt"))
      .orderBy("year_g", "status_g")
  }, Some("""
    SELECT coalesce(CAST(year(o_orderdate) AS BIGINT), -1) AS year_g,
           coalesce(o_orderstatus, 'ALL') AS status_g,
           CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS revenue,
           CAST(count(*) AS BIGINT) AS cnt
    FROM orders WHERE o_orderdate IS NOT NULL
    GROUP BY ROLLUP(CAST(year(o_orderdate) AS BIGINT), o_orderstatus)
    ORDER BY year_g, status_g
  """))

  /** Left-anti join: customers with zero urgent orders. */
  private val qNoUrgentCustomers = BoundQuery("q_no_urgent_customers", (s, d) => {
    val urgent = Tables.orders(s, d)
      .where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"))
      .orderBy("custkey")
  }, Some("""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY custkey
  """))

  /** Schema-ful JSON parsing with from_json (vs q_json_props'
    * path extraction): the whole payload becomes a typed struct once,
    * then fields are ordinary columns — the right shape when several
    * fields are read (one parse, not one per path). */
  private val qJsonStruct = BoundQuery("q_json_struct", (s, d) => {
    Tables.events(s, d)
      .withColumn("j", from_json(col("props"), lit("k BIGINT")))
      .where(col("j.k").isNotNull)
      .groupBy(col("event_type"))
      .agg(sum(col("j.k")).as("sum_k"),
        min(col("j.k")).as("min_k"), max(col("j.k")).as("max_k"))
      .orderBy("event_type")
  }, Some("""
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY event_type ORDER BY event_type
  """))

  /** Semi-structured extraction: parse the JSON props column and
    * aggregate an extracted field (exact int sums). */
  private val qJsonProps = BoundQuery("q_json_props", (s, d) => {
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .where(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"))
      .select(col("event_type"), col("sum_k"), col("cnt"),
        (col("sum_k").cast("double") / col("cnt").cast("double")).as("avg_k"))
      .orderBy("event_type")
  }, Some("""
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS avg_k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY event_type ORDER BY event_type
  """))

  /** Point-in-time join: each event paired with the user's most
    * recent purchase at-or-before it (operators.AsOfJoin — composed
    * union+window as-of; oracle is DuckDB's native ASOF JOIN, which
    * shares the inclusive >= tie semantics). */
  private val qAsofJoin = BoundQuery("q_asof_join", (s, d) => {
    val ev = Tables.events(s, d)
      .select("event_id", "user_id", "ts_ns", "event_type")
    val purchases = ev.where(col("event_type") === "purchase")
    graft.operators.AsOfJoin.lastAtOrBefore(
      ev, purchases, col("user_id"), col("ts_ns"), col("event_id"), "purchase_id")
      .select(col("event_id"), col("user_id"), col("asof_purchase_id"))
      .orderBy("event_id")
  }, Some("""
    SELECT e.event_id, e.user_id, p.event_id AS asof_purchase_id
    FROM events e ASOF LEFT JOIN
      (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    ORDER BY e.event_id
  """), headline = true)

  /** Sketch aggregates: HyperLogLog distinct estimates GRADED against
    * exact counts inside the engine. HLL internals have no DuckDB
    * twin, so the gate carries the exact counts plus envelope
    * booleans: approx_count_distinct's default rsd is 0.05, so a
    * correct sketch lands within 3σ = 15% of exact — if Spark's
    * estimate ever escapes the envelope the boolean flips and the
    * oracle hash breaks. SketchSpec separately pins tighter
    * distributional behavior. */
  private val qApproxDistinct = BoundQuery("q_approx_distinct", (s, d) => {
    Tables.orders(s, d).agg(
      countDistinct(col("o_custkey")).as("exact_users"),
      countDistinct(col("o_orderkey")).as("exact_orders"),
      approx_count_distinct(col("o_custkey")).as("au"),
      approx_count_distinct(col("o_orderkey")).as("ao"))
      .select(col("exact_users"), col("exact_orders"),
        (abs(col("au") - col("exact_users")).cast("double") <=
          col("exact_users").cast("double") * 0.15).as("users_in_envelope"),
        (abs(col("ao") - col("exact_orders")).cast("double") <=
          col("exact_orders").cast("double") * 0.15).as("orders_in_envelope"))
  }, Some("""
    SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_users,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS users_in_envelope, TRUE AS orders_in_envelope
    FROM orders
  """))

  /** Salted two-phase aggregation (SkewTools): identical answer to a
    * direct groupBy — the oracle IS the direct groupBy — with the
    * skew-resistant shuffle shape. */
  private val qSaltedAgg = BoundQuery("q_salted_agg", (s, d) => {
    graft.operators.SkewTools.saltedAggregate(
      Tables.lineitem(s, d),
      keys = Seq("l_returnflag"),
      saltSource = col("l_orderkey"),
      sums = Map("qty_c" -> cents(col("l_quantity"))))
      .select(col("l_returnflag"), col("cnt"), money(col("qty_c")).as("sum_qty"))
      .orderBy("l_returnflag")
  }, Some("""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty
    FROM lineitem GROUP BY 1 ORDER BY 1
  """))

  /** Rolling 30-day spend per customer — a RANGE frame over epoch
    * seconds (value-based, unlike q_running_revenue's ROWS frame):
    * every order sums the customer's orders in the trailing 30 days,
    * however many rows that is. Integer frame bounds on both engines. */
  private val qRolling30d = BoundQuery("q_rolling_30d", (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(s, d)
      .where(col("o_custkey") < 100 && col("o_orderdate").isNotNull)
      .withColumn("roll_c", sum(cents(col("o_totalprice"))).over(w))
      .select(col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"),
        money(col("roll_c")).as("rolling_30d"))
      .orderBy("custkey", "orderkey")
  }, Some("""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT))
                  OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                        RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
             AS rolling_30d
    FROM orders WHERE o_custkey < 100 AND o_orderdate IS NOT NULL
    ORDER BY custkey, orderkey
  """))

  /** Unpivot (melt): wide per-flag aggregates to (flag, measure,
    * value) long form via stack() — the reshaping twin of q_pivot. */
  private val qUnpivot = BoundQuery("q_unpivot", (s, d) => {
    Tables.lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(sumCents(col("l_quantity")).as("qty_c"),
        sumCents(col("l_extendedprice")).as("price_c"))
      .select(col("l_returnflag"),
        expr("stack(2, 'sum_qty', qty_c, 'sum_price', price_c) AS (measure, val_c)"))
      .select(col("l_returnflag"), col("measure"), money(col("val_c")).as("value"))
      .orderBy("l_returnflag", "measure")
  }, Some("""
    WITH wide AS (
      SELECT l_returnflag,
        CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS qty_c,
        CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS price_c
      FROM lineitem GROUP BY 1)
    SELECT l_returnflag, measure, CAST(val_c AS DOUBLE)/100.0 AS value FROM (
      SELECT l_returnflag, 'sum_qty' AS measure, qty_c AS val_c FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_price', price_c FROM wide)
    ORDER BY l_returnflag, measure
  """))

  /** Set algebra over keyed snapshots: customers active in BOTH 1995
    * and 1996 (INTERSECT), only-1995 (EXCEPT), either (UNION) — as
    * counts so the output is stable. Spark intersect/except plan as
    * semi/anti joins — no distinct-sort. */
  private val qSetOps = BoundQuery("q_set_ops", (s, d) => {
    def custs(y: Int) = Tables.orders(s, d)
      .where(year(col("o_orderdate")) === y).select("o_custkey").distinct()
    val c95 = custs(1995); val c96 = custs(1996)
    c95.intersect(c96).agg(count(lit(1)).as("n"))
      .select(lit("1_both").as("op"), col("n"))
      .unionAll(c95.except(c96).agg(count(lit(1)).as("n"))
        .select(lit("2_only_1995").as("op"), col("n")))
      .unionAll(c95.union(c96).distinct().agg(count(lit(1)).as("n"))
        .select(lit("3_either").as("op"), col("n")))
      .orderBy("op")
  }, Some("""
    WITH c95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
    c96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
    SELECT op, n FROM (
      SELECT '1_both' AS op,
             CAST((SELECT count(*) FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)) AS BIGINT) AS n
      UNION ALL
      SELECT '2_only_1995',
             CAST((SELECT count(*) FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96)) AS BIGINT)
      UNION ALL
      SELECT '3_either',
             CAST((SELECT count(*) FROM (SELECT * FROM c95 UNION SELECT * FROM c96)) AS BIGINT))
    ORDER BY op
  """))

  /** Scalar-subquery filter: orders above the global average price.
    * The average is computed ONCE (cents-exact, then one division)
    * and broadcast into the scan's filter. */
  private val qAboveAvg = BoundQuery("q_above_avg", (s, d) => {
    val avgC = Tables.orders(s, d)
      .agg((sumCents(col("o_totalprice")).cast("double") /
        count(lit(1)).cast("double")).as("avg_c"))
    Tables.orders(s, d).crossJoin(broadcast(avgC))
      .where(cents(col("o_totalprice")).cast("double") > col("avg_c"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumCents(col("o_totalprice")).as("rc"))
      .select(col("o_orderpriority"), col("n"), money(col("rc")).as("revenue"))
      .orderBy("o_orderpriority")
  }, Some("""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
    FROM orders
    WHERE CAST(CAST(round(o_totalprice*100,0) AS BIGINT) AS DOUBLE) >
          (SELECT CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) FROM orders)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
  """))

  /** Calendar-function suite: quarter / last_day / +30 days / datediff
    * on the order dates — the date toolbox with cross-engine-identical
    * semantics, one row per (year, quarter). */
  private val qCalendar = BoundQuery("q_calendar", (s, d) => {
    Tables.orders(s, d).where(col("o_orderdate").isNotNull)
      .select(
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due"),
        datediff(lit("1999-01-01").cast("date"), col("o_orderdate")).cast("long").as("age_days"))
      .groupBy("y", "q")
      .agg(count(lit(1)).as("n"), max("month_end").as("max_month_end"),
        max("due").as("max_due"), sum("age_days").as("sum_age"))
      .orderBy("y", "q")
  }, Some("""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(count(*) AS BIGINT) AS n,
           max(strftime(last_day(o_orderdate), '%Y-%m-%d')) AS max_month_end,
           max(strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')) AS max_due,
           CAST(sum(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')) AS BIGINT) AS sum_age
    FROM orders WHERE o_orderdate IS NOT NULL
    GROUP BY 1, 2 ORDER BY y, q
  """))

  /** Keyset pagination (Pagination.keysetPage) — the scale path the
    * offset q_paginate can't take at 100 TB: page 2 is a pushed-down
    * `key > cursor` + TakeOrdered, no global window. The cursor comes
    * from page 1's max key (in serving, from the client). */
  private val qKeysetPage = BoundQuery("q_keyset_page", (s, d) => {
    import graft.operators.Pagination
    val cust = Tables.customer(s, d)
    val cursor = Pagination.keysetPage(cust, col("c_custkey"), None, 20)
      .agg(max("c_custkey")).first().getLong(0)
    Pagination.keysetPage(cust, col("c_custkey"), Some(lit(cursor)), 20)
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }, Some("""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey > (SELECT max(c_custkey) FROM
                       (SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 20))
    ORDER BY c_custkey LIMIT 20
  """))

  /** Ratio-to-report: each priority's share of total revenue — an
    * unpartitioned SUM-over-window on the already-aggregated 5-row
    * result (windows over aggregates, not rows, at scale). */
  private val qPercentTotal = BoundQuery("q_percent_total", (s, d) => {
    val w = Window.partitionBy()
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(sumCents(col("o_totalprice")).as("rc"))
      .withColumn("share",
        round(col("rc").cast("double") / sum(col("rc")).over(w).cast("double"), 9))
      .select(col("o_orderpriority"), money(col("rc")).as("revenue"), col("share"))
      .orderBy("o_orderpriority")
  }, Some("""
    WITH agg AS (
      SELECT o_orderpriority,
             CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS rc
      FROM orders GROUP BY 1)
    SELECT o_orderpriority, CAST(rc AS DOUBLE)/100.0 AS revenue,
           round(CAST(rc AS DOUBLE) / CAST(sum(rc) OVER () AS DOUBLE), 9) AS share
    FROM agg ORDER BY o_orderpriority
  """))

  /** First-touch attribution via max_by/min_by: each user's first
    * event type and last purchase value in ONE aggregation — no
    * window, no self-join (DuckDB twin: arg_min/arg_max). Ordered on
    * the exact ns epoch; event_id breaks ties via the packed struct. */
  private val qFirstTouch = BoundQuery("q_first_touch", (s, d) => {
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min_by(col("event_type"),
          format_string("%020d-%010d", col("ts_ns"), col("event_id"))).as("first_type"),
        max_by(col("event_type"),
          format_string("%020d-%010d", col("ts_ns"), col("event_id"))).as("last_type"),
        count(lit(1)).as("n"))
      .orderBy("user_id")
  }, Some("""
    SELECT user_id,
           arg_min(event_type, printf('%020d-%010d', epoch_ns(ts), event_id)) AS first_type,
           arg_max(event_type, printf('%020d-%010d', epoch_ns(ts), event_id)) AS last_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY user_id ORDER BY user_id
  """))

  /** Ordered string aggregation: per-customer, per-priority ordered
    * key list. Built portably as sort(collect) + join — NUMERIC sort
    * before stringification (a lexicographic listagg would order
    * "10" before "2"); DuckDB twin is string_agg(... ORDER BY). */
  private val qStringAgg = BoundQuery("q_string_agg", (s, d) => {
    Tables.orders(s, d).where(col("o_custkey") < 20)
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(array_join(
        transform(sort_array(collect_list(col("o_orderkey"))), x => x.cast("string")),
        ",").as("keys"))
      .orderBy("o_custkey", "o_orderpriority")
  }, Some("""
    SELECT o_custkey, o_orderpriority,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys
    FROM orders WHERE o_custkey < 20
    GROUP BY 1, 2 ORDER BY o_custkey, o_orderpriority
  """))

  /** Per-group mode (most frequent priority per customer, ties to the
    * lexicographically smallest) — count + rank, deterministic where a
    * native mode()'s tie behavior is engine-defined. */
  private val qMode = BoundQuery("q_mode", (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("cnt").desc, col("o_orderpriority"))
    Tables.orders(s, d).where(col("o_custkey") < 100)
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderpriority").as("mode_priority"), col("cnt"))
      .orderBy("o_custkey")
  }, Some("""
    SELECT o_custkey, o_orderpriority AS mode_priority, cnt FROM (
      SELECT o_custkey, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY count(*) DESC, o_orderpriority) AS rn
      FROM orders WHERE o_custkey < 100 GROUP BY 1, 2)
    WHERE rn = 1 ORDER BY o_custkey
  """))

  /** Cohort lifetime-value curves: customers grouped by first-order
    * month, revenue accumulated over months-since-first — the LTV
    * readout that complements q_retention's activity counts and
    * q_first_order_cohort's sizing. Cohort sizes and revenues are
    * exact longs; the cumulative window partitions by cohort (never
    * global); LTV-per-customer is one final division. */
  private val qCohortLtv = BoundQuery("q_cohort_ltv", (s, d) => {
    val o = Tables.orders(s, d)
    val first = o.groupBy("o_custkey")
      .agg(trunc(min(col("o_orderdate")), "month").as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_customers"))
    val aged = o.join(first, "o_custkey")
      .withColumn("age",
        months_between(trunc(col("o_orderdate"), "month"), col("cohort")).cast("long"))
      .groupBy("cohort", "age")
      .agg(count(lit(1)).as("n_orders"), sumCents(col("o_totalprice")).as("rc"))
    val w = Window.partitionBy("cohort").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aged.withColumn("cum_rc", sum(col("rc")).over(w))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("age"), col("n_customers"), col("n_orders"),
        money(col("rc")).as("revenue"),
        money(col("cum_rc")).as("cum_revenue"),
        round(col("cum_rc").cast("double") / col("n_customers").cast("double") / 100.0, 6)
          .as("ltv_per_customer"))
      .orderBy("cohort", "age")
  }, Some("""
    WITH first AS (
      SELECT o_custkey, CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS cohort
      FROM orders GROUP BY 1),
    sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
              FROM first GROUP BY 1),
    aged AS (
      SELECT cohort,
        CAST(datediff('month', cohort, CAST(date_trunc('month', o_orderdate) AS DATE)) AS BIGINT) AS age,
        CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rc
      FROM orders JOIN first USING (o_custkey)
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort, age, n_orders, rc,
        sum(rc) OVER (PARTITION BY cohort ORDER BY age
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rc
      FROM aged)
    SELECT cum.cohort, age, n_customers, n_orders,
      CAST(rc AS DOUBLE) / 100.0 AS revenue,
      CAST(cum_rc AS DOUBLE) / 100.0 AS cum_revenue,
      round(CAST(cum_rc AS DOUBLE) / CAST(n_customers AS DOUBLE) / 100.0, 6)
        AS ltv_per_customer
    FROM cum JOIN sizes USING (cohort)
    ORDER BY cohort, age
  """))

  val all: Seq[BoundQuery] = Seq(
    qRunningRevenue, qRollupRevenue, qNoUrgentCustomers, qJsonProps,
    qJsonStruct, qAsofJoin, qApproxDistinct, qSaltedAgg, qRolling30d,
    qUnpivot, qSetOps, qAboveAvg, qCalendar, qKeysetPage, qPercentTotal,
    qFirstTouch, qStringAgg, qMode, qCohortLtv)
}
