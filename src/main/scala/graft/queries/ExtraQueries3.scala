package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._
import graft.operators.IntervalJoin

/** SURVEY §2.6 analytic-surface wave 3: windowed regression analytics
  * and the interval-overlap join — the two classic engine features
  * still missing from the window/join families (q_window_suite /
  * q_rolling_30d cover frames; q_range_join / q_asof_join cover
  * point-vs-interval; this adds slope-over-frame and
  * interval-vs-interval). */
object ExtraQueries3 {

  /** Rolling 7-observation OLS slope of daily revenue per type — the
    * trend readout a metrics dashboard overlays on q_rolling_30d's
    * moving average. The slope clears to integers INSIDE each frame:
    * b = (nΣty − ΣtΣy)/(nΣt² − (Σt)²) over the frame's (epoch-day,
    * cents) pairs — both forms are t-shift-invariant, so absolute
    * epoch days need no per-frame reindexing, and gaps in the
    * calendar change the denominator rather than silently skewing t.
    * slope_milli = 1000·b_num div b_den (signed; both engines
    * truncate toward zero). Frames with fewer than 7 observations are
    * suppressed (rank < 7), not emitted half-filled.
    *
    * Scale shape: one (type, day) preagg, then ROWS-frame window sums
    * per type over the calendar-bounded series — never a global
    * window, never a self-join. */
  private val qRollingSlope = BoundQuery("q_rolling_slope", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))
      .withColumn("t", expr("unix_date(day)"))
    val f = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(f))
      .withColumn("st", sum(col("t")).over(f))
      .withColumn("sy", sum(col("y")).over(f))
      .withColumn("stt", sum(col("t") * col("t")).over(f))
      .withColumn("sty", sum(expr("CAST(t AS DECIMAL(38,0)) * y")).over(f))
      .where(col("rn") >= 7)
      .select(col("event_type"), col("day"), col("y"),
        expr("""CAST((1000 * (CAST(n AS DECIMAL(38,0))*sty
                              - CAST(st AS DECIMAL(38,0))*sy))
                     div (CAST(n AS DECIMAL(38,0))*stt
                          - CAST(st AS DECIMAL(38,0))*st) AS BIGINT)""")
          .as("slope_milli_c_per_day"),
        expr("sy div n").as("avg7_c"))
      .orderBy("event_type", "day")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y,
        CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t
      FROM events GROUP BY 1, 2, 4),
    fr AS (
      SELECT event_type, day, y,
        row_number() OVER w AS rn,
        CAST(count(*) OVER f AS BIGINT) AS n,
        CAST(sum(t) OVER f AS BIGINT) AS st,
        CAST(sum(y) OVER f AS BIGINT) AS sy,
        CAST(sum(t*t) OVER f AS BIGINT) AS stt,
        CAST(sum(CAST(t AS HUGEINT) * y) OVER f AS HUGEINT) AS sty
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day),
             f AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT event_type, day, y,
      CAST((1000 * (CAST(n AS HUGEINT)*sty - CAST(st AS HUGEINT)*sy))
           // (CAST(n AS HUGEINT)*stt - CAST(st AS HUGEINT)*st) AS BIGINT)
        AS slope_milli_c_per_day,
      sy // n AS avg7_c
    FROM fr WHERE rn >= 7 ORDER BY event_type, day
  """))

  /** Interval-overlap join (operators.IntervalJoin): for every user,
    * which of their daily CLICK activity spans overlap their daily
    * ERROR spans in time — the "were errors landing while the user
    * was actively browsing" correlation, as an interval×interval
    * join. Intervals are per-(user, day) [first, last] event-time
    * spans in exact micros; the join key is the USER ONLY (not the
    * day — cross-midnight spans must still meet), so the operator's
    * bucket blocking does real work: each span explodes into the
    * 6-hour buckets it covers, the join runs as a pure (user, bucket)
    * EQUI join, candidates verify against the exact closed-interval
    * predicate and dedupe per pair. The oracle runs the quadratic
    * per-user formulation DuckDB can afford. */
  private val qIntervalJoin = BoundQuery("q_interval_join", (s, d) => {
    def spans(t: String) = Tables.events(s, d)
      .where(col("event_type") === t)
      .groupBy(col("user_id").as("key"),
        expr("unix_date(CAST(ts AS DATE))").as("id"))
      .agg(min(unix_micros(col("ts"))).as("start"),
        max(unix_micros(col("ts"))).as("end"))
    IntervalJoin.overlapPairs(spans("click"), spans("error"),
        bucketWidth = 6L * 3600 * 1000 * 1000)
      .select(col("key").as("user_id"),
        col("a_start").as("click_start_us"), col("a_end").as("click_end_us"),
        col("b_start").as("error_start_us"), col("b_end").as("error_end_us"),
        col("overlap").as("overlap_us"))
      .orderBy("user_id", "click_start_us", "error_start_us")
  }, Some("""
    WITH ev AS (
      SELECT user_id, event_type, epoch_ns(ts)//1000 AS us FROM events
      WHERE event_type IN ('click', 'error')),
    spans AS (
      SELECT user_id, event_type,
        CAST(min(us) AS BIGINT) AS s, CAST(max(us) AS BIGINT) AS e
      FROM ev GROUP BY user_id, event_type, us // 86400000000),
    j AS (
      SELECT a.user_id,
        a.s AS click_start_us, a.e AS click_end_us,
        b.s AS error_start_us, b.e AS error_end_us,
        least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
      FROM (SELECT * FROM spans WHERE event_type = 'click') a
      JOIN (SELECT * FROM spans WHERE event_type = 'error') b
        ON a.user_id = b.user_id AND a.s <= b.e AND b.s <= a.e)
    SELECT * FROM j
    ORDER BY user_id, click_start_us, error_start_us
  """))

  /** Top-k MIGRATION between consecutive years — the "movers and
    * shakers" dashboard table: each year's top-20 revenue parts with
    * their rank, previous-year rank, delta, and entry status
    * (new / up / down / steady). Revenue is exact cents; ranks
    * tie-break on partkey; the year-over-year match is a self equi
    * join of two 20-row frames per year — nothing wider than the
    * per-(year, part) partial agg ever shuffles. */
  private val qTopkMigration = BoundQuery("q_topk_migration", (s, d) => {
    val rev = Tables.lineitem(s, d)
      .groupBy(year(col("l_shipdate")).cast("long").as("yr"),
        col("l_partkey").as("pk"))
      .agg(sum(cents(col("l_extendedprice"))).as("rev_c"))
    val w = Window.partitionBy("yr").orderBy(desc("rev_c"), col("pk"))
    val top = rev.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 20)
    val prev = top.select((col("yr") + 1).as("yr"), col("pk"),
      col("rnk").as("prev_rnk"))
    top.join(prev, Seq("yr", "pk"), "left")
      .select(col("yr"), col("pk"), col("rnk"),
        col("prev_rnk"),
        (coalesce(col("prev_rnk"), lit(0L)) - col("rnk")).as("delta"),
        when(col("prev_rnk").isNull, "new")
          .when(col("prev_rnk") > col("rnk"), "up")
          .when(col("prev_rnk") < col("rnk"), "down")
          .otherwise("steady").as("status"))
      .orderBy("yr", "rnk")
  }, Some("""
    WITH rev AS (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, l_partkey AS pk,
        CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_c
      FROM lineitem GROUP BY 1, 2),
    top AS (
      SELECT yr, pk, rnk FROM (
        SELECT yr, pk,
          CAST(row_number() OVER (PARTITION BY yr ORDER BY rev_c DESC, pk) AS BIGINT) AS rnk
        FROM rev) WHERE rnk <= 20)
    SELECT t.yr, t.pk, t.rnk, p.rnk AS prev_rnk,
      COALESCE(p.rnk, 0) - t.rnk AS delta,
      CASE WHEN p.rnk IS NULL THEN 'new'
           WHEN p.rnk > t.rnk THEN 'up'
           WHEN p.rnk < t.rnk THEN 'down'
           ELSE 'steady' END AS status
    FROM top t LEFT JOIN top p ON p.yr = t.yr - 1 AND p.pk = t.pk
    ORDER BY t.yr, t.rnk
  """))

  /** Decile Lorenz curve of customer revenue — the curve q_gini is
    * the area of: customers ntile into revenue deciles (over the
    * CUSTOMER-GRAIN aggregate, |customers| ≪ |orders| — the q_rfm
    * bounded-window contract), each decile reports its exact-ppm
    * share of customers and of revenue, plus the running cumulative
    * share (the Lorenz ordinate). Fully integer. */
  private val qLorenz = BoundQuery("q_lorenz", (s, d) => {
    val rev = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sumCents(col("o_totalprice")).as("x"))
    val dec = rev.withColumn("decile",
      ntile(10).over(Window.orderBy(col("x"), col("o_custkey"))).cast("long"))
    val tot = dec.agg(sum(col("x").cast("decimal(38,0)")).as("tx"),
      count(lit(1)).as("tn"))
    val byDec = dec.groupBy("decile")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("x").cast("decimal(38,0)")).as("sx"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDec.crossJoin(broadcast(tot))
      .withColumn("cum_sx", sum(col("sx")).over(w))
      .select(col("decile"), col("n_cust"),
        expr("CAST((1000000 * sx) div tx AS BIGINT)").as("rev_share_ppm"),
        expr("CAST((1000000 * cum_sx) div tx AS BIGINT)").as("lorenz_ppm"))
      .orderBy("decile")
  }, Some("""
    WITH rev AS (
      SELECT o_custkey,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1),
    dec AS (
      SELECT x, CAST(ntile(10) OVER (ORDER BY x, o_custkey) AS BIGINT)
        AS decile
      FROM rev),
    tot AS (SELECT CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS tx FROM dec),
    byDec AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
        CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx
      FROM dec GROUP BY 1)
    SELECT decile, n_cust,
      CAST((1000000 * sx) // tx AS BIGINT) AS rev_share_ppm,
      CAST((1000000 * sum(sx) OVER (ORDER BY decile
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) // tx AS BIGINT)
        AS lorenz_ppm
    FROM byDec, tot ORDER BY decile
  """))

  /** Quantity-WEIGHTED price quartiles — the weighted companion to
    * q_global_median (an unweighted median answers "the typical line
    * item"; weighting by quantity answers "the typical UNIT sold",
    * the number a pricing analyst actually wants). Lower-median
    * convention at each quartile: the smallest price whose cumulative
    * weight reaches k/4 of the total, evaluated as exact integer
    * inequalities (4·cum ≥ k·W — no division, no ties ambiguity).
    *
    * Scale shape: one Ranking.globalCumSum (two-phase
    * range-partitioned running sum, never a single-partition window)
    * over (price, key)-sorted cents, then ONE conditional min
    * aggregation picks all three quartiles in the same pass — the
    * threshold scan never rescans per quantile. */
  private val qWeightedQuantiles = BoundQuery("q_weighted_quantiles", (s, d) => {
    val li = Tables.lineitem(s, d).select(
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
      cents(col("l_extendedprice")).as("v"), col("l_quantity").cast("long").as("w"))
    val cum = graft.operators.Ranking.globalCumSum(
      li, col("w"), "cw", col("v"), col("ok"), col("ln"))
      .crossJoin(broadcast(li.agg(sum(col("w")).as("tw"))))
    cum.agg(max(col("tw")).as("total_qty"),
        min(when(col("cw") * 4 >= col("tw"), col("v"))).as("p25_c"),
        min(when(col("cw") * 2 >= col("tw"), col("v"))).as("p50_c"),
        min(when(col("cw") * 4 >= col("tw") * 3, col("v"))).as("p75_c"))
      .select(col("total_qty"),
        money(col("p25_c")).as("w_p25"),
        money(col("p50_c")).as("w_median"),
        money(col("p75_c")).as("w_p75"))
  }, Some("""
    WITH li AS (
      SELECT l_orderkey AS ok, l_linenumber AS ln,
        CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v,
        CAST(l_quantity AS BIGINT) AS w
      FROM lineitem),
    c AS (
      SELECT v, w,
        CAST(sum(w) OVER (ORDER BY v, ok, ln
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
        CAST(sum(w) OVER () AS BIGINT) AS tw
      FROM li)
    SELECT max(tw) AS total_qty,
      CAST(min(CASE WHEN cw * 4 >= tw THEN v END) AS DOUBLE) / 100.0 AS w_p25,
      CAST(min(CASE WHEN cw * 2 >= tw THEN v END) AS DOUBLE) / 100.0 AS w_median,
      CAST(min(CASE WHEN cw * 4 >= tw * 3 THEN v END) AS DOUBLE) / 100.0 AS w_p75
    FROM c
  """))

  val all: Seq[BoundQuery] =
    Seq(qRollingSlope, qIntervalJoin, qTopkMigration, qLorenz,
      qWeightedQuantiles)
}
