package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 wave 9 (r5): the three serial-diagnostics closed
  * forms every forecasting pipeline runs over its residual/series
  * checks — Ljung–Box portmanteau, the Lo–MacKinlay variance ratio,
  * and MASE of the seasonal-naive baseline. All three build on the
  * exact-integer daily-series discipline (q_acf's n·x − Σx centering,
  * cents sums) with identical-double-tree finishes.
  */
object DiagnosticsQueries {

  /** Ljung–Box Q over lags 1..10 of the daily-revenue series
    * (Ljung & Box 1978): Q = n(n+2)·Σ_k ρ̂_k²/(n−k), with the ρ̂_k
    * read as the SAME exact acf ppm integers q_acf computes (decimal
    * centering, one truncating division per lag), so both engines
    * share the identical ρ inputs; the lag sum walks k = 1..10 in a
    * pinned ORDER BY fold. Emits Q alongside the 10-lag ppm table's
    * summary terms. */
  private val qLjungBox = BoundQuery("q_ljung_box", (s, d) => {
    val ser = graft.util.CacheScope.persist(
      Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(cents(col("o_totalprice"))).as("x")))
    val st = ser.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val y = graft.util.CacheScope.persist(
      ser.crossJoin(broadcast(st))
        .select(col("day"),
          (col("n").cast("decimal(19,0)") * col("x").cast("decimal(19,0)") -
            col("sx").cast("decimal(38,0)")).as("y")))
    val den = y.agg(
      floor(sum(col("y") * col("y")) / lit(1000000L)).as("den_m"))
    val lags = s.range(1, 11).select(col("id").as("lag"))
    val acf = y.crossJoin(broadcast(lags))
      .join(y.select(col("day").as("bday"), col("y").as("yb")),
        col("bday") === date_add(col("day"), col("lag").cast("int")))
      .groupBy("lag")
      .agg(sum(col("y") * col("yb")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), expr("num div den_m").as("acf_ppm"))
    acf.crossJoin(broadcast(st.select(col("n"))))
      .groupBy("n")
      .agg(sort_array(collect_list(struct(col("lag"), col("acf_ppm")))).as("rs"))
      .select(col("n").as("n_days"),
        round(expr("""
          CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) *
          aggregate(rs, CAST(0.0 AS DOUBLE), (acc, v) ->
            acc + (CAST(v.acf_ppm AS DOUBLE)/1e6) * (CAST(v.acf_ppm AS DOUBLE)/1e6)
                  / (CAST(n AS DOUBLE) - CAST(v.lag AS DOUBLE)))"""), 6)
          .as("ljung_box_q"),
        size(col("rs")).cast("long").as("n_lags"))
  }, Some("""
    WITH ser AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS HUGEINT) AS x
      FROM orders GROUP BY 1),
    st AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx FROM ser),
    y AS (SELECT day, n*x - sx AS y FROM ser, st),
    den AS (SELECT sum(y*y) // 1000000 AS den_m FROM y),
    acf AS (
      SELECT CAST(l.lag AS BIGINT) AS lag,
             CAST(sum(a.y*b.y) // den_m AS BIGINT) AS acf_ppm
      FROM y a
      CROSS JOIN (SELECT unnest(range(1, 11)) AS lag) l
      JOIN y b ON b.day = a.day + CAST(l.lag AS INTEGER)
      CROSS JOIN den
      GROUP BY l.lag, den_m),
    packed AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
        list_sort(list(struct_pack(lag := lag, acf_ppm := acf_ppm))) AS rs
      FROM acf, st)
    SELECT n AS n_days,
      round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) *
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(rs, v ->
            (CAST(v.acf_ppm AS DOUBLE)/1e6) * (CAST(v.acf_ppm AS DOUBLE)/1e6)
              / (CAST(n AS DOUBLE) - CAST(v.lag AS DOUBLE)))),
          (acc, v) -> acc + v), 6) AS ljung_box_q,
      CAST(len(rs) AS BIGINT) AS n_lags
    FROM packed
  """))

  /** Lo–MacKinlay variance ratio VR(q) for q = 5 on daily revenue
    * changes — "is the series a random walk?" (VR ≈ 1) or mean-
    * reverting (< 1) / trending (> 1): both variances come from
    * exact integer moment sums of the 1-day and 5-day differences
    * (overlapping q-period differences, the standard estimator), and
    * VR = (n₁·(n₁·Q₅ − S₅²)) / (q·n₅·(n₅·Q₁ − S₁²)) as one identical
    * double tree over six exact integers. */
  private val vrQ = 5

  private val qVarianceRatio = BoundQuery("q_variance_ratio", (s, d) => {
    val q = vrQ
    val ser = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).as("x"))
    val w = Window.orderBy("day")
    val diffs = ser
      .withColumn("d1", col("x") - lag(col("x"), 1).over(w))
      .withColumn("dq", col("x") - lag(col("x"), q).over(w))
    val m = diffs.agg(
      count(col("d1")).as("n1"), sum(col("d1")).as("s1"),
      sum(expr("CAST(d1 AS DECIMAL(38,0)) * d1")).as("q1"),
      count(col("dq")).as("nq"), sum(col("dq")).as("sq"),
      sum(expr("CAST(dq AS DECIMAL(38,0)) * dq")).as("qq"))
    def cD(nm: String) = col(nm).cast("double")
    val var1 = (cD("n1") * cD("q1") - cD("s1") * cD("s1")) /
      (cD("n1") * cD("n1"))
    val varq = (cD("nq") * cD("qq") - cD("sq") * cD("sq")) /
      (cD("nq") * cD("nq"))
    m.select(col("n1").as("n_diffs1"), col("nq").as(s"n_diffs$q"),
      round(varq / (lit(q.toDouble) * var1), 9).as("vr5"))
  }, Some(s"""
    WITH ser AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
        CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1),
    diffs AS (
      SELECT x - lag(x, 1) OVER (ORDER BY day) AS d1,
             x - lag(x, $vrQ) OVER (ORDER BY day) AS dq
      FROM ser),
    m AS (
      SELECT CAST(count(d1) AS BIGINT) AS n1, CAST(sum(d1) AS BIGINT) AS s1,
        CAST(sum(CAST(d1 AS HUGEINT) * d1) AS HUGEINT) AS q1,
        CAST(count(dq) AS BIGINT) AS nq, CAST(sum(dq) AS BIGINT) AS sq,
        CAST(sum(CAST(dq AS HUGEINT) * dq) AS HUGEINT) AS qq
      FROM diffs)
    SELECT n1 AS n_diffs1, nq AS n_diffs$vrQ,
      round(((CAST(nq AS DOUBLE)*CAST(qq AS DOUBLE)
              - CAST(sq AS DOUBLE)*CAST(sq AS DOUBLE))
             / (CAST(nq AS DOUBLE)*CAST(nq AS DOUBLE)))
        / ($vrQ.0 * ((CAST(n1 AS DOUBLE)*CAST(q1 AS DOUBLE)
                    - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE))
                   / (CAST(n1 AS DOUBLE)*CAST(n1 AS DOUBLE)))), 9) AS vr5
    FROM m
  """))

  /** MASE of the seasonal-naive week-ago forecast per event type
    * (Hyndman & Koehler 2006): mean |y_t − y_{t−7}| over mean
    * |y_t − y_{t−1}| — both absolute-error sums are EXACT integers
    * (daily revenue cents), so MASE is one integral-cleared ratio:
    * mase_ppm = 10⁶·n₁·Σ|e₇| div (n₇·Σ|e₁|). < 10⁶ means beating
    * the naive one-step baseline. The scale-free forecast metric
    * beside q_pinball (quantile loss) and q_theil_u (RMSE ratio). */
  private val qMase = BoundQuery("q_mase", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("e1", abs(col("y") - lag(col("y"), 1).over(w)))
      .withColumn("e7", abs(col("y") - lag(col("y"), 7).over(w)))
      .groupBy("event_type")
      .agg(count(col("e1")).as("n1"), sum(col("e1")).as("se1"),
        count(col("e7")).as("n7"), sum(col("e7")).as("se7"))
      .select(col("event_type"), col("n1"), col("n7"),
        expr("""CASE WHEN n7 > 0 AND se1 > 0 THEN
                  CAST((1000000 * CAST(n1 AS DECIMAL(38,0)) * se7)
                       div (CAST(n7 AS DECIMAL(38,0)) * se1) AS BIGINT)
                END""").as("mase_ppm"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    e AS (
      SELECT event_type,
        abs(y - lag(y, 1) OVER (PARTITION BY event_type ORDER BY day)) AS e1,
        abs(y - lag(y, 7) OVER (PARTITION BY event_type ORDER BY day)) AS e7
      FROM daily),
    m AS (
      SELECT event_type, CAST(count(e1) AS BIGINT) AS n1,
        CAST(sum(e1) AS BIGINT) AS se1,
        CAST(count(e7) AS BIGINT) AS n7, CAST(sum(e7) AS BIGINT) AS se7
      FROM e GROUP BY 1)
    SELECT event_type, n1, n7,
      CASE WHEN n7 > 0 AND se1 > 0 THEN
        CAST((1000000 * CAST(n1 AS HUGEINT) * se7)
             // (CAST(n7 AS HUGEINT) * se1) AS BIGINT)
      END AS mase_ppm
    FROM m ORDER BY event_type
  """))

  /** Bartlett's test of equal order-value variances across the five
    * order priorities (Bartlett 1937) — the parametric sibling of
    * q_brown_forsythe (median-Levene) for normal-ish data: per-group
    * exact integer moments (n, Σcents, Σcents²), then the k-sized
    * statistic as one pinned fold over the priority-sorted group list
    * (Spark aggregate() HOF == DuckDB list_reduce over list_sort) —
    * identical double trees because every ln/÷ sees identical
    * integer operands in identical order on both engines. */
  private val qBartlett = BoundQuery("q_bartlett", (s, d) => {
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(cents(col("o_totalprice")).cast("decimal(38,0)")).as("sx"),
        sum(expr("""CAST(CAST(round(o_totalprice*100, 0) AS BIGINT) AS DECIMAL(38,0))
                    * CAST(round(o_totalprice*100, 0) AS BIGINT)""")).as("qx"))
      .agg(sort_array(collect_list(struct(
        col("o_orderpriority").as("p"), col("n"), col("sx"), col("qx")))).as("gs"))
      .select(
        size(col("gs")).cast("long").as("k"),
        expr("aggregate(gs, 0L, (a, v) -> a + v.n)").as("n_total"),
        expr("""aggregate(gs, CAST(0.0 AS DOUBLE), (a, v) ->
            a + (CAST(v.n AS DOUBLE) - 1.0) *
                ((CAST(v.n AS DOUBLE) * CAST(v.qx AS DOUBLE)
                  - CAST(v.sx AS DOUBLE) * CAST(v.sx AS DOUBLE))
                 / (CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0))))""")
          .as("pooled_num"),
        expr("""aggregate(gs, CAST(0.0 AS DOUBLE), (a, v) ->
            a + (CAST(v.n AS DOUBLE) - 1.0) *
                ln((CAST(v.n AS DOUBLE) * CAST(v.qx AS DOUBLE)
                    - CAST(v.sx AS DOUBLE) * CAST(v.sx AS DOUBLE))
                   / (CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0))))""")
          .as("sum_ln"),
        expr("""aggregate(gs, CAST(0.0 AS DOUBLE), (a, v) ->
            a + 1.0 / (CAST(v.n AS DOUBLE) - 1.0))""").as("sum_inv"))
      .select(col("k"), col("n_total"),
        round((
          (col("n_total").cast("double") - col("k").cast("double")) *
            log(col("pooled_num") /
              (col("n_total").cast("double") - col("k").cast("double"))) -
            col("sum_ln")) /
          (lit(1.0) + (col("sum_inv") - lit(1.0) /
            (col("n_total").cast("double") - col("k").cast("double"))) /
            (lit(3.0) * (col("k").cast("double") - lit(1.0)))), 6)
          .as("bartlett_t"))
        // pooled variance itself is ~1e14 cents² — beyond the 1e-4
        // round grain of a double ulp, so it is not emitted
  }, Some("""
    WITH g AS (
      SELECT o_orderpriority AS p, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS HUGEINT) AS sx,
        CAST(sum(CAST(CAST(round(o_totalprice*100, 0) AS BIGINT) AS HUGEINT)
                 * CAST(round(o_totalprice*100, 0) AS BIGINT)) AS HUGEINT) AS qx
      FROM orders GROUP BY 1),
    packed AS (
      SELECT list_sort(list(struct_pack(p := p, n := n, sx := sx, qx := qx))) AS gs
      FROM g),
    folds AS (
      SELECT CAST(len(gs) AS BIGINT) AS k,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(gs, v -> v.n)), (a, x) -> a + x) AS n_total,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(gs, v ->
          (CAST(v.n AS DOUBLE) - 1.0) *
          ((CAST(v.n AS DOUBLE) * CAST(v.qx AS DOUBLE)
            - CAST(v.sx AS DOUBLE) * CAST(v.sx AS DOUBLE))
           / (CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0))))),
          (a, x) -> a + x) AS pooled_num,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(gs, v ->
          (CAST(v.n AS DOUBLE) - 1.0) *
          ln((CAST(v.n AS DOUBLE) * CAST(v.qx AS DOUBLE)
              - CAST(v.sx AS DOUBLE) * CAST(v.sx AS DOUBLE))
             / (CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0))))),
          (a, x) -> a + x) AS sum_ln,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(gs, v ->
          1.0 / (CAST(v.n AS DOUBLE) - 1.0))), (a, x) -> a + x) AS sum_inv
      FROM packed)
    SELECT k, n_total,
      round(((CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE)) *
               ln(pooled_num / (CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE)))
             - sum_ln)
            / (1.0 + (sum_inv - 1.0 / (CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE)))
                     / (3.0 * (CAST(k AS DOUBLE) - 1.0))), 6) AS bartlett_t
    FROM folds
  """))

  /** Cook's distance + leverage for every day of the daily-revenue-
    * on-time OLS (Cook 1977) — which days bend the trend line: the
    * regression moments are exact decimals, the residual is CLEARED
    * to integers (E_i = n·D·y_i − D·Sy + Nb·Sx − n·Nb·x_i with
    * D = n·Sxx − Sx², Nb = n·Sxy − Sx·Sy) and read back to cents by
    * one truncating division — both engines truncate toward zero, so
    * e_cents is bit-identical; leverage h_i = (D + (n·x_i − Sx)²)/(n·D)
    * is an exact ppm. Cook's D then = e²·h/(p·s²·(1−h)²) as an
    * identical double tree over (e_cents, lev_ppm, SSE, n). The day
    * index comes from datediff against the broadcast min-day — no
    * global window anywhere. */
  private val qCooks = BoundQuery("q_cooks_distance", (s, d) => {
    val ser = graft.util.CacheScope.persist(
      Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(cents(col("o_totalprice"))).as("y")))
    val d0 = ser.agg(min(col("day")).as("d0"))
    val xy = graft.util.CacheScope.persist(
      ser.crossJoin(broadcast(d0))
        .select(col("day"),
          datediff(col("day"), col("d0")).cast("decimal(38,0)").as("x"),
          col("y").cast("decimal(38,0)").as("yy")))
    val m = xy.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x")).as("sx"), sum(col("yy")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("yy")).as("sxy"))
    val rows = graft.util.CacheScope.persist(
      xy.crossJoin(broadcast(m))
        .withColumn("dd", expr("n*sxx - sx*sx"))
        .withColumn("nb", expr("n*sxy - sx*sy"))
        .select(col("day"), col("n"),
          expr("(n*dd*yy - dd*sy + nb*sx - n*nb*x) div (n*dd)").as("e_cents"),
          expr("(1000000 * (dd + (n*x - sx)*(n*x - sx))) div (n*dd)")
            .as("lev_ppm")))
    val sse = rows.agg(
      sum(expr("CAST(e_cents AS DECIMAL(38,0)) * e_cents")).as("sse"))
    rows.crossJoin(broadcast(sse))
      .select(col("day"), col("e_cents"), col("lev_ppm"),
        round(expr("""
          (CAST(e_cents AS DOUBLE) * CAST(e_cents AS DOUBLE)
           * (CAST(lev_ppm AS DOUBLE) / 1e6))
          / (2.0 * (CAST(sse AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0))
             * (1.0 - CAST(lev_ppm AS DOUBLE) / 1e6)
             * (1.0 - CAST(lev_ppm AS DOUBLE) / 1e6))"""), 9).as("cooks_d"))
      .orderBy("day")
  }, Some("""
    WITH ser AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    d0 AS (SELECT min(day) AS d0 FROM ser),
    xy AS (
      SELECT day, CAST(datediff('day', d0, day) AS HUGEINT) AS x,
             CAST(y AS HUGEINT) AS yy
      FROM ser, d0),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(yy) AS sy,
        sum(x*x) AS sxx, sum(x*yy) AS sxy
      FROM xy),
    rows_ AS (
      SELECT day, n,
        (n*dd*yy - dd*sy + nb*sx - n*nb*x) // (n*dd) AS e_cents,
        (1000000 * (dd + (n*x - sx)*(n*x - sx))) // (n*dd) AS lev_ppm
      FROM (SELECT xy.*, m.n, m.sx, m.sy,
              m.n*m.sxx - m.sx*m.sx AS dd,
              m.n*m.sxy - m.sx*m.sy AS nb
            FROM xy, m)),
    sse AS (SELECT sum(e_cents * e_cents) AS sse FROM rows_)
    SELECT day, CAST(e_cents AS BIGINT) AS e_cents,
      CAST(lev_ppm AS BIGINT) AS lev_ppm,
      round((CAST(e_cents AS DOUBLE) * CAST(e_cents AS DOUBLE)
             * (CAST(lev_ppm AS DOUBLE) / 1e6))
            / (2.0 * (CAST(sse AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0))
               * (1.0 - CAST(lev_ppm AS DOUBLE) / 1e6)
               * (1.0 - CAST(lev_ppm AS DOUBLE) / 1e6)), 9) AS cooks_d
    FROM rows_, sse ORDER BY day
  """))

  /** Breusch–Pagan heteroskedasticity LM test on the daily-revenue-
    * on-time OLS (Breusch & Pagan 1979, Koenker's studentized form
    * via the R² of e² on x): residuals come CLEARED to exact integer
    * cents (the q_cooks_distance identity — truncating div on both
    * engines), are down-scaled to exact kilo-cents (another truncating
    * div, so the squares fit decimal(38)), and the auxiliary
    * regression's R² is one double over six exact integer moments.
    * LM = n·R² ~ χ²(1) under homoskedasticity. */
  private val qBreuschPagan = BoundQuery("q_breusch_pagan", (s, d) => {
    val ser = graft.util.CacheScope.persist(
      Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(cents(col("o_totalprice"))).as("y")))
    val d0 = ser.agg(min(col("day")).as("d0"))
    val xy = graft.util.CacheScope.persist(
      ser.crossJoin(broadcast(d0))
        .select(datediff(col("day"), col("d0")).cast("decimal(38,0)").as("x"),
          col("y").cast("decimal(38,0)").as("yy")))
    val m = xy.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x")).as("sx"), sum(col("yy")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("yy")).as("sxy"))
    val aux = xy.crossJoin(broadcast(m))
      .withColumn("dd", expr("n*sxx - sx*sx"))
      .withColumn("nb", expr("n*sxy - sx*sy"))
      .select(col("x"),
        expr("((n*dd*yy - dd*sy + nb*sx - n*nb*x) div (n*dd)) div 1000")
          .as("ek"))
      .select(col("x"), (col("ek") * col("ek")).cast("decimal(38,0)").as("u"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("u")).as("su"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("u")).as("sxu"),
        sum(col("u") * col("u")).as("suu"))
    aux.select(col("n").cast("long").as("n_days"),
      round(expr("""
        CAST(n AS DOUBLE) *
        (CAST(n*sxu - sx*su AS DOUBLE) * CAST(n*sxu - sx*su AS DOUBLE))
        / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*suu - su*su AS DOUBLE))
      """), 6).as("bp_lm"))
  }, Some("""
    WITH ser AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    d0 AS (SELECT min(day) AS d0 FROM ser),
    xy AS (
      SELECT CAST(datediff('day', d0, day) AS HUGEINT) AS x,
             CAST(y AS HUGEINT) AS yy
      FROM ser, d0),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(yy) AS sy,
        sum(x*x) AS sxx, sum(x*yy) AS sxy
      FROM xy),
    aux AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(u) AS su,
        sum(x*x) AS sxx, sum(x*u) AS sxu, sum(u*u) AS suu
      FROM (
        SELECT x, ek*ek AS u FROM (
          SELECT x,
            ((n*dd*yy - dd*sy + nb*sx - n*nb*x) // (n*dd)) // 1000 AS ek
          FROM (SELECT xy.*, m.n, m.sx, m.sy,
                  m.n*m.sxx - m.sx*m.sx AS dd,
                  m.n*m.sxy - m.sx*m.sy AS nb
                FROM xy, m))))
    SELECT CAST(n AS BIGINT) AS n_days,
      round(CAST(n AS DOUBLE) *
        (CAST(n*sxu - sx*su AS DOUBLE) * CAST(n*sxu - sx*su AS DOUBLE))
        / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*suu - su*su AS DOUBLE)), 6)
        AS bp_lm
    FROM aux
  """))

  /** sMAPE + WAPE of the week-ago seasonal-naive per event type —
    * the two percentage-error readouts MASE (q_mase) doesn't give.
    * FULLY integer: each day's sMAPE term is (2·10⁶·|y−f|) div
    * (|y|+|f|) (truncating, identical both engines), the mean is an
    * integer div of the exact term sum, and WAPE is one integral-
    * cleared ppm ratio — no double appears anywhere. Forecast = lag-7
    * under a type-partitioned window (never global). */
  private val qSmape = BoundQuery("q_smape", (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))
    daily.withColumn("f", lag(col("y"), 7).over(w))
      .where(col("f").isNotNull && (abs(col("y")) + abs(col("f"))) > 0L)
      .select(col("event_type"),
        expr("(2000000 * CAST(abs(y - f) AS DECIMAL(38,0))) div (abs(y) + abs(f))")
          .as("term"),
        abs(col("y") - col("f")).as("ae"), abs(col("y")).as("ay"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        expr("CAST(sum(term) div count(1) AS BIGINT)").as("smape_ppm"),
        expr("""CAST((1000000 * CAST(sum(ae) AS DECIMAL(38,0)))
                div sum(ay) AS BIGINT)""").as("wape_ppm"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    lagd AS (
      SELECT event_type, y,
        lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
      FROM daily),
    terms AS (
      SELECT event_type,
        (2000000 * CAST(abs(y - f) AS HUGEINT)) // (abs(y) + abs(f)) AS term,
        abs(y - f) AS ae, abs(y) AS ay
      FROM lagd WHERE f IS NOT NULL AND abs(y) + abs(f) > 0)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      CAST(sum(term) // count(*) AS BIGINT) AS smape_ppm,
      CAST((1000000 * CAST(sum(ae) AS HUGEINT)) // sum(ay) AS BIGINT) AS wape_ppm
    FROM terms GROUP BY 1 ORDER BY 1
  """))

  /** Turning-point randomness test of the daily-revenue series
    * (Kendall 1973; Brockwell & Davis §1.6): count strict local
    * extrema T (sign change between consecutive diffs), compare to
    * the i.i.d. expectation E[T] = 2(n−2)/3 with
    * Var[T] = (16n−29)/90. The count is a FULLY integer pipeline
    * (lag/lead over the calendar-bounded daily series — the
    * q_engle_granger bounded-window contract); z is one double.
    * Flat spots (zero diff) are not turning points on either side —
    * the strict-product convention both engines share. */
  private val qTurningPoints = BoundQuery("q_turning_points", (s, d) => {
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val ser = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).as("y"))
    ser.withColumn("dp", col("y") - lag(col("y"), 1).over(w))
      .withColumn("dn", lead(col("y"), 1).over(w) - col("y"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dp").isNotNull && col("dn").isNotNull &&
          expr("CAST(dp AS DECIMAL(38,0)) * dn") < 0L, 1L).otherwise(0L))
          .as("t"))
      .select(col("n").as("n_days"), col("t").as("turning_points"),
        round(expr("""(CAST(t AS DOUBLE) - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
          / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0)"""), 6).as("z"))
  }, Some("""
    WITH ser AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    diffs AS (
      SELECT y - lag(y, 1) OVER (ORDER BY day) AS dp,
             lead(y, 1) OVER (ORDER BY day) - y AS dn
      FROM ser),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN dp IS NOT NULL AND dn IS NOT NULL
                       AND CAST(dp AS HUGEINT) * dn < 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS t
      FROM diffs)
    SELECT n AS n_days, t AS turning_points,
      round((CAST(t AS DOUBLE) - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
        / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 6) AS z
    FROM agg
  """))

  /** Welch's unequal-variance one-way ANOVA of order value across the
    * five priorities (Welch 1951) — the F test q_anova should have
    * been when q_bartlett says the variances differ: weights
    * wᵢ = nᵢ/sᵢ² from exact group moments, F* = Σwᵢ(mᵢ−m̄w)²/(k−1)
    * over the Welch correction term, plus its Satterthwaite df₂.
    * Same k-sized pinned sorted-group fold as q_bartlett (identical
    * double trees over identical integer operands in identical
    * order on both engines). */
  private val qWelchAnova = BoundQuery("q_welch_anova", (s, d) => {
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(cents(col("o_totalprice")).cast("decimal(38,0)")).as("sx"),
        sum(expr("""CAST(CAST(round(o_totalprice*100, 0) AS BIGINT) AS DECIMAL(38,0))
                    * CAST(round(o_totalprice*100, 0) AS BIGINT)""")).as("qx"))
      .agg(sort_array(collect_list(struct(
        col("o_orderpriority").as("p"), col("n"), col("sx"), col("qx")))).as("gs"))
      .withColumn("k", size(col("gs")).cast("long"))
      .withColumn("ww", expr("""aggregate(gs, CAST(0.0 AS DOUBLE), (a, v) ->
        a + CAST(v.n AS DOUBLE) * CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0)
            / CAST(v.n * v.qx - v.sx * v.sx AS DOUBLE))"""))
      .withColumn("mw", expr("""aggregate(gs, CAST(0.0 AS DOUBLE), (a, v) ->
        a + CAST(v.n AS DOUBLE) * CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0)
            / CAST(v.n * v.qx - v.sx * v.sx AS DOUBLE)
            * (CAST(v.sx AS DOUBLE) / CAST(v.n AS DOUBLE))) / ww"""))
      .withColumn("num", expr("""aggregate(gs, CAST(0.0 AS DOUBLE), (a, v) ->
        a + CAST(v.n AS DOUBLE) * CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0)
            / CAST(v.n * v.qx - v.sx * v.sx AS DOUBLE)
            * (CAST(v.sx AS DOUBLE) / CAST(v.n AS DOUBLE) - mw)
            * (CAST(v.sx AS DOUBLE) / CAST(v.n AS DOUBLE) - mw))
        / (CAST(k AS DOUBLE) - 1.0)"""))
      .withColumn("lam", expr("""aggregate(gs, CAST(0.0 AS DOUBLE), (a, v) ->
        a + (1.0 - CAST(v.n AS DOUBLE) * CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0)
                   / CAST(v.n * v.qx - v.sx * v.sx AS DOUBLE) / ww)
            * (1.0 - CAST(v.n AS DOUBLE) * CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0)
                     / CAST(v.n * v.qx - v.sx * v.sx AS DOUBLE) / ww)
            / (CAST(v.n AS DOUBLE) - 1.0))"""))
      .select(col("k"),
        round(expr("""num / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
          / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) * lam)"""), 6)
          .as("welch_f"),
        round(expr("""(CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
          / (3.0 * lam)"""), 4).as("df2"))
  }, Some("""
    WITH g AS (
      SELECT o_orderpriority AS p, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS HUGEINT) AS sx,
        CAST(sum(CAST(CAST(round(o_totalprice*100, 0) AS BIGINT) AS HUGEINT)
                 * CAST(round(o_totalprice*100, 0) AS BIGINT)) AS HUGEINT) AS qx
      FROM orders GROUP BY 1),
    packed AS (
      SELECT list_sort(list(struct_pack(p := p, n := n, sx := sx, qx := qx))) AS gs
      FROM g),
    s1 AS (
      SELECT gs, CAST(len(gs) AS BIGINT) AS k,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(gs, v ->
          CAST(v.n AS DOUBLE) * CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0)
            / CAST(v.n * v.qx - v.sx * v.sx AS DOUBLE))), (a, x) -> a + x) AS ww
      FROM packed),
    s2 AS (
      SELECT gs, k, ww,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(gs, v ->
          CAST(v.n AS DOUBLE) * CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0)
            / CAST(v.n * v.qx - v.sx * v.sx AS DOUBLE)
            * (CAST(v.sx AS DOUBLE) / CAST(v.n AS DOUBLE)))), (a, x) -> a + x)
          / ww AS mw
      FROM s1),
    s3 AS (
      SELECT k,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(gs, v ->
          CAST(v.n AS DOUBLE) * CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0)
            / CAST(v.n * v.qx - v.sx * v.sx AS DOUBLE)
            * (CAST(v.sx AS DOUBLE) / CAST(v.n AS DOUBLE) - mw)
            * (CAST(v.sx AS DOUBLE) / CAST(v.n AS DOUBLE) - mw))), (a, x) -> a + x)
          / (CAST(k AS DOUBLE) - 1.0) AS num,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(gs, v ->
          (1.0 - CAST(v.n AS DOUBLE) * CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0)
                 / CAST(v.n * v.qx - v.sx * v.sx AS DOUBLE) / ww)
          * (1.0 - CAST(v.n AS DOUBLE) * CAST(v.n AS DOUBLE) * (CAST(v.n AS DOUBLE) - 1.0)
                   / CAST(v.n * v.qx - v.sx * v.sx AS DOUBLE) / ww)
          / (CAST(v.n AS DOUBLE) - 1.0))), (a, x) -> a + x) AS lam
      FROM s2)
    SELECT k,
      round(num / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
        / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) * lam), 6) AS welch_f,
      round((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) / (3.0 * lam), 4)
        AS df2
    FROM s3
  """))

  /** Mahalanobis outlier ranking over the 3-feature order profile
    * (quantity cents, item count, totalprice cents — q_ols3's
    * feature frame): d²(x) = (x−μ)ᵀ Σ⁻¹ (x−μ) with Σ the population
    * covariance from the SAME exact decimal moment sums q_ols3
    * accumulates and Σ⁻¹ the closed-form 3×3 adjugate — the
    * multivariate companion to q_tukey_fences/q_grubbs that catches
    * rows no per-column fence sees (unusual COMBINATIONS). Top-20 by
    * d² with the ranking on the ROUNDED distance + orderkey
    * tiebreak, so the emitted order is ulp-independent and the
    * DuckDB oracle replays the identical double tree.
    *
    * Scale shape: one moment reduction (map-side partial to one
    * row), the 1-row broadcast back, one codegen'd per-row quadratic
    * form, TakeOrdered 20 — no window, no shuffle beyond the moment
    * combine. */
  private val qMahalanobis = BoundQuery("q_mahalanobis", (s, d) => {
    def d19(c: Column): Column = c.cast("decimal(19,0)")
    val feats = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_quantity"))).as("x1"),
        count(lit(1)).as("x2"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"),
          cents(col("o_totalprice")).as("x3")), Seq("l_orderkey"))
    val m = feats.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("x3")).as("s3"),
      sum(d19(col("x1")) * col("x1")).as("s11"),
      sum(d19(col("x1")) * col("x2")).as("s12"),
      sum(d19(col("x1")) * col("x3")).as("s13"),
      sum(d19(col("x2")) * col("x2")).as("s22"),
      sum(d19(col("x2")) * col("x3")).as("s23"),
      sum(d19(col("x3")) * col("x3")).as("s33"))
    val n = col("n").cast("double")
    def mu(i: Int) = col(s"s$i").cast("double") / n
    def cov(i: Int, j: Int) = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      col(s"s$a$b").cast("double") / n - mu(a) * mu(b)
    }
    val (c11, c12, c13) = (cov(1, 1), cov(1, 2), cov(1, 3))
    val (c22, c23, c33) = (cov(2, 2), cov(2, 3), cov(3, 3))
    val det = c11 * (c22 * c33 - c23 * c23) - c12 * (c12 * c33 - c23 * c13) +
      c13 * (c12 * c23 - c22 * c13)
    // adjugate / det — symmetric inverse entries
    val i11 = (c22 * c33 - c23 * c23) / det
    val i12 = (c13 * c23 - c12 * c33) / det
    val i13 = (c12 * c23 - c13 * c22) / det
    val i22 = (c11 * c33 - c13 * c13) / det
    val i23 = (c13 * c12 - c11 * c23) / det
    val i33 = (c11 * c22 - c12 * c12) / det
    val z1 = col("x1").cast("double") - mu(1)
    val z2 = col("x2").cast("double") - mu(2)
    val z3 = col("x3").cast("double") - mu(3)
    val d2 = z1 * (z1 * i11 + z2 * i12 + z3 * i13) +
      z2 * (z1 * i12 + z2 * i22 + z3 * i23) +
      z3 * (z1 * i13 + z2 * i23 + z3 * i33)
    feats.crossJoin(broadcast(m))
      .select(col("l_orderkey").as("okey"), round(d2, 6).as("d2"))
      .orderBy(desc("d2"), col("okey"))
      .limit(20)
  }, Some("""
    WITH feats AS (
      SELECT l_orderkey,
        sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS x1,
        CAST(count(*) AS BIGINT) AS x2,
        any_value(x3) AS x3
      FROM lineitem JOIN (
        SELECT o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS x3
        FROM orders) o ON o.o_orderkey = l_orderkey
      GROUP BY l_orderkey),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3,
        sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x1*x3) AS s13,
        sum(x2*x2) AS s22, sum(x2*x3) AS s23, sum(x3*x3) AS s33
      FROM feats),
    c AS (
      SELECT CAST(n AS DOUBLE) AS n,
        CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE) AS m1,
        CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE) AS m2,
        CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE) AS m3,
        CAST(s11 AS DOUBLE)/CAST(n AS DOUBLE)
          - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)) AS c11,
        CAST(s12 AS DOUBLE)/CAST(n AS DOUBLE)
          - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE)) AS c12,
        CAST(s13 AS DOUBLE)/CAST(n AS DOUBLE)
          - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE)) AS c13,
        CAST(s22 AS DOUBLE)/CAST(n AS DOUBLE)
          - (CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE)) AS c22,
        CAST(s23 AS DOUBLE)/CAST(n AS DOUBLE)
          - (CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE)) AS c23,
        CAST(s33 AS DOUBLE)/CAST(n AS DOUBLE)
          - (CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE)) AS c33
      FROM m),
    inv AS (
      SELECT m1, m2, m3,
        (c22*c33 - c23*c23) / det AS i11,
        (c13*c23 - c12*c33) / det AS i12,
        (c12*c23 - c13*c22) / det AS i13,
        (c11*c33 - c13*c13) / det AS i22,
        (c13*c12 - c11*c23) / det AS i23,
        (c11*c22 - c12*c12) / det AS i33
      FROM (SELECT *,
        c11*(c22*c33 - c23*c23) - c12*(c12*c33 - c23*c13)
          + c13*(c12*c23 - c22*c13) AS det FROM c))
    SELECT l_orderkey AS okey,
      round(
        (CAST(x1 AS DOUBLE)-m1) * ((CAST(x1 AS DOUBLE)-m1)*i11
          + (CAST(x2 AS DOUBLE)-m2)*i12 + (CAST(x3 AS DOUBLE)-m3)*i13)
        + (CAST(x2 AS DOUBLE)-m2) * ((CAST(x1 AS DOUBLE)-m1)*i12
          + (CAST(x2 AS DOUBLE)-m2)*i22 + (CAST(x3 AS DOUBLE)-m3)*i23)
        + (CAST(x3 AS DOUBLE)-m3) * ((CAST(x1 AS DOUBLE)-m1)*i13
          + (CAST(x2 AS DOUBLE)-m2)*i23 + (CAST(x3 AS DOUBLE)-m3)*i33),
        6) AS d2
    FROM feats, inv
    ORDER BY d2 DESC, okey LIMIT 20
  """))

  val all: Seq[BoundQuery] = Seq(qLjungBox, qVarianceRatio, qMase,
    qBartlett, qCooks, qBreuschPagan, qSmape, qTurningPoints, qWelchAnova,
    qMahalanobis)
}
