package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 classical-stats wave 3: rank correlation, analysis of
  * variance, and robust slope estimation — the remaining canonical
  * exploratory-statistics primitives beside the existing t-test / KS /
  * chi-square / Mann-Kendall family.
  *
  * Numeric rule shared by all three: every aggregate is exact long /
  * decimal(38,0) arithmetic; ratios appear only as final integral
  * divisions to ppm (both engines truncate toward zero — verified for
  * negative operands too), and square roots are avoided entirely by
  * emitting SIGNED SQUARED statistics in ppm (the q_mann_kendall z²
  * convention), so the DuckDB oracle replays every term bit-exact.
  */
object StatsQueries {

  /** Spearman rank correlation per event type between the daily event
    * count and the daily revenue — "do busier days make more money,
    * monotonically?", the nonparametric complement to q_correlation's
    * Pearson.
    *
    * Ties use the standard averaged-rank convention kept EXACT by
    * working with 2·rank throughout: 2·avgrank = 2·minrank + (ties−1)
    * is always an integer, and Pearson's formula on the doubled ranks
    * equals Pearson on the averaged ranks (correlation is invariant
    * under the affine map r → 2r). The output is the SIGNED SQUARE of
    * rho in ppm — sign(num) · 10⁶·num² div (denx·deny) — which avoids
    * the one non-replayable operation (sqrt of a huge integer) while
    * determining rho to ±1e-6 exactly.
    *
    * Scale shape: one partial-aggregated shuffle to the (type, day)
    * grain, then windows partitioned by event_type whose width is
    * bounded by the CALENDAR (days observed), never by raw event rows
    * — the same bounded-window contract as q_seasonal/q_mann_kendall.
    */
  private val qSpearman = BoundQuery("q_spearman", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"), sumCents(col("value")).as("y"))
    val wx = Window.partitionBy("event_type").orderBy("x")
    val wy = Window.partitionBy("event_type").orderBy("y")
    val ranked = daily
      .withColumn("rx",
        lit(2L) * rank().over(wx).cast("long") +
          count(lit(1)).over(Window.partitionBy("event_type", "x")) - 1L)
      .withColumn("ry",
        lit(2L) * rank().over(wy).cast("long") +
          count(lit(1)).over(Window.partitionBy("event_type", "y")) - 1L)
    ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
      .select(col("event_type"), col("n").as("n_days"),
        expr("""CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 THEN
                  (CASE WHEN (n*sxy - sx*sy) < 0 THEN -1 ELSE 1 END) *
                  ((1000000 * (n*sxy - sx*sy) * (n*sxy - sx*sy))
                     div ((n*sxx - sx*sx) * (n*syy - sy*sy)))
                END""").as("rho2s_ppm"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(count(*) AS BIGINT) AS x,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type,
        2*CAST(rank() OVER (PARTITION BY event_type ORDER BY x) AS BIGINT)
          + CAST(count(*) OVER (PARTITION BY event_type, x) AS BIGINT) - 1 AS rx,
        2*CAST(rank() OVER (PARTITION BY event_type ORDER BY y) AS BIGINT)
          + CAST(count(*) OVER (PARTITION BY event_type, y) AS BIGINT) - 1 AS ry
      FROM daily),
    a AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        sum(rx) AS sx, sum(ry) AS sy,
        sum(rx*rx) AS sxx, sum(ry*ry) AS syy, sum(rx*ry) AS sxy
      FROM r GROUP BY 1)
    SELECT event_type, n AS n_days,
      CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 THEN
        CAST((CASE WHEN (n*sxy - sx*sy) < 0 THEN -1 ELSE 1 END) *
          ((1000000 * (n*sxy - sx*sy) * (n*sxy - sx*sy))
             // ((n*sxx - sx*sx) * (n*syy - sy*sy))) AS BIGINT)
      END AS rho2s_ppm
    FROM a ORDER BY event_type
  """))

  /** One-way ANOVA: does order priority explain any variance in order
    * value? F = (SSB/(k−1)) / (SSW/(n−k)) over cents-exact moments.
    *
    * The only non-integer steps in the textbook formula are the k+1
    * mean-square ratios S_g²/n_g; each is replaced by ONE truncating
    * integral division (error < 1 cent², identical in both engines),
    * after which SSB and SSW are plain integer sums — the same
    * engine-proven normalization q_attribution and q_ab_test use.
    * Unit choice is WHOLE DOLLARS, not cents: the per-group quotient
    * S_g² div n_g must fit int64 (Spark's `div` output type) at the
    * 10× smoke too, and cents would overflow it there (≈6.7e19)
    * while dollars stay 4 orders inside the range; the second moment
    * still accumulates in decimal(38,0) / HUGEINT.
    *
    * Scale shape: one map-side-combined groupBy over k=5 priority
    * groups, then a 5-row reduction — the cheapest possible test of a
    * categorical factor at any data size (no window, no join, no
    * second scan). Output variances are per-row (SS div n), so the
    * columns stay BIGINT-ranged at any sf. */
  private val qAnova = BoundQuery("q_anova", (s, d) => {
    val c = round(col("o_totalprice"), 0).cast("long")
    val g = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("ng"), sum(c).as("sg"),
        sum(c.cast("decimal(19,0)") * c.cast("decimal(19,0)")).as("qg"))
    g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("sg")).as("s"),
        sum(col("qg")).as("q"),
        sum(expr("(CAST(sg AS DECIMAL(38,0)) * sg) div ng")
          .cast("decimal(38,0)")).as("bsum"))
      .select(col("k"), col("n").as("n_orders"),
        expr("CAST((bsum - (CAST(s AS DECIMAL(38,0)) * s) div n) div n AS BIGINT)")
          .as("vb_usd2"),
        expr("CAST((q - bsum) div n AS BIGINT)").as("vw_usd2"),
        expr("""CAST((1000000 * (bsum - (CAST(s AS DECIMAL(38,0)) * s) div n)
                        * (n - k))
                     div (CAST((q - bsum) AS DECIMAL(38,0)) * (k - 1))
                     AS BIGINT)""").as("f_ppm"))
  }, Some("""
    WITH g AS (
      SELECT o_orderpriority,
        CAST(count(*) AS BIGINT) AS ng,
        CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS BIGINT) AS sg,
        sum(CAST(CAST(round(o_totalprice, 0) AS BIGINT) AS HUGEINT)
            * CAST(round(o_totalprice, 0) AS BIGINT)) AS qg
      FROM orders GROUP BY 1),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        CAST(sum(sg) AS BIGINT) AS s, sum(qg) AS q,
        sum((CAST(sg AS HUGEINT) * sg) // ng) AS bsum
      FROM g)
    SELECT k, n AS n_orders,
      CAST((bsum - (CAST(s AS HUGEINT) * s) // n) // n AS BIGINT) AS vb_usd2,
      CAST((q - bsum) // n AS BIGINT) AS vw_usd2,
      CAST((1000000 * (bsum - (CAST(s AS HUGEINT) * s) // n) * (n - k))
           // (CAST((q - bsum) AS HUGEINT) * (k - 1)) AS BIGINT) AS f_ppm
    FROM t
  """))

  /** Theil–Sen robust slope of daily revenue per event type: the
    * median of all pairwise day-to-day slopes — the estimator that
    * shrugs off the outlier days that wreck the OLS trend (q_linreg /
    * q_ols3 are its parametric cousins).
    *
    * The median is PICKED, never interpolated: pairs order by the
    * IEEE-exact double ratio Δrev/Δday (identical operands → identical
    * division in both engines) with the (day_i, day_j) pair as total
    * tiebreak, and the type-1 lower-median row is selected by rank.
    * The picked slope is then reported as its EXACT rational parts
    * (numerator cents, denominator days) plus a truncating ppm
    * quotient — no float survives into the hashed output.
    *
    * Scale shape: the pair set is CALENDAR²-bounded per type (d days →
    * d(d−1)/2 pairs regardless of raw event volume — the q_mann_kendall
    * bound), built by one self-join of the daily preagg; windows
    * partition by event_type over those bounded pairs only. */
  private val qTheilSen = BoundQuery("q_theil_sen", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("rev"))
      .withColumn("di", unix_date(col("day")).cast("long"))
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.di") < col("b.di"))
      .select(col("a.event_type").as("event_type"),
        (col("b.rev") - col("a.rev")).as("num"),
        (col("b.di") - col("a.di")).as("den"),
        col("a.di").as("di"), col("b.di").as("dj"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("num").cast("double") / col("den").cast("double"),
        col("di"), col("dj"))
    pairs
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("np", count(lit(1)).over(Window.partitionBy("event_type")))
      .where(col("rn") === expr("(np + 1) div 2"))
      .select(col("event_type"), col("np").as("n_pairs"),
        col("num").as("med_num_cents"), col("den").as("med_den_days"),
        expr("(num * 1000000) div den").as("slope_ppm"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS rev,
        CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di
      FROM events GROUP BY 1, 2, 4),
    pairs AS (
      SELECT a.event_type, b.rev - a.rev AS num, b.di - a.di AS den,
             a.di AS di, b.di AS dj
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.di < b.di),
    ranked AS (
      SELECT *,
        CAST(row_number() OVER (PARTITION BY event_type
          ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE), di, dj)
          AS BIGINT) AS rn,
        CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
      FROM pairs)
    SELECT event_type, np AS n_pairs, num AS med_num_cents,
      den AS med_den_days, (num * 1000000) // den AS slope_ppm
    FROM ranked WHERE rn = (np + 1) // 2
    ORDER BY event_type
  """))

  /** CUPED variance-reduced A/B readout (Deng 2013) — the industry-
    * standard experiment-sensitivity trick: adjust each cohort's
    * post-period metric by θ·(pre-period covariate − pooled mean),
    * θ = Cov(X,Y)/Var(X), shrinking variance by ρ²_XY without biasing
    * the A−B difference. Beside q_ab_test (raw Welch t) and
    * q_bootstrap (resampled CIs).
    *
    * X = customer's 1995–97 order count, Y = customer's 1998+ spend
    * in WHOLE DOLLARS (the q_anova unit rule: keeps n·Σxy and the ρ²
    * cross-products inside decimal(38,0) at the 10× smoke), cohorts
    * by md5(custkey). θ and ρ² come from exact pooled moments with
    * one truncating division each (ppm); the adjusted means replay
    * engine-identically. One groupBy to the customer grain, one 2-row
    * reduction — no window, no join beyond the broadcast of pooled
    * scalars. */
  private val qCuped = BoundQuery("q_cuped", (s, d) => {
    val per = Tables.orders(s, d)
      .withColumn("pre", (col("o_orderdate") < "1998-01-01").cast("long"))
      .withColumn("usd", round(col("o_totalprice"), 0).cast("long"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("pre")).as("x"),
        sum((lit(1L) - col("pre")) * col("usd")).as("y"))
      .withColumn("grp",
        when(substring(md5(col("o_custkey").cast("string")), 1, 2) < "80", "A")
          .otherwise("B"))
    val pooled = per.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)")).as("sxy"),
      sum(col("y").cast("decimal(19,0)") * col("y").cast("decimal(19,0)")).as("syy"))
      .select(col("n"), col("sx"), col("sy"),
        expr("""CAST((1000000 * (n * sxy - CAST(sx AS DECIMAL(38,0)) * sy))
                div (n * CAST(sxx AS DECIMAL(38,0)) - CAST(sx AS DECIMAL(38,0)) * sx)
                AS BIGINT)""").as("theta_ppm"),
        expr("""CAST((1000000 * (n * sxy - CAST(sx AS DECIMAL(38,0)) * sy)
                      * (n * sxy - CAST(sx AS DECIMAL(38,0)) * sy))
                div ((n * CAST(sxx AS DECIMAL(38,0)) - CAST(sx AS DECIMAL(38,0)) * sx)
                     * (n * syy - CAST(sy AS DECIMAL(38,0)) * sy))
                AS BIGINT)""").as("rho2_ppm"),
        expr("(1000000 * sx) div n").as("mx_pooled_u"))
    per.groupBy("grp")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("x")).as("gx"), sum(col("y")).as("gy"))
      .crossJoin(broadcast(pooled.select("theta_ppm", "rho2_ppm", "mx_pooled_u")))
      .select(col("grp"), col("n_cust"), col("theta_ppm"), col("rho2_ppm"),
        expr("(1000000 * gy) div n_cust").as("my_usd_u"),
        expr("""(1000000 * gy) div n_cust
                - CAST((CAST(theta_ppm AS DECIMAL(38,0))
                        * ((1000000 * gx) div n_cust - mx_pooled_u))
                       div 1000000 AS BIGINT)""").as("my_adj_usd_u"))
      .orderBy("grp")
  }, Some("""
    WITH per AS (
      SELECT o_custkey,
        CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END)
          AS BIGINT) AS x,
        CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                 THEN CAST(round(o_totalprice, 0) AS BIGINT) ELSE 0 END)
          AS BIGINT) AS y,
        CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 2) < '80'
             THEN 'A' ELSE 'B' END AS grp
      FROM orders GROUP BY o_custkey),
    pooled AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(x*x) AS BIGINT) AS sxx,
        sum(CAST(x AS HUGEINT) * y) AS sxy,
        sum(CAST(y AS HUGEINT) * y) AS syy
      FROM per),
    scal AS (
      SELECT n, sx, sy,
        CAST((1000000 * (n * sxy - CAST(sx AS HUGEINT) * sy))
          // (n * CAST(sxx AS HUGEINT) - CAST(sx AS HUGEINT) * sx) AS BIGINT)
          AS theta_ppm,
        CAST((1000000 * (n * sxy - CAST(sx AS HUGEINT) * sy)
              * (n * sxy - CAST(sx AS HUGEINT) * sy))
          // ((n * CAST(sxx AS HUGEINT) - CAST(sx AS HUGEINT) * sx)
             * (n * syy - CAST(sy AS HUGEINT) * sy)) AS BIGINT) AS rho2_ppm,
        (1000000 * sx) // n AS mx_pooled_u
      FROM pooled)
    SELECT grp, CAST(count(*) AS BIGINT) AS n_cust, theta_ppm, rho2_ppm,
      (1000000 * CAST(sum(y) AS BIGINT)) // count(*) AS my_usd_u,
      (1000000 * CAST(sum(y) AS BIGINT)) // count(*)
        - CAST((CAST(theta_ppm AS HUGEINT)
                * ((1000000 * CAST(sum(x) AS BIGINT)) // count(*) - mx_pooled_u))
               // 1000000 AS BIGINT) AS my_adj_usd_u
    FROM per CROSS JOIN scal
    GROUP BY grp, theta_ppm, rho2_ppm, mx_pooled_u ORDER BY grp
  """))

  /** Ratio-to-moving-average seasonal decomposition of daily event
    * volume per type — the classical (pre-STL) decomposition: trend =
    * centered 7-day window sum, detrended ratio in ppm, day-of-week
    * seasonal index = mean ratio per dow, residual = ratio − index.
    * Completes the temporal-modeling family: q_seasonal reads the dow
    * index alone, q_holt smooths level+trend; this separates all
    * three components. Full 7-day windows only, with the q_backtest
    * calendar-gap guard (last−first = 6 days) so a missing day
    * invalidates the window instead of silently shrinking it.
    *
    * All ratios are single truncating integral divisions on exact
    * counts; windows partition by event_type over the CALENDAR-
    * bounded daily grain. */
  private val qDecompose = BoundQuery("q_decompose", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("di", unix_date(col("day")).cast("long"))
    val w7 = Window.partitionBy("event_type").orderBy("di").rowsBetween(-3, 3)
    val ratios = daily
      .withColumn("sum7", sum(col("x")).over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("span", max(col("di")).over(w7) - min(col("di")).over(w7))
      .where(col("n7") === 7 && col("span") === 6)
      .withColumn("ratio_ppm", expr("(7000000 * x) div sum7"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    val seas = ratios.groupBy("event_type", "dow")
      .agg(expr("sum(ratio_ppm) div count(1)").as("seas_ppm"))
    ratios.join(seas, Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("x").as("n_events"),
        col("sum7"), col("ratio_ppm"), col("seas_ppm"),
        (col("ratio_ppm") - col("seas_ppm")).as("resid_ppm"))
      .orderBy("event_type", "day")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(count(*) AS BIGINT) AS x,
        CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di
      FROM events GROUP BY 1, 2, 4),
    win AS (
      SELECT event_type, day, x, di,
        CAST(sum(x) OVER w AS BIGINT) AS sum7,
        CAST(count(*) OVER w AS BIGINT) AS n7,
        CAST(max(di) OVER w - min(di) OVER w AS BIGINT) AS span
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY di
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    ratios AS (
      SELECT event_type, day, x, sum7,
        (7000000 * x) // sum7 AS ratio_ppm,
        CAST(dayofweek(day) + 1 AS BIGINT) AS dow
      FROM win WHERE n7 = 7 AND span = 6),
    seas AS (
      SELECT event_type, dow,
        CAST(sum(ratio_ppm) AS BIGINT) // count(*) AS seas_ppm
      FROM ratios GROUP BY 1, 2)
    SELECT r.event_type, r.day, r.x AS n_events, r.sum7, r.ratio_ppm,
      s.seas_ppm, r.ratio_ppm - s.seas_ppm AS resid_ppm
    FROM ratios r JOIN seas s ON r.event_type = s.event_type AND r.dow = s.dow
    ORDER BY r.event_type, r.day
  """))

  /** Inverse-propensity-weighted (stratified Horvitz–Thompson)
    * estimate of the effect of order urgency on completion,
    * controlling for order size — the observational-causal primitive
    * beside the randomized-split readouts (q_ab_test, q_cuped):
    * treatment = urgent/high priority, outcome = status F, strata =
    * fixed $100k size buckets, propensity = within-stratum treatment
    * rate.
    *
    * With a DISCRETE propensity the HT estimator is exact integer
    * work: per-stratum rates and the two weighted outcome means are
    * each one truncating division; no per-row weight ever
    * materializes (the stratum aggregate carries it). One scan, one
    * 5-stratum groupBy, one reduction. */
  private val qIpw = BoundQuery("q_ipw", (s, d) => {
    val strata = Tables.orders(s, d)
      .withColumn("st", least(floor(col("o_totalprice") / 100000).cast("long"), lit(4L)))
      .withColumn("t", col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long"))
      .withColumn("y", (col("o_orderstatus") === "F").cast("long"))
      .groupBy("st")
      .agg(count(lit(1)).as("n_s"), sum(col("t")).as("nt"),
        sum(col("t") * col("y")).as("yt"),
        sum((lit(1L) - col("t")) * col("y")).as("yc"))
      // positivity: strata with no treated or no control rows have an
      // undefined propensity weight — drop them (standard practice;
      // none occur on this data, the guard is for the 100 TB corpus)
      .where(col("nt") > 0 && col("nt") < col("n_s"))
      .withColumn("e_ppm", expr("(1000000 * nt) div n_s"))
      // HT contributions: Σ y_i/e_s over treated = (yt·1e12) div e_ppm
      .withColumn("c1", expr("(yt * 1000000000000) div e_ppm"))
      .withColumn("c0", expr("(yc * 1000000000000) div (1000000 - e_ppm)"))
    strata.agg(sum(col("n_s")).as("n"), count(lit(1)).as("n_strata"),
        sum(col("c1")).as("s1"), sum(col("c0")).as("s0"))
      .select(col("n").as("n_orders"), col("n_strata"),
        expr("s1 div n").as("y1_ppm"), expr("s0 div n").as("y0_ppm"),
        expr("s1 div n - s0 div n").as("ate_ppm"))
  }, Some("""
    WITH strata AS (
      SELECT least(CAST(floor(o_totalprice / 100000) AS BIGINT), 4) AS st,
        CAST(count(*) AS BIGINT) AS n_s,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS yt,
        CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS yc
      FROM orders GROUP BY 1),
    w AS (
      SELECT n_s,
        (yt * 1000000000000) // ((1000000 * nt) // n_s) AS c1,
        (yc * 1000000000000) // (1000000 - (1000000 * nt) // n_s) AS c0
      FROM strata WHERE nt > 0 AND nt < n_s)
    SELECT CAST(sum(n_s) AS BIGINT) AS n_orders,
      CAST(count(*) AS BIGINT) AS n_strata,
      CAST(sum(c1) AS BIGINT) // CAST(sum(n_s) AS BIGINT) AS y1_ppm,
      CAST(sum(c0) AS BIGINT) // CAST(sum(n_s) AS BIGINT) AS y0_ppm,
      CAST(sum(c1) AS BIGINT) // CAST(sum(n_s) AS BIGINT)
        - CAST(sum(c0) AS BIGINT) // CAST(sum(n_s) AS BIGINT) AS ate_ppm
    FROM w
  """))

  /** Difference-in-differences: the 2×2 (cohort × pre/post) panel
    * estimator — (A_post − A_pre) − (B_post − B_pre) on mean order
    * value, cohorts by md5(custkey), periods split at 1998-01-01.
    * On a hash split the true DID is ~0, which is exactly what the
    * placebo audit of an experiment pipeline should report. All four
    * cell means are single truncating divisions on exact whole-dollar
    * sums; one scan, one 4-cell groupBy, one reduction. */
  private val qDid = BoundQuery("q_did", (s, d) => {
    val cells = Tables.orders(s, d)
      .withColumn("grp",
        when(substring(md5(col("o_custkey").cast("string")), 1, 2) < "80", "A")
          .otherwise("B"))
      .withColumn("post", (col("o_orderdate") >= "1998-01-01").cast("long"))
      .withColumn("usd", round(col("o_totalprice"), 0).cast("long"))
      .groupBy("grp", "post")
      .agg(count(lit(1)).as("n"), sum(col("usd")).as("s"))
      .withColumn("mean_u", expr("(1000000 * s) div n"))
    cells.groupBy()
      .pivot(concat(col("grp"), col("post")), Seq("A0", "A1", "B0", "B1"))
      .agg(first(col("mean_u")))
      .select(col("A0").as("a_pre_u"), col("A1").as("a_post_u"),
        col("B0").as("b_pre_u"), col("B1").as("b_post_u"),
        expr("(A1 - A0) - (B1 - B0)").as("did_u"))
  }, Some("""
    WITH cells AS (
      SELECT
        CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 2) < '80'
             THEN 'A' ELSE 'B' END AS grp,
        CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS post,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS BIGINT) AS s
      FROM orders GROUP BY 1, 2),
    m AS (SELECT grp, post, (1000000 * s) // n AS mean_u FROM cells)
    SELECT
      max(CASE WHEN grp = 'A' AND post = 0 THEN mean_u END) AS a_pre_u,
      max(CASE WHEN grp = 'A' AND post = 1 THEN mean_u END) AS a_post_u,
      max(CASE WHEN grp = 'B' AND post = 0 THEN mean_u END) AS b_pre_u,
      max(CASE WHEN grp = 'B' AND post = 1 THEN mean_u END) AS b_post_u,
      (max(CASE WHEN grp = 'A' AND post = 1 THEN mean_u END)
       - max(CASE WHEN grp = 'A' AND post = 0 THEN mean_u END))
      - (max(CASE WHEN grp = 'B' AND post = 1 THEN mean_u END)
         - max(CASE WHEN grp = 'B' AND post = 0 THEN mean_u END)) AS did_u
    FROM m
  """))

  /** ABC (Pareto) classification of parts by revenue: class A carries
    * the first 80% of cumulative revenue, B to 95%, C the tail — the
    * inventory-analytics classic, and the canonical consumer of the
    * two-phase globalCumSum (revenue-descending rank over ALL parts —
    * the exact shape a naive `sum over (order by rev desc)` window
    * would funnel through one task).
    *
    * Class fences compare exact cents: cum·100 ≤ total·80 — integer
    * cross-multiplication, no percentage float. Output is the 3-row
    * class summary. */
  private val qAbcClass = BoundQuery("q_abc_class", (s, d) => {
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("part"))
      .agg(sumCents(col("l_extendedprice")).as("rev_c"))
    val tot = rev.agg(sum(col("rev_c")).as("t"))
    val cum = graft.operators.Ranking.globalCumSum(
      rev, col("rev_c"), "cum_c", col("rev_c").desc, col("part"))
    cum.crossJoin(broadcast(tot))
      .withColumn("cls",
        when(col("cum_c") * 100 <= col("t") * 80, "A")
          .when(col("cum_c") * 100 <= col("t") * 95, "B")
          .otherwise("C"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_parts"), sum(col("rev_c")).as("rev_cents"))
      .crossJoin(broadcast(tot))
      .select(col("cls"), col("n_parts"), col("rev_cents"),
        expr("(1000000 * rev_cents) div t").as("share_ppm"))
      .orderBy("cls")
  }, Some("""
    WITH rev AS (
      SELECT l_partkey AS part,
        CAST(sum(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) AS rev_c
      FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS t FROM rev),
    cum AS (
      SELECT part, rev_c,
        CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, part
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c
      FROM rev),
    cls AS (
      SELECT CASE WHEN cum_c * 100 <= t * 80 THEN 'A'
                  WHEN cum_c * 100 <= t * 95 THEN 'B'
                  ELSE 'C' END AS cls, rev_c
      FROM cum, tot)
    SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
      CAST(sum(rev_c) AS BIGINT) AS rev_cents,
      (1000000 * CAST(sum(rev_c) AS BIGINT)) // (SELECT t FROM tot) AS share_ppm
    FROM cls GROUP BY 1 ORDER BY 1
  """))

  /** Hill tail-index estimator over the top-200 order values — "how
    * heavy is the revenue tail?", the telemetry that decides whether
    * mean-based planning (thin tail, α > 2) or quantile-based
    * planning (heavy tail) is sound, and the classical complement to
    * q_zipf's rank-frequency slope. 1/α̂ = mean of ln(x_i/x_k) over
    * the k−1 largest values above the k-th.
    *
    * Per-term lns round to µnats before the exact-long sum (the
    * q_bigram_lm rule); α̂ itself is one integral division. The top-k
    * collapses to a TakeOrdered(200) — no global sort — and the
    * threshold x_k arrives by a 1-row broadcast min. */
  private val qHill = BoundQuery("q_hill", (s, d) => {
    val top = Tables.orders(s, d)
      .select(cents(col("o_totalprice")).as("c"), col("o_orderkey"))
      .orderBy(desc("c"), col("o_orderkey")).limit(200)
    val xk = top.agg(min(col("c")).as("ck"))
    top.crossJoin(broadcast(xk))
      .where(col("c") > col("ck"))
      .withColumn("t_u",
        round(log(col("c").cast("double") / col("ck").cast("double")) * 1e6, 0)
          .cast("long"))
      .agg(count(lit(1)).as("k_used"), max(col("ck")).as("xk_cents"),
        sum(col("t_u")).as("tsum"))
      .select(col("k_used"), col("xk_cents"),
        expr("tsum div k_used").as("inv_alpha_u"),
        expr("1000000000000 div (tsum div k_used)").as("alpha_ppm"))
  }, Some("""
    WITH top AS (
      SELECT CAST(round(o_totalprice*100, 0) AS BIGINT) AS c, o_orderkey
      FROM orders ORDER BY c DESC, o_orderkey LIMIT 200),
    xk AS (SELECT CAST(min(c) AS BIGINT) AS ck FROM top),
    terms AS (
      SELECT c, ck,
        CAST(round(ln(CAST(c AS DOUBLE) / CAST(ck AS DOUBLE)) * 1e6, 0) AS BIGINT)
          AS t_u
      FROM top, xk WHERE c > ck)
    SELECT CAST(count(*) AS BIGINT) AS k_used,
      CAST(max(ck) AS BIGINT) AS xk_cents,
      CAST(sum(t_u) AS BIGINT) // CAST(count(*) AS BIGINT) AS inv_alpha_u,
      1000000000000 // (CAST(sum(t_u) AS BIGINT) // CAST(count(*) AS BIGINT))
        AS alpha_ppm
    FROM terms
  """))

  /** Kendall tau-b per event type between the daily event count and
    * the daily revenue (q_spearman's exact grain) — the
    * pair-concordance rank correlation beside q_spearman's
    * rank-Pearson (tau is the one with the direct probabilistic
    * reading: P(concordant) − P(discordant)).
    *
    * Everything is exact integer work: concordant / discordant / tied
    * pair counts come from sign comparisons (never dx·dy products, so
    * no overflow at any sf), and tau-b's ratio
    * (C−D)/√((n0−n1)(n0−n2)) is emitted as the SIGNED SQUARE in ppm —
    * sign(C−D)·10⁶·(C−D)² div ((n0−n1)(n0−n2)) — the q_spearman /
    * q_mann_kendall convention that avoids the one non-replayable op
    * (sqrt) while pinning tau to ±1e-6.
    *
    * Scale shape: the O(m²) pair join is bounded by the CALENDAR, not
    * the data — m = days observed per type (≤ ~1000 over any test
    * horizon), so the self-join emits ≤ |types|·m²/2 rows total from a
    * first-stage aggregate that is itself one partial-agg shuffle over
    * raw events. */
  private val qKendall = BoundQuery("q_kendall_tau", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"), sumCents(col("value")).as("y"))
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        signum(col("a.x") - col("b.x")).cast("long").as("sx"),
        signum(col("a.y") - col("b.y")).cast("long").as("sy"))
    pairs.groupBy("event_type")
      .agg(count(lit(1)).as("n0"),
        sum(when(col("sx") * col("sy") === 1L, 1L).otherwise(0L)).as("conc"),
        sum(when(col("sx") * col("sy") === -1L, 1L).otherwise(0L)).as("disc"),
        sum(when(col("sx") === 0L, 1L).otherwise(0L)).as("tie_x"),
        sum(when(col("sy") === 0L, 1L).otherwise(0L)).as("tie_y"))
      .select(col("event_type"), col("n0").as("n_pairs"),
        col("conc"), col("disc"),
        expr("""CASE WHEN (n0 - tie_x) > 0 AND (n0 - tie_y) > 0 THEN
                  (CASE WHEN (conc - disc) < 0 THEN -1 ELSE 1 END) *
                  ((1000000 * (conc - disc) * (conc - disc))
                     div ((n0 - tie_x) * (n0 - tie_y)))
                END""").as("taub2s_ppm"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(count(*) AS BIGINT) AS x,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    p AS (
      SELECT a.event_type,
        CAST(sign(a.x - b.x) AS BIGINT) AS sx,
        CAST(sign(a.y - b.y) AS BIGINT) AS sy
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day),
    agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN sx*sy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
        CAST(sum(CASE WHEN sx*sy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
        CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tie_x,
        CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tie_y
      FROM p GROUP BY 1)
    SELECT event_type, n0 AS n_pairs, conc, disc,
      CASE WHEN (n0 - tie_x) > 0 AND (n0 - tie_y) > 0 THEN
        CAST((CASE WHEN (conc - disc) < 0 THEN -1 ELSE 1 END) *
          ((1000000 * (conc - disc) * (conc - disc))
             // ((n0 - tie_x) * (n0 - tie_y))) AS BIGINT)
      END AS taub2s_ppm
    FROM agg ORDER BY event_type
  """))

  /** Cramér's V effect size for the event_type × weekday contingency
    * table — "HOW strongly are type and weekday associated?", the
    * [0,1]-normalized companion to q_chi_square's unbounded statistic.
    *
    * Unlike q_chi_square (textbook float terms, pinned fold), the
    * statistic here is the DISCRETIZED chi²: each cell's term
    * (o·t − rt·ct)²/(t·rt·ct) is ONE truncating integral division to
    * ppm — numerator ≤ n⁴·10⁶ lives in decimal(38,0)/HUGEINT, error
    * < 1e-6 per cell, identical in both engines — so chi2_ppm is an
    * exact long SUM and V² = chi2/(n·min(r−1,c−1)) is one more
    * integral division. No float ever materializes; both readouts are
    * bit-replayable at any sf.
    *
    * Scale shape: one partial-agg shuffle to ≤ 20×7 cells; margins and
    * the final reduction are constant-size broadcasts. */
  private val qCramersV = BoundQuery("q_cramers_v", (s, d) => {
    val cells = Tables.events(s, d)
      .groupBy(col("event_type").as("r"),
        dayofweek(col("ts")).cast("long").as("c"))
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy("r").agg(sum("o").as("rt"))
    val ct = cells.groupBy("c").agg(sum("o").as("ct"))
    val tot = cells.agg(sum(col("o")).as("t"),
      count_distinct(col("r")).as("rlev"), count_distinct(col("c")).as("clev"))
    cells.join(broadcast(rt), "r").join(broadcast(ct), "c")
      .crossJoin(broadcast(tot))
      .select(col("rlev"), col("clev"), col("t"),
        expr("""(1000000 * (CAST(o AS DECIMAL(38,0)) * t - CAST(rt AS DECIMAL(38,0)) * ct)
                         * (CAST(o AS DECIMAL(38,0)) * t - CAST(rt AS DECIMAL(38,0)) * ct))
                div (CAST(t AS DECIMAL(38,0)) * rt * ct)""").as("term_u"))
      .groupBy("rlev", "clev", "t")
      .agg(sum(col("term_u")).as("chi2_ppm"), count(lit(1)).as("n_cells"))
      .select(col("t").as("n"), col("rlev").as("r_levels"),
        col("clev").as("c_levels"), col("n_cells"), col("chi2_ppm"),
        expr("chi2_ppm div (t * least(rlev - 1, clev - 1))").as("v2_ppm"))
  }, Some("""
    WITH cells AS (
      SELECT event_type AS r, CAST(dayofweek(ts) AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2),
    rt AS (SELECT r, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY r),
    ct AS (SELECT c, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY c),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS t,
                   CAST(count(DISTINCT r) AS BIGINT) AS rlev,
                   CAST(count(DISTINCT c) AS BIGINT) AS clev
            FROM cells),
    terms AS (
      SELECT rlev, clev, t,
        (1000000 * (CAST(o AS HUGEINT)*t - CAST(rt AS HUGEINT)*ct)
                 * (CAST(o AS HUGEINT)*t - CAST(rt AS HUGEINT)*ct))
          // (CAST(t AS HUGEINT) * rt * ct) AS term_u
      FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN tot)
    SELECT max(t) AS n, max(rlev) AS r_levels, max(clev) AS c_levels,
      CAST(count(*) AS BIGINT) AS n_cells,
      CAST(sum(term_u) AS BIGINT) AS chi2_ppm,
      CAST(CAST(sum(term_u) AS HUGEINT)
           // (max(t) * least(max(rlev) - 1, max(clev) - 1)) AS BIGINT)
        AS v2_ppm
    FROM terms GROUP BY rlev, clev, t
  """))

  /** Seasonal strength per event type (Wang, Smith & Hyndman 2006;
    * the `feasts` F_s feature): F_s = max(0, 1 − Var(remainder) /
    * Var(detrended)) over q_decompose's EXACT ppm components — the
    * one number that says whether the day-of-week pattern is signal
    * (F_s → 1) or noise (F_s → 0), and therefore whether
    * q_seasonal's index is worth applying. Same full-window/
    * calendar-gap guards as q_decompose; both variances are exact
    * integer quadratic forms sharing n, so F_s is one double. */
  private val qSeasonalStrength = BoundQuery("q_seasonal_strength", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("di", unix_date(col("day")).cast("long"))
    val w7 = Window.partitionBy("event_type").orderBy("di").rowsBetween(-3, 3)
    val ratios = daily
      .withColumn("sum7", sum(col("x")).over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("span", max(col("di")).over(w7) - min(col("di")).over(w7))
      .where(col("n7") === 7 && col("span") === 6)
      .withColumn("ratio_ppm", expr("(7000000 * x) div sum7"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    val seas = ratios.groupBy("event_type", "dow")
      .agg(expr("sum(ratio_ppm) div count(1)").as("seas_ppm"))
    ratios.join(seas, Seq("event_type", "dow"))
      .select(col("event_type"),
        col("ratio_ppm").cast("decimal(38,0)").as("r"),
        (col("ratio_ppm") - col("seas_ppm")).cast("decimal(38,0)").as("e"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("r")).as("sr"), sum(col("r") * col("r")).as("qr"),
        sum(col("e")).as("se"), sum(col("e") * col("e")).as("qe"))
      .select(col("event_type"), col("n").cast("long").as("n_days"),
        round(greatest(lit(0.0), lit(1.0) -
          expr("CAST(n*qe - se*se AS DOUBLE) / CAST(n*qr - sr*sr AS DOUBLE)")), 9)
          .as("seasonal_strength"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(count(*) AS BIGINT) AS x,
        CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di
      FROM events GROUP BY 1, 2, 4),
    win AS (
      SELECT event_type, day, x, di,
        CAST(sum(x) OVER w AS BIGINT) AS sum7,
        CAST(count(*) OVER w AS BIGINT) AS n7,
        CAST(max(di) OVER w - min(di) OVER w AS BIGINT) AS span
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY di
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    ratios AS (
      SELECT event_type, (7000000 * x) // sum7 AS ratio_ppm,
        CAST(dayofweek(day) + 1 AS BIGINT) AS dow
      FROM win WHERE n7 = 7 AND span = 6),
    seas AS (
      SELECT event_type, dow,
        CAST(sum(ratio_ppm) AS BIGINT) // count(*) AS seas_ppm
      FROM ratios GROUP BY 1, 2),
    comp AS (
      SELECT r.event_type, CAST(r.ratio_ppm AS HUGEINT) AS rr,
        CAST(r.ratio_ppm - s.seas_ppm AS HUGEINT) AS e
      FROM ratios r JOIN seas s
        ON r.event_type = s.event_type AND r.dow = s.dow),
    m AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        sum(rr) AS sr, sum(rr*rr) AS qr, sum(e) AS se, sum(e*e) AS qe
      FROM comp GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
      round(greatest(0.0, 1.0 -
        CAST(n*qe - se*se AS DOUBLE) / CAST(n*qr - sr*sr AS DOUBLE)), 9)
        AS seasonal_strength
    FROM m ORDER BY event_type
  """))

  /** Caliper nearest-neighbor matching ATT (Rosenbaum & Rubin 1985)
    * — the matching companion to q_ipw's weighting estimator, same
    * treatment/outcome convention (treated = URGENT/HIGH priority,
    * y = order reached final status): each treated order matches its
    * nearest control by order value within a ±$10 caliper (with
    * replacement; ties → lower control value distance, then lower
    * control key — fully deterministic), ATT = mean matched outcome
    * difference. Binary outcome ⇒ the whole estimator is EXACT
    * integer work: candidate generation is operators.RangeJoin's
    * bucketed equi-join (never a BroadcastNestedLoop BETWEEN), the
    * argmin is TopKPerGroup(1) (no single-partition window), and the
    * two readouts are truncating ppm divisions.
    *
    * Scale shape: O(controls + treated·spans) bucket rows, one
    * equi-join shuffle, one per-treated top-1, one reduction. */
  private val qCaliperMatch = BoundQuery("q_caliper_match", (s, d) => {
    val caliper = 1000L // cents: ±$10 on order value
    val o = Tables.orders(s, d).select(
      col("o_orderkey").as("okey"),
      cents(col("o_totalprice")).as("price"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long").as("t"),
      (col("o_orderstatus") === "F").cast("long").as("y"))
    val treated = o.where(col("t") === 1)
      .select(col("okey").as("tk"), col("price").as("tp"), col("y").as("ty"))
    val controls = o.where(col("t") === 0)
      .select(col("okey").as("ck"), col("price").as("cp"), col("y").as("cy"))
    val cands = graft.operators.RangeJoin.bucketed(
      controls, col("cp"),
      treated.withColumn("lo", col("tp") - caliper)
        .withColumn("hi", col("tp") + caliper),
      col("lo"), col("hi"), bucketWidth = caliper.toDouble)
      .withColumn("ad", abs(col("cp") - col("tp")))
    val matched = graft.operators.TopKPerGroup.topK(cands,
      Seq(col("tk")), Seq(asc("ad"), col("ck")), 1, rankCol = "rnk")
    val nt = treated.agg(count(lit(1)).as("n_treated"))
    matched.agg(count(lit(1)).as("n_matched"),
        sum(col("ty") - col("cy")).as("sd"))
      .crossJoin(broadcast(nt))
      .select(col("n_treated"), col("n_matched"),
        expr("(1000000 * n_matched) div n_treated").as("match_rate_ppm"),
        expr("(1000000 * sd) div n_matched").as("att_ppm"))
  }, Some("""
    WITH o AS (
      SELECT o_orderkey AS okey,
        CAST(round(o_totalprice*100, 0) AS BIGINT) AS price,
        CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END AS t,
        CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    tr AS (SELECT okey AS tk, price AS tp, CAST(y AS BIGINT) AS ty
           FROM o WHERE t = 1),
    ct AS (SELECT okey AS ck, price AS cp, CAST(y AS BIGINT) AS cy
           FROM o WHERE t = 0),
    cand AS (
      SELECT tk, ty, cy, abs(cp - tp) AS ad, ck
      FROM tr JOIN ct ON cp BETWEEN tp - 1000 AND tp + 1000),
    m AS (
      SELECT tk, ty, cy FROM (
        SELECT *, row_number() OVER (PARTITION BY tk ORDER BY ad, ck) AS rn
        FROM cand) WHERE rn = 1),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n_matched,
                 CAST(sum(ty - cy) AS BIGINT) AS sd FROM m),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_treated FROM tr)
    SELECT n_treated, n_matched,
      (1000000 * n_matched) // n_treated AS match_rate_ppm,
      (1000000 * sd) // n_matched AS att_ppm
    FROM g, nt
  """))

  val all: Seq[BoundQuery] = Seq(qSpearman, qAnova, qTheilSen, qCuped,
    qDecompose, qIpw, qDid, qAbcClass, qHill, qKendall, qCramersV,
    qSeasonalStrength, qCaliperMatch)
}
