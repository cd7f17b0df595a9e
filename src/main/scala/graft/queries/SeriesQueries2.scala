package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 series wave 2 (r5): Chatterjee's ξ rank correlation —
  * the modern "is y a FUNCTION of x" coefficient that detects
  * non-monotone dependence Pearson/Spearman miss — and dynamic time
  * warping between two calendar years of monthly revenue, the
  * alignment distance for "did this year follow last year's shape,
  * possibly shifted?".
  *
  * Both are EXACT integer pipelines end-to-end: ξ is rank arithmetic
  * cleared to one truncating ppm division (the q_spearman doubled-rank
  * school), DTW is integer |·| and min over cents with the 12×12
  * recurrence unrolled identically on both engines (the q_pca_power
  * unroll technique, laid out across generated columns / CTEs).
  */
object SeriesQueries2 {

  /** Chatterjee's ξ (JASA 2020, ties form) per event type between
    * daily event count (x) and daily revenue (y) on the (type, day)
    * grain: sort by (x, day), take y's max-ranks r_i = #{y_j ≤ y_i},
    * l_i = #{y_j ≥ y_i}, then
    *   ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n − l_i)).
    * Every term is exact integers from rank windows; ties in y are
    * handled by the max-rank convention the formula requires, and the
    * data order is pinned by (x, day) so both engines walk the same
    * permutation. Windows are partitioned by event_type and bounded
    * by the CALENDAR (the q_spearman contract). Degenerate constant-y
    * types surface as NULL on both engines. */
  private val qXiCorr = BoundQuery("q_xi_corr", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"), sumCents(col("value")).as("y"))
    val wN = Window.partitionBy("event_type")
    val wy = Window.partitionBy("event_type").orderBy("y")
    val wx = Window.partitionBy("event_type").orderBy("x", "day")
    val ranked = daily
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("r",
        rank().over(wy).cast("long") +
          count(lit(1)).over(Window.partitionBy("event_type", "y")) - 1L)
      .withColumn("l",
        col("n") - rank().over(wy).cast("long") + 1L)
      .withColumn("dr", abs(col("r") - lag(col("r"), 1).over(wx)))
    ranked.groupBy("event_type")
      .agg(max(col("n")).as("n_days"),
        sum(col("dr")).as("sum_dr"),
        sum(col("l") * (col("n") - col("l"))).as("sum_l"))
      .select(col("event_type"), col("n_days"), col("sum_dr"),
        expr("""CASE WHEN sum_l > 0 THEN
                  (1000000 * (2 * sum_l - n_days * sum_dr)) div (2 * sum_l)
                END""").as("xi_ppm"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(count(*) AS BIGINT) AS x,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT event_type, x, day, y,
        CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        CAST(rank() OVER (PARTITION BY event_type ORDER BY y) AS BIGINT)
          + CAST(count(*) OVER (PARTITION BY event_type, y) AS BIGINT) - 1 AS r,
        CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
          - CAST(rank() OVER (PARTITION BY event_type ORDER BY y) AS BIGINT)
          + 1 AS l
      FROM daily),
    walked AS (
      SELECT event_type, n, l, r,
        abs(r - lag(r) OVER (PARTITION BY event_type ORDER BY x, day)) AS dr
      FROM ranked),
    agg AS (
      SELECT event_type, max(n) AS n_days,
        CAST(sum(dr) AS BIGINT) AS sum_dr,
        CAST(sum(l * (n - l)) AS BIGINT) AS sum_l
      FROM walked GROUP BY 1)
    SELECT event_type, n_days, sum_dr,
      CASE WHEN sum_l > 0 THEN
        (1000000 * (2 * sum_l - n_days * sum_dr)) // (2 * sum_l)
      END AS xi_ppm
    FROM agg ORDER BY event_type
  """))

  /** Dynamic time warping between 1998's and 1999's monthly revenue
    * curves (12 points each, exact cents): the classic Sakoe-Chiba
    * DP c_{i,j} = |a_i − b_j| + min(c_{i−1,j}, c_{i,j−1}, c_{i−1,j−1})
    * — unrolled as 144 generated projection columns over the ONE-ROW
    * monthly aggregate, so the whole alignment is integer adds and
    * mins with zero runtime iteration (the q_pca_power unroll, laid
    * out across columns). The oracle unrolls the same 144 cells as a
    * chained-CTE column stack; both engines compute the identical
    * recurrence, hence identical BIGINT output.
    *
    * Scale shape: ONE conditional-aggregation scan collapses any
    * number of orders to 24 cells; the DP is constant-size. */
  private val qDtw = BoundQuery("q_dtw", (s, d) => {
    val conds = (1 to 12).flatMap { m =>
      Seq(sum(when(year(col("o_orderdate")) === 1998 &&
            month(col("o_orderdate")) === m, cents(col("o_totalprice")))
          .otherwise(0L)).as(s"a$m"),
        sum(when(year(col("o_orderdate")) === 1999 &&
            month(col("o_orderdate")) === m, cents(col("o_totalprice")))
          .otherwise(0L)).as(s"b$m"))
    }
    var df = Tables.orders(s, d)
      .where(year(col("o_orderdate")).isin(1998, 1999))
      .groupBy()
      .agg(conds.head, conds.tail: _*)
    for (i <- 1 to 12; j <- 1 to 12) {
      val cost = abs(col(s"a$i") - col(s"b$j"))
      val best =
        if (i == 1 && j == 1) lit(0L)
        else if (i == 1) col(s"c${i}_${j - 1}")
        else if (j == 1) col(s"c${i - 1}_$j")
        else least(col(s"c${i - 1}_$j"), col(s"c${i}_${j - 1}"),
          col(s"c${i - 1}_${j - 1}"))
      df = df.withColumn(s"c${i}_$j", cost + best)
    }
    df.select(
      money((1 to 12).map(m => col(s"a$m")).reduce(_ + _)).as("rev_1998"),
      money((1 to 12).map(m => col(s"b$m")).reduce(_ + _)).as("rev_1999"),
      col("c12_12").as("dtw_cents"),
      money(col("c12_12")).as("dtw_dollars"))
  }, Some {
    val aggs = (1 to 12).flatMap { m =>
      Seq(
        s"""CAST(sum(CASE WHEN year(o_orderdate) = 1998 AND month(o_orderdate) = $m
           THEN CAST(round(o_totalprice*100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS a$m""",
        s"""CAST(sum(CASE WHEN year(o_orderdate) = 1999 AND month(o_orderdate) = $m
           THEN CAST(round(o_totalprice*100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS b$m""")
    }.mkString(",\n        ")
    val cells = new StringBuilder
    var prev = "m0"
    for (i <- 1 to 12; j <- 1 to 12) {
      val best =
        if (i == 1 && j == 1) "0"
        else if (i == 1) s"c${i}_${j - 1}"
        else if (j == 1) s"c${i - 1}_$j"
        else s"least(c${i - 1}_$j, c${i}_${j - 1}, c${i - 1}_${j - 1})"
      val cur = s"t${i}_$j"
      cells.append(
        s",\n    $cur AS (SELECT *, abs(a$i - b$j) + $best AS c${i}_$j FROM $prev)")
      prev = cur
    }
    s"""
    WITH m0 AS (
      SELECT
        $aggs
      FROM orders WHERE year(o_orderdate) IN (1998, 1999))$cells
    SELECT
      CAST(${(1 to 12).map(m => s"a$m").mkString(" + ")} AS DOUBLE)/100.0 AS rev_1998,
      CAST(${(1 to 12).map(m => s"b$m").mkString(" + ")} AS DOUBLE)/100.0 AS rev_1999,
      c12_12 AS dtw_cents,
      CAST(c12_12 AS DOUBLE)/100.0 AS dtw_dollars
    FROM $prev
  """
  })

  /** Market-model beta of each event type's daily revenue against the
    * all-types total (the single-index model, Sharpe 1963): β =
    * (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) per type, plus the intercept α
    * and R² — which streams amplify the aggregate swing (β > 1),
    * which dampen it. The day×type grid completes by conditional-sum
    * pivot + stack (no join, one scan); x (the daily total) rides
    * each stacked row, moments are exact decimals per type, and β, α,
    * R² are identical double trees. */
  private val qBeta = BoundQuery("q_beta", (s, d) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val itemCols = types.map(t =>
      sum(when(col("event_type") === t, cents(col("value")))
        .otherwise(lit(0L))).as(s"y_$t"))
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(itemCols.head, itemCols.tail: _*)
      .withColumn("x", types.map(t => col(s"y_$t")).reduce(_ + _))
    val stacked = daily.select(col("x").cast("decimal(38,0)").as("x"),
      expr("stack(5, " + types.map(t => s"'$t', y_$t").mkString(", ") +
        ") AS (event_type, y0)"))
      .select(col("event_type"), col("x"),
        col("y0").cast("decimal(38,0)").as("y"))
    stacked.groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n").cast("long").as("n_days"),
        round(expr("CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)"), 9)
          .as("beta"),
        round(expr("""(CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE)
            * (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)))
          / CAST(n AS DOUBLE) / 100.0"""), 4).as("alpha_dollars"),
        round(expr("""(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE))
          / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))"""), 9)
          .as("r2"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
        CAST(sum(CASE WHEN event_type = 'click'    THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y_click,
        CAST(sum(CASE WHEN event_type = 'error'    THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y_error,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y_purchase,
        CAST(sum(CASE WHEN event_type = 'signup'   THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y_signup,
        CAST(sum(CASE WHEN event_type = 'view'     THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y_view
      FROM events GROUP BY 1),
    stacked AS (
      SELECT CAST(y_click + y_error + y_purchase + y_signup + y_view AS HUGEINT) AS x,
             t.event_type,
             CAST(CASE t.event_type
               WHEN 'click' THEN y_click WHEN 'error' THEN y_error
               WHEN 'purchase' THEN y_purchase WHEN 'signup' THEN y_signup
               ELSE y_view END AS HUGEINT) AS y
      FROM daily CROSS JOIN (
        SELECT unnest(['click','error','purchase','signup','view']) AS event_type) t),
    m AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
        sum(x*y) AS sxy, sum(y*y) AS syy
      FROM stacked GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
      round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 9)
        AS beta,
      round((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE)
          * (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)))
        / CAST(n AS DOUBLE) / 100.0, 4) AS alpha_dollars,
      round((CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE))
        / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 9)
        AS r2
    FROM m ORDER BY event_type
  """))

  /** Cross-correlation function between the 'view' and 'purchase'
    * daily-revenue series at lags −5..+5 (does browsing LEAD buying,
    * and by how many days?) — the lead/lag discovery readout Granger
    * (q_granger) assumes you already did. Each lag's Pearson r comes
    * from exact integer moments over the date-key join (the q_acf lag
    * idiom — no window at all), one IEEE-sqrt double per lag. */
  private val qCcf = BoundQuery("q_ccf", (s, d) => {
    val daily = graft.util.CacheScope.persist(
      Tables.events(s, d)
        .where(col("event_type").isin("view", "purchase"))
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(sumCents(col("value")).as("y")))
    val x = daily.where(col("event_type") === "view")
      .select(col("day"), col("y").cast("decimal(38,0)").as("x"))
    val y = daily.where(col("event_type") === "purchase")
      .select(col("day").as("yday"), col("y").cast("decimal(38,0)").as("yy"))
    val lags = s.range(-5, 6).select(col("id").as("lag"))
    x.crossJoin(broadcast(lags))
      .join(y, col("yday") === expr("date_add(day, cast(lag as int))"))
      .groupBy("lag")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("yy")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("yy") * col("yy")).as("syy"),
        sum(col("x") * col("yy")).as("sxy"))
      .select(col("lag").cast("long").as("lag"), col("n").cast("long").as("n_days"),
        round(expr("""CAST(n*sxy - sx*sy AS DOUBLE)
          / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))"""), 9)
          .as("r"))
      .orderBy("lag")
  }, Some("""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1, 2),
    x AS (SELECT day, CAST(y AS HUGEINT) AS x FROM daily
          WHERE event_type = 'view'),
    yv AS (SELECT day AS yday, CAST(y AS HUGEINT) AS yy FROM daily
           WHERE event_type = 'purchase'),
    lags AS (SELECT unnest(range(-5, 6)) AS lag),
    m AS (
      SELECT lag, CAST(count(*) AS HUGEINT) AS n,
        sum(x) AS sx, sum(yy) AS sy, sum(x*x) AS sxx,
        sum(yy*yy) AS syy, sum(x*yy) AS sxy
      FROM x CROSS JOIN lags
      JOIN yv ON yday = day + CAST(lag AS INT)
      GROUP BY lag)
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
      round(CAST(n*sxy - sx*sy AS DOUBLE)
        / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 9)
        AS r
    FROM m ORDER BY lag
  """))

  val all: Seq[BoundQuery] = Seq(qXiCorr, qDtw, qBeta, qCcf)
}
