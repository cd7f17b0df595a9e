package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 monitoring / cointegration wave: the production-
  * telemetry tests that sit downstream of q_cusum / q_psi_drift /
  * q_anomaly — Shewhart control charting with run rules, the
  * Page–Hinkley sequential change detector, the Engle–Granger
  * residual unit-root statistic (are two revenue series CO-moving or
  * just both trending?), and Theil's U2 forecast-skill ratio grading
  * q_backtest's seasonal-naive against the no-skill naive.
  *
  * Numeric rule: the StatsQueries contract — exact long /
  * decimal(38,0) sums, scale-invariant integer residuals where a
  * regression is involved (the q_durbin_watson trick), one truncating
  * division per emitted stat (both engines truncate toward zero —
  * verified: Spark IntegralDivide and DuckDB // agree at −7/2 = −3),
  * pinned float folds only where the recurrence is genuinely
  * sequential (Page–Hinkley), mirrored by a recursive CTE. */
object MonitoringQueries {

  private def daily(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))

  private val dailySql = """
    SELECT event_type, CAST(ts AS DATE) AS day,
      CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2"""

  /** Shewhart control chart over each type's daily revenue: per day,
    * the exact 3σ individuals test (rule 1) and the 8-in-a-row run
    * rule (rule 2). Both EXACT — rule 1 compares
    * z²_milli = 1000·(n·y − S)²·(n−1) div (n·(nQ − S²)) against 9000
    * (the cleared (y−x̄)² > 9s² inequality, no sqrt), rule 2 builds
    * same-side islands with the gaps-and-islands double row_number
    * (the q_scd2 machinery) and flags members of islands of length
    * ≥ 8. Sides come from the exact sign of n·y − S. Limits here are
    * retrospective (whole-series x̄, s — phase-I charting); a live
    * chart would freeze them from a reference window. */
  private val qControlChart = BoundQuery("q_control_chart", (s, d) => {
    val g = daily(s, d).groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("qy"))
    val base = daily(s, d).join(broadcast(g), col("event_type") === col("et"))
      .withColumn("z2_milli", expr(
        """CAST((1000 * (CAST(n AS DECIMAL(38,0))*y - sy)
                      * (CAST(n AS DECIMAL(38,0))*y - sy) * (n - 1))
                div (n * (CAST(n AS DECIMAL(38,0))*qy - CAST(sy AS DECIMAL(38,0))*sy))
                AS BIGINT)"""))
      .withColumn("side", expr(
        "CASE WHEN CAST(n AS DECIMAL(38,0))*y > sy THEN 1 WHEN CAST(n AS DECIMAL(38,0))*y < sy THEN -1 ELSE 0 END"))
    val wAll = Window.partitionBy("event_type").orderBy("day")
    val wSide = Window.partitionBy("event_type", "side").orderBy("day")
    val isl = base
      .withColumn("grp",
        row_number().over(wAll).cast("long") -
          row_number().over(wSide).cast("long"))
    val runLen = Window.partitionBy("event_type", "side", "grp")
    isl.withColumn("run_len", count(lit(1)).over(runLen))
      .select(col("event_type"), col("day"), col("y"), col("z2_milli"),
        col("side").cast("long").as("side"),
        (col("z2_milli") > 9000L).as("ooc_3sigma"),
        (col("run_len") >= 8L && col("side") =!= 0).as("ooc_run8"))
      .orderBy("event_type", "day")
  }, Some(s"""
    WITH daily AS ($dailySql),
    g AS (
      SELECT event_type AS et, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS qy
      FROM daily GROUP BY 1),
    base AS (
      SELECT event_type, day, y,
        CAST((1000 * (CAST(n AS HUGEINT)*y - sy)
                   * (CAST(n AS HUGEINT)*y - sy) * (n - 1))
             // (n * (CAST(n AS HUGEINT)*qy - CAST(sy AS HUGEINT)*sy))
             AS BIGINT) AS z2_milli,
        CASE WHEN CAST(n AS HUGEINT)*y > sy THEN 1
             WHEN CAST(n AS HUGEINT)*y < sy THEN -1 ELSE 0 END AS side
      FROM daily JOIN g ON event_type = et),
    isl AS (
      SELECT *,
        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
          AS BIGINT)
        - CAST(row_number() OVER (PARTITION BY event_type, side ORDER BY day)
          AS BIGINT) AS grp
      FROM base)
    SELECT event_type, day, y, z2_milli, CAST(side AS BIGINT) AS side,
      z2_milli > 9000 AS ooc_3sigma,
      (count(*) OVER (PARTITION BY event_type, side, grp) >= 8
       AND side <> 0) AS ooc_run8
    FROM isl ORDER BY event_type, day
  """))

  /** Page–Hinkley sequential change detector per type: the cumulative
    * deviation from the RUNNING mean, m_t = m_{t−1} + (x_t − x̄_t),
    * with alarms when m drifts λ past its running extremum —
    * ph_inc = m_n − min_t m (upward shift), ph_dec = max_t m − m_n
    * (downward). δ = 0 (max sensitivity; a deployment would set the
    * tolerated drift). Genuinely sequential (x̄_t moves), so it runs
    * as the pinned float fold of the q_holt convention over the
    * calendar-bounded series, recursive-CTE mirrored. */
  /** Per-batch (type, day) cents deltas — the exact-integer partials
    * the streaming twin merges (order-irrelevant) before scoring. */
  def dailyTypeSums(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    events.groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sumCents(col("value")).as("y"))

  /** The PH scorer over a (event_type, day, y) daily table — shared
    * by the batch binding and the streaming replay spec (the
    * q_anomaly twin pattern: maintain exact partials incrementally,
    * run the sequential fold on the maintained state). */
  def pageHinkleyOf(dailyDf: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val dl = dailyDf.withColumn("x", col("y").cast("double") / lit(100.0))
    val fold = aggregate(col("seq"),
      struct(lit(0.0).as("sum"), lit(0.0).as("m"),
        lit(0.0).as("mn"), lit(0.0).as("mx"), lit(0L).as("i")),
      (acc: Column, e: Column) => {
        val x = e("x")
        val sum1 = acc("sum") + x
        val m1 = acc("m") + (x - sum1 / (acc("i").cast("double") + lit(1.0)))
        struct(sum1.as("sum"), m1.as("m"),
          least(acc("mn"), m1).as("mn"), greatest(acc("mx"), m1).as("mx"),
          (acc("i") + 1L).as("i"))
      })
    dl.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("seq"))
      .select(col("event_type"), size(col("seq")).cast("long").as("n_days"),
        fold.as("st"))
      .select(col("event_type"), col("n_days"),
        round(col("st.m"), 6).as("m_final"),
        round(col("st.m") - col("st.mn"), 6).as("ph_inc"),
        round(col("st.mx") - col("st.m"), 6).as("ph_dec"))
      .orderBy("event_type")
  }

  private val qPageHinkley = BoundQuery("q_page_hinkley", (s, d) =>
    pageHinkleyOf(daily(s, d)), Some(s"""
    WITH RECURSIVE daily AS ($dailySql),
    ser AS (
      SELECT event_type,
        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
          AS BIGINT) AS t,
        CAST(y AS DOUBLE) / 100.0 AS x
      FROM daily),
    nn AS (SELECT event_type AS et, CAST(count(*) AS BIGINT) AS n_days
           FROM ser GROUP BY 1),
    rec AS (
      SELECT event_type, t, x AS s_sum,
        x - x / 1.0 AS m,
        least(0.0, x - x / 1.0) AS mn, greatest(0.0, x - x / 1.0) AS mx
      FROM ser WHERE t = 1
      UNION ALL
      SELECT r.event_type, s.t, r.s_sum + s.x,
        r.m + (s.x - (r.s_sum + s.x) / CAST(s.t AS DOUBLE)) AS m,
        least(r.mn, r.m + (s.x - (r.s_sum + s.x) / CAST(s.t AS DOUBLE))),
        greatest(r.mx, r.m + (s.x - (r.s_sum + s.x) / CAST(s.t AS DOUBLE)))
      FROM rec r JOIN ser s
        ON s.event_type = r.event_type AND s.t = r.t + 1)
    SELECT event_type, n_days,
      round(m, 6) AS m_final,
      round(m - mn, 6) AS ph_inc,
      round(mx - m, 6) AS ph_dec
    FROM rec JOIN nn ON rec.event_type = nn.et AND rec.t = nn.n_days
    ORDER BY event_type
  """))

  /** Engle–Granger cointegration statistic between click and purchase
    * daily revenue: step 1 regresses purchase on click (levels) with
    * the SCALE-INVARIANT integer residual of the q_durbin_watson
    * trick, r = b_den·(n·y − Sy) − b_num·(n·x − Sx); step 2 runs the
    * Dickey–Fuller no-intercept regression of Δr on r_{t−1}, whose
    * n·(ρ̂−1) statistic clears to
    *   df_z_milli = 1000·n·Σ(r_{t−1}·Δr) div Σ(r_{t−1}²)
    * — the residual scale cancels, so r is first REDUCED by the exact
    * scalar division r div b_den (both engines truncate identically;
    * the reduced residual ≈ n·e_t keeps ~8+ significant digits at
    * every SF while r itself — whose square would need ~92 digits at
    * sf1 — never gets squared). Strongly negative ⇔ residuals
    * mean-revert ⇔ the two series co-move rather than just co-trend.
    * Both engines divide the SIGNED numerator identically (truncation
    * toward zero in both, verified at −7/2). */
  private val qEngleGranger = BoundQuery("q_engle_granger", (s, d) => {
    val base = daily(s, d)
    val xy = base.where(col("event_type") === "click")
      .select(col("day"), col("y").as("x"))
      .join(base.where(col("event_type") === "purchase")
        .select(col("day"), col("y")), "day")
    val m = xy.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
    val r = xy.crossJoin(broadcast(m))
      .withColumn("r", expr(
        """((CAST(n AS DECIMAL(38,0))*sxx - CAST(sx AS DECIMAL(38,0))*sx)
              * (CAST(n AS DECIMAL(38,0))*y - sy)
            - (CAST(n AS DECIMAL(38,0))*sxy - CAST(sx AS DECIMAL(38,0))*sy)
              * (CAST(n AS DECIMAL(38,0))*x - sx))
           div (CAST(n AS DECIMAL(38,0))*sxx - CAST(sx AS DECIMAL(38,0))*sx)"""))
      .withColumn("rl", lag(col("r"), 1).over(Window.orderBy("day")))
    r.where(col("rl").isNotNull)
      .agg(count(lit(1)).as("n_diff"),
        sum(expr("CAST(rl AS DECIMAL(38,0)) * (r - rl)")).as("num"),
        sum(expr("CAST(rl AS DECIMAL(38,0)) * rl")).as("den"))
      .select(col("n_diff"),
        expr("CAST((1000 * (n_diff + 1) * num) div den AS BIGINT)")
          .as("df_z_milli"))
  }, Some(s"""
    WITH daily AS ($dailySql),
    xy AS (
      SELECT c.day, c.y AS x, p.y AS y
      FROM (SELECT day, y FROM daily WHERE event_type = 'click') c
      JOIN (SELECT day, y FROM daily WHERE event_type = 'purchase') p
        ON c.day = p.day),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM xy),
    res AS (
      SELECT day,
        ((CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx)
           * (CAST(n AS HUGEINT)*y - sy)
         - (CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy)
           * (CAST(n AS HUGEINT)*x - sx))
        // (CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx) AS r
      FROM xy CROSS JOIN m),
    dr AS (
      SELECT r, lag(r) OVER (ORDER BY day) AS rl FROM res)
    SELECT CAST(count(*) AS BIGINT) AS n_diff,
      CAST((1000 * (count(*) + 1) * sum(CAST(rl AS HUGEINT) * (r - rl)))
           // sum(CAST(rl AS HUGEINT) * rl) AS BIGINT) AS df_z_milli
    FROM dr WHERE rl IS NOT NULL
  """))

  /** Theil's U2 forecast-skill ratio for q_backtest's seasonal-naive
    * model: U2² = Σ(f_t − y_t)² / Σ(y_{t−1} − y_t)² over the days
    * where both the model (y_{t−7}) and the no-skill naive (y_{t−1})
    * exist. u2_sq_milli < 1000 ⇔ the weekly-seasonal model beats
    * carrying yesterday forward — the one-number answer to "is the
    * seasonality worth modeling" per type, in exact cents². */
  private val qTheilU = BoundQuery("q_theil_u", (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("day")
    daily(s, d)
      .withColumn("f", lag(col("y"), 7).over(w))
      .withColumn("nv", lag(col("y"), 1).over(w))
      .where(col("f").isNotNull && col("nv").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_scored"),
        sum(expr("CAST(f - y AS DECIMAL(38,0)) * (f - y)")).as("num"),
        sum(expr("CAST(nv - y AS DECIMAL(38,0)) * (nv - y)")).as("den"))
      .select(col("event_type"), col("n_scored"),
        expr("CAST((1000 * num) div den AS BIGINT)").as("u2_sq_milli"))
      .orderBy("event_type")
  }, Some(s"""
    WITH daily AS ($dailySql),
    l AS (
      SELECT event_type, y,
        lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS f,
        lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS nv
      FROM daily)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
      CAST((1000 * sum(CAST(f - y AS HUGEINT) * (f - y)))
           // sum(CAST(nv - y AS HUGEINT) * (nv - y)) AS BIGINT) AS u2_sq_milli
    FROM l WHERE f IS NOT NULL AND nv IS NOT NULL
    GROUP BY event_type ORDER BY event_type
  """))

  /** Robust seasonal outlier detection (S-H-ESD-lite): deseasonalize
    * each type's daily revenue by its day-of-week nearest-rank median
    * (the q_dow_bands P50), then flag days whose residual exceeds
    * 3σ-equivalent in MAD units — |r| > 3·1.4826·MAD, the robust rule
    * that q_control_chart's mean/σ version loses to the moment a fat
    * outlier inflates σ itself. EXACT throughout: both medians are
    * integer nearest-rank selections, the flag compares
    * 10000·|r| > 44478·MAD in pure longs (44478 = 3·1.4826·10⁴).
    * Every row emits with its residual, MAD, and flag — the spec
    * checks the flagged set equals a local replay. */
  private val qSeasonalEsd = BoundQuery("q_seasonal_esd", (s, d) => {
    val dl = daily(s, d).withColumn("dow", dayofweek(col("day")).cast("long"))
    val wd = Window.partitionBy("event_type", "dow").orderBy("y", "day")
    val med = dl
      .withColumn("rn", row_number().over(wd).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("event_type", "dow")))
      .groupBy(col("event_type").as("et"), col("dow").as("dw"))
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("y")))
        .as("med_dow"))
    val resid = dl.join(broadcast(med),
        col("event_type") === col("et") && col("dow") === col("dw"))
      .withColumn("r", col("y") - col("med_dow"))
      .withColumn("ar", abs(col("r")))
    val wm = Window.partitionBy("event_type").orderBy("ar", "day")
    val mad = resid
      .withColumn("rn2", row_number().over(wm).cast("long"))
      .withColumn("n2", count(lit(1)).over(
        Window.partitionBy("event_type")))
      .groupBy(col("event_type").as("et2"))
      .agg(max(when(col("rn2") === expr("(n2 + 1) div 2"), col("ar")))
        .as("mad"))
    resid.join(broadcast(mad), col("event_type") === col("et2"))
      .select(col("event_type"), col("day"), col("y"), col("r"), col("mad"),
        (col("ar") * 10000L > col("mad") * 44478L).as("outlier"))
      .orderBy("event_type", "day")
  }, Some(s"""
    WITH daily AS ($dailySql),
    dl AS (SELECT event_type, day, y,
             CAST(dayofweek(day) + 1 AS BIGINT) AS dow FROM daily),
    rmed AS (
      SELECT event_type, dow, y,
        CAST(row_number() OVER (PARTITION BY event_type, dow
          ORDER BY y, day) AS BIGINT) AS rn,
        CAST(count(*) OVER (PARTITION BY event_type, dow) AS BIGINT) AS n
      FROM dl),
    med AS (
      SELECT event_type AS et, dow AS dw,
        max(CASE WHEN rn = (n + 1) // 2 THEN y END) AS med_dow
      FROM rmed GROUP BY 1, 2),
    resid AS (
      SELECT dl.event_type, dl.day, dl.y, dl.y - med_dow AS r,
        abs(dl.y - med_dow) AS ar
      FROM dl JOIN med ON event_type = et AND dow = dw),
    rmad AS (
      SELECT event_type, ar,
        CAST(row_number() OVER (PARTITION BY event_type
          ORDER BY ar, day) AS BIGINT) AS rn2,
        CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n2
      FROM resid),
    mad AS (
      SELECT event_type AS et2,
        max(CASE WHEN rn2 = (n2 + 1) // 2 THEN ar END) AS mad
      FROM rmad GROUP BY 1)
    SELECT event_type, day, y, r, mad,
      ar * 10000 > mad * 44478 AS outlier
    FROM resid JOIN mad ON event_type = et2
    ORDER BY event_type, day
  """))

  /** Hurst exponent by rescaled-range analysis (Hurst 1951, the
    * Mandelbrot–Wallis estimator): does each type's daily revenue
    * series trend-persist (H > 0.5), mean-revert (H < 0.5), or walk
    * randomly? For block sizes m ∈ {8, 16, 32}, the series splits
    * into ⌊n/m⌋ blocks; each block's R/S = (max−min of the
    * mean-adjusted cumulative sum) / σ is averaged, and H is the
    * log-log slope over the three (m, avg R/S) points.
    *
    * Exactness: cumulative sums run on exact cents (one partitioned
    * window); each block's R and S² clear denominators to integers
    * (R_u = m·max−min of m·cusum−t·blocksum; S²_u = m·Σx²−S²), so
    * every per-block value rounds ONCE to micro-units; block
    * averages are exact integer sums; only the final 3-point
    * log-log slope runs in doubles as identical trees. Windows
    * partition by (type, block) over the bounded day domain. */
  private val qHurst = BoundQuery("q_hurst", (s, d) => {
    val dl = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val indexed = graft.util.CacheScope.persist(
      dl.withColumn("t", row_number().over(wOrd).cast("long") - 1))
    val ms = Seq(8, 16, 32)
    val perM = ms.map { m =>
      val blocked = indexed
        .withColumn("blk", expr(s"t div $m"))
        .withColumn("i", expr(s"t % $m") + 1)
        .withColumn("nblk", count(lit(1)).over(
          Window.partitionBy("event_type", "blk")))
        .where(col("nblk") === m) // full blocks only
      val wb = Window.partitionBy("event_type", "blk").orderBy("i")
      val withCs = blocked
        .withColumn("cs", sum(col("y")).over(wb))
        .withColumn("bs", sum(col("y")).over(
          Window.partitionBy("event_type", "blk")))
        .withColumn("ss", sum(col("y") * col("y")).over(
          Window.partitionBy("event_type", "blk")))
        // mean-adjusted cusum, cleared: d_u = m·cs − i·bs (exact)
        .withColumn("du", lit(m.toLong) * col("cs") - col("i") * col("bs"))
      withCs.groupBy("event_type", "blk")
        .agg(max(col("du")).as("mx"), min(col("du")).as("mn"),
          max(col("ss")).as("ssq"), max(col("bs")).as("bsum"))
        // zero-variance guard: m·Σy² = S² iff the block is constant
        // (Cauchy–Schwarz equality) → S = 0 → R/S is 0/0; skip the
        // block, identically on both sides, so the readout is total
        .where(lit(m.toLong) * col("ssq") > col("bsum") * col("bsum"))
        // R/S = ((mx−mn)/m) / sqrt((m·Σy²−bs²)/m²) — one rounded
        // micro-unit value per block, then exact integer averaging
        .select(col("event_type"),
          round((col("mx") - col("mn")).cast("double") /
            lit(m.toDouble) /
            sqrt((lit(m.toDouble) * col("ssq").cast("double") -
              col("bsum").cast("double") * col("bsum").cast("double")) /
              lit(m.toDouble * m)) * 1e6, 0).cast("long").as("rs_micro"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("nb"), sum(col("rs_micro")).as("srs"))
        .select(col("event_type"), lit(m.toLong).as("m"),
          expr("srs div nb").as("avg_rs_micro"))
    }
    val pts = perM.reduce(_.unionAll(_))
    // 3-point log-log OLS slope: H = Σ(lx−l̄x)(ly−l̄y)/Σ(lx−l̄x)²
    val logged = pts
      .withColumn("lx", log(col("m").cast("double")))
      .withColumn("ly", log(col("avg_rs_micro").cast("double") / 1e6))
    logged.groupBy("event_type")
      .agg(count(lit(1)).as("k"), sum("lx").as("sx"), sum("ly").as("sy"),
        sum(col("lx") * col("lx")).as("sxx"), sum(col("lx") * col("ly")).as("sxy"))
      .select(col("event_type"),
        round((col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")), 6).as("hurst"))
      .orderBy("event_type")
  }, Some {
    def block(m: Int) = s"""
    SELECT event_type, CAST($m AS BIGINT) AS m,
      CAST(sum(rs_micro) // count(*) AS BIGINT) AS avg_rs_micro
    FROM (
      SELECT event_type, blk,
        CAST(round((CAST(max(du) - min(du) AS DOUBLE) / $m.0)
          / sqrt(($m.0 * CAST(max(ss) AS DOUBLE)
                  - CAST(max(bs) AS DOUBLE) * CAST(max(bs) AS DOUBLE))
                 / ${m * m}.0) * 1e6, 0) AS BIGINT) AS rs_micro
      FROM (
        SELECT event_type, blk, i,
          CAST($m AS BIGINT) * cs - i * bs AS du, ss, bs
        FROM (
          SELECT event_type, t // $m AS blk, (t % $m) + 1 AS i,
            sum(y) OVER (PARTITION BY event_type, t // $m ORDER BY t) AS cs,
            sum(y) OVER (PARTITION BY event_type, t // $m) AS bs,
            sum(y*y) OVER (PARTITION BY event_type, t // $m) AS ss,
            count(*) OVER (PARTITION BY event_type, t // $m) AS nblk
          FROM idx)
        WHERE nblk = $m)
      GROUP BY event_type, blk
      HAVING CAST($m AS HUGEINT) * max(ss)
           > CAST(max(bs) AS HUGEINT) * max(bs))
    GROUP BY event_type"""
    s"""
    WITH daily AS ($dailySql),
    idx AS (
      SELECT event_type, day,
        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
          AS BIGINT) - 1 AS t,
        y
      FROM daily),
    pts AS (${ms3.map(block).mkString("\n    UNION ALL\n    ")}),
    logged AS (
      SELECT event_type, ln(CAST(m AS DOUBLE)) AS lx,
        ln(CAST(avg_rs_micro AS DOUBLE) / 1e6) AS ly
      FROM pts)
    SELECT event_type,
      round((count(*) * sum(lx*ly) - sum(lx) * sum(ly))
            / (count(*) * sum(lx*lx) - sum(lx) * sum(lx)), 6) AS hurst
    FROM logged GROUP BY event_type ORDER BY event_type
  """})

  private def ms3 = Seq(8, 16, 32)

  /** Poisson rate-ratio test per event type between the first and
    * second half of the observed window (split at the exact integer
    * midpoint of the day range — data-derived, no hardcoded date):
    * RR = (a/T_A)/(b/T_B) with exposures = distinct days per half,
    * Wald CI on ln RR with SE = √(1/a + 1/b) (the standard two-sample
    * Poisson comparison). Counts and exposures are exact integers;
    * ln/exp finishes are identical double trees with the 1.959964
    * literal shared. The "did the arrival rate actually change"
    * readout behind every incident review. */
  private val qRateRatio = BoundQuery("q_rate_ratio", (s, d) => {
    val ev = graft.util.CacheScope.persist(
      Tables.events(s, d)
        .select(col("event_type"), expr("unix_date(to_date(ts))").as("ud")))
    val mid = ev.agg(
      expr("(min(ud) + max(ud)) div 2").as("mid"))
    val marked = graft.util.CacheScope.persist(
      ev.crossJoin(broadcast(mid))
        .select(col("event_type"), col("ud"),
          (col("ud") <= col("mid")).cast("long").as("inA")))
    val expo = marked.groupBy("ud").agg(max(col("inA")).as("inA"))
      .agg(sum(col("inA")).as("ta"), sum(lit(1L) - col("inA")).as("tb"))
    marked.groupBy("event_type")
      .agg(sum(col("inA")).as("a"), sum(lit(1L) - col("inA")).as("b"))
      .crossJoin(broadcast(expo))
      .select(col("event_type"), col("a"), col("b"), col("ta"), col("tb"),
        round(expr("""(CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
          / (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE))"""), 6).as("rate_ratio"),
        round(expr("""exp(ln((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
            / (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)))
          - 1.959964 * sqrt(1.0/CAST(a AS DOUBLE) + 1.0/CAST(b AS DOUBLE)))"""), 6)
          .as("ci_lo"),
        round(expr("""exp(ln((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
            / (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)))
          + 1.959964 * sqrt(1.0/CAST(a AS DOUBLE) + 1.0/CAST(b AS DOUBLE)))"""), 6)
          .as("ci_hi"))
      .orderBy("event_type")
  }, Some("""
    WITH ev AS (
      SELECT event_type,
        CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ud
      FROM events),
    mid AS (SELECT (min(ud) + max(ud)) // 2 AS mid FROM ev),
    marked AS (
      SELECT event_type, ud,
        CASE WHEN ud <= mid THEN 1 ELSE 0 END AS inA
      FROM ev, mid),
    expo AS (
      SELECT CAST(sum(inA) AS BIGINT) AS ta,
        CAST(sum(1 - inA) AS BIGINT) AS tb
      FROM (SELECT ud, max(inA) AS inA FROM marked GROUP BY ud)),
    g AS (
      SELECT event_type, CAST(sum(inA) AS BIGINT) AS a,
        CAST(sum(1 - inA) AS BIGINT) AS b
      FROM marked GROUP BY 1)
    SELECT event_type, a, b, ta, tb,
      round((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
        / (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)), 6) AS rate_ratio,
      round(exp(ln((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
          / (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)))
        - 1.959964 * sqrt(1.0/CAST(a AS DOUBLE) + 1.0/CAST(b AS DOUBLE))), 6)
        AS ci_lo,
      round(exp(ln((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
          / (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)))
        + 1.959964 * sqrt(1.0/CAST(a AS DOUBLE) + 1.0/CAST(b AS DOUBLE))), 6)
        AS ci_hi
    FROM g, expo ORDER BY event_type
  """))

  /** Standardized morbidity/mortality-style ratio (indirect
    * standardization): observed completions in the urgent-order
    * cohort vs the count EXPECTED if each order-value stratum
    * completed at the whole-book's stratum rate — q_rate_ratio's
    * confounder-adjusted sibling (a cohort can look better purely by
    * living in easier strata; SMR removes exactly that). Strata are
    * q_ipw's $1000-capped value buckets; reference rates are exact
    * ppm truncating divisions, the expected count is an exact long
    * sum of n_s·rate_s ppm terms, and SMR = obs·10¹² div expected —
    * every emitted value an integer. One scan, one stratum groupBy,
    * one reduction. */
  private val qSmr = BoundQuery("q_smr", (s, d) => {
    val strata = Tables.orders(s, d)
      .withColumn("st", least(floor(col("o_totalprice") / 100000).cast("long"), lit(4L)))
      .withColumn("u", col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long"))
      .withColumn("f", (col("o_orderstatus") === "F").cast("long"))
      .groupBy("st")
      .agg(count(lit(1)).as("n_s"), sum(col("f")).as("f_s"),
        sum(col("u")).as("nu_s"), sum(col("u") * col("f")).as("fu_s"))
      // rate_ppm = whole-book stratum completion rate; expected urgent
      // completions in ppm-order units = nu_s * rate_ppm (exact long)
      .withColumn("rate_ppm", expr("(1000000 * f_s) div n_s"))
      .withColumn("exp_ppm", col("nu_s") * col("rate_ppm"))
    strata.agg(count(lit(1)).as("n_strata"), sum(col("nu_s")).as("n_urgent"),
        sum(col("fu_s")).as("observed"), sum(col("exp_ppm")).as("expected_ppm"))
      .select(col("n_strata"), col("n_urgent"), col("observed"),
        col("expected_ppm"),
        expr("(observed * 1000000000000) div expected_ppm").as("smr_ppm"))
  }, Some("""
    WITH strata AS (
      SELECT least(CAST(floor(o_totalprice / 100000) AS BIGINT), 4) AS st,
        CAST(count(*) AS BIGINT) AS n_s,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
             AS BIGINT) AS f_s,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS nu_s,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS fu_s
      FROM orders GROUP BY 1),
    w AS (
      SELECT n_s, nu_s, fu_s,
        nu_s * ((1000000 * f_s) // n_s) AS exp_ppm
      FROM strata)
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
      CAST(sum(nu_s) AS BIGINT) AS n_urgent,
      CAST(sum(fu_s) AS BIGINT) AS observed,
      CAST(sum(exp_ppm) AS BIGINT) AS expected_ppm,
      (CAST(sum(fu_s) AS BIGINT) * 1000000000000)
        // CAST(sum(exp_ppm) AS BIGINT) AS smr_ppm
    FROM w
  """))

  /** Hysteresis (Schmitt-trigger) burst flags over the daily event
    * count: enter a burst when the day exceeds μ+2σ, stay in it
    * until the count falls to μ+σ — the two-threshold memory that
    * stops a rate hovering at one boundary from flapping the way
    * q_control_chart's memoryless per-point rule does (Kleinberg's
    * two-state burst model collapsed to its hysteresis core). The
    * state recurrence is inherently sequential, so it runs as ONE
    * codegen'd aggregate() fold over the sorted day array,
    * accumulating a '0'/'1' flag string — the calendar is bounded at
    * any corpus size, so the array is driver-safe by construction
    * and the fold replays verbatim as DuckDB's list_reduce. Exact
    * integer day counts; μ, σ and both thresholds are identical
    * double trees on both engines. */
  private val qBurstFlags = BoundQuery("q_burst_flags", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(expr("unix_date(to_date(ts))").as("ud"))
      .agg(count(lit(1)).as("c"))
    val agg = daily.agg(
      count(lit(1)).as("n"), sum(col("c")).as("sc"),
      sum(col("c") * col("c")).as("sc2"),
      sort_array(collect_list(struct(col("ud"), col("c")))).as("days"))
    val mu = col("sc").cast("double") / col("n").cast("double")
    val sg = sqrt(col("sc2").cast("double") / col("n").cast("double") - mu * mu)
    val flags = aggregate(
      transform(col("days"), x => x("c").cast("string")),
      lit(""),
      (acc, cs) => concat(acc,
        when((substring(acc, -1, 1) === "1" &&
            cs.cast("long").cast("double") > mu + sg)
          || (substring(acc, -1, 1) =!= "1" &&
            cs.cast("long").cast("double") > mu + lit(2.0) * sg),
          lit("1")).otherwise(lit("0"))))
    agg.withColumn("flags", flags)
      .select(col("flags"), posexplode(col("days")).as(Seq("i", "day")))
      .select(col("day.ud").cast("long").as("ud"), col("day.c").as("n_events"),
        (expr("substring(flags, i + 1, 1)") === "1").as("burst"))
      .orderBy("ud")
  }, Some("""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ud,
        CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sc,
        CAST(sum(c*c) AS BIGINT) AS sc2,
        list_sort(list(struct_pack(ud := ud, c := c))) AS days
      FROM daily),
    f AS (
      SELECT days,
        list_reduce(
          list_prepend('', list_transform(days, x -> CAST(x.c AS VARCHAR))),
          (acc, cs) -> acc || CASE WHEN
            (substr(acc, length(acc), 1) = '1' AND
              CAST(CAST(cs AS BIGINT) AS DOUBLE) >
                CAST(sc AS DOUBLE)/CAST(n AS DOUBLE)
                + sqrt(CAST(sc2 AS DOUBLE)/CAST(n AS DOUBLE)
                  - (CAST(sc AS DOUBLE)/CAST(n AS DOUBLE))
                    *(CAST(sc AS DOUBLE)/CAST(n AS DOUBLE))))
            OR (substr(acc, length(acc), 1) <> '1' AND
              CAST(CAST(cs AS BIGINT) AS DOUBLE) >
                CAST(sc AS DOUBLE)/CAST(n AS DOUBLE)
                + 2.0 * sqrt(CAST(sc2 AS DOUBLE)/CAST(n AS DOUBLE)
                  - (CAST(sc AS DOUBLE)/CAST(n AS DOUBLE))
                    *(CAST(sc AS DOUBLE)/CAST(n AS DOUBLE))))
            THEN '1' ELSE '0' END) AS flags
      FROM agg),
    ex AS (SELECT unnest(range(1, len(days)+1)) AS i, days, flags FROM f)
    SELECT days[i].ud AS ud, days[i].c AS n_events,
      substr(flags, i, 1) = '1' AS burst
    FROM ex ORDER BY ud
  """))

  /** Process-capability indices Cp / Cpk per order priority class
    * (Juran's quality handbook; the SPEC-limit companion to
    * q_control_chart's control limits): Cp = (USL−LSL)/6s measures
    * spread against the tolerance band, Cpk = min(USL−x̄, x̄−LSL)/3s
    * penalizes off-center processes. Spec limits are frozen literals
    * on both engines: 0 .. $600,000.00 — a band that actually brackets
    * the fixture's o_totalprice distribution (~$1k–$500k, class means
    * ≈ $250k), so the indices are meaningful capability numbers rather
    * than the degenerate Cpk<0 a too-narrow band produces (round-7
    * advice item 1; the earlier $0–$3000 band was wrong about the
    * generator's range).
    *
    * Exactness: per-class n, Σx, Σx² in exact cents (Σx² as
    * decimal(38,0) — a 5e7-cent price squares to 2.5e15, long
    * overflow by ~1e5 rows); the sample variance and both indices are
    * identical double trees over those exact scalars, rounded to 4.
    * One partial-aggregated groupBy — the cheapest possible shape at
    * any scale. */
  private val qCpk = BoundQuery("q_cpk", (s, d) => {
    import graft.functions.Num.cents
    val lsl = 0L; val usl = 60000000L // cents ($600k; see Scaladoc)
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("priority"),
        cents(col("o_totalprice")).as("v"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sx"),
        sum(col("v").cast("decimal(38,0)") * col("v")).as("qx"))
      .where(col("n") > 1)
      .withColumn("mean_c", col("sx").cast("double") / col("n").cast("double"))
      .withColumn("s_c", sqrt(
        (col("qx").cast("double") - col("sx").cast("double")
          * col("sx").cast("double") / col("n").cast("double"))
          / (col("n").cast("double") - 1.0)))
      .select(col("priority"), col("n"),
        round(col("mean_c") / 100.0, 2).as("mean_usd"),
        round(col("s_c") / 100.0, 2).as("sd_usd"),
        round(lit((usl - lsl).toDouble) / (lit(6.0) * col("s_c")), 4)
          .as("cp"),
        round(least(lit(usl.toDouble) - col("mean_c"),
          col("mean_c") - lit(lsl.toDouble)) / (lit(3.0) * col("s_c")), 4)
          .as("cpk"))
      .orderBy("priority")
  }, Some("""
    WITH g AS (
      SELECT o_orderpriority AS priority,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sx,
        sum(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)
            * CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS qx
      FROM orders GROUP BY 1),
    m AS (
      SELECT priority, n,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
        sqrt((CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
              / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS s_c
      FROM g WHERE n > 1)
    SELECT priority, n,
      round(mean_c / 100.0, 2) AS mean_usd,
      round(s_c / 100.0, 2) AS sd_usd,
      round(60000000.0 / (6.0 * s_c), 4) AS cp,
      round(least(60000000.0 - mean_c, mean_c - 0.0) / (3.0 * s_c), 4) AS cpk
    FROM m ORDER BY priority
  """))

  val all: Seq[BoundQuery] =
    Seq(qControlChart, qPageHinkley, qEngleGranger, qTheilU, qSeasonalEsd,
      qHurst, qRateRatio, qSmr, qBurstFlags, qCpk)
}
