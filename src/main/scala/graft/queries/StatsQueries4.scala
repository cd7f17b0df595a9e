package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 classical-stats wave 5: the regression-diagnostics and
  * distribution-shape tests that round out the q_anova / q_wilcoxon /
  * q_kruskal_wallis family — normality (Jarque–Bera), randomness
  * (Wald–Wolfowitz runs), residual autocorrelation (Durbin–Watson),
  * effect size (Cohen's d), single mean-shift segmentation
  * (changepoint), and the chance-robust classifier score (Matthews
  * correlation) beside q_prf1's precision/recall readout.
  *
  * Numeric rule (the StatsQueries contract): exact long /
  * decimal(38,0) moment sums; statistics emitted either as one
  * truncating integral division (milli/ppm) or — where clearing the
  * denominators would overflow decimal(38,0) at sf1 (Jarque–Bera's
  * m₃²/m₂³ needs ~x⁶) — as doubles derived by an IDENTICALLY
  * PARENTHESIZED sequence of IEEE ops on exact-integer-cast operands,
  * the q_chi_square pinned-float convention. Every window partitions
  * by event type over the calendar-bounded (≤366-row) day domain —
  * the documented bounded-window quarantine; nothing here scales with
  * event volume past the first map-side-combined (type, day) preagg.
  */
object StatsQueries4 {

  /** Shared input: per-(type, day) revenue in exact cents. */
  private def daily(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))

  private val dailySql = """
    SELECT event_type, CAST(ts AS DATE) AS day,
      CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2"""

  /** Jarque–Bera normality test of each type's daily revenue: JB =
    * n·(skew²/6 + (kurt−3)²/24). Raw power sums S,Q,C,F (x..x⁴ over
    * WHOLE-DOLLAR daily totals) are exact decimal(38,0); the central
    * moments come from the cleared-denominator identities
    *   A = n²C − 3nQS + 2S³   (= n³·m₃),
    *   B = nQ − S²            (= n²·m₂),
    *   D = n³F − 4n²CS + 6nQS² − 3S⁴  (= n⁴·m₄),
    * so skew² = A²/B³ and kurt = D/B² with every n-power cancelling.
    * A² would need ~76 integer digits at sf1, past decimal(38) — so
    * the three FINAL ratios are pinned-structure double ops over the
    * exactly-cast A, B, D (both engines round the same decimal to the
    * same double, then run the identical IEEE ×/÷ tree). */
  private val qJarqueBera = BoundQuery("q_jarque_bera", (s, d) => {
    val m = daily(s, d).select(col("event_type"), expr("y div 100").as("x"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("q"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x * x")).as("c"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x * x * x")).as("f"))
    val t = m.select(col("event_type"), col("n"),
      expr("""CAST(n AS DECIMAL(38,0))*n*c - 3*CAST(n AS DECIMAL(38,0))*q*s
              + 2*CAST(s AS DECIMAL(38,0))*s*s""").as("a"),
      expr("CAST(n AS DECIMAL(38,0))*q - CAST(s AS DECIMAL(38,0))*s")
        .as("b"),
      expr("""CAST(n AS DECIMAL(38,0))*n*n*f
              - 4*CAST(n AS DECIMAL(38,0))*n*c*s
              + 6*CAST(n AS DECIMAL(38,0))*q*s*s
              - 3*CAST(s AS DECIMAL(38,0))*s*s*s""").as("dd"))
    val ad = col("a").cast("double"); val bd = col("b").cast("double")
    val ddd = col("dd").cast("double")
    t.select(col("event_type"), col("n").as("n_days"),
        (ad * ad / (bd * bd * bd)).as("skew2"),
        (ddd / (bd * bd)).as("kurt"))
      .withColumn("jb", col("n_days").cast("double") *
        (col("skew2") / lit(6.0) +
          (col("kurt") - lit(3.0)) * (col("kurt") - lit(3.0)) / lit(24.0)))
      .orderBy("event_type")
  }, Some(s"""
    WITH daily AS ($dailySql),
    m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(y // 100) AS HUGEINT) AS s,
        sum(CAST(y // 100 AS HUGEINT) * (y // 100)) AS q,
        sum(CAST(y // 100 AS HUGEINT) * (y // 100) * (y // 100)) AS c,
        sum(CAST(y // 100 AS HUGEINT) * (y // 100) * (y // 100) * (y // 100)) AS f
      FROM daily GROUP BY 1),
    t AS (
      SELECT event_type, n,
        CAST(n AS HUGEINT)*n*c - 3*CAST(n AS HUGEINT)*q*s
          + 2*CAST(s AS HUGEINT)*s*s AS a,
        CAST(n AS HUGEINT)*q - CAST(s AS HUGEINT)*s AS b,
        CAST(n AS HUGEINT)*n*n*f - 4*CAST(n AS HUGEINT)*n*c*s
          + 6*CAST(n AS HUGEINT)*q*s*s - 3*CAST(s AS HUGEINT)*s*s*s AS dd
      FROM m)
    SELECT event_type, n AS n_days,
      CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
        / (CAST(b AS DOUBLE) * CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) AS skew2,
      CAST(dd AS DOUBLE) / (CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) AS kurt,
      CAST(n AS DOUBLE) * (
        (CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
          / (CAST(b AS DOUBLE) * CAST(b AS DOUBLE) * CAST(b AS DOUBLE))) / 6.0
        + (CAST(dd AS DOUBLE) / (CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) - 3.0)
          * (CAST(dd AS DOUBLE) / (CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) - 3.0)
          / 24.0) AS jb
    FROM t ORDER BY event_type
  """))

  /** Wald–Wolfowitz runs test (mean-dichotomized variant): is each
    * type's daily revenue serially random, or does it streak? Days
    * label above/below the type mean EXACTLY (n·y vs Σy — no division),
    * mean-exact days drop; R = number of label runs in day order.
    * Under H₀, E[R] = 1 + 2n₁n₂/N and the z² clears to
    *   z²_milli = 1000·(RN − N − 2n₁n₂)²·(N−1)
    *              div (N·2n₁n₂·(2n₁n₂ − N)),
    * all int64-small (N ≤ 366). z² ≥ 3.84e3 milli rejects at 5% —
    * too FEW runs (trend/clustering) and too MANY (oscillation) both
    * land high. Degenerate one-sided series emit 0. */
  private val qRunsTest = BoundQuery("q_runs_test", (s, d) => {
    val dl = daily(s, d)
    val tot = dl.groupBy(col("event_type").as("et"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("nd"))
    val lab = dl.join(broadcast(tot), col("event_type") === col("et"))
      .withColumn("lab",
        when(col("nd") * col("y") > col("sy"), lit(1))
          .when(col("nd") * col("y") < col("sy"), lit(-1)).otherwise(lit(0)))
      .where(col("lab") =!= 0)
    val w = Window.partitionBy("event_type").orderBy("day")
    lab.withColumn("chg",
        when(lag(col("lab"), 1).over(w).isNull ||
          lag(col("lab"), 1).over(w) =!= col("lab"), lit(1L)).otherwise(lit(0L)))
      .groupBy("event_type")
      .agg(sum(when(col("lab") === 1, 1L).otherwise(0L)).as("n_above"),
        sum(when(col("lab") === -1, 1L).otherwise(0L)).as("n_below"),
        sum(col("chg")).as("runs"))
      .select(col("event_type"), col("n_above"), col("n_below"), col("runs"),
        expr("""CASE WHEN 2*n_above*n_below <= (n_above+n_below) THEN 0
                ELSE (1000 * (runs*(n_above+n_below) - (n_above+n_below)
                              - 2*n_above*n_below)
                           * (runs*(n_above+n_below) - (n_above+n_below)
                              - 2*n_above*n_below)
                           * (n_above+n_below-1))
                     div ((n_above+n_below) * 2*n_above*n_below
                          * (2*n_above*n_below - (n_above+n_below))) END""")
          .as("z2_milli"))
      .orderBy("event_type")
  }, Some(s"""
    WITH daily AS ($dailySql),
    tot AS (
      SELECT event_type AS et, CAST(sum(y) AS BIGINT) AS sy,
        CAST(count(*) AS BIGINT) AS nd
      FROM daily GROUP BY 1),
    lab AS (
      SELECT event_type, day,
        CASE WHEN nd*y > sy THEN 1 WHEN nd*y < sy THEN -1 ELSE 0 END AS lab
      FROM daily JOIN tot ON event_type = et
      WHERE CASE WHEN nd*y > sy THEN 1 WHEN nd*y < sy THEN -1 ELSE 0 END <> 0),
    chg AS (
      SELECT event_type, lab,
        CASE WHEN lag(lab) OVER (PARTITION BY event_type ORDER BY day) IS NULL
          OR lag(lab) OVER (PARTITION BY event_type ORDER BY day) <> lab
          THEN 1 ELSE 0 END AS chg
      FROM lab),
    agg AS (
      SELECT event_type,
        CAST(sum(CASE WHEN lab = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        CAST(sum(CASE WHEN lab = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        CAST(sum(chg) AS BIGINT) AS runs
      FROM chg GROUP BY 1)
    SELECT event_type, n_above, n_below, runs,
      CASE WHEN 2*n_above*n_below <= (n_above+n_below) THEN 0
      ELSE (1000 * (runs*(n_above+n_below) - (n_above+n_below)
                    - 2*n_above*n_below)
                 * (runs*(n_above+n_below) - (n_above+n_below)
                    - 2*n_above*n_below)
                 * (n_above+n_below-1))
           // ((n_above+n_below) * 2*n_above*n_below
              * (2*n_above*n_below - (n_above+n_below))) END AS z2_milli
    FROM agg ORDER BY event_type
  """))

  /** Durbin–Watson autocorrelation diagnostic on the residuals of each
    * type's daily-revenue-vs-time OLS. The trick that keeps it exact:
    * DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² is SCALE-INVARIANT in e, so instead of the
    * rational residual e = y − a − bt we use the integer-scaled
    *   r = b_den·(n·y − Σy) − b_num·(n·t − Σt)  (= n·b_den·e),
    * with b_num = nΣty − ΣtΣy, b_den = nΣt² − (Σt)² — the common
    * factor n·b_den cancels in the ratio, so dw_milli =
    * 1000·Σ(Δr)² div Σr² is the exact truncated statistic with no
    * division before the last. DW≈2 ⇔ no autocorrelation, →0 positive
    * (momentum), →4 negative (mean-reversion). */
  private val qDurbinWatson = BoundQuery("q_durbin_watson", (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("day")
    val idx = daily(s, d)
      .withColumn("t", row_number().over(w).cast("long") - 1L)
    val agg = idx.groupBy(col("event_type").as("et")).agg(
      count(lit(1)).as("n"), sum(col("y")).as("sy"), sum(col("t")).as("st"),
      sum(col("t") * col("t")).as("stt"),
      sum(expr("CAST(t AS DECIMAL(38,0)) * y")).as("sty"))
    val r = idx.join(broadcast(agg), col("event_type") === col("et"))
      .withColumn("r", expr(
        """(CAST(n*stt - st*st AS DECIMAL(38,0)))
             * (CAST(n AS DECIMAL(38,0))*y - sy)
           - (CAST(n AS DECIMAL(38,0))*sty - CAST(st AS DECIMAL(38,0))*sy)
             * (CAST(n AS DECIMAL(38,0))*t - st)"""))
      .withColumn("dr", col("r") - lag(col("r"), 1).over(w))
    r.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(expr("CAST(dr AS DECIMAL(38,0)) * dr")).as("num"),
        sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("den"))
      .select(col("event_type"), col("n_days"),
        expr("CAST((1000 * num) div den AS BIGINT)").as("dw_milli"))
      .orderBy("event_type")
  }, Some(s"""
    WITH daily AS ($dailySql),
    idx AS (
      SELECT event_type, y,
        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
          AS BIGINT) - 1 AS t,
        day
      FROM daily),
    agg AS (
      SELECT event_type AS et, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(y) AS BIGINT) AS sy, CAST(sum(t) AS BIGINT) AS st,
        CAST(sum(t*t) AS BIGINT) AS stt,
        CAST(sum(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty
      FROM idx GROUP BY 1),
    res AS (
      SELECT event_type, day,
        CAST(n*stt - st*st AS HUGEINT) * (CAST(n AS HUGEINT)*y - sy)
          - (CAST(n AS HUGEINT)*sty - CAST(st AS HUGEINT)*sy)
            * (CAST(n AS HUGEINT)*t - st) AS r
      FROM idx JOIN agg ON event_type = et),
    dr AS (
      SELECT event_type, r,
        r - lag(r) OVER (PARTITION BY event_type ORDER BY day) AS dr
      FROM res)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      CAST((1000 * sum(CAST(dr AS HUGEINT) * dr))
           // sum(CAST(r AS HUGEINT) * r) AS BIGINT) AS dw_milli
    FROM dr GROUP BY event_type ORDER BY event_type
  """))

  /** Single mean-shift changepoint per type: the split k maximizing
    * the between-group sum of squares BSS(k) = n₁n₂/n·(x̄₁−x̄₂)², found
    * from ONE cumulative-sum pass (binary-segmentation round 1, CUSUM
    * q_cusum's argmax sibling). Scored in exact whole-dollar² units:
    * score = (S₁n₂ − S₂n₁)² div (n₁·n₂·10⁴) — the 10⁴ folds the cents²
    * scale back to dollars², keeping the quotient inside int64 at sf1
    * (Spark's div WRAPS past int64 — the q_logreg_newton finding).
    * Argmax by (score desc, day asc) is deterministic in both engines
    * because they compare identical truncated integers. */
  private val qChangepoint = BoundQuery("q_changepoint", (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("day")
    val tot = daily(s, d).groupBy(col("event_type").as("et"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
    val pre = daily(s, d)
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("s1", sum(col("y")).over(w))
      .join(broadcast(tot), col("event_type") === col("et"))
      .where(col("i") < col("n"))
      .withColumn("score", expr(
        """(CAST(s1 AS DECIMAL(38,0))*(n-i) - CAST(sy-s1 AS DECIMAL(38,0))*i)
           * (CAST(s1 AS DECIMAL(38,0))*(n-i) - CAST(sy-s1 AS DECIMAL(38,0))*i)
           div (i * (n-i) * 10000)"""))
    pre.withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("score").desc, col("day"))))
      .where(col("rn") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("i").as("n_left"), (col("n") - col("i")).as("n_right"),
        expr("s1 div i").as("mean_left_c"),
        expr("(sy - s1) div (n - i)").as("mean_right_c"),
        col("score").as("bss_d2"))
      .orderBy("event_type")
  }, Some(s"""
    WITH daily AS ($dailySql),
    tot AS (
      SELECT event_type AS et, CAST(sum(y) AS BIGINT) AS sy,
        CAST(count(*) AS BIGINT) AS n
      FROM daily GROUP BY 1),
    pre AS (
      SELECT event_type, day,
        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
          AS BIGINT) AS i,
        CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s1
      FROM daily),
    sc AS (
      SELECT p.event_type, p.day, p.i, p.s1, t.n, t.sy,
        (CAST(p.s1 AS HUGEINT)*(t.n-p.i) - CAST(t.sy-p.s1 AS HUGEINT)*p.i)
        * (CAST(p.s1 AS HUGEINT)*(t.n-p.i) - CAST(t.sy-p.s1 AS HUGEINT)*p.i)
        // (p.i * (t.n-p.i) * 10000) AS score
      FROM pre p JOIN tot t ON p.event_type = t.et
      WHERE p.i < t.n),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
        ORDER BY score DESC, day) AS rn
      FROM sc)
    SELECT event_type, day AS split_day, i AS n_left,
      n - i AS n_right, s1 // i AS mean_left_c,
      (sy - s1) // (n - i) AS mean_right_c,
      CAST(score AS BIGINT) AS bss_d2
    FROM best WHERE rn = 1 ORDER BY event_type
  """))

  /** Cohen's d effect size between click and view daily revenue — the
    * "how big", where q_wilcoxon/q_ab_test answer "how sure". Emitted
    * sqrt-free as the SIGNED SQUARE (the q_mann_kendall z² convention):
    * d² = (x̄₁−x̄₂)²/s²_pooled clears to
    *   d²_ppm = ±10⁶·(S₁n₂−S₂n₁)²·(n₁+n₂−2)
    *            div (n₁n₂·[n₂(n₁Q₁−S₁²) + n₁(n₂Q₂−S₂²)]),
    * every factor an exact decimal(38,0) product of long sums. |d|≥0.8
    * ("large") ⇔ d²_ppm ≥ 640 000. The mean gap also lands exact in
    * cents. Both groups reduce to single rows before the 1×1 join. */
  private val qCohensD = BoundQuery("q_cohens_d", (s, d) => {
    def side(t: String, sfx: String) = daily(s, d)
      .where(col("event_type") === t)
      .agg(count(lit(1)).as(s"n$sfx"), sum(col("y")).as(s"s$sfx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as(s"q$sfx"))
    side("click", "1").crossJoin(side("view", "2"))
      .select(col("n1"), col("n2"),
        expr("(CAST(s1 AS DECIMAL(38,0))*n2 - CAST(s2 AS DECIMAL(38,0))*n1) div (n1*n2)")
          .as("mean_diff_c"),
        expr("""CASE WHEN CAST(s1 AS DECIMAL(38,0))*n2 < CAST(s2 AS DECIMAL(38,0))*n1
                     THEN -1 ELSE 1 END
                * ((1000000
                    * (CAST(s1 AS DECIMAL(38,0))*n2 - CAST(s2 AS DECIMAL(38,0))*n1)
                    * (CAST(s1 AS DECIMAL(38,0))*n2 - CAST(s2 AS DECIMAL(38,0))*n1)
                    * (n1 + n2 - 2))
                   div (CAST(n1 AS DECIMAL(38,0)) * n2
                        * (n2*(n1*q1 - CAST(s1 AS DECIMAL(38,0))*s1)
                           + n1*(n2*q2 - CAST(s2 AS DECIMAL(38,0))*s2))))""")
          .cast("long").as("d2_ppm_signed"))
  }, Some(s"""
    WITH daily AS ($dailySql),
    g1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n1, CAST(sum(y) AS BIGINT) AS s1,
        CAST(sum(CAST(y AS HUGEINT)*y) AS HUGEINT) AS q1
      FROM daily WHERE event_type = 'click'),
    g2 AS (
      SELECT CAST(count(*) AS BIGINT) AS n2, CAST(sum(y) AS BIGINT) AS s2,
        CAST(sum(CAST(y AS HUGEINT)*y) AS HUGEINT) AS q2
      FROM daily WHERE event_type = 'view')
    SELECT n1, n2,
      CAST((CAST(s1 AS HUGEINT)*n2 - CAST(s2 AS HUGEINT)*n1) // (n1*n2)
        AS BIGINT) AS mean_diff_c,
      CAST((CASE WHEN CAST(s1 AS HUGEINT)*n2 < CAST(s2 AS HUGEINT)*n1
                 THEN -1 ELSE 1 END)
        * ((1000000
            * (CAST(s1 AS HUGEINT)*n2 - CAST(s2 AS HUGEINT)*n1)
            * (CAST(s1 AS HUGEINT)*n2 - CAST(s2 AS HUGEINT)*n1)
            * (n1 + n2 - 2))
           // (CAST(n1 AS HUGEINT) * n2
               * (n2*(n1*q1 - CAST(s1 AS HUGEINT)*s1)
                  + n1*(n2*q2 - CAST(s2 AS HUGEINT)*s2))))
        AS BIGINT) AS d2_ppm_signed
    FROM g1 CROSS JOIN g2
  """))

  /** Per-class one-vs-rest Matthews correlation of the Naive Bayes
    * classifier — the chance-robust single-number score that q_prf1's
    * precision/recall cannot give on imbalanced classes (predict-all-
    * majority scores F1>0 but MCC=0). From the same confusion matrix,
    * signed-square ppm (q_item_cf convention, sqrt-free):
    * mcc²_ppm = ±10⁶·(tp·tn − fp·fn)² div ((tp+fp)(tp+fn)(tn+fp)(tn+fn)),
    * 0 when any marginal is empty (the defined MCC limit). Everything
    * after the NB scoring is ≤ k² rows. */
  private val qMcc = BoundQuery("q_mcc", (s, d) => {
    val conf = MlQueries.naiveBayesConfusion(s, d)
    val per = conf.groupBy(col("actual").as("label"))
      .agg(sum(when(col("predicted") === col("actual"), col("n_docs"))
        .otherwise(0L)).as("tp"), sum(col("n_docs")).as("support"))
    val pt = conf.groupBy(col("predicted").as("label"))
      .agg(sum(col("n_docs")).as("pred_n"))
    val tot = conf.agg(sum(col("n_docs")).as("total"))
    per.join(pt, Seq("label"), "left").na.fill(0L, Seq("pred_n"))
      .crossJoin(broadcast(tot))
      .withColumn("fp", col("pred_n") - col("tp"))
      .withColumn("fn", col("support") - col("tp"))
      .withColumn("tn",
        col("total") - col("tp") - col("fp") - col("fn"))
      .select(col("label"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("""CASE WHEN (tp+fp)*(tp+fn) = 0 OR (tn+fp)*(tn+fn) = 0 THEN 0
                ELSE (CASE WHEN CAST(tp AS DECIMAL(38,0))*tn < CAST(fp AS DECIMAL(38,0))*fn
                           THEN -1 ELSE 1 END)
                     * ((1000000
                         * (CAST(tp AS DECIMAL(38,0))*tn - CAST(fp AS DECIMAL(38,0))*fn)
                         * (CAST(tp AS DECIMAL(38,0))*tn - CAST(fp AS DECIMAL(38,0))*fn))
                        div (CAST(tp+fp AS DECIMAL(38,0)) * (tp+fn)
                             * (tn+fp) * (tn+fn))) END""")
          .cast("long").as("mcc2_ppm_signed"))
      .orderBy("label")
  }, Some(s"""
    WITH conf AS (${MlQueries.naiveBayesConfusionSql}),
    per AS (
      SELECT actual AS label,
        CAST(sum(CASE WHEN predicted = actual THEN n_docs ELSE 0 END)
          AS BIGINT) AS tp,
        CAST(sum(n_docs) AS BIGINT) AS support
      FROM conf GROUP BY 1),
    pt AS (SELECT predicted AS label, CAST(sum(n_docs) AS BIGINT) AS pred_n
           FROM conf GROUP BY 1),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM conf),
    cells AS (
      SELECT per.label, per.tp,
        coalesce(pt.pred_n, 0) - per.tp AS fp,
        per.support - per.tp AS fn,
        total - per.tp - (coalesce(pt.pred_n, 0) - per.tp)
          - (per.support - per.tp) AS tn
      FROM per LEFT JOIN pt ON per.label = pt.label CROSS JOIN tot)
    SELECT label, tp, fp, fn, tn,
      CAST(CASE WHEN (tp+fp)*(tp+fn) = 0 OR (tn+fp)*(tn+fn) = 0 THEN 0
      ELSE (CASE WHEN CAST(tp AS HUGEINT)*tn < CAST(fp AS HUGEINT)*fn
                 THEN -1 ELSE 1 END)
           * ((1000000
               * (CAST(tp AS HUGEINT)*tn - CAST(fp AS HUGEINT)*fn)
               * (CAST(tp AS HUGEINT)*tn - CAST(fp AS HUGEINT)*fn))
              // (CAST(tp+fp AS HUGEINT) * (tp+fn)
                 * (tn+fp) * (tn+fn))) END AS BIGINT) AS mcc2_ppm_signed
    FROM cells ORDER BY label
  """))

  /** Tukey–Kramer post-hoc: WHICH pairs differ, after q_anova says
    * SOME pair does. For every type pair, the squared studentized
    * range statistic in the unbalanced-safe Kramer form clears to
    *   q² = 2(x̄ᵢ−x̄ⱼ)²/(MSE·(1/nᵢ+1/nⱼ))
    *      = 2·(Sᵢnⱼ−Sⱼnᵢ)²·(N−k) div (nᵢnⱼ(nᵢ+nⱼ)·ssw),
    * with ssw = Σ_g((n_g·Q_g − S_g²) div n_g) — one truncating
    * division per group, error < 1 cent² (the q_kruskal_wallis
    * normalization). significant = q² ≥ 3.858² (studentized-range 5%
    * critical for k=5, df=∞, the exact literal 14884 milli; at
    * df≈145 the flag is conservative by <2%, stated here). Pair
    * fan-out is k², off the k-row group table. */
  private val qTukeyHsd = BoundQuery("q_tukey_hsd", (s, d) => {
    val g = daily(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("ng"), sum(col("y")).as("sg"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("qg"))
    val w = g.agg(
      sum(expr("(ng * qg - CAST(sg AS DECIMAL(38,0)) * sg) div ng"))
        .as("ssw"), sum(col("ng")).as("n"), count(lit(1)).as("k"))
    g.as("a").join(g.as("b"),
        col("a.event_type") < col("b.event_type"))
      .crossJoin(broadcast(w))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        expr("""(CAST(a.sg AS DECIMAL(38,0)) * b.ng
                 - CAST(b.sg AS DECIMAL(38,0)) * a.ng) div (a.ng * b.ng)""")
          .as("mean_diff_c"),
        expr("""CAST((2000 * (CAST(a.sg AS DECIMAL(38,0)) * b.ng
                              - CAST(b.sg AS DECIMAL(38,0)) * a.ng)
                           * (CAST(a.sg AS DECIMAL(38,0)) * b.ng
                              - CAST(b.sg AS DECIMAL(38,0)) * a.ng)
                           * (n - k))
                     div (CAST(a.ng AS DECIMAL(38,0)) * b.ng
                          * (a.ng + b.ng) * ssw) AS BIGINT)""")
          .as("q2_milli"))
      .withColumn("significant", col("q2_milli") >= 14884L)
      .orderBy("type_a", "type_b")
  }, Some(s"""
    WITH daily AS ($dailySql),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
        CAST(sum(y) AS BIGINT) AS sg,
        CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS qg
      FROM daily GROUP BY 1),
    w AS (
      SELECT CAST(sum((ng * qg - CAST(sg AS HUGEINT) * sg) // ng) AS HUGEINT)
          AS ssw,
        CAST(sum(ng) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k
      FROM g)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
      CAST((CAST(a.sg AS HUGEINT) * b.ng - CAST(b.sg AS HUGEINT) * a.ng)
           // (a.ng * b.ng) AS BIGINT) AS mean_diff_c,
      CAST((2000 * (CAST(a.sg AS HUGEINT) * b.ng - CAST(b.sg AS HUGEINT) * a.ng)
                 * (CAST(a.sg AS HUGEINT) * b.ng - CAST(b.sg AS HUGEINT) * a.ng)
                 * (n - k))
           // (CAST(a.ng AS HUGEINT) * b.ng * (a.ng + b.ng) * ssw) AS BIGINT)
        AS q2_milli,
      (2000 * (CAST(a.sg AS HUGEINT) * b.ng - CAST(b.sg AS HUGEINT) * a.ng)
            * (CAST(a.sg AS HUGEINT) * b.ng - CAST(b.sg AS HUGEINT) * a.ng)
            * (n - k))
        // (CAST(a.ng AS HUGEINT) * b.ng * (a.ng + b.ng) * ssw) >= 14884
        AS significant
    FROM g a JOIN g b ON a.event_type < b.event_type
    CROSS JOIN w ORDER BY type_a, type_b
  """))

  /** Cochran's Q over (day × type) blocks: do the k event types
    * systematically trade places WITHIN days? Each day's revenues
    * dichotomize against the day's own cross-type MEAN, strictly and
    * EXACTLY (k_d·y vs Σ_day — no division, no median-interpolation
    * ambiguity between engines), so between-day level shifts cancel
    * by construction — the repeated-measures question
    * q_kruskal_wallis's global ranking cannot isolate. Q clears to
    *   q_milli = 1000·(k−1)·(k·ΣC_j² − N²) div (k·(k·ΣR_d − ΣR_d²)),
    * C_j per-type above count, R_d per-day above count, N = ΣC. */
  private val qCochranQ = BoundQuery("q_cochran_q", (s, d) => {
    val dl = daily(s, d)
    val med = dl.groupBy(col("day").as("dd"))
      .agg(sum(col("y")).as("sd"), count(lit(1)).as("kd"))
    val x = dl.join(broadcast(med), col("day") === col("dd"))
      .withColumn("above", (col("kd") * col("y") > col("sd")).cast("long"))
    val cj = x.groupBy("event_type").agg(sum(col("above")).as("c"))
      .agg(sum(col("c")).as("nn"), sum(col("c") * col("c")).as("c2"),
        count(lit(1)).as("k"))
    val rd = x.groupBy("day").agg(sum(col("above")).as("r"))
      .agg(sum(col("r")).as("sr"), sum(col("r") * col("r")).as("r2"))
    cj.crossJoin(rd)
      .select(col("k"), col("nn").as("n_above"),
        expr("""CASE WHEN k * (k * sr - r2) = 0 THEN 0
                ELSE (1000 * (k - 1) * (k * c2 - nn * nn))
                     div (k * (k * sr - r2)) END""").as("q_milli"))
  }, Some(s"""
    WITH daily AS ($dailySql),
    med AS (
      SELECT day AS dd, CAST(sum(y) AS BIGINT) AS sd,
        CAST(count(*) AS BIGINT) AS kd
      FROM daily GROUP BY 1),
    x AS (
      SELECT event_type, day, CASE WHEN kd * y > sd THEN 1 ELSE 0 END AS above
      FROM daily JOIN med ON day = dd),
    cj AS (
      SELECT CAST(sum(c) AS BIGINT) AS nn,
        CAST(sum(c * c) AS BIGINT) AS c2, CAST(count(*) AS BIGINT) AS k
      FROM (SELECT CAST(sum(above) AS BIGINT) AS c FROM x
            GROUP BY event_type)),
    rd AS (
      SELECT CAST(sum(r) AS BIGINT) AS sr, CAST(sum(r * r) AS BIGINT) AS r2
      FROM (SELECT CAST(sum(above) AS BIGINT) AS r FROM x GROUP BY day))
    SELECT k, nn AS n_above,
      CASE WHEN k * (k * sr - r2) = 0 THEN 0
      ELSE (1000 * (k - 1) * (k * c2 - nn * nn))
           // (k * (k * sr - r2)) END AS q_milli
    FROM cj CROSS JOIN rd
  """))

  /** A/B sample-size calculator from the measured base rate: per-arm
    * n to detect a relative lift of {1,2,5,10}% on the purchase share
    * at α=.05 (two-sided), power .80 — two-proportion z formula
    *   n = (z_{α/2}+z_β)²·(p₁(1−p₁)+p₂(1−p₂))/(p₁−p₂)²,
    * EXACT in integers: p in ppm from one event scan, variances in
    * ppm² longs, and (z_{.025}+z_{.8})² inlined as the exact integer
    * square of the µ-unit literal 2801585 (= 1959964 + 841621) — no
    * erf, no float. Ceiling division (+den−1) so the emitted n always
    * reaches the power target. The MDE grid is a 4-row literal
    * crossed against the 1-row base rate. */
  private val qPowerAnalysis = BoundQuery("q_power_analysis", (s, d) => {
    val base = Tables.events(s, d).agg(
      expr("""(1000000 * sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END))
              div count(1)""").as("p1"))
    import s.implicits._
    val grid = Seq(10L, 20L, 50L, 100L).toDF("lift_milli")
    grid.crossJoin(broadcast(base))
      .withColumn("p2", expr("p1 + (p1 * lift_milli) div 1000"))
      .withColumn("n_per_arm", expr(
        """CAST((CAST(2801585 AS DECIMAL(38,0)) * 2801585
                 * (p1 * (1000000 - p1) + p2 * (1000000 - p2))
                 + (CAST(1000000000000 AS DECIMAL(38,0))
                    * ((p2 - p1) * (p2 - p1)) - 1))
                div (CAST(1000000000000 AS DECIMAL(38,0))
                     * ((p2 - p1) * (p2 - p1))) AS BIGINT)"""))
      .select(col("lift_milli"), col("p1").as("p1_ppm"),
        col("p2").as("p2_ppm"), col("n_per_arm"))
      .orderBy("lift_milli")
  }, Some("""
    WITH base AS (
      SELECT (1000000 * sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END))
             // count(*) AS p1
      FROM events),
    grid AS (SELECT unnest([10, 20, 50, 100]) AS lift_milli),
    p AS (
      SELECT CAST(lift_milli AS BIGINT) AS lift_milli,
        CAST(p1 AS BIGINT) AS p1,
        CAST(p1 + (p1 * lift_milli) // 1000 AS BIGINT) AS p2
      FROM grid CROSS JOIN base)
    SELECT lift_milli, p1 AS p1_ppm, p2 AS p2_ppm,
      CAST((CAST(2801585 AS HUGEINT) * 2801585
            * (p1 * (1000000 - p1) + p2 * (1000000 - p2))
            + (CAST(1000000000000 AS HUGEINT)
               * ((p2 - p1) * (p2 - p1)) - 1))
           // (CAST(1000000000000 AS HUGEINT)
               * ((p2 - p1) * (p2 - p1))) AS BIGINT) AS n_per_arm
    FROM p ORDER BY lift_milli
  """))

  /** Simpson's-paradox audit: does the aggregate association between
    * customer segment and order failure REVERSE inside priority
    * strata? For each segment pair, the aggregate rate comparison
    * (exact cross-multiplication — no rate division) is checked
    * against every stratum's comparison; emitted per pair: the
    * aggregate sign, how many strata agree/disagree/flip, and the
    * paradox flag (aggregate sign nonzero while NO stratum carries
    * it). The confounder audit an experimentation platform runs
    * before reading any segmented metric.
    *
    * Scale shape: one (segment, priority) contingency collapse, then
    * k²·m bounded comparisons off the broadcast-sized table. */
  private val qSimpsonCheck = BoundQuery("q_simpson_check", (s, d) => {
    val cells = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"),
        sum((col("o_orderstatus") === "F").cast("long")).as("f"))
    val agg = cells.groupBy(col("seg")).agg(sum(col("n")).as("n"),
      sum(col("f")).as("f"))
    // broadcast: the segment aggregate is K rows, and a bare
    // non-equi self-join would otherwise plan a CartesianProduct
    // (PlanLintSpec's class of offense)
    val aggPairs = agg.as("a").join(broadcast(agg.as("b")),
        col("a.seg") < col("b.seg"))
      .select(col("a.seg").as("seg_a"), col("b.seg").as("seg_b"),
        expr("""CAST(CASE WHEN CAST(a.f AS DECIMAL(38,0)) * b.n
                          > CAST(b.f AS DECIMAL(38,0)) * a.n THEN 1
                     WHEN CAST(a.f AS DECIMAL(38,0)) * b.n
                          < CAST(b.f AS DECIMAL(38,0)) * a.n THEN -1
                     ELSE 0 END AS BIGINT)""").as("agg_sign"))
    val strata = cells.as("a").join(cells.as("b"),
        col("a.seg") < col("b.seg") && col("a.pri") === col("b.pri"))
      .select(col("a.seg").as("seg_a"), col("b.seg").as("seg_b"),
        expr("""CASE WHEN CAST(a.f AS DECIMAL(38,0)) * b.n
                          > CAST(b.f AS DECIMAL(38,0)) * a.n THEN 1
                     WHEN CAST(a.f AS DECIMAL(38,0)) * b.n
                          < CAST(b.f AS DECIMAL(38,0)) * a.n THEN -1
                     ELSE 0 END""").as("s_sign"))
    aggPairs.join(strata, Seq("seg_a", "seg_b"))
      .groupBy("seg_a", "seg_b", "agg_sign")
      .agg(count(lit(1)).as("n_strata"),
        sum(when(col("s_sign") === col("agg_sign"), 1L).otherwise(0L))
          .as("n_agree"),
        sum(when(col("s_sign") === -col("agg_sign") && col("agg_sign") =!= 0,
          1L).otherwise(0L)).as("n_reversed"))
      .withColumn("paradox",
        col("agg_sign") =!= 0 && col("n_agree") === 0L)
      .select("seg_a", "seg_b", "agg_sign", "n_strata", "n_agree",
        "n_reversed", "paradox")
      .orderBy("seg_a", "seg_b")
  }, Some("""
    WITH cells AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
          AS f
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    agg AS (SELECT seg, CAST(sum(n) AS BIGINT) AS n,
                   CAST(sum(f) AS BIGINT) AS f FROM cells GROUP BY 1),
    ap AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b,
        CASE WHEN CAST(a.f AS HUGEINT) * b.n > CAST(b.f AS HUGEINT) * a.n
          THEN 1
          WHEN CAST(a.f AS HUGEINT) * b.n < CAST(b.f AS HUGEINT) * a.n
          THEN -1 ELSE 0 END AS agg_sign
      FROM agg a JOIN agg b ON a.seg < b.seg),
    st AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b,
        CASE WHEN CAST(a.f AS HUGEINT) * b.n > CAST(b.f AS HUGEINT) * a.n
          THEN 1
          WHEN CAST(a.f AS HUGEINT) * b.n < CAST(b.f AS HUGEINT) * a.n
          THEN -1 ELSE 0 END AS s_sign
      FROM cells a JOIN cells b ON a.seg < b.seg AND a.pri = b.pri)
    SELECT seg_a, seg_b, CAST(agg_sign AS BIGINT) AS agg_sign,
      CAST(count(*) AS BIGINT) AS n_strata,
      CAST(sum(CASE WHEN s_sign = agg_sign THEN 1 ELSE 0 END) AS BIGINT)
        AS n_agree,
      CAST(sum(CASE WHEN agg_sign <> 0 AND s_sign = -agg_sign
        THEN 1 ELSE 0 END) AS BIGINT) AS n_reversed,
      (agg_sign <> 0 AND
       sum(CASE WHEN s_sign = agg_sign THEN 1 ELSE 0 END) = 0) AS paradox
    FROM ap JOIN st USING (seg_a, seg_b)
    GROUP BY seg_a, seg_b, agg_sign
    ORDER BY seg_a, seg_b
  """))

  /** Benjamini–Hochberg FDR correction over a FAMILY of simultaneous
    * tests — the multiple-comparisons discipline every metrics
    * dashboard skips and then regrets: 15 (priority × status) cells
    * each run a one-sample z of their mean order value against the
    * global mean; raw p-values are then STEP-UP corrected (find the
    * largest k with p_(k) ≤ k·α/m, discover ranks 1..k, α = 0.05).
    *
    * The tail probability uses the logistic approximation
    * p = 2/(1+exp(1.702·|z|)) ≈ 2(1−Φ(|z|)) — neither engine ships
    * erf, and the approximation (|error| < 0.0095, Bowling 2009) is
    * an identical expression tree on both sides, so the DEFINITION is
    * the approximation and the gate is exact. Moments are exact
    * cents-longs; the BH pass runs on the m=15-row table (two window
    * functions), nothing scales past the first groupBy. */
  private val qFdr = BoundQuery("q_fdr", (s, d) => {
    val cell = Tables.orders(s, d)
      .withColumn("c", cents(col("o_totalprice")))
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"), sum("c").as("sc"),
        sum(col("c") * col("c")).as("ssc"))
    val glob = Tables.orders(s, d)
      .withColumn("c", cents(col("o_totalprice")))
      .agg(count(lit(1)).as("ng"), sum("c").as("scg"))
    val z = cell.crossJoin(broadcast(glob))
      .withColumn("mean", col("sc").cast("double") / col("n").cast("double"))
      .withColumn("gmean", col("scg").cast("double") / col("ng").cast("double"))
      .withColumn("variance",
        (col("ssc").cast("double") - col("sc").cast("double") *
          col("sc").cast("double") / col("n").cast("double")) /
          (col("n") - 1).cast("double"))
      .withColumn("z",
        (col("mean") - col("gmean")) / sqrt(col("variance") / col("n").cast("double")))
      .withColumn("p", lit(2.0) / (lit(1.0) + exp(lit(1.702) * abs(col("z")))))
    val wRank = Window.orderBy(col("p"), col("priority"), col("status"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    z.withColumn("k", row_number().over(wRank).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("ok", col("p") <= col("k").cast("double") * 0.05 / col("m").cast("double"))
      .withColumn("kstar", max(when(col("ok"), col("k"))).over(wAll))
      .select(col("priority"), col("status"), col("n"),
        round(col("z"), 6).as("z"),
        round(col("p") * 1e6, 0).cast("long").as("p_ppm"),
        col("k"), (col("k") <= coalesce(col("kstar"), lit(0L))).as("discovered"))
      .orderBy("k")
  }, Some("""
    WITH cell AS (
      SELECT o_orderpriority AS priority, o_orderstatus AS status,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sc,
        CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)
               * CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS ssc
      FROM orders GROUP BY 1, 2),
    gstats AS (
      SELECT CAST(count(*) AS BIGINT) AS ng,
        CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS scg
      FROM orders),
    z AS (
      SELECT priority, status, n,
        (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)
          - CAST(scg AS DOUBLE) / CAST(ng AS DOUBLE))
        / sqrt(((CAST(ssc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
               / CAST(n AS DOUBLE)) AS z
      FROM cell CROSS JOIN gstats),
    p AS (
      SELECT priority, status, n, z,
        2.0 / (1.0 + exp(1.702 * abs(z))) AS p
      FROM z),
    ranked AS (
      SELECT priority, status, n, z, p,
        CAST(row_number() OVER (ORDER BY p, priority, status) AS BIGINT) AS k,
        CAST(count(*) OVER () AS BIGINT) AS m
      FROM p),
    flagged AS (
      SELECT *, p <= CAST(k AS DOUBLE) * 0.05 / CAST(m AS DOUBLE) AS ok
      FROM ranked),
    kstar AS (SELECT max(CASE WHEN ok THEN k END) AS ks FROM flagged)
    SELECT priority, status, n, round(z, 6) AS z,
      CAST(round(p * 1e6, 0) AS BIGINT) AS p_ppm, k,
      k <= COALESCE(ks, 0) AS discovered
    FROM flagged CROSS JOIN kstar ORDER BY k
  """))

  /** Exact per-group quantiles by RANK arithmetic — the per-nation
    * p50/p90 revenue readout, each quantile the element of rank
    * max(1, ceil(q·n)) within its group (quantile_disc's convention,
    * the same contract q_kll_quantiles pins globally). Two window
    * passes over cents-longs, no sketch, no interpolation floats —
    * exact and hash-stable at any group size; at 100 TB the
    * per-group sort is the partitioned window shuffle. */
  private val qGroupQuantiles = BoundQuery("q_group_quantiles", (s, d) => {
    val j = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), cents(col("o_totalprice")).as("c"))
    val w = Window.partitionBy("n_name").orderBy(col("c"))
    val ranked = j
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("n_name")))
    def pick(q: Double, as: String) =
      max(when(col("rn") === greatest(lit(1L),
        ceil(lit(q) * col("n").cast("double")).cast("long")), col("c"))).as(as)
    ranked.groupBy("n_name")
      .agg(max(col("n")).as("n"), pick(0.5, "p50_c"), pick(0.9, "p90_c"))
      .select(col("n_name"), col("n"),
        money(col("p50_c")).as("p50"), money(col("p90_c")).as("p90"))
      .orderBy("n_name")
  }, Some("""
    WITH j AS (
      SELECT n_name, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey),
    ranked AS (
      SELECT n_name, c,
        CAST(row_number() OVER (PARTITION BY n_name ORDER BY c) AS BIGINT) AS rn,
        CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n
      FROM j)
    SELECT n_name, max(n) AS n,
      CAST(max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
               THEN c END) AS DOUBLE) / 100.0 AS p50,
      CAST(max(CASE WHEN rn = greatest(1, CAST(ceil(0.9 * n) AS BIGINT))
               THEN c END) AS DOUBLE) / 100.0 AS p90
    FROM ranked GROUP BY n_name ORDER BY n_name
  """))

  /** Binary-segmentation changepoints, depth 2 (Scott & Knott 1974;
    * the greedy recursion behind ruptures' BinSeg): q_changepoint's
    * single best split, then the SAME between-segment-sum-of-squares
    * argmax re-run inside each half — up to three changepoints per
    * event type from two scoring passes. Each pass is the exact
    * integer BSS score over (partition-keyed) cumsums — the level-2
    * windows just gain the segment in their partition key, so nothing
    * is ever single-partition. A one-day segment emits no candidate
    * row (i < n filters it), exactly like the SQL replay. */
  private val qBinseg = BoundQuery("q_binseg", (s, d) => {
    val scoreSql = """
      (CAST(s1 AS DECIMAL(38,0))*(n-i) - CAST(sy-s1 AS DECIMAL(38,0))*i)
      * (CAST(s1 AS DECIMAL(38,0))*(n-i) - CAST(sy-s1 AS DECIMAL(38,0))*i)
      div (i * (n-i) * 10000)"""
    val w1 = Window.partitionBy("event_type").orderBy("day")
    val tot1 = daily(s, d).groupBy(col("event_type").as("et"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
    val best1 = daily(s, d)
      .withColumn("i", row_number().over(w1).cast("long"))
      .withColumn("s1", sum(col("y")).over(w1))
      .join(broadcast(tot1), col("event_type") === col("et"))
      .where(col("i") < col("n"))
      .withColumn("score", expr(scoreSql))
      .withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("score").desc, col("day"))))
      .where(col("rn") === 1)
      .select(col("event_type").as("et1"), col("day").as("split1"),
        col("i").as("nl"), (col("n") - col("i")).as("nr"),
        col("score").as("score1"))
    val lvl1 = graft.util.CacheScope.persist(best1)
    val seg = daily(s, d)
      .join(broadcast(lvl1.select(col("et1"), col("split1"))),
        col("event_type") === col("et1"))
      .withColumn("seg", when(col("day") <= col("split1"), "left")
        .otherwise("right"))
    val w2 = Window.partitionBy("event_type", "seg").orderBy("day")
    val tot2 = seg.groupBy(col("event_type").as("et"), col("seg").as("sg"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
    val best2 = seg
      .withColumn("i", row_number().over(w2).cast("long"))
      .withColumn("s1", sum(col("y")).over(w2))
      .join(broadcast(tot2),
        col("event_type") === col("et") && col("seg") === col("sg"))
      .where(col("i") < col("n"))
      .withColumn("score", expr(scoreSql))
      .withColumn("rn", row_number().over(Window
        .partitionBy("event_type", "seg")
        .orderBy(col("score").desc, col("day"))))
      .where(col("rn") === 1)
      .select(col("event_type"), lit(2L).as("level"), col("seg").as("segment"),
        col("day").as("split_day"), col("i").as("n_left"),
        (col("n") - col("i")).as("n_right"), col("score").as("bss_d2"))
    lvl1.select(col("et1").as("event_type"), lit(1L).as("level"),
        lit("all").as("segment"), col("split1").as("split_day"),
        col("nl").as("n_left"), col("nr").as("n_right"),
        col("score1").as("bss_d2"))
      .union(best2)
      .orderBy("event_type", "level", "segment")
  }, Some(s"""
    WITH daily AS ($dailySql),
    tot AS (
      SELECT event_type AS et, CAST(sum(y) AS BIGINT) AS sy,
        CAST(count(*) AS BIGINT) AS n
      FROM daily GROUP BY 1),
    pre AS (
      SELECT event_type, day,
        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
          AS BIGINT) AS i,
        CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s1
      FROM daily),
    sc AS (
      SELECT p.event_type, p.day, p.i, p.s1, t.n, t.sy,
        (CAST(p.s1 AS HUGEINT)*(t.n-p.i) - CAST(t.sy-p.s1 AS HUGEINT)*p.i)
        * (CAST(p.s1 AS HUGEINT)*(t.n-p.i) - CAST(t.sy-p.s1 AS HUGEINT)*p.i)
        // (p.i * (t.n-p.i) * 10000) AS score
      FROM pre p JOIN tot t ON p.event_type = t.et
      WHERE p.i < t.n),
    best1 AS (
      SELECT event_type AS et1, day AS split1, i AS nl, n - i AS nr,
        score AS score1
      FROM (SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY score DESC, day) AS rn FROM sc)
      WHERE rn = 1),
    seg AS (
      SELECT d.event_type, d.day, d.y,
        CASE WHEN d.day <= b.split1 THEN 'left' ELSE 'right' END AS seg
      FROM daily d JOIN best1 b ON d.event_type = b.et1),
    tot2 AS (
      SELECT event_type AS et, seg AS sg, CAST(sum(y) AS BIGINT) AS sy,
        CAST(count(*) AS BIGINT) AS n
      FROM seg GROUP BY 1, 2),
    pre2 AS (
      SELECT event_type, seg, day,
        CAST(row_number() OVER (PARTITION BY event_type, seg ORDER BY day)
          AS BIGINT) AS i,
        CAST(sum(y) OVER (PARTITION BY event_type, seg ORDER BY day
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s1
      FROM seg),
    sc2 AS (
      SELECT p.event_type, p.seg, p.day, p.i, p.s1, t.n, t.sy,
        (CAST(p.s1 AS HUGEINT)*(t.n-p.i) - CAST(t.sy-p.s1 AS HUGEINT)*p.i)
        * (CAST(p.s1 AS HUGEINT)*(t.n-p.i) - CAST(t.sy-p.s1 AS HUGEINT)*p.i)
        // (p.i * (t.n-p.i) * 10000) AS score
      FROM pre2 p JOIN tot2 t ON p.event_type = t.et AND p.seg = t.sg
      WHERE p.i < t.n),
    best2 AS (
      SELECT event_type, CAST(2 AS BIGINT) AS level, seg AS segment,
        day AS split_day, i AS n_left, n - i AS n_right,
        CAST(score AS BIGINT) AS bss_d2
      FROM (SELECT *, row_number() OVER (PARTITION BY event_type, seg
              ORDER BY score DESC, day) AS rn FROM sc2)
      WHERE rn = 1)
    SELECT et1 AS event_type, CAST(1 AS BIGINT) AS level, 'all' AS segment,
      split1 AS split_day, nl AS n_left, nr AS n_right,
      CAST(score1 AS BIGINT) AS bss_d2
    FROM best1
    UNION ALL
    SELECT * FROM best2
    ORDER BY event_type, level, segment
  """))

  val all: Seq[BoundQuery] = Seq(qJarqueBera, qRunsTest, qDurbinWatson,
    qChangepoint, qCohensD, qMcc, qTukeyHsd, qCochranQ, qPowerAnalysis,
    qSimpsonCheck, qFdr, qGroupQuantiles, qBinseg)
}
