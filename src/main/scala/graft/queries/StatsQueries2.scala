package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 classical-stats wave 4: autoregressive fit, the paired
  * nonparametric test, and self-auditing approximate query
  * processing — rounding out the forecasting (q_holt/q_acf), testing
  * (q_ks_test/q_mann_kendall/q_anova) and sampling (q_hash_sample/
  * q_bootstrap) families.
  *
  * Numeric rule (the StatsQueries contract): exact long /
  * decimal(38,0) aggregates, integral divisions last to ppm, signed
  * squared statistics instead of square roots, every ORDER BY with a
  * unique tie-break.
  */
object StatsQueries2 {

  /** AR(1) autoregression of daily revenue per event type: OLS of
    * y_d on y_{d-1} over CONSECUTIVE-day pairs (lag via a
    * calendar-bounded window; a gap in the calendar drops the pair
    * rather than regressing across it). slope in ppm and intercept in
    * cents, both exact: second moments accumulate in decimal(38,0)
    * (n·sxy reaches ~4e18 at the sf1 smoke — past int64 if cents were
    * multiplied as longs), and the two outputs are single truncating
    * integral divisions whose quotients are small (slope_ppm ≲ 10⁶,
    * intercept ≤ max daily cents), so Spark's BIGINT `div` cannot wrap
    * (the q_logreg_newton hazard).
    *
    * Scale shape: one partial-aggregated shuffle to the (type, day)
    * grain, then a lag window partitioned per type whose width is the
    * CALENDAR, then a 5-group reduction — the q_spearman bounded-window
    * contract. */
  private val qAr1 = BoundQuery("q_ar1", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val pairs = daily
      .withColumn("py", lag(col("y"), 1).over(w))
      .withColumn("pday", lag(col("day"), 1).over(w))
      .where(col("py").isNotNull && datediff(col("day"), col("pday")) === 1)
    val dec = "decimal(38,0)"
    pairs.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("py").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("py").cast(dec) * col("py").cast(dec)).as("sxx"),
        sum(col("py").cast(dec) * col("y").cast(dec)).as("sxy"))
      .select(col("event_type"), col("n").as("n_pairs"),
        expr("""CASE WHEN n*sxx - sx*sx <> 0 THEN
                  CAST((1000000 * (n*sxy - sx*sy)) div (n*sxx - sx*sx) AS BIGINT)
                END""").as("slope_ppm"),
        expr("""CASE WHEN n*sxx - sx*sx <> 0 THEN
                  CAST((1000000*sy - ((1000000 * (n*sxy - sx*sy)) div (n*sxx - sx*sx)) * sx)
                       div (n * 1000000) AS BIGINT)
                END""").as("intercept_cents"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    pairs AS (
      SELECT event_type,
        CAST(lag(y) OVER (PARTITION BY event_type ORDER BY day) AS HUGEINT) AS px,
        CAST(y AS HUGEINT) AS py_,
        lag(day) OVER (PARTITION BY event_type ORDER BY day) AS pday, day
      FROM daily),
    m AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        sum(px) AS sx, sum(py_) AS sy,
        sum(px*px) AS sxx, sum(px*py_) AS sxy
      FROM pairs
      WHERE px IS NOT NULL AND date_diff('day', pday, day) = 1
      GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
      CASE WHEN n*sxx - sx*sx <> 0 THEN
        CAST((1000000 * (n*sxy - sx*sy)) // (n*sxx - sx*sx) AS BIGINT)
      END AS slope_ppm,
      CASE WHEN n*sxx - sx*sx <> 0 THEN
        CAST((1000000*sy - ((1000000 * (n*sxy - sx*sy)) // (n*sxx - sx*sx)) * sx)
             // (n * 1000000) AS BIGINT)
      END AS intercept_cents
    FROM m ORDER BY event_type
  """))

  /** Wilcoxon signed-rank test between the daily revenues of the two
    * highest-volume event types (click vs view), paired BY DAY: does
    * one reliably out-earn the other on the same day? Zero
    * differences are dropped (standard practice); |d| ties use the
    * averaged-rank convention kept exact by DOUBLED ranks
    * (2·avgrank = 2·minrank + ties − 1, the q_spearman identity).
    *
    * With W⁺ the sum of (undoubled) positive-d ranks,
    * E[W⁺] = n(n+1)/4 and 48·Var = 2n(n+1)(2n+1) − Σ(t³−t)
    * (tie-corrected). Writing A = 2·w2_plus − n(n+1) = 4(W⁺−E), the
    * squared z-statistic is z² = 3A²/(48·Var), emitted as
    * z2_ppm = (3·10⁶·A²) div var48 with the sign of A — the signed
    * squared form every test in this family uses (|z|≥1.96 ⇔
    * |z2_ppm| ≥ 3.84e6).
    *
    * Scale shape: (type, day) partial agg, a day-keyed self-pairing
    * of exactly two types (broadcast-sized after the calendar agg),
    * one rank window over the calendar-bounded diff set, one global
    * reduction. */
  private val qWilcoxon = BoundQuery("q_wilcoxon", (s, d) => {
    val daily = Tables.events(s, d)
      .where(col("event_type").isin("click", "view"))
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sumCents(col("value")).as("y"))
    val diffs = daily.groupBy("day")
      .agg(sum(when(col("event_type") === "click", col("y"))).as("yc"),
        sum(when(col("event_type") === "view", col("y"))).as("yv"),
        count(lit(1)).as("k"))
      .where(col("k") === 2 && col("yc") =!= col("yv"))
      .select(col("day"), (col("yc") - col("yv")).as("diff"),
        abs(col("yc") - col("yv")).as("ad"))
    val ranked = diffs.withColumn("r2",
      lit(2L) * rank().over(Window.orderBy("ad")).cast("long") +
        count(lit(1)).over(Window.partitionBy("ad")) - 1L)
    ranked
      .groupBy(lit(1).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("diff") > 0, col("r2")).otherwise(0L)).as("w2_plus"),
        sum(when(col("diff") < 0, col("r2")).otherwise(0L)).as("w2_minus"))
      .join(
        // tie term Σ(t³−t) over |d| multiplicities
        diffs.groupBy("ad").agg(count(lit(1)).as("t"))
          .agg(coalesce(sum(col("t") * col("t") * col("t") - col("t")), lit(0L))
            .as("tie3")).withColumn("g", lit(1)),
        Seq("g"))
      .select(col("n").as("n_pairs"), col("w2_plus"), col("w2_minus"),
        expr("""CASE WHEN 2*n*(n+1)*(2*n+1) - tie3 > 0 THEN
                  (CASE WHEN 2*w2_plus - n*(n+1) < 0 THEN -1 ELSE 1 END) *
                  CAST((CAST(3000000 AS DECIMAL(38,0))
                          * (2*w2_plus - n*(n+1)) * (2*w2_plus - n*(n+1)))
                       div (2*n*(n+1)*(2*n+1) - tie3) AS BIGINT)
                END""").as("z2s_ppm"))
  }, Some("""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
    diffs AS (
      SELECT day,
        sum(CASE WHEN event_type = 'click' THEN y END)
          - sum(CASE WHEN event_type = 'view' THEN y END) AS diff,
        abs(sum(CASE WHEN event_type = 'click' THEN y END)
          - sum(CASE WHEN event_type = 'view' THEN y END)) AS ad
      FROM daily GROUP BY day
      HAVING count(*) = 2
         AND sum(CASE WHEN event_type = 'click' THEN y END)
          <> sum(CASE WHEN event_type = 'view' THEN y END)),
    ranked AS (
      SELECT diff,
        2*CAST(rank() OVER (ORDER BY ad) AS BIGINT)
          + CAST(count(*) OVER (PARTITION BY ad) AS BIGINT) - 1 AS r2
      FROM diffs),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN diff > 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2_plus,
        CAST(sum(CASE WHEN diff < 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2_minus
      FROM ranked),
    ties AS (
      SELECT CAST(coalesce(sum(t*t*t - t), 0) AS BIGINT) AS tie3 FROM (
        SELECT CAST(count(*) AS BIGINT) AS t FROM diffs GROUP BY ad) x)
    SELECT n AS n_pairs, w2_plus, w2_minus,
      CASE WHEN 2*n*(n+1)*(2*n+1) - tie3 > 0 THEN
        CAST((CASE WHEN 2*w2_plus - n*(n+1) < 0 THEN -1 ELSE 1 END) *
          ((3000000 * CAST(2*w2_plus - n*(n+1) AS HUGEINT)
                    * CAST(2*w2_plus - n*(n+1) AS HUGEINT))
             // (2*n*(n+1)*(2*n+1) - tie3)) AS BIGINT)
      END AS z2s_ppm
    FROM agg CROSS JOIN ties
  """))

  /** Self-auditing AQP: estimate per-status order revenue from the
    * deterministic ~10.2% md5-prefix hash sample (the q_hash_sample
    * gate, 0x1a/0x100), inverse-probability-scale it by the EXACT
    * rational 256/26, and grade the estimate against the true total
    * computed in the same single scan — est, truth and error are all
    * integers both engines agree on. The audit twin of
    * q_hash_sample: it answers "how wrong would the 10% sample have
    * been?", which is the question AQP must answer before anyone
    * trusts the sample at 100 TB (where the full-scan truth column is
    * dropped and only the estimate survives).
    *
    * Scale shape: ONE map-side-combined scan over orders — the sample
    * membership test is a per-row hash, both aggregates are
    * conditional sums in the same groupBy, no join, no window. */
  private val qAqpEstimate = BoundQuery("q_aqp_estimate", (s, d) => {
    val sampled = substring(md5(col("o_orderkey").cast("string").cast("binary")), 1, 2) < "1a"
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(sampled, lit(1L)).otherwise(0L)).as("n_sampled"),
        sumCents(col("o_totalprice")).as("true_cents"),
        sum(when(sampled, cents(col("o_totalprice"))).otherwise(0L)).as("samp_cents"))
      .select(col("o_orderstatus"), col("n_rows"), col("n_sampled"),
        col("true_cents"),
        expr("(samp_cents * 256) div 26").as("est_cents"),
        expr("(1000000 * abs((samp_cents * 256) div 26 - true_cents)) div true_cents")
          .as("err_ppm"))
      .orderBy("o_orderstatus")
  }, Some("""
    WITH g AS (
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(*) FILTER (substr(md5(CAST(o_orderkey AS VARCHAR)),1,2) < '1a') AS BIGINT) AS n_sampled,
        CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS true_cents,
        CAST(coalesce(sum(CAST(round(o_totalprice*100,0) AS BIGINT))
               FILTER (substr(md5(CAST(o_orderkey AS VARCHAR)),1,2) < '1a'), 0) AS BIGINT) AS samp_cents
      FROM orders GROUP BY 1)
    SELECT o_orderstatus, n_rows, n_sampled, true_cents,
      CAST((samp_cents * 256) // 26 AS BIGINT) AS est_cents,
      CAST((1000000 * abs((samp_cents * 256) // 26 - true_cents)) // true_cents AS BIGINT) AS err_ppm
    FROM g ORDER BY o_orderstatus
  """))

  /** Burstiness of each event type: the index of dispersion
    * D = Var/Mean of DAILY event counts — D ≈ 1 is Poisson-like
    * arrivals, D ≫ 1 means bursts (the overdispersion signal that
    * decides whether rate alerts need burst-robust thresholds).
    *
    * Exact: with S = Σc, Q = Σc² over n days, population variance
    * obeys n²·Var = n·Q − S², so D_ppm = 10⁶·(nQ − S²) div (n·S) —
    * one truncating division over decimal(38,0) moment products
    * (n·Q·10⁶ passes int64 at 100× sf1). Calendar-bounded second
    * phase after one (type, day) partial agg. */
  private val qBurstiness = BoundQuery("q_burstiness", (s, d) => {
    val dec = "decimal(38,0)"
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("c").cast(dec)).as("sc"),
        sum(col("c").cast(dec) * col("c").cast(dec)).as("qc"))
      .select(col("event_type"), col("n_days"),
        col("sc").cast("long").as("total"),
        expr("CAST((1000000 * (n_days*qc - sc*sc)) div (n_days * sc) AS BIGINT)")
          .as("dispersion_ppm"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS HUGEINT) AS c
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n_days,
             sum(c) AS sc, sum(c*c) AS qc
      FROM daily GROUP BY 1)
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
      CAST(sc AS BIGINT) AS total,
      CAST((1000000 * (n_days*qc - sc*sc)) // (n_days * sc) AS BIGINT)
        AS dispersion_ppm
    FROM m ORDER BY event_type
  """))

  /** Cohen's kappa between the stopword language heuristic and the
    * stored label — chance-corrected agreement, the one number
    * q_langid_eval's confusion matrix is usually reduced to.
    * κ = (p_o − p_e)/(1 − p_e); multiplying through by N² keeps it a
    * ratio of exact integers: κ_ppm = 10⁶·(N·agree − Σ_c row_c·col_c)
    * div (N² − Σ_c row_c·col_c), one truncating division over
    * decimal(38,0) products (N²·10⁶ passes int64 at 100× sf1).
    * Categories missing on either side (zh is never predicted)
    * contribute zero to the chance term via the inner marginal join —
    * the asymmetric-marginal case handled exactly.
    *
    * Scale shape: one documents scan → (truth, pred) cells, then all
    * remaining work on the ≤|langs|² table. */
  private val qCohenKappa = BoundQuery("q_cohen_kappa", (s, d) => {
    import graft.functions.TextFunctions.{langId, tokens}
    val dec = "decimal(38,0)"
    val cells = Tables.documents(s, d)
      .select(col("lang"), langId(tokens(col("text"))).as("pred"))
      .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
    val rows = cells.groupBy("lang").agg(sum(col("n")).as("r"))
    val cols = cells.groupBy("pred").agg(sum(col("n")).as("c"))
    val pe = rows.join(cols, col("lang") === col("pred"))
      .agg(coalesce(sum(col("r").cast(dec) * col("c").cast(dec)),
        lit(0).cast(dec)).as("pe2"))
    cells.agg(sum(col("n")).cast(dec).as("n"),
        sum(when(col("lang") === col("pred"), col("n")).otherwise(0L))
          .cast(dec).as("agree"))
      .crossJoin(broadcast(pe))
      .select(col("n").cast("long").as("n_docs"),
        col("agree").cast("long").as("n_agree"),
        expr("CAST((1000000 * (n * agree - pe2)) div (n * n - pe2) AS BIGINT)")
          .as("kappa_ppm"))
  }, Some("""
    WITH p AS (
      SELECT lang,
        CASE WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
             WHEN c_es > 0 AND c_es >= c_de AND c_es >= c_fr THEN 'es'
             WHEN c_de > 0 AND c_de >= c_fr THEN 'de'
             WHEN c_fr > 0 THEN 'fr'
             ELSE 'und' END AS pred
      FROM (
        SELECT lang,
          CAST(len(list_filter(list_filter(string_split(text,' '), x -> x <> ''), w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS c_en,
          CAST(len(list_filter(list_filter(string_split(text,' '), x -> x <> ''), w -> w IN ('el','la','de','los','y'))) AS BIGINT) AS c_es,
          CAST(len(list_filter(list_filter(string_split(text,' '), x -> x <> ''), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS c_de,
          CAST(len(list_filter(list_filter(string_split(text,' '), x -> x <> ''), w -> w IN ('le','les','des','et','une'))) AS BIGINT) AS c_fr
        FROM documents) t),
    cells AS (SELECT lang, pred, CAST(count(*) AS HUGEINT) AS n FROM p GROUP BY 1, 2),
    r AS (SELECT lang, sum(n) AS r FROM cells GROUP BY 1),
    c AS (SELECT pred, sum(n) AS c FROM cells GROUP BY 1),
    pe AS (SELECT coalesce(sum(r.r * c.c), 0) AS pe2
           FROM r JOIN c ON r.lang = c.pred),
    a AS (SELECT sum(n) AS n,
                 sum(CASE WHEN lang = pred THEN n ELSE 0 END) AS agree
          FROM cells)
    SELECT CAST(n AS BIGINT) AS n_docs, CAST(agree AS BIGINT) AS n_agree,
      CAST((1000000 * (n * agree - pe2)) // (n * n - pe2) AS BIGINT) AS kappa_ppm
    FROM a CROSS JOIN pe
  """))

  /** Derandomized paired permutation test on the same daily
    * click−view revenue differences as q_wilcoxon: 64 sign-flip
    * replicas whose signs come from the replayable rolling
    * fingerprint (the q_bootstrap convention — reproducible across
    * engines, runs and partitionings, disclosed non-secret
    * randomness), T_r = Σ_d s(d,r)·diff_d against the observed
    * T₀ = Σ_d diff_d. Every statistic is an exact cents sum; the
    * p-value is a count of replicas with |T_r| ≥ |T₀| over 64,
    * also emitted as ppm by one integral division.
    *
    * Scale shape: (day)-grain diffs (calendar-bounded) × 64 explode →
    * one 64-group partial-aggregated shuffle — constant output, linear
    * scan, no window (the q_bootstrap shape exactly). */
  private val qPermutationTest = BoundQuery("q_permutation_test", (s, d) => {
    import graft.functions.TextFunctions.rollingFingerprint
    val daily = Tables.events(s, d)
      .where(col("event_type").isin("click", "view"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg((sum(when(col("event_type") === "click", cents(col("value"))).otherwise(0L))
        - sum(when(col("event_type") === "view", cents(col("value"))).otherwise(0L)))
        .as("diff"))
    val t0 = daily.agg(sum(col("diff")).as("t0"), count(lit(1)).as("n_days"))
    val reps = daily
      .select(col("day"), col("diff"), explode(sequence(lit(0L), lit(63L))).as("r"))
      .withColumn("sgn",
        when(pmod(rollingFingerprint(concat_ws("|", col("day"), col("r"))),
          lit(2L)) === 0L, 1L).otherwise(-1L))
      .groupBy("r").agg(sum(col("sgn") * col("diff")).as("tr"))
    reps.crossJoin(broadcast(t0))
      .agg(max(col("n_days")).as("n_days"), max(col("t0")).as("t0_cents"),
        sum(when(abs(col("tr")) >= abs(col("t0")), 1L).otherwise(0L)).as("n_extreme"))
      .select(col("n_days"), col("t0_cents"), col("n_extreme"),
        expr("(1000000 * n_extreme) div 64").as("p_ppm"))
  }, Some("""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
        sum(CASE WHEN event_type = 'click'
                 THEN CAST(round(value*100, 0) AS BIGINT) ELSE 0 END)
        - sum(CASE WHEN event_type = 'view'
                   THEN CAST(round(value*100, 0) AS BIGINT) ELSE 0 END) AS diff
      FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
    t0 AS (SELECT CAST(sum(diff) AS BIGINT) AS t0,
                  CAST(count(*) AS BIGINT) AS n_days FROM daily),
    reps AS (
      SELECT day, diff, unnest(range(0, 64)) AS r FROM daily),
    sg AS (
      SELECT r, diff,
        CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, len(CAST(day AS VARCHAR) || '|'
                || CAST(r AS VARCHAR)) + 1),
              i -> CAST(ascii(substring(CAST(day AS VARCHAR) || '|'
                || CAST(r AS VARCHAR), i, 1)) AS BIGINT))),
            (a, c) -> (a*31 + c) % 1000000007) % 2 = 0
          THEN 1 ELSE -1 END AS sgn
      FROM reps),
    tr AS (SELECT r, CAST(sum(sgn * diff) AS BIGINT) AS tr FROM sg GROUP BY r)
    SELECT max(n_days) AS n_days, max(t0) AS t0_cents,
      CAST(sum(CASE WHEN abs(tr) >= abs(t0) THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
      CAST((1000000 * sum(CASE WHEN abs(tr) >= abs(t0) THEN 1 ELSE 0 END)) // 64 AS BIGINT) AS p_ppm
    FROM tr CROSS JOIN t0
  """))

  /** McNemar paired test: does TRUNCATING documents to their first
    * 120 characters change the langid heuristic's accuracy against
    * the stored label? The b/c discordant cells (full-right &
    * trunc-wrong vs full-wrong & trunc-right) carry ALL the signal —
    * concordant cells cancel out of the paired test, which is why
    * McNemar beats two independent accuracy readouts on the SAME
    * documents. χ² = (b−c)²/(b+c) in exact milli-units (integer
    * numerator, one truncating division; sqrt-free like q_wilcoxon);
    * χ²_milli ≥ 3841 rejects at α=0.05.
    *
    * The ablation is the capacity question every truncation-based
    * curation shortcut asks: can the expensive full-document pass be
    * replaced by a prefix pass?
    *
    * Scale shape: both predictors are codegen'd array math in ONE
    * documents scan reduced to 4 counters — no join, no window, no
    * shuffle beyond the final 1-row agg. */
  private val qMcNemar = BoundQuery("q_mcnemar", (s, d) => {
    import graft.functions.TextFunctions.{langId, tokens}
    val full = langId(tokens(col("text"))) === col("lang")
    val trunc = langId(tokens(substring(col("text"), 1, 120))) === col("lang")
    Tables.documents(s, d)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(full && !trunc, 1L).otherwise(0L)).as("b"),
        sum(when(!full && trunc, 1L).otherwise(0L)).as("c"),
        sum(when(full, 1L).otherwise(0L)).as("full_correct"),
        sum(when(trunc, 1L).otherwise(0L)).as("trunc_correct"))
      .select(col("n_docs"), col("full_correct"), col("trunc_correct"),
        col("b"), col("c"),
        expr("""CASE WHEN b + c > 0
                THEN CAST((1000 * (b - c) * (b - c)) div (b + c) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END""").as("chi2_milli"))
  }, Some("""
    WITH p AS (
      SELECT lang,
        CASE WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
             WHEN c_es > 0 AND c_es >= c_de AND c_es >= c_fr THEN 'es'
             WHEN c_de > 0 AND c_de >= c_fr THEN 'de'
             WHEN c_fr > 0 THEN 'fr' ELSE 'und' END = lang AS full_ok,
        CASE WHEN t_en > 0 AND t_en >= t_es AND t_en >= t_de AND t_en >= t_fr THEN 'en'
             WHEN t_es > 0 AND t_es >= t_de AND t_es >= t_fr THEN 'es'
             WHEN t_de > 0 AND t_de >= t_fr THEN 'de'
             WHEN t_fr > 0 THEN 'fr' ELSE 'und' END = lang AS trunc_ok
      FROM (
        SELECT lang,
          len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''), w -> w IN ('the','a','of','and','to'))) AS c_en,
          len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''), w -> w IN ('el','la','de','los','y'))) AS c_es,
          len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''), w -> w IN ('der','die','das','und','ist'))) AS c_de,
          len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''), w -> w IN ('le','les','des','et','une'))) AS c_fr,
          len(list_filter(list_filter(string_split(substring(text, 1, 120), ' '), x -> x <> ''), w -> w IN ('the','a','of','and','to'))) AS t_en,
          len(list_filter(list_filter(string_split(substring(text, 1, 120), ' '), x -> x <> ''), w -> w IN ('el','la','de','los','y'))) AS t_es,
          len(list_filter(list_filter(string_split(substring(text, 1, 120), ' '), x -> x <> ''), w -> w IN ('der','die','das','und','ist'))) AS t_de,
          len(list_filter(list_filter(string_split(substring(text, 1, 120), ' '), x -> x <> ''), w -> w IN ('le','les','des','et','une'))) AS t_fr
        FROM documents))
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN full_ok THEN 1 ELSE 0 END) AS BIGINT) AS full_correct,
      CAST(sum(CASE WHEN trunc_ok THEN 1 ELSE 0 END) AS BIGINT) AS trunc_correct,
      CAST(sum(CASE WHEN full_ok AND NOT trunc_ok THEN 1 ELSE 0 END) AS BIGINT) AS b,
      CAST(sum(CASE WHEN NOT full_ok AND trunc_ok THEN 1 ELSE 0 END) AS BIGINT) AS c,
      CASE WHEN sum(CASE WHEN full_ok AND NOT trunc_ok THEN 1 ELSE 0 END)
              + sum(CASE WHEN NOT full_ok AND trunc_ok THEN 1 ELSE 0 END) > 0
        THEN CAST((1000 * (sum(CASE WHEN full_ok AND NOT trunc_ok THEN 1 ELSE 0 END)
                           - sum(CASE WHEN NOT full_ok AND trunc_ok THEN 1 ELSE 0 END))
                        * (sum(CASE WHEN full_ok AND NOT trunc_ok THEN 1 ELSE 0 END)
                           - sum(CASE WHEN NOT full_ok AND trunc_ok THEN 1 ELSE 0 END)))
                  // (sum(CASE WHEN full_ok AND NOT trunc_ok THEN 1 ELSE 0 END)
                      + sum(CASE WHEN NOT full_ok AND trunc_ok THEN 1 ELSE 0 END)) AS BIGINT)
        ELSE CAST(0 AS BIGINT) END AS chi2_milli
    FROM p
  """))

  /** Sample-ratio-mismatch (SRM) audit of q_train_split's md5
    * assignment: the first gate every experimentation/split pipeline
    * runs — do the observed train/val/test counts match the designed
    * 204:26:26 /256 weights? Per split the χ² term in exact
    * milli-units via the cleared-denominator identity
    * (O − wn/256)²/ (wn/256) = (256·O − w·n)² / (256·w·n); the total
    * χ²_milli (df = 2, reject at α=0.05 above 5991) repeats on each
    * row from a 1-row crossJoin. (256·O)² reaches ~1.7e20 at 100×
    * sf1, so the square runs in decimal(38,0) / HUGEINT.
    *
    * Scale shape: ONE md5-bucket scan partial-aggregated to 3 rows;
    * everything after is constant-size. */
  private val qAbSrm = BoundQuery("q_ab_srm", (s, d) => {
    val h = substring(md5(col("text")), 1, 2)
    val dec = "decimal(38,0)"
    val obs = Tables.documents(s, d)
      .select(when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
        .as("split"))
      .groupBy("split").agg(count(lit(1)).as("n_obs"))
      .withColumn("w",
        when(col("split") === "train", 204L)
          .when(col("split") === "val", 26L).otherwise(26L))
    val tot = obs.agg(sum(col("n_obs")).as("n"))
    val terms = obs.crossJoin(broadcast(tot))
      .select(col("split"), col("n_obs"), col("w"), col("n"),
        expr(s"""CAST((1000 * CAST(256 * n_obs - w * n AS $dec)
                           * CAST(256 * n_obs - w * n AS $dec))
                 div (256 * CAST(w AS $dec) * n) AS BIGINT)""").as("term_milli"))
    val chi2 = terms.agg(sum(col("term_milli")).as("chi2_milli"))
    terms.crossJoin(broadcast(chi2))
      .select(col("split"), col("n_obs"),
        expr("CAST((1000000 * w) div 256 AS BIGINT)").as("expected_ppm"),
        expr("CAST((1000000 * n_obs) div n AS BIGINT)").as("observed_ppm"),
        col("term_milli"), col("chi2_milli"))
      .orderBy("split")
  }, Some("""
    WITH obs AS (
      SELECT CASE WHEN substr(md5(text),1,2) < 'cc' THEN 'train'
                  WHEN substr(md5(text),1,2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split,
        CAST(count(*) AS BIGINT) AS n_obs
      FROM documents GROUP BY 1),
    w AS (SELECT split, n_obs,
            CAST(CASE WHEN split = 'train' THEN 204 ELSE 26 END AS BIGINT) AS w
          FROM obs),
    tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
    terms AS (
      SELECT split, n_obs, w, n,
        CAST((1000 * CAST(256 * n_obs - w * n AS HUGEINT)
                   * CAST(256 * n_obs - w * n AS HUGEINT))
             // (256 * CAST(w AS HUGEINT) * n) AS BIGINT) AS term_milli
      FROM w CROSS JOIN tot),
    chi2 AS (SELECT CAST(sum(term_milli) AS BIGINT) AS chi2_milli FROM terms)
    SELECT split, n_obs,
      CAST((1000000 * w) // 256 AS BIGINT) AS expected_ppm,
      CAST((1000000 * n_obs) // n AS BIGINT) AS observed_ppm,
      term_milli, chi2_milli
    FROM terms CROSS JOIN chi2
    ORDER BY split
  """))

  /** Mann–Whitney U (Wilcoxon RANK-SUM — the independent-samples
    * twin of q_wilcoxon's paired signed-rank): do BUILDING-segment
    * and MACHINERY-segment customers draw order values from the same
    * distribution? Midranks come from the DISTINCT-VALUE grain —
    * 2·midrank = 2·F_before + c + 1 is integer by construction, and
    * the cumulative count F rides Ranking.globalCumSum (two-phase,
    * no single-partition window over millions of distinct cents
    * values). With A = 2U − n_a·n_b and the tie-corrected
    * 12σ² = n_a·n_b·((n+1)·n(n−1) − Σ(t³−t)) / (n(n−1)), the signed
    * squared statistic clears to
    *   z2_milli = sign(A) · (3000·n(n−1)·A²)
    *              div (n_a·n_b·((n+1)·n(n−1) − T))
    * — exact decimal products end to end, one truncating division.
    * |z| ≥ 1.96 ⇔ |z2_milli| ≥ 3842. */
  private val qMannWhitney = BoundQuery("q_mann_whitney", (s, d) => {
    val vals = Tables.orders(s, d)
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(graft.functions.Num.cents(col("o_totalprice")).as("v"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("ia"))
    val perValue = vals.groupBy("v")
      .agg(sum(col("ia")).as("ca"), sum(lit(1L) - col("ia")).as("cb"),
        count(lit(1)).as("c"))
    val cum = graft.operators.Ranking.globalCumSum(
      perValue, col("c"), "cumc", col("v"))
    val m = cum.agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      // 2R_A = Σ ca·(2F + c + 1) with F = inclusive cumsum − c
      sum(col("ca").cast("decimal(38,0)")
        * (lit(2) * (col("cumc") - col("c")) + col("c") + 1)).as("r2a"),
      sum(col("c").cast("decimal(38,0)") * col("c") * col("c") - col("c"))
        .as("t3t"))
    m.select(col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        // 2U = 2R_A − n_a(n_a+1); A = 2U − n_a·n_b
        (col("r2a") - col("na").cast("decimal(38,0)") * (col("na") + 1)
          - col("na").cast("decimal(38,0)") * col("nb")).as("aa"),
        col("t3t"), (col("na") + col("nb")).cast("decimal(38,0)").as("n"))
      .select(col("n_a"), col("n_b"),
        col("aa").cast("long").as("a_stat"),
        expr("""CAST(CASE WHEN aa < 0 THEN -1 ELSE 1 END * (
            (3000 * n * (n - 1) * aa * aa)
            div (CAST(n_a AS DECIMAL(38,0)) * n_b
                 * ((n + 1) * n * (n - 1) - t3t))) AS BIGINT)""")
          .as("z2_milli"))
  }, Some("""
    WITH vals AS (
      SELECT CAST(round(o_totalprice*100, 0) AS BIGINT) AS v,
        CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ia
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
    pv AS (
      SELECT v, CAST(sum(ia) AS BIGINT) AS ca,
        CAST(sum(1 - ia) AS BIGINT) AS cb,
        CAST(count(*) AS BIGINT) AS c
      FROM vals GROUP BY 1),
    cum AS (
      SELECT *, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cumc FROM pv),
    m AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
        CAST(sum(CAST(ca AS HUGEINT) * (2*(cumc - c) + c + 1)) AS HUGEINT) AS r2a,
        CAST(sum(CAST(c AS HUGEINT)*c*c - c) AS HUGEINT) AS t3t
      FROM cum),
    fin AS (
      SELECT na AS n_a, nb AS n_b,
        r2a - CAST(na AS HUGEINT)*(na + 1) - CAST(na AS HUGEINT)*nb AS aa,
        t3t, CAST(na + nb AS HUGEINT) AS n
      FROM m)
    SELECT n_a, n_b, CAST(aa AS BIGINT) AS a_stat,
      CAST(CASE WHEN aa < 0 THEN -1 ELSE 1 END * (
        (3000 * n * (n - 1) * aa * aa)
        // (CAST(n_a AS HUGEINT) * n_b * ((n + 1) * n * (n - 1) - t3t)))
        AS BIGINT) AS z2_milli
    FROM fin
  """))

  /** Cliff's delta (Cliff 1993) — the ordinal effect size that pairs
    * with q_mann_whitney the way q_cohens_d pairs with q_ab_test:
    * "how big", where the rank-sum z answers "how sure".
    * δ = P(x>y) − P(x<y) = (2U − n_a·n_b)/(n_a·n_b) with the SAME
    * midrank machinery (2·midrank = 2F + c + 1 over distinct values,
    * cumulative counts via globalCumSum), so δ is one exact integer
    * A = 2U − n_a·n_b cleared to ppm by a single truncating division.
    * |δ| ≥ 0.474 is Romano's "large". */
  private val qCliffsDelta = BoundQuery("q_cliffs_delta", (s, d) => {
    val vals = Tables.orders(s, d)
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(graft.functions.Num.cents(col("o_totalprice")).as("v"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("ia"))
    val perValue = vals.groupBy("v")
      .agg(sum(col("ia")).as("ca"), sum(lit(1L) - col("ia")).as("cb"),
        count(lit(1)).as("c"))
    val cum = graft.operators.Ranking.globalCumSum(
      perValue, col("c"), "cumc", col("v"))
    cum.agg(
        sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        sum(col("ca").cast("decimal(38,0)")
          * (lit(2) * (col("cumc") - col("c")) + col("c") + 1)).as("r2a"))
      .select(col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        (col("r2a") - col("na").cast("decimal(38,0)") * (col("na") + 1)
          - col("na").cast("decimal(38,0)") * col("nb")).as("aa"),
        col("na").cast("decimal(38,0)").as("nn"),
        col("nb").cast("decimal(38,0)").as("md"))
      .select(col("n_a"), col("n_b"),
        expr("CAST((1000000 * aa) div (nn * md) AS BIGINT)").as("delta_ppm"))
  }, Some("""
    WITH vals AS (
      SELECT CAST(round(o_totalprice*100, 0) AS BIGINT) AS v,
        CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ia
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
    pv AS (
      SELECT v, CAST(sum(ia) AS BIGINT) AS ca,
        CAST(sum(1 - ia) AS BIGINT) AS cb,
        CAST(count(*) AS BIGINT) AS c
      FROM vals GROUP BY 1),
    cum AS (
      SELECT *, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cumc FROM pv),
    m AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
        CAST(sum(CAST(ca AS HUGEINT) * (2*(cumc - c) + c + 1)) AS HUGEINT) AS r2a
      FROM cum)
    SELECT na AS n_a, nb AS n_b,
      CAST((1000000 * (r2a - CAST(na AS HUGEINT)*(na + 1)
            - CAST(na AS HUGEINT)*nb))
        // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS delta_ppm
    FROM m
  """))

  val all: Seq[BoundQuery] = Seq(qAr1, qWilcoxon, qAqpEstimate, qBurstiness,
    qCohenKappa, qPermutationTest, qMcNemar, qAbSrm, qMannWhitney,
    qCliffsDelta)
}
