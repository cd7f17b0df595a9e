package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 nonparametric-testing wave: the k-sample rank tests
  * (Kruskal–Wallis, Friedman) and the median-based robustness tests
  * (Brown–Forsythe, Mood's median) — closing the gap between the
  * two-sample family (q_wilcoxon, q_ks_test) and the parametric
  * k-sample family (q_anova). These are the tests an analyst reaches
  * for when q_anova's normality assumption is exactly what's in
  * question — heavy-tailed revenue distributions at corpus scale.
  *
  * Numeric rule (the StatsQueries contract): exact long /
  * decimal(38,0) aggregates, integral divisions last to ppm/milli,
  * doubled ranks for exact tie handling (2·avgrank = 2·minrank +
  * ties − 1, the q_spearman identity), every ORDER BY with a unique
  * tie-break.
  */
object StatsQueries3 {

  /** Kruskal–Wallis k-sample rank test: do the k event types draw
    * their DAILY REVENUE from the same distribution? The rank-based
    * one-way ANOVA — q_anova's distribution-free sibling and
    * q_wilcoxon's k-sample extension. Observations are the
    * (type, day) daily cents totals, ranked globally with doubled
    * ranks so tied days cost nothing in exactness.
    *
    * With Rg2 the per-group sum of DOUBLED average ranks and
    * B = Σ_g (Rg2² div n_g) (one truncating division per group,
    * error < 1 — the q_anova normalization), the statistic
    * H = 3·(B − N(N+1)²) / (N(N+1)) is emitted as h_ppm, and the
    * tie-corrected H′ = H / (1 − ΣT/(N³−N)) as
    * h_tie_ppm = 3e6·(B − N(N+1)²)·(N³−N) div (N(N+1)·(N³−N−ΣT)),
    * T = t³−t over tied |y| multiplicities. χ²₍k₋₁₎ threshold at
    * k=5: h_tie_ppm ≥ 9.49e6 rejects at 5%.
    *
    * Scale shape: one map-side-combined (type, day) preagg collapses
    * any event volume to the CALENDAR×k grain; the global rank window
    * runs over those ≤ 366·k rows under the documented
    * bounded-domain contract (the q_wilcoxon quarantine); the rest is
    * a k-row groupBy and a scalar reduction. */
  private val qKruskalWallis = BoundQuery("q_kruskal_wallis", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))
    val ranked = daily.withColumn("r2",
      lit(2L) * rank().over(Window.orderBy("y")).cast("long") +
        count(lit(1)).over(Window.partitionBy("y")) - 1L)
    val grp = ranked.groupBy("event_type")
      .agg(count(lit(1)).as("ng"), sum(col("r2")).as("rg2"))
    val ties = daily.groupBy("y").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * col("t") * col("t") - col("t")), lit(0L))
        .as("tie3"))
    grp.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(expr("(CAST(rg2 AS DECIMAL(38,0)) * rg2) div ng")
          .cast("decimal(38,0)")).as("b"))
      .crossJoin(ties)
      .select(col("k"), col("n").as("n_obs"), col("tie3"),
        expr("""CAST((3000000 * (b - CAST(n AS DECIMAL(38,0))*(n+1)*(n+1)))
                     div (CAST(n AS DECIMAL(38,0))*(n+1)) AS BIGINT)""")
          .as("h_ppm"),
        expr("""CAST((3000000 * (b - CAST(n AS DECIMAL(38,0))*(n+1)*(n+1))
                        * (CAST(n AS DECIMAL(38,0))*n*n - n))
                     div (CAST(n AS DECIMAL(38,0))*(n+1)
                          * (CAST(n AS DECIMAL(38,0))*n*n - n - tie3))
                     AS BIGINT)""").as("h_tie_ppm"))
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT event_type,
        2*CAST(rank() OVER (ORDER BY y) AS BIGINT)
          + CAST(count(*) OVER (PARTITION BY y) AS BIGINT) - 1 AS r2
      FROM daily),
    grp AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
        CAST(sum(r2) AS BIGINT) AS rg2
      FROM ranked GROUP BY 1),
    ties AS (
      SELECT CAST(coalesce(sum(t*t*t - t), 0) AS BIGINT) AS tie3 FROM (
        SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY y) x),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        sum((CAST(rg2 AS HUGEINT) * rg2) // ng) AS b
      FROM grp)
    SELECT k, n AS n_obs, tie3,
      CAST((3000000 * (b - CAST(n AS HUGEINT)*(n+1)*(n+1)))
           // (CAST(n AS HUGEINT)*(n+1)) AS BIGINT) AS h_ppm,
      CAST((3000000 * (b - CAST(n AS HUGEINT)*(n+1)*(n+1))
              * (CAST(n AS HUGEINT)*n*n - n))
           // (CAST(n AS HUGEINT)*(n+1)
              * (CAST(n AS HUGEINT)*n*n - n - tie3)) AS BIGINT) AS h_tie_ppm
    FROM agg CROSS JOIN ties
  """))

  /** Friedman repeated-measures rank test: ranking the k event types
    * WITHIN each day (blocks = complete calendar days carrying all k
    * types), does any type consistently out-earn the others
    * day-after-day? The blocked companion of q_kruskal_wallis — it
    * cancels day-level effects (weekends, promos) that inflate the
    * unblocked test.
    *
    * Fully integer-exact, no per-group division at all: with
    * S = Σ_type (Σ_days r2)² over doubled within-day ranks,
    * χ² = 3·(S − n²k(k+1)²)/(nk(k+1)) → chi2_ppm, and the
    * tie-corrected form multiplies through by (k−1):
    * chi2_tie_ppm = 3e6·(S − n²k(k+1)²)·(k−1) div (nk(k²−1) − ΣT),
    * ΣT = Σ_blocks Σ(t³−t). χ²₍k₋₁₎ at k=5: ≥ 9.49e6 rejects at 5%.
    *
    * Scale shape: the (type, day) preagg collapses volume to the
    * calendar grain; the rank window partitions BY DAY over exactly k
    * rows per partition — no bounded-domain quarantine even needed,
    * this window is scale-safe verbatim; then a k-row groupBy and a
    * scalar reduction. */
  private val qFriedman = BoundQuery("q_friedman", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))
    val k0 = daily.groupBy("day").agg(count(lit(1)).as("kk"))
    val kmax = k0.agg(max(col("kk")).as("k"))
    val complete = daily.join(broadcast(k0.crossJoin(kmax)
      .where(col("kk") === col("k")).select("day")), Seq("day"))
    val wDay = Window.partitionBy("day")
    val ranked = complete.withColumn("r2",
      lit(2L) * rank().over(wDay.orderBy("y")).cast("long") +
        count(lit(1)).over(Window.partitionBy("day", "y")) - 1L)
    val tieB = ranked.groupBy("day", "y").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * col("t") * col("t") - col("t")), lit(0L))
        .as("tie3"))
    val grp = ranked.groupBy("event_type").agg(sum(col("r2")).as("rj2"),
      count(lit(1)).as("nb"))
    grp.agg(count(lit(1)).as("k"), max(col("nb")).as("n"),
        sum(expr("CAST(rj2 AS DECIMAL(38,0)) * rj2").cast("decimal(38,0)"))
          .as("s2"))
      .crossJoin(tieB)
      .select(col("k"), col("n").as("n_blocks"), col("tie3"),
        expr("""CAST((3000000 * (s2 - CAST(n AS DECIMAL(38,0))*n*k*(k+1)*(k+1)))
                     div (CAST(n AS DECIMAL(38,0))*k*(k+1)) AS BIGINT)""")
          .as("chi2_ppm"),
        expr("""CAST((3000000 * (s2 - CAST(n AS DECIMAL(38,0))*n*k*(k+1)*(k+1))
                        * (k - 1))
                     div (CAST(n AS DECIMAL(38,0))*k*(k*k - 1) - tie3)
                     AS BIGINT)""").as("chi2_tie_ppm"))
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    kk AS (SELECT day, count(*) AS c FROM daily GROUP BY 1),
    km AS (SELECT max(c) AS k FROM kk),
    complete AS (
      SELECT d.* FROM daily d JOIN kk ON d.day = kk.day
      CROSS JOIN km WHERE kk.c = km.k),
    ranked AS (
      SELECT event_type, day,
        2*CAST(rank() OVER (PARTITION BY day ORDER BY y) AS BIGINT)
          + CAST(count(*) OVER (PARTITION BY day, y) AS BIGINT) - 1 AS r2
      FROM complete),
    tieb AS (
      SELECT CAST(coalesce(sum(t*t*t - t), 0) AS BIGINT) AS tie3 FROM (
        SELECT CAST(count(*) AS BIGINT) AS t FROM complete
        GROUP BY day, y) x),
    grp AS (
      SELECT event_type, CAST(sum(r2) AS BIGINT) AS rj2,
        CAST(count(*) AS BIGINT) AS nb
      FROM ranked GROUP BY 1),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(max(nb) AS BIGINT) AS n,
        sum(CAST(rj2 AS HUGEINT) * rj2) AS s2
      FROM grp)
    SELECT k, n AS n_blocks, tie3,
      CAST((3000000 * (s2 - CAST(n AS HUGEINT)*n*k*(k+1)*(k+1)))
           // (CAST(n AS HUGEINT)*k*(k+1)) AS BIGINT) AS chi2_ppm,
      CAST((3000000 * (s2 - CAST(n AS HUGEINT)*n*k*(k+1)*(k+1)) * (k - 1))
           // (CAST(n AS HUGEINT)*k*(k*k - 1) - tie3) AS BIGINT)
        AS chi2_tie_ppm
    FROM agg CROSS JOIN tieb
  """))

  /** Brown–Forsythe variance-homogeneity test: do the k order
    * priorities have the same SPREAD of order value (not the same
    * mean — q_anova's question)? The robust Levene variant: one-way
    * ANOVA on |x − median_g|, whose median centering keeps the test
    * honest under the heavy-tailed totals that wreck the classic
    * (mean-based) Levene.
    *
    * Group medians are PICKED exactly on the whole-dollar value
    * domain (type-1 lower median = ⌈n/2⌉-th smallest, the q_decile
    * convention): the per-(priority, dollar) count table cumulates per
    * group and the first value reaching the threshold is the median —
    * and because |x − med| depends only on (value, count), the
    * deviation moments come from the SAME count table, no second
    * scan. F then follows the q_anova integer machinery on deviation
    * dollars: bsum = Σ(Sg² div ng), f_ppm one final division.
    * F₍₄,∞₎ at 5%: f_ppm ≥ 2.37e6 rejects.
    *
    * Scale shape: one map-side-combined groupBy to the (k × dollar
    * domain) grain (≤ 5·5e5 rows at ANY sf — domain-bounded, the
    * q_decision_stump contract); cumulative windows partition per
    * priority over that bounded domain; then k-row aggs. Row volume
    * never reaches a window. */
  private val qBrownForsythe = BoundQuery("q_brown_forsythe", (s, d) => {
    val byVal = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"),
        round(col("o_totalprice"), 0).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wg = Window.partitionBy("o_orderpriority").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("o_orderpriority")
    val med = byVal
      .withColumn("cum", sum(col("cnt")).over(wg))
      .withColumn("ng", sum(col("cnt")).over(wAll))
      .where(col("cum") >= expr("(ng + 1) div 2") &&
        col("cum") - col("cnt") < expr("(ng + 1) div 2"))
      .select(col("o_orderpriority"), col("v").as("med"))
    val gm = byVal.join(med, Seq("o_orderpriority"))
      .withColumn("z", abs(col("v") - col("med")))
      .groupBy(col("o_orderpriority"), col("med"))
      .agg(sum(col("cnt")).as("ng"),
        sum(col("cnt") * col("z")).as("sg"),
        sum(col("cnt").cast("decimal(38,0)") * col("z") * col("z")).as("qg"))
    val f = gm.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("sg")).as("s"), sum(col("qg")).as("q"),
        sum(expr("(CAST(sg AS DECIMAL(38,0)) * sg) div ng")
          .cast("decimal(38,0)")).as("bsum"))
      .select(expr("""CAST((1000000 * (bsum - (CAST(s AS DECIMAL(38,0)) * s) div n)
                              * (n - k))
                           div (CAST((q - bsum) AS DECIMAL(38,0)) * (k - 1))
                           AS BIGINT)""").as("f_ppm"))
    gm.select(col("o_orderpriority"), col("ng"), col("med").as("med_usd"),
        col("sg").as("sum_absdev_usd"))
      .crossJoin(broadcast(f))
      .orderBy("o_orderpriority")
  }, Some("""
    WITH byval AS (
      SELECT o_orderpriority, CAST(round(o_totalprice, 0) AS BIGINT) AS v,
        CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2),
    cums AS (
      SELECT *, sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        sum(cnt) OVER (PARTITION BY o_orderpriority) AS ng
      FROM byval),
    med AS (
      SELECT o_orderpriority, v AS med FROM cums
      WHERE cum >= (ng + 1) // 2 AND cum - cnt < (ng + 1) // 2),
    gm AS (
      SELECT b.o_orderpriority, m.med, CAST(sum(cnt) AS BIGINT) AS ng,
        CAST(sum(cnt * abs(v - med)) AS BIGINT) AS sg,
        sum(CAST(cnt AS HUGEINT) * abs(v - med) * abs(v - med)) AS qg
      FROM byval b JOIN med m ON b.o_orderpriority = m.o_orderpriority
      GROUP BY 1, 2),
    f AS (
      SELECT CAST((1000000 * (sum((CAST(sg AS HUGEINT) * sg) // ng)
                     - (CAST(sum(sg) AS HUGEINT) * sum(sg)) // sum(ng))
                     * (sum(ng) - count(*)))
                  // (CAST(sum(qg) - sum((CAST(sg AS HUGEINT) * sg) // ng)
                        AS HUGEINT) * (count(*) - 1)) AS BIGINT) AS f_ppm
      FROM gm)
    SELECT o_orderpriority, ng, med AS med_usd, sg AS sum_absdev_usd, f_ppm
    FROM gm CROSS JOIN f ORDER BY o_orderpriority
  """))

  /** Mood's median test: split every order at the GRAND median value
    * and chi-square the above/below counts across the k priorities —
    * the coarsest, most outlier-proof "does location differ?" test
    * (it only consumes each value's side of one global cut). The
    * robustness triangle closes: q_anova (means), q_kruskal_wallis
    * (ranks), q_moods_median (signs).
    *
    * The grand median is picked exactly on the whole-dollar domain
    * (lower median, as q_brown_forsythe per group). With per-group
    * above-counts O_g, group sizes n_g, total above A (below B = N−A):
    * each χ² cell expands engine-exactly to
    * (N·O − n_g·A)² / (N·n_g·A) — the q_ab_srm pattern — summed over
    * both cells into term_milli per group and chi2_milli total.
    * χ²₍k₋₁₎ at k=5: chi2_milli ≥ 9488 rejects at 5%.
    *
    * Scale shape: the same domain-bounded count table as
    * q_brown_forsythe, one global cumulation over ≤ 5e5 domain rows
    * (bounded-domain contract), then a k-row conditional agg and
    * 5-row arithmetic. No raw row ever reaches a window or join. */
  private val qMoodsMedian = BoundQuery("q_moods_median", (s, d) => {
    val byVal = Tables.orders(s, d)
      .groupBy(round(col("o_totalprice"), 0).cast("long").as("v"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
    val byValAll = byVal.groupBy("v").agg(sum(col("cnt")).as("cnt"))
    val wv = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gmed = byValAll
      .withColumn("cum", sum(col("cnt")).over(wv))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .where(col("cum") >= expr("(n + 1) div 2") &&
        col("cum") - col("cnt") < expr("(n + 1) div 2"))
      .select(col("v").as("gmed"))
    val grp = byVal.crossJoin(broadcast(gmed))
      .groupBy("o_orderpriority", "gmed")
      .agg(sum(col("cnt")).as("ng"),
        sum(when(col("v") > col("gmed"), col("cnt")).otherwise(0L)).as("og"))
    val tot = grp.agg(sum(col("ng")).as("n"), sum(col("og")).as("a"))
    val terms = grp.crossJoin(broadcast(tot))
      .withColumn("term_milli", expr(
        """CAST((1000 * (CAST(n AS DECIMAL(38,0))*og - ng*a)
                      * (CAST(n AS DECIMAL(38,0))*og - ng*a))
                div (CAST(n AS DECIMAL(38,0)) * ng * a) AS BIGINT)
           + CAST((1000 * (CAST(n AS DECIMAL(38,0))*(ng-og) - ng*(n-a))
                        * (CAST(n AS DECIMAL(38,0))*(ng-og) - ng*(n-a)))
                  div (CAST(n AS DECIMAL(38,0)) * ng * (n-a)) AS BIGINT)"""))
    val chi2 = terms.agg(sum(col("term_milli")).as("chi2_milli"))
    terms.select(col("o_orderpriority"), col("gmed").as("grand_med_usd"),
        col("ng"), col("og").as("n_above"), (col("ng") - col("og")).as("n_below"),
        col("term_milli"))
      .crossJoin(broadcast(chi2))
      .orderBy("o_orderpriority")
  }, Some("""
    WITH byval AS (
      SELECT CAST(round(o_totalprice, 0) AS BIGINT) AS v, o_orderpriority,
        CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2),
    byvala AS (SELECT v, sum(cnt) AS cnt FROM byval GROUP BY 1),
    cums AS (
      SELECT v, cnt,
        sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS cum,
        sum(cnt) OVER () AS n
      FROM byvala),
    gmed AS (
      SELECT v AS gmed FROM cums
      WHERE cum >= (n + 1) // 2 AND cum - cnt < (n + 1) // 2),
    grp AS (
      SELECT o_orderpriority, gmed, CAST(sum(cnt) AS BIGINT) AS ng,
        CAST(sum(CASE WHEN v > gmed THEN cnt ELSE 0 END) AS BIGINT) AS og
      FROM byval CROSS JOIN gmed GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(og) AS BIGINT) AS a
            FROM grp),
    terms AS (
      SELECT o_orderpriority, gmed, ng, og, n, a,
        CAST((1000 * (CAST(n AS HUGEINT)*og - ng*a)
                   * (CAST(n AS HUGEINT)*og - ng*a))
             // (CAST(n AS HUGEINT) * ng * a) AS BIGINT)
        + CAST((1000 * (CAST(n AS HUGEINT)*(ng-og) - ng*(n-a))
                     * (CAST(n AS HUGEINT)*(ng-og) - ng*(n-a)))
               // (CAST(n AS HUGEINT) * ng * (n-a)) AS BIGINT) AS term_milli
      FROM grp CROSS JOIN tot),
    chi2 AS (SELECT CAST(sum(term_milli) AS BIGINT) AS chi2_milli FROM terms)
    SELECT o_orderpriority, gmed AS grand_med_usd, ng, og AS n_above,
      ng - og AS n_below, term_milli, chi2_milli
    FROM terms CROSS JOIN chi2 ORDER BY o_orderpriority
  """))

  val all: Seq[BoundQuery] =
    Seq(qKruskalWallis, qFriedman, qBrownForsythe, qMoodsMedian)
}
