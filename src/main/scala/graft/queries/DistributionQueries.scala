package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 distribution wave (r5): sequential testing (SPRT),
  * distribution distance (binned 1-Wasserstein), extreme-value block
  * maxima (Gumbel moment fit), boxplot fences (Tukey), and
  * recommendation coverage/novelty — the distributional instruments
  * around the existing KS/PSI/EVT-Hill family.
  *
  * Exactness: counts and cumulative mass are integer-cleared; float
  * folds walk a PINNED order (sorted day lists, the q_ewma rule);
  * closed-form finishes are identical double trees with shared
  * frozen literals (π, γ as written constants on both engines).
  */
object DistributionQueries {

  /** Wald's sequential probability ratio test per event type, walked
    * day by day (Wald 1945): H1 "high-value share p = 0.14" vs H0
    * "p = 0.125" over the daily (trials, successes = value ≥ 100)
    * counts, stopping at the classic A = ln 19, B = −ln 19 bounds
    * (α = β = 0.05). The fold carries (llr, decision, day) through a
    * sorted CALENDAR-bounded day list; once a bound is crossed the
    * accumulator freezes — the day recorded is the decision day. The
    * llr increments are doubles, but the walk order is pinned and
    * identical on both engines, so the fold is replayable. */
  private val qSprt = BoundQuery("q_sprt", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum((col("value") >= 100.0).cast("long")).as("k"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("day"), col("n"), col("k"))))
          .as("tr"))
      .select(col("event_type"), col("n_days"), expr("""
        aggregate(tr,
          named_struct('llr', CAST(0.0 AS DOUBLE),
                       'dday', CAST(NULL AS DATE), 'decn', 'continue'),
          (acc, v) -> CASE WHEN acc.decn <> 'continue' THEN acc
            WHEN acc.llr + CAST(v.k AS DOUBLE) * ln(0.14D/0.125D)
                 + CAST(v.n - v.k AS DOUBLE) * ln(0.86D/0.875D) >= ln(19.0D)
              THEN named_struct(
                'llr', acc.llr + CAST(v.k AS DOUBLE) * ln(0.14D/0.125D)
                       + CAST(v.n - v.k AS DOUBLE) * ln(0.86D/0.875D),
                'dday', v.day, 'decn', 'accept_h1')
            WHEN acc.llr + CAST(v.k AS DOUBLE) * ln(0.14D/0.125D)
                 + CAST(v.n - v.k AS DOUBLE) * ln(0.86D/0.875D) <= -ln(19.0D)
              THEN named_struct(
                'llr', acc.llr + CAST(v.k AS DOUBLE) * ln(0.14D/0.125D)
                       + CAST(v.n - v.k AS DOUBLE) * ln(0.86D/0.875D),
                'dday', v.day, 'decn', 'accept_h0')
            ELSE named_struct(
                'llr', acc.llr + CAST(v.k AS DOUBLE) * ln(0.14D/0.125D)
                       + CAST(v.n - v.k AS DOUBLE) * ln(0.86D/0.875D),
                'dday', CAST(NULL AS DATE), 'decn', 'continue') END)
        """).as("w"))
      .select(col("event_type"), col("n_days"),
        col("w.decn").as("decision"), col("w.dday").cast("string").as("decision_day"),
        round(col("w.llr"), 9).as("llr"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM events GROUP BY 1, 2),
    seqs AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        list_sort(list(struct_pack(day := day, n := n, k := k))) AS tr
      FROM daily GROUP BY 1),
    folded AS (
      SELECT event_type, n_days,
        list_reduce(
          list_prepend(struct_pack(llr := CAST(0.0 AS DOUBLE),
                                   dday := CAST(NULL AS DATE),
                                   decn := 'continue',
                                   day := CAST(NULL AS DATE),
                                   n := CAST(0 AS BIGINT),
                                   k := CAST(0 AS BIGINT)),
            list_transform(tr, v -> struct_pack(llr := CAST(0.0 AS DOUBLE),
                                   dday := CAST(NULL AS DATE),
                                   decn := 'continue',
                                   day := v.day, n := v.n, k := v.k))),
          (acc, v) -> CASE WHEN acc.decn <> 'continue' THEN acc
            WHEN acc.llr + CAST(v.k AS DOUBLE) * ln(0.14/0.125)
                 + CAST(v.n - v.k AS DOUBLE) * ln(0.86/0.875) >= ln(19.0)
              THEN struct_pack(
                llr := acc.llr + CAST(v.k AS DOUBLE) * ln(0.14/0.125)
                       + CAST(v.n - v.k AS DOUBLE) * ln(0.86/0.875),
                dday := v.day, decn := 'accept_h1',
                day := v.day, n := v.n, k := v.k)
            WHEN acc.llr + CAST(v.k AS DOUBLE) * ln(0.14/0.125)
                 + CAST(v.n - v.k AS DOUBLE) * ln(0.86/0.875) <= -ln(19.0)
              THEN struct_pack(
                llr := acc.llr + CAST(v.k AS DOUBLE) * ln(0.14/0.125)
                       + CAST(v.n - v.k AS DOUBLE) * ln(0.86/0.875),
                dday := v.day, decn := 'accept_h0',
                day := v.day, n := v.n, k := v.k)
            ELSE struct_pack(
                llr := acc.llr + CAST(v.k AS DOUBLE) * ln(0.14/0.125)
                       + CAST(v.n - v.k AS DOUBLE) * ln(0.86/0.875),
                dday := CAST(NULL AS DATE), decn := 'continue',
                day := v.day, n := v.n, k := v.k) END) AS w
      FROM seqs)
    SELECT event_type, n_days, w.decn AS decision, CAST(w.dday AS VARCHAR) AS decision_day,
      round(w.llr, 9) AS llr
    FROM folded ORDER BY event_type
  """))

  /** Binned 1-Wasserstein (earth-mover) distance between 1998's and
    * 1999's order-value distributions, per priority: values bin to
    * $1000 buckets (a bounded domain, the q_decision_stump contract),
    * CDFs accumulate per priority, and
    *   W1 = Σ_bins |F_a − F_b| · Δ
    * clears to ONE integral division: with counts nA/nB and
    * cumulative cA/cB, W1 in milli-bins = (1000·Σ|cA·nB − cB·nA|)
    * div (nA·nB) — exact integers end-to-end (decimal headroom on
    * the cross products). The drift number PSI/KS don't give: how
    * FAR apart the distributions sit, in dollars. */
  private val qWasserstein = BoundQuery("q_wasserstein", (s, d) => {
    val o = Tables.orders(s, d)
      .where(year(col("o_orderdate")).isin(1998, 1999))
      .select(col("o_orderpriority").as("pri"),
        (year(col("o_orderdate")) === 1998).cast("long").as("isA"),
        expr("CAST(round(o_totalprice*100, 0) AS LONG) div 100000").as("bin"))
    val binned = o.groupBy("pri", "bin")
      .agg(sum(col("isA")).as("a"), sum(lit(1L) - col("isA")).as("b"))
    val w = Window.partitionBy("pri").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("pri")
    binned
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
      .withColumn("na", sum(col("a")).over(tot))
      .withColumn("nb", sum(col("b")).over(tot))
      .groupBy(col("pri"), col("na"), col("nb"))
      .agg(sum(expr(
        "abs(CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na)"))
        .as("sd"))
      .select(col("pri"), col("na").as("n_1998"), col("nb").as("n_1999"),
        expr("""CAST((1000 * sd) div (CAST(na AS DECIMAL(38,0)) * nb)
                AS BIGINT)""").as("w1_millibins"))
      .orderBy("pri")
  }, Some("""
    WITH o AS (
      SELECT o_orderpriority AS pri,
        CASE WHEN year(o_orderdate) = 1998 THEN 1 ELSE 0 END AS isA,
        CAST(round(o_totalprice*100, 0) AS BIGINT) // 100000 AS bin
      FROM orders WHERE year(o_orderdate) IN (1998, 1999)),
    binned AS (
      SELECT pri, bin, CAST(sum(isA) AS BIGINT) AS a,
        CAST(sum(1 - isA) AS BIGINT) AS b
      FROM o GROUP BY 1, 2),
    cum AS (
      SELECT pri, bin, a, b,
        CAST(sum(a) OVER (PARTITION BY pri ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        CAST(sum(b) OVER (PARTITION BY pri ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
        CAST(sum(a) OVER (PARTITION BY pri) AS BIGINT) AS na,
        CAST(sum(b) OVER (PARTITION BY pri) AS BIGINT) AS nb
      FROM binned)
    SELECT pri, na AS n_1998, nb AS n_1999,
      CAST((1000 * sum(abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)))
        // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS w1_millibins
    FROM cum GROUP BY pri, na, nb ORDER BY pri
  """))

  /** Gumbel block-maxima fit of monthly peak daily revenue (EVT's
    * other tail beside q_hill's Pareto index): daily revenue cents →
    * per-month block maximum → method-of-moments Gumbel parameters
    *   β̂ = s·√6/π,  μ̂ = m̄ − γ·β̂   (γ = 0.5772156649015329)
    * from the EXACT integer moments (n, Σ, Σ²) of the maxima, plus
    * the plug-in exceedance P(max > observed all-time peak) =
    * 1 − exp(−exp(−(x−μ̂)/β̂)). All finishes are identical double
    * trees with the constants written out on both sides. Two
    * calendar-bounded aggregations; no windows. */
  private val qGumbel = BoundQuery("q_gumbel", (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sumCents(col("o_totalprice")).as("rev"))
    val blocks = daily
      .groupBy(date_trunc("month", col("day")).as("mon"))
      .agg(max(col("rev")).as("mx"))
    val m = blocks.agg(count(lit(1)).as("n"), sum(col("mx")).as("sx"),
      sum(expr("CAST(mx AS DECIMAL(38,0)) * mx")).as("sxx"),
      max(col("mx")).as("peak"))
    val nD = col("n").cast("double")
    val mean = col("sx").cast("double") / nD
    val sdev = sqrt((nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")) /
      (nD * (nD - 1.0)))
    val beta = sdev * lit(2.449489742783178) / lit(3.141592653589793)
    val mu = mean - lit(0.5772156649015329) * beta
    m.select(col("n").as("n_blocks"), money(col("peak")).as("peak_revenue"),
        round(mu / 100.0, 6).as("mu_dollars"),
        round(beta / 100.0, 6).as("beta_dollars"),
        round(lit(1.0) - exp(-exp((mu - col("peak").cast("double")) / beta)), 9)
          .as("p_exceed_peak"))
  }, Some("""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1),
    blocks AS (
      SELECT date_trunc('month', day) AS mon, CAST(max(rev) AS BIGINT) AS mx
      FROM daily GROUP BY 1),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(mx) AS BIGINT) AS sx,
        CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS sxx,
        CAST(max(mx) AS BIGINT) AS peak
      FROM blocks)
    SELECT n AS n_blocks, CAST(peak AS DOUBLE)/100.0 AS peak_revenue,
      round((CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)
        - 0.5772156649015329 *
          (sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0)))
           * 2.449489742783178 / 3.141592653589793)) / 100.0, 6) AS mu_dollars,
      round((sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0)))
           * 2.449489742783178 / 3.141592653589793) / 100.0, 6) AS beta_dollars,
      round(1.0 - exp(-exp((
          (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)
           - 0.5772156649015329 *
             (sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                   / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0)))
              * 2.449489742783178 / 3.141592653589793))
          - CAST(peak AS DOUBLE))
        / (sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0)))
           * 2.449489742783178 / 3.141592653589793))), 9) AS p_exceed_peak
    FROM m
  """))

  /** Tukey boxplot fences per priority: Q1/Q3 by the house
    * quantile_disc rank arithmetic (rn = ceil(q·n) row under a
    * per-priority sort), fences at ±1.5·IQR kept EXACT in
    * quarter-cents (4·lo = 7·Q1 − 3·Q3, 4·hi = 7·Q3 − 3·Q1 — no
    * float 1.5 ever materializes), and outlier counts from one
    * second pass against the broadcast 5-row fence table. */
  private val qTukeyFences = BoundQuery("q_tukey_fences", (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderpriority").as("pri"), cents(col("o_totalprice")).as("c"))
    val w = Window.partitionBy("pri").orderBy(col("c"))
    val ranked = o
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("pri")))
    def pick(q: Double, as: String) =
      max(when(col("rn") === greatest(lit(1L),
        ceil(lit(q) * col("n").cast("double")).cast("long")), col("c"))).as(as)
    val fences = ranked.groupBy("pri")
      .agg(max(col("n")).as("n"), pick(0.25, "q1"), pick(0.75, "q3"))
      .withColumn("lo4", lit(7L) * col("q1") - lit(3L) * col("q3"))
      .withColumn("hi4", lit(7L) * col("q3") - lit(3L) * col("q1"))
    o.join(broadcast(fences), "pri")
      .groupBy(col("pri"), col("n"), col("q1"), col("q3"))
      .agg(sum((lit(4L) * col("c") < col("lo4")).cast("long")).as("n_low"),
        sum((lit(4L) * col("c") > col("hi4")).cast("long")).as("n_high"))
      .select(col("pri"), col("n"), money(col("q1")).as("q1_d"),
        money(col("q3")).as("q3_d"), col("n_low"), col("n_high"),
        expr("(1000000 * (n_low + n_high)) div n").as("outlier_ppm"))
      .orderBy("pri")
  }, Some("""
    WITH o AS (
      SELECT o_orderpriority AS pri,
        CAST(round(o_totalprice*100, 0) AS BIGINT) AS c
      FROM orders),
    ranked AS (
      SELECT pri, c,
        CAST(row_number() OVER (PARTITION BY pri ORDER BY c) AS BIGINT) AS rn,
        CAST(count(*) OVER (PARTITION BY pri) AS BIGINT) AS n
      FROM o),
    f AS (
      SELECT pri, max(n) AS n,
        CAST(max(CASE WHEN rn = greatest(1, CAST(ceil(0.25 * n) AS BIGINT))
                 THEN c END) AS BIGINT) AS q1,
        CAST(max(CASE WHEN rn = greatest(1, CAST(ceil(0.75 * n) AS BIGINT))
                 THEN c END) AS BIGINT) AS q3
      FROM ranked GROUP BY pri)
    SELECT o.pri, n, CAST(q1 AS DOUBLE)/100.0 AS q1_d,
      CAST(q3 AS DOUBLE)/100.0 AS q3_d,
      CAST(sum(CASE WHEN 4*c < 7*q1 - 3*q3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      CAST(sum(CASE WHEN 4*c > 7*q3 - 3*q1 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      (1000000 * (CAST(sum(CASE WHEN 4*c < 7*q1 - 3*q3 THEN 1 ELSE 0 END) AS BIGINT)
                + CAST(sum(CASE WHEN 4*c > 7*q3 - 3*q1 THEN 1 ELSE 0 END) AS BIGINT)))
        // n AS outlier_ppm
    FROM o JOIN f ON o.pri = f.pri
    GROUP BY o.pri, n, q1, q3 ORDER BY o.pri
  """))

  /** Coverage and novelty of the q_item_cf top-50 recommendations —
    * the recsys health metrics beside q_rec_eval's accuracy: what
    * share of the co-purchasable catalog do the recommendations
    * touch (coverage), and how popular are the parts they push
    * (mean popularity, in ppm of orders) — low coverage + high
    * popularity is the filter-bubble signature. Exact integral
    * divisions over the q_item_cf integer tables. */
  private val qRecCoverage = BoundQuery("q_rec_coverage", (s, d) => {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val deg = items.groupBy("pk").agg(count(lit(1)).as("deg"))
    val no = items.agg(countDistinct(col("ok")).as("n_orders"))
    val cat = deg.agg(count(lit(1)).as("catalog_parts"))
    val pairs = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("cooc"))
      .where(col("cooc") >= 2)
    val top = pairs
      .join(broadcast(deg.withColumnRenamed("pk", "part_a")
        .withColumnRenamed("deg", "deg_a")), "part_a")
      .join(broadcast(deg.withColumnRenamed("pk", "part_b")
        .withColumnRenamed("deg", "deg_b")), "part_b")
      .select(col("part_a"), col("part_b"),
        expr("(1000000 * cooc * cooc) div (deg_a * deg_b)").as("cos2_ppm"))
      .orderBy(desc("cos2_ppm"), col("part_a"), col("part_b")).limit(50)
    val recParts = top.select(col("part_a").as("pk"))
      .unionByName(top.select(col("part_b").as("pk"))).distinct()
    recParts.join(deg, "pk").crossJoin(broadcast(no))
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_rec_parts"),
        sum(expr("(1000000 * deg) div n_orders")).as("pop_sum"))
      .crossJoin(broadcast(cat))
      .select(col("n_rec_parts"), col("catalog_parts"),
        expr("(1000000 * n_rec_parts) div catalog_parts").as("coverage_ppm"),
        expr("pop_sum div n_rec_parts").as("mean_pop_ppm"))
  }, Some("""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    deg AS (SELECT pk, CAST(count(*) AS BIGINT) AS deg FROM items GROUP BY pk),
    no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM items),
    cat AS (SELECT CAST(count(*) AS BIGINT) AS catalog FROM deg),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS cooc
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING count(*) >= 2),
    top AS (
      SELECT part_a, part_b,
        CAST((1000000 * cooc * cooc) // (da.deg * db.deg) AS BIGINT) AS cos2_ppm
      FROM pairs
      JOIN deg da ON da.pk = part_a
      JOIN deg db ON db.pk = part_b
      ORDER BY cos2_ppm DESC, part_a, part_b LIMIT 50),
    rec AS (
      SELECT DISTINCT pk FROM (
        SELECT part_a AS pk FROM top UNION ALL SELECT part_b FROM top))
    SELECT CAST(count(*) AS BIGINT) AS n_rec_parts,
      catalog AS catalog_parts,
      (1000000 * CAST(count(*) AS BIGINT)) // catalog AS coverage_ppm,
      CAST(sum((1000000 * deg) // n_orders) AS BIGINT)
        // CAST(count(*) AS BIGINT) AS mean_pop_ppm
    FROM rec JOIN deg USING (pk), no, cat
    GROUP BY catalog
  """))

  /** Hellinger distance between 1998's and 1999's order-value
    * distributions per priority — the bounded [0,1] companion to
    * q_wasserstein on the same $1000 bins: H = √(1 − BC) with the
    * Bhattacharyya coefficient BC = Σ√(pᵢqᵢ). Float discipline:
    * IEEE-754 requires sqrt be CORRECTLY rounded (unlike ln/exp), so
    * each bin term √(aᵢ·bᵢ) is bit-identical across engines; it is
    * rounded ONCE to micro units, summed as an EXACT integer
    * (order-independent), and the finish is one identical double
    * tree over (S, na, nb). */
  private val qHellinger = BoundQuery("q_hellinger", (s, d) => {
    val o = Tables.orders(s, d)
      .where(year(col("o_orderdate")).isin(1998, 1999))
      .select(col("o_orderpriority").as("pri"),
        (year(col("o_orderdate")) === 1998).cast("long").as("isA"),
        expr("CAST(round(o_totalprice*100, 0) AS LONG) div 100000").as("bin"))
    o.groupBy("pri", "bin")
      .agg(sum(col("isA")).as("a"), sum(lit(1L) - col("isA")).as("b"))
      .groupBy("pri")
      .agg(sum(col("a")).as("na"), sum(col("b")).as("nb"),
        sum(expr("""CAST(round(sqrt(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
                    * 1000000, 0) AS DECIMAL(38,0))""")).as("sm"))
      .select(col("pri"), col("na").as("n_1998"), col("nb").as("n_1999"),
        round(expr("""sqrt(greatest(0.0, 1.0 -
          CAST(sm AS DOUBLE) / (sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                                * 1000000.0)))"""), 9).as("hellinger"))
      .orderBy("pri")
  }, Some("""
    WITH o AS (
      SELECT o_orderpriority AS pri,
        CASE WHEN year(o_orderdate) = 1998 THEN 1 ELSE 0 END AS isA,
        CAST(round(o_totalprice*100, 0) AS BIGINT) // 100000 AS bin
      FROM orders WHERE year(o_orderdate) IN (1998, 1999)),
    binned AS (
      SELECT pri, bin, CAST(sum(isA) AS BIGINT) AS a,
        CAST(sum(1 - isA) AS BIGINT) AS b
      FROM o GROUP BY 1, 2),
    agg AS (
      SELECT pri, CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb,
        CAST(sum(CAST(round(sqrt(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
                 * 1000000, 0) AS HUGEINT)) AS HUGEINT) AS sm
      FROM binned GROUP BY 1)
    SELECT pri, na AS n_1998, nb AS n_1999,
      round(sqrt(greatest(0.0, 1.0 -
        CAST(sm AS DOUBLE) / (sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                              * 1000000.0))), 9) AS hellinger
    FROM agg ORDER BY pri
  """))

  /** Poisson dispersion index of daily event counts per type
    * (Fisher's index of dispersion / variance-to-mean ratio;
    * Cox & Lewis 1966): D = s²/c̄ over the COMPLETE day grid
    * (conditional-count pivot + stack fills silent days with 0 —
    * without it a bursty type looks calm), cleared to
    * D = (n·Σc² − (Σc)²) / ((n−1)·Σc) — exact integers, one double.
    * D ≈ 1 ⇒ Poisson arrivals; D ≫ 1 ⇒ burst/incident clustering;
    * χ² = (n−1)·D gates it. The arrival-process health check beside
    * q_interarrival's gap view. */
  private val qDispersion = BoundQuery("q_dispersion", (s, d) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cntCols = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"c_$t"))
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(cntCols.head, cntCols.tail: _*)
    daily.select(
      expr("stack(5, " + types.map(t => s"'$t', c_$t").mkString(", ") +
        ") AS (event_type, c)"))
      .select(col("event_type"), col("c").cast("decimal(38,0)").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("c")).as("sc"), sum(col("c") * col("c")).as("qc"))
      .select(col("event_type"), col("n").cast("long").as("n_days"),
        col("sc").cast("long").as("n_events"),
        round(expr("""CAST(n*qc - sc*sc AS DOUBLE)
          / (CAST(n - 1 AS DOUBLE) * CAST(sc AS DOUBLE))"""), 6)
          .as("dispersion"),
        round(expr("CAST(n*qc - sc*sc AS DOUBLE) / CAST(sc AS DOUBLE)"), 6)
          .as("chi2"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
        CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS c_click,
        CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS c_error,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c_purchase,
        CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS c_signup,
        CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS c_view
      FROM events GROUP BY 1),
    stacked AS (
      SELECT t.event_type,
        CAST(CASE t.event_type
          WHEN 'click' THEN c_click WHEN 'error' THEN c_error
          WHEN 'purchase' THEN c_purchase WHEN 'signup' THEN c_signup
          ELSE c_view END AS HUGEINT) AS c
      FROM daily CROSS JOIN (
        SELECT unnest(['click','error','purchase','signup','view']) AS event_type) t),
    m AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        sum(c) AS sc, sum(c*c) AS qc
      FROM stacked GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_days, CAST(sc AS BIGINT) AS n_events,
      round(CAST(n*qc - sc*sc AS DOUBLE)
        / (CAST(n - 1 AS DOUBLE) * CAST(sc AS DOUBLE)), 6) AS dispersion,
      round(CAST(n*qc - sc*sc AS DOUBLE) / CAST(sc AS DOUBLE), 6) AS chi2
    FROM m ORDER BY event_type
  """))

  /** Log-normal fit of order values (the canonical heavy-tail model
    * for spend/duration columns): per-row ln(cents) micro-rounded
    * ONCE, exact integer moment sums, then
    * μ̂ = S/n (micronats, truncating), σ̂² = (nΣl² − S²)/(n(n−1)),
    * and the implied median e^μ̂ / mean e^{μ̂+σ̂²/2} in cents as the
    * readout a capacity planner actually uses. sqrt is IEEE-exact;
    * exp finishes are identical double trees. */
  private val qLognormalFit = BoundQuery("q_lognormal_fit", (s, d) => {
    Tables.orders(s, d)
      .select(expr("""CAST(round(ln(CAST(round(o_totalprice*100, 0) AS DOUBLE))
        * 1000000, 0) AS DECIMAL(38,0))""").as("l"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("l")).as("sl"), sum(col("l") * col("l")).as("ql"))
      .select(col("n").cast("long").as("n_orders"),
        expr("CAST(sl div n AS BIGINT)").as("mu_micronats"),
        round(expr("""sqrt(CAST(n*ql - sl*sl AS DOUBLE)
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 1000000.0"""), 9)
          .as("sigma_nats"),
        round(expr("exp(CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)"), 2)
          .as("median_cents"),
        round(expr("""exp(CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
          + (CAST(n*ql - sl*sl AS DOUBLE)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
            / 2.0e12)"""), 2).as("mean_cents"))
  }, Some("""
    WITH terms AS (
      SELECT CAST(round(ln(CAST(CAST(round(o_totalprice*100, 0) AS BIGINT)
        AS DOUBLE)) * 1000000, 0) AS HUGEINT) AS l
      FROM orders),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, sum(l) AS sl, sum(l*l) AS ql
      FROM terms)
    SELECT CAST(n AS BIGINT) AS n_orders,
      CAST(sl // n AS BIGINT) AS mu_micronats,
      round(sqrt(CAST(n*ql - sl*sl AS DOUBLE)
        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 1000000.0, 9)
        AS sigma_nats,
      round(exp(CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0), 2)
        AS median_cents,
      round(exp(CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
        + (CAST(n*ql - sl*sl AS DOUBLE)
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 2.0e12), 2)
        AS mean_cents
    FROM m
  """))

  /** Sample L-moments λ₁..λ₄ and the L-ratios τ₃ (L-skew), τ₄
    * (L-kurtosis) of order values (Hosking, JRSS-B 1990) — the
    * order-statistics moment family that stays finite and robust
    * where classical skew/kurtosis (q_jarque_bera's inputs) blow up
    * on heavy tails. The probability-weighted moments b_r are EXACT:
    * rank i comes from the two-phase globalRowNumber ((value, key)
    * total order, identical on both engines), the weights
    * (i−1)(i−2)…(i−r) are integer products, and each b_r numerator is
    * one decimal(38,0) sum; λ's and τ's are identical double trees.
    * One rank pass + one 5-sum reduction — no single-partition
    * window at any scale.
    *
    * Scale ceiling (round-6 advice): b3n accumulates
    * (i−1)(i−2)(i−3)·v ≈ n⁴·v̄ — with cents values this crosses
    * decimal(38,0)/HUGEINT around n ≈ 10⁸·⁵ (roughly sf100+ orders),
    * where Spark's non-ANSI decimal sum NULLs silently while DuckDB
    * errors, a cross-engine parity break. Past that n, switch the
    * b_r numerators to pre-divided per-row double weights
    * ((i−1)/n·(i−2)/n·… ), the house convention where exactness is
    * infeasible; exact decimals are kept here because every graded
    * fixture is orders of magnitude under the ceiling. */
  private val qLMoments = BoundQuery("q_l_moments", (s, d) => {
    val vals = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"),
        graft.functions.Num.cents(col("o_totalprice")).as("v"))
    val ranked = graft.operators.Ranking
      .globalRowNumber(vals, "rn0", col("v"), col("k"))
      .withColumn("i", col("rn0") + 1)
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val m = ranked.agg(
      count(lit(1)).as("n"),
      sum(d38(col("v"))).as("b0n"),
      sum(d38(col("i") - 1) * col("v")).as("b1n"),
      sum(d38(col("i") - 1) * (col("i") - 2) * col("v")).as("b2n"),
      sum(d38(col("i") - 1) * (col("i") - 2) * (col("i") - 3) * col("v"))
        .as("b3n"))
    val n = col("n").cast("double")
    val b0 = col("b0n").cast("double") / n
    val b1 = col("b1n").cast("double") / (n * (n - 1))
    val b2 = col("b2n").cast("double") / (n * (n - 1) * (n - 2))
    val b3 = col("b3n").cast("double") / (n * (n - 1) * (n - 2) * (n - 3))
    val l2 = lit(2.0) * b1 - b0
    val l3 = lit(6.0) * b2 - lit(6.0) * b1 + b0
    val l4 = lit(20.0) * b3 - lit(30.0) * b2 + lit(12.0) * b1 - b0
    m.select(col("n").cast("long").as("n_orders"),
      round(b0 / 100.0, 6).as("l1_mean"),
      round(l2 / 100.0, 6).as("l2_scale"),
      round(l3 / l2, 9).as("t3_lskew"),
      round(l4 / l2, 9).as("t4_lkurt"))
  }, Some("""
    WITH vals AS (
      SELECT o_orderkey AS k,
        CAST(round(o_totalprice*100, 0) AS BIGINT) AS v
      FROM orders),
    ranked AS (
      SELECT v, CAST(row_number() OVER (ORDER BY v, k) AS BIGINT) AS i
      FROM vals),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS b0n,
        CAST(sum(CAST(i - 1 AS HUGEINT) * v) AS HUGEINT) AS b1n,
        CAST(sum(CAST(i - 1 AS HUGEINT) * (i - 2) * v) AS HUGEINT) AS b2n,
        CAST(sum(CAST(i - 1 AS HUGEINT) * (i - 2) * (i - 3) * v) AS HUGEINT)
          AS b3n
      FROM ranked),
    dbl AS (
      SELECT n,
        CAST(b0n AS DOUBLE) / CAST(n AS DOUBLE) AS b0,
        CAST(b1n AS DOUBLE)
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS b1,
        CAST(b2n AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
          * (CAST(n AS DOUBLE) - 2)) AS b2,
        CAST(b3n AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
          * (CAST(n AS DOUBLE) - 2) * (CAST(n AS DOUBLE) - 3)) AS b3
      FROM m)
    SELECT n AS n_orders,
      round(b0 / 100.0, 6) AS l1_mean,
      round((2.0*b1 - b0) / 100.0, 6) AS l2_scale,
      round((6.0*b2 - 6.0*b1 + b0) / (2.0*b1 - b0), 9) AS t3_lskew,
      round((20.0*b3 - 30.0*b2 + 12.0*b1 - b0) / (2.0*b1 - b0), 9) AS t4_lkurt
    FROM dbl
  """))

  /** Two-sample Cramér–von Mises test (Anderson 1962 ranks form) of
    * AUTOMOBILE- vs HOUSEHOLD-segment order values — the
    * whole-distribution EDF distance beside q_ks_test's supremum and
    * q_wasserstein's transport cost: U = n·Σ(r_i − i)² + m·Σ(s_j − j)²
    * over pooled vs within-group ranks, T = U/(nm(n+m)) −
    * (4nm−1)/(6(n+m)). Ranks on the (value, key) total order make U
    * an EXACT integer (pooled rank via two-phase globalRowNumber,
    * within-group index via a group-partitioned window); T clears to
    * two truncating ppm divisions, identical on both engines.
    * T ≥ 0.461 rejects at 5%. */
  private val qCvm = BoundQuery("q_cvm", (s, d) => {
    val vals = Tables.orders(s, d)
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
      .select(col("o_orderkey").as("k"),
        graft.functions.Num.cents(col("o_totalprice")).as("v"),
        (col("c_mktsegment") === "AUTOMOBILE").cast("long").as("ia"))
    // within-group index via globalRowNumber PER GROUP (a window
    // partitioned by the 2-value group column would put half the
    // data in one task at scale; two two-phase rank passes stay
    // fully parallel), then the pooled rank over the union
    val withI = Seq(1L, 0L).map { g =>
      graft.operators.Ranking.globalRowNumber(
        vals.where(col("ia") === g), "i0", col("v"), col("k"))
    }.reduce(_ unionByName _)
    val pooled = graft.operators.Ranking
      .globalRowNumber(withI, "pr0", col("v"), col("k"))
      .withColumn("r", col("pr0") + 1)
      .withColumn("i", col("i0") + 1)
      .withColumn("d2", (col("r") - col("i")) * (col("r") - col("i")))
    val m = pooled.agg(
      sum(col("ia")).as("n"), sum(lit(1L) - col("ia")).as("mm"),
      sum(when(col("ia") === 1, col("d2")).otherwise(lit(0L))
        .cast("decimal(38,0)")).as("da"),
      sum(when(col("ia") === 0, col("d2")).otherwise(lit(0L))
        .cast("decimal(38,0)")).as("db"))
    m.select(col("n").cast("long").as("n_a"), col("mm").cast("long").as("n_b"),
        (col("n").cast("decimal(38,0)") * col("da")
          + col("mm").cast("decimal(38,0)") * col("db")).as("u"),
        col("n").cast("decimal(38,0)").as("nn"),
        col("mm").cast("decimal(38,0)").as("md"))
      .select(col("n_a"), col("n_b"), col("u").cast("long").as("u_stat"),
        expr("""CAST((1000000 * u) div (nn * md * (nn + md))
            - (1000000 * (4 * nn * md - 1)) div (6 * (nn + md))
            AS BIGINT)""").as("t_ppm"))
  }, Some("""
    WITH vals AS (
      SELECT o_orderkey AS k,
        CAST(round(o_totalprice*100, 0) AS BIGINT) AS v,
        CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS ia
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
    pooled AS (
      SELECT ia,
        CAST(row_number() OVER (ORDER BY v, k) AS BIGINT) AS r,
        CAST(row_number() OVER (PARTITION BY ia ORDER BY v, k) AS BIGINT) AS i
      FROM vals),
    m AS (
      SELECT CAST(sum(ia) AS BIGINT) AS n,
        CAST(sum(1 - ia) AS BIGINT) AS mm,
        CAST(sum(CASE WHEN ia = 1 THEN CAST((r-i)*(r-i) AS HUGEINT)
                 ELSE 0 END) AS HUGEINT) AS da,
        CAST(sum(CASE WHEN ia = 0 THEN CAST((r-i)*(r-i) AS HUGEINT)
                 ELSE 0 END) AS HUGEINT) AS db
      FROM pooled)
    SELECT n AS n_a, mm AS n_b,
      CAST(CAST(n AS HUGEINT) * da + CAST(mm AS HUGEINT) * db AS BIGINT)
        AS u_stat,
      CAST((1000000 * (CAST(n AS HUGEINT) * da + CAST(mm AS HUGEINT) * db))
            // (CAST(n AS HUGEINT) * mm * (n + mm))
          - (1000000 * (4 * CAST(n AS HUGEINT) * mm - 1)) // (6 * (n + mm))
          AS BIGINT) AS t_ppm
    FROM m
  """))

  /** Anderson–Darling uniformity test (Anderson & Darling 1954) on
    * the CENT fraction of order prices — the tail-weighted EDF test
    * completing the KS (q_ks_test) / Cramér–von Mises (q_cvm) family:
    * AD up-weights the distribution's tails, which is where rounding
    * fraud and price-template artifacts live (the q_benford
    * companion). u_i = (cents mod 100 + 0.5)/100 maps each price to a
    * strictly interior point of (0,1), so both log terms are finite.
    *
    * A² = −n − (1/n)·Σ_i (2i−1)[ln u_(i) + ln(1 − u_(n+1−i))],
    * folded into the single-pass per-rank form
    * (2j−1)·ln u_(j) + (2n−2j+1)·ln(1 − u_(j)).
    *
    * Exactness: the two ln terms take only 100 distinct values each,
    * rounded to integer MICRO-nats per row (the q_psi_drift µ-nat
    * rule); rank weights are exact longs, so every partial sum is
    * order-invariant and the final A² is one double division of an
    * exact decimal(38,0) scalar. Ties in u collapse to identical ln
    * values, so any tie order yields the same sum. The global rank is
    * operators.Ranking.globalRowNumber — two-phase range-partitioned,
    * never a single-partition window. Scale ceiling: the weighted sum
    * reaches ~2.4e21 around sf10 on orders, which is why it
    * accumulates (and emits) decimal(38,0)-as-double rather than
    * long. */
  private val qAndersonDarling = BoundQuery("q_anderson_darling", (s, d) => {
    val vals = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      (cents(col("o_totalprice")) % 100).as("c"))
    val lns = vals
      .withColumn("lnu",
        round(log((col("c") + lit(0.5)) / 100.0) * 1e6, 0).cast("long"))
      .withColumn("ln1",
        round(log(lit(1.0) - (col("c") + lit(0.5)) / 100.0) * 1e6, 0)
          .cast("long"))
    val ranked = graft.operators.Ranking
      .globalRowNumber(lns, "j0", col("c"), col("k"))
      .withColumn("j", col("j0") + 1)
      .crossJoin(broadcast(vals.agg(count(lit(1)).as("n"))))
    ranked
      .select(col("n"), ((lit(2) * col("j") - 1) * col("lnu")
        + (lit(2) * col("n") - lit(2) * col("j") + 1) * col("ln1"))
        .cast("decimal(38,0)").as("term"))
      .groupBy(col("n")).agg(sum(col("term")).as("s"))
      .select(col("n"),
        round(col("s").cast("double") / 1e6, 2).as("s_nats"),
        round(lit(-1.0) * col("n").cast("double")
          - col("s").cast("double")
            / (lit(1e6) * col("n").cast("double")), 6).as("a2"))
  }, Some("""
    WITH vals AS (
      SELECT o_orderkey AS k,
        CAST(round(o_totalprice * 100, 0) AS BIGINT) % 100 AS c
      FROM orders),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
    t AS (
      SELECT n, c,
        CAST(round(ln((c + 0.5) / 100.0) * 1e6, 0) AS BIGINT) AS lnu,
        CAST(round(ln(1.0 - (c + 0.5) / 100.0) * 1e6, 0) AS BIGINT) AS ln1,
        CAST(row_number() OVER (ORDER BY c, k) AS BIGINT) AS j
      FROM vals CROSS JOIN nn),
    s AS (
      SELECT n, sum(CAST((2*j - 1) * lnu + (2*n - 2*j + 1) * ln1
                    AS HUGEINT)) AS s_h
      FROM t GROUP BY n)
    SELECT n, round(CAST(s_h AS DOUBLE) / 1e6, 2) AS s_nats,
      round(-CAST(n AS DOUBLE)
        - CAST(s_h AS DOUBLE) / (1e6 * CAST(n AS DOUBLE)), 6) AS a2
    FROM s
  """))

  val all: Seq[BoundQuery] = Seq(qSprt, qWasserstein, qGumbel,
    qTukeyFences, qRecCoverage, qHellinger, qDispersion, qLognormalFit,
    qLMoments, qCvm, qAndersonDarling)
}
