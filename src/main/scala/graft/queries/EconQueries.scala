package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 commerce-analytics wave: the revenue-science trio —
  * funnel A/B significance (does a treatment change step
  * conversion?), log-log price elasticity (how demand responds to
  * price), and ABC's variability companion XYZ (how forecastable
  * demand is). Exact rules as everywhere: micro-nat logs rounded once
  * per row, cleared-integer test statistics, one truncating division
  * per emitted value.
  */
object EconQueries {

  /** Two-proportion z² per funnel step between md5-split arms — the
    * experiment readout layered over q_funnel's step semantics (first
    * view → click within a day → purchase within a day). For each
    * transition, with (a/b) the A-arm conversions/athletes and (c/d)
    * the B-arm's, the pooled z² clears to
    *   z²_milli = 1000·(ad − cb)²·(b+d)
    *              div (b·d·(a+c)·(b+d−a−c)),
    * exact decimal products. The arm split rides the same md5
    * convention as q_ab_srm, so a true SRM would surface there. */
  private val qFunnelSig = BoundQuery("q_funnel_sig", (s, d) => {
    val stepNs = 86400000000000L
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
      col("ts_ns"),
      (substring(md5(col("user_id").cast("string")), 1, 2) < "80")
        .as("arm_a"))
    val t1 = ev.where(col("event_type") === "view")
      .groupBy("user_id", "arm_a").agg(min("ts_ns").as("t1"))
    val t2 = ev.where(col("event_type") === "click")
      .join(t1.select("user_id", "t1"), "user_id")
      .where(col("ts_ns") > col("t1") &&
        col("ts_ns") - col("t1") <= lit(stepNs))
      .groupBy("user_id").agg(min("ts_ns").as("t2"))
    val t3 = ev.where(col("event_type") === "purchase")
      .join(t2.select("user_id", "t2"), "user_id")
      .where(col("ts_ns") > col("t2") &&
        col("ts_ns") - col("t2") <= lit(stepNs))
      .groupBy("user_id").agg(min("ts_ns").as("t3"))
    val flags = t1.select(col("user_id"), col("arm_a"))
      .join(t2.select(col("user_id"), lit(1L).as("s2")), Seq("user_id"), "left")
      .join(t3.select(col("user_id"), lit(1L).as("s3")), Seq("user_id"), "left")
      .na.fill(0L, Seq("s2", "s3"))
    val arms = flags.groupBy("arm_a")
      .agg(count(lit(1)).as("n1"), sum(col("s2")).as("n2"),
        sum(col("s3")).as("n3"))
    val w = arms.groupBy()
      .pivot("arm_a", Seq(true, false)).agg(
        first(col("n1")).as("x1"), first(col("n2")).as("x2"),
        first(col("n3")).as("x3"))
      .select(col("true_x1").as("b1"), col("true_x2").as("a2"),
        col("true_x3").as("a3"), col("false_x1").as("d1"),
        col("false_x2").as("c2"), col("false_x3").as("c3"))
    def z2(a: String, b: String, c: String, dd: String) = expr(
      s"""CASE WHEN ($a + $c) = 0 OR ($b + $dd - $a - $c) = 0 THEN 0
          ELSE CAST((1000 * (CAST($a AS DECIMAL(38,0)) * $dd
                             - CAST($c AS DECIMAL(38,0)) * $b)
                          * (CAST($a AS DECIMAL(38,0)) * $dd
                             - CAST($c AS DECIMAL(38,0)) * $b)
                          * ($b + $dd))
               div (CAST($b AS DECIMAL(38,0)) * $dd * ($a + $c)
                    * ($b + $dd - $a - $c)) AS BIGINT) END""")
    w.select(
        struct(lit("view_to_click").as("step"), col("a2").as("conv_a"),
          col("b1").as("n_a"), col("c2").as("conv_b"), col("d1").as("n_b"),
          z2("a2", "b1", "c2", "d1").as("z2_milli")).as("r1"),
        struct(lit("click_to_purchase").as("step"), col("a3").as("conv_a"),
          col("a2").as("n_a"), col("c3").as("conv_b"), col("c2").as("n_b"),
          z2("a3", "a2", "c3", "c2").as("z2_milli")).as("r2"))
      .select(explode(array(col("r1"), col("r2"))).as("r"))
      .select("r.step", "r.conv_a", "r.n_a", "r.conv_b", "r.n_b",
        "r.z2_milli")
      .orderBy("step")
  }, Some("""
    WITH ev AS (
      SELECT user_id, event_type, epoch_ns(ts) AS t,
        substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80' AS arm_a
      FROM events),
    t1 AS (SELECT user_id, arm_a, min(t) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY 1, 2),
    t2 AS (SELECT e.user_id, min(t) AS t2 FROM ev e JOIN t1 USING (user_id)
           WHERE event_type = 'click' AND t > t1.t1
             AND t - t1.t1 <= 86400000000000 GROUP BY 1),
    t3 AS (SELECT e.user_id, min(t) AS t3 FROM ev e JOIN t2 USING (user_id)
           WHERE event_type = 'purchase' AND t > t2.t2
             AND t - t2.t2 <= 86400000000000 GROUP BY 1),
    flags AS (
      SELECT t1.user_id, t1.arm_a,
        CASE WHEN t2.user_id IS NULL THEN 0 ELSE 1 END AS s2,
        CASE WHEN t3.user_id IS NULL THEN 0 ELSE 1 END AS s3
      FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
      LEFT JOIN t3 ON t1.user_id = t3.user_id),
    arms AS (
      SELECT arm_a, CAST(count(*) AS BIGINT) AS n1,
        CAST(sum(s2) AS BIGINT) AS n2, CAST(sum(s3) AS BIGINT) AS n3
      FROM flags GROUP BY 1),
    w AS (
      SELECT
        max(CASE WHEN arm_a THEN n1 END) AS b1,
        max(CASE WHEN arm_a THEN n2 END) AS a2,
        max(CASE WHEN arm_a THEN n3 END) AS a3,
        max(CASE WHEN NOT arm_a THEN n1 END) AS d1,
        max(CASE WHEN NOT arm_a THEN n2 END) AS c2,
        max(CASE WHEN NOT arm_a THEN n3 END) AS c3
      FROM arms)
    SELECT 'view_to_click' AS step, a2 AS conv_a, b1 AS n_a,
      c2 AS conv_b, d1 AS n_b,
      CASE WHEN (a2 + c2) = 0 OR (b1 + d1 - a2 - c2) = 0 THEN 0
      ELSE CAST((1000 * (CAST(a2 AS HUGEINT) * d1 - CAST(c2 AS HUGEINT) * b1)
                      * (CAST(a2 AS HUGEINT) * d1 - CAST(c2 AS HUGEINT) * b1)
                      * (b1 + d1))
           // (CAST(b1 AS HUGEINT) * d1 * (a2 + c2) * (b1 + d1 - a2 - c2))
           AS BIGINT) END AS z2_milli
    FROM w
    UNION ALL
    SELECT 'click_to_purchase', a3, a2, c3, c2,
      CASE WHEN (a3 + c3) = 0 OR (a2 + c2 - a3 - c3) = 0 THEN 0
      ELSE CAST((1000 * (CAST(a3 AS HUGEINT) * c2 - CAST(c3 AS HUGEINT) * a2)
                      * (CAST(a3 AS HUGEINT) * c2 - CAST(c3 AS HUGEINT) * a2)
                      * (a2 + c2))
           // (CAST(a2 AS HUGEINT) * c2 * (a3 + c3) * (a2 + c2 - a3 - c3))
           AS BIGINT) END
    FROM w
    ORDER BY step
  """))

  /** Log-log price elasticity of demand per brand: the OLS slope of
    * ln(total quantity sold) on ln(retail price) across the brand's
    * parts — the ε a pricing team reads as "a 1% price rise moves
    * demand ε%". Each log rounds ONCE to micro-nats; the slope is the
    * exact cleared rational of micro-nat moments with a final ppm
    * division (the q_ar1 lag-OLS convention). Parts with zero sales
    * drop (ln undefined), counted alongside. */
  private val qElasticity = BoundQuery("q_elasticity", (s, d) => {
    val demand = Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg(sumCents(col("l_quantity")).as("qc"))
    val rows = Tables.part(s, d)
      .join(demand, col("p_partkey") === col("l_partkey"))
      .where(col("qc") > 0)
      .select(col("p_brand"),
        round(log(col("p_retailprice")) * 1e6, 0).cast("long").as("x"),
        round(log(col("qc").cast("double") / lit(100.0)) * 1e6, 0)
          .cast("long").as("y"))
    rows.groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .select(col("p_brand"), col("n_parts"),
        expr("""CAST((1000000 * (CAST(n_parts AS DECIMAL(38,0))*sxy
                                 - CAST(sx AS DECIMAL(38,0))*sy))
                div (CAST(n_parts AS DECIMAL(38,0))*sxx
                     - CAST(sx AS DECIMAL(38,0))*sx) AS BIGINT)""")
          .as("elasticity_ppm"))
      .orderBy("p_brand")
  }, Some("""
    WITH demand AS (
      SELECT l_partkey,
        CAST(sum(CAST(round(l_quantity*100, 0) AS BIGINT)) AS BIGINT) AS qc
      FROM lineitem GROUP BY 1),
    rows_ AS (
      SELECT p_brand,
        CAST(round(ln(p_retailprice) * 1e6, 0) AS BIGINT) AS x,
        CAST(round(ln(CAST(qc AS DOUBLE) / 100.0) * 1e6, 0) AS BIGINT) AS y
      FROM part JOIN demand ON p_partkey = l_partkey
      WHERE qc > 0)
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
      CAST((1000000 * (CAST(count(*) AS HUGEINT)*sum(CAST(x AS HUGEINT)*y)
                       - CAST(sum(x) AS HUGEINT)*sum(y)))
           // (CAST(count(*) AS HUGEINT)*sum(CAST(x AS HUGEINT)*x)
               - CAST(sum(x) AS HUGEINT)*sum(x)) AS BIGINT)
        AS elasticity_ppm
    FROM rows_ GROUP BY p_brand ORDER BY p_brand
  """))

  /** XYZ demand-variability classes per brand — q_abc_class's
    * forecastability companion: per part, CV² of monthly shipped
    * quantity over the part's observed months, exact as
    * cv2_ppm = 10⁶·(n·Q − S²) div S²; class X (cv ≤ .5, steady) /
    * Y (≤ 1, swinging) / Z (lumpy) by integer thresholds; rolled up
    * to (brand, class) counts. Parts seen in a single month are Z by
    * convention (one observation carries no variability evidence —
    * stated, not hidden). */
  private val qXyzClass = BoundQuery("q_xyz_class", (s, d) => {
    val monthly = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), date_trunc("month", col("l_shipdate"))
        .as("m"))
      .agg(sumCents(col("l_quantity")).as("q"))
    val per = monthly.groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"),
        sum(expr("CAST(q AS DECIMAL(38,0)) * q")).as("qq"))
      .withColumn("cv2_ppm", expr(
        """CASE WHEN n <= 1 THEN NULL
           ELSE CAST((1000000 * (n * qq - CAST(sq AS DECIMAL(38,0)) * sq))
                div (CAST(sq AS DECIMAL(38,0)) * sq) AS BIGINT) END"""))
      .withColumn("xyz", expr(
        """CASE WHEN cv2_ppm IS NULL THEN 'Z'
                WHEN cv2_ppm <= 250000 THEN 'X'
                WHEN cv2_ppm <= 1000000 THEN 'Y' ELSE 'Z' END"""))
    per.join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "xyz")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("sq")).as("qty_c"))
      .orderBy("p_brand", "xyz")
  }, Some("""
    WITH monthly AS (
      SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
        CAST(sum(CAST(round(l_quantity*100, 0) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2),
    per AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(q) AS BIGINT) AS sq,
        CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS qq
      FROM monthly GROUP BY 1),
    cls AS (
      SELECT l_partkey, sq,
        CASE WHEN n <= 1 THEN 'Z'
          WHEN (1000000 * (n * qq - CAST(sq AS HUGEINT) * sq))
               // (CAST(sq AS HUGEINT) * sq) <= 250000 THEN 'X'
          WHEN (1000000 * (n * qq - CAST(sq AS HUGEINT) * sq))
               // (CAST(sq AS HUGEINT) * sq) <= 1000000 THEN 'Y'
          ELSE 'Z' END AS xyz
      FROM per)
    SELECT p_brand, xyz, CAST(count(*) AS BIGINT) AS n_parts,
      CAST(sum(sq) AS BIGINT) AS qty_c
    FROM cls JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2 ORDER BY p_brand, xyz
  """))

  /** Laspeyres / Paasche / Fisher price indices year over year — the
    * classic index-number trio over the part catalog. Per (year,
    * part): exact cents revenue R and centi-unit quantity Q; the
    * index sums run entirely in integers by clearing each price
    * ratio's denominator with ONE truncating division per part
    * (L = Σ R₁·Q₀ div Q₁ over Σ R₀, P = Σ R₁ over Σ R₀·Q₁ div Q₀ —
    * the div-before-sum keeps every partial exact and
    * partition-invariant), emitted in milli; Fisher is the one final
    * sqrt over the two exact millis, identical trees both engines.
    * Parts present in both years only (the matched-basket rule). */
  private val qFisherIndex = BoundQuery("q_fisher_index", (s, d) => {
    val py = Tables.lineitem(s, d)
      .groupBy(year(col("l_shipdate")).cast("long").as("yr"),
        col("l_partkey").as("pk"))
      .agg(sum(cents(col("l_extendedprice"))).as("r"),
        sum(cents(col("l_quantity"))).as("q"))
    val cur = py.select(col("yr"), col("pk"), col("r").as("r1"), col("q").as("q1"))
    val base = py.select((col("yr") + 1).as("yr"), col("pk"),
      col("r").as("r0"), col("q").as("q0"))
    cur.join(base, Seq("yr", "pk"))
      .groupBy("yr")
      .agg(count(lit(1)).as("n_parts"),
        sum(expr("(r1 * q0) div q1")).as("l_num"),
        sum(col("r0")).as("l_den"),
        sum(col("r1")).as("p_num"),
        sum(expr("(r0 * q1) div q0")).as("p_den"))
      .select(col("yr"), col("n_parts"),
        expr("(l_num * 1000) div l_den").as("laspeyres_milli"),
        expr("(p_num * 1000) div p_den").as("paasche_milli"),
        round(sqrt(expr("((l_num * 1000) div l_den)").cast("double") *
          expr("((p_num * 1000) div p_den)").cast("double")) / 1000.0, 6)
          .as("fisher"))
      .orderBy("yr")
  }, Some("""
    WITH py AS (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, l_partkey AS pk,
        CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS r,
        CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2),
    m AS (
      SELECT c.yr, c.pk, c.r AS r1, c.q AS q1, b.r AS r0, b.q AS q0
      FROM py c JOIN py b ON b.yr = c.yr - 1 AND b.pk = c.pk),
    agg AS (
      SELECT yr, CAST(count(*) AS BIGINT) AS n_parts,
        CAST(sum((r1 * q0) // q1) AS BIGINT) AS l_num,
        CAST(sum(r0) AS BIGINT) AS l_den,
        CAST(sum(r1) AS BIGINT) AS p_num,
        CAST(sum((r0 * q1) // q0) AS BIGINT) AS p_den
      FROM m GROUP BY yr)
    SELECT yr, n_parts,
      CAST((l_num * 1000) // l_den AS BIGINT) AS laspeyres_milli,
      CAST((p_num * 1000) // p_den AS BIGINT) AS paasche_milli,
      round(sqrt(CAST((l_num * 1000) // l_den AS DOUBLE)
               * CAST((p_num * 1000) // p_den AS DOUBLE)) / 1000.0, 6) AS fisher
    FROM agg ORDER BY yr
  """))

  /** Croston's method for intermittent demand (Croston 1972) — the
    * forecasting standard when a part sells in occasional lumps and a
    * plain SES just averages the zeros away: one SES over nonzero
    * demand SIZES, one over the INTERVALS between demand months, and
    * forecast = ẑ/p̂ per month. Both recurrences are order-dependent
    * float folds made engine-exact the q_ewma way: collect per part,
    * sort on the unique month key, fold left with literal α=0.2 from
    * the first observation — identical IEEE sequences on both
    * engines. Parts need ≥4 demand months; first 100 by key. */
  private val qCroston = BoundQuery("q_croston", (s, d) => {
    val pm = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long").as("m"))
      .agg(sum(cents(col("l_quantity"))).as("z"))
    pm.groupBy("pk")
      .agg(sort_array(collect_list(struct(col("m"), col("z")))).as("sq"))
      .where(size(col("sq")) >= 4)
      .select(col("pk"), size(col("sq")).cast("long").as("n_months"),
        expr("transform(sq, x -> CAST(x.z AS DOUBLE)/100.0)").as("zs"),
        expr("transform(sq, x -> x.m)").as("ms"))
      .select(col("pk"), col("n_months"), col("zs"),
        expr("""transform(sequence(2, size(ms)),
                i -> CAST(element_at(ms, i) - element_at(ms, i-1) AS DOUBLE))""")
          .as("gaps"))
      .select(col("pk"), col("n_months"),
        round(expr("""aggregate(slice(zs, 2, size(zs)-1), element_at(zs, 1),
          (acc, z) -> 0.2D*z + 0.8D*acc)"""), 9).as("z_hat"),
        round(expr("""aggregate(slice(gaps, 2, size(gaps)-1), element_at(gaps, 1),
          (acc, g) -> 0.2D*g + 0.8D*acc)"""), 9).as("p_hat"))
      .withColumn("forecast_per_month", round(col("z_hat") / col("p_hat"), 6))
      .orderBy("pk").limit(100)
  }, Some("""
    WITH pm AS (
      SELECT l_partkey AS pk,
        CAST(year(l_shipdate)*12 + month(l_shipdate) AS BIGINT) AS m,
        CAST(sum(CAST(round(l_quantity*100, 0) AS BIGINT)) AS BIGINT) AS z
      FROM lineitem GROUP BY 1, 2),
    seqs AS (
      SELECT pk, list_sort(list(struct_pack(m := m, z := z))) AS sq
      FROM pm GROUP BY pk),
    good AS (
      SELECT pk, CAST(len(sq) AS BIGINT) AS n_months,
        list_transform(sq, x -> CAST(x.z AS DOUBLE)/100.0) AS zs,
        list_transform(sq, x -> x.m) AS ms
      FROM seqs WHERE len(sq) >= 4),
    gapped AS (
      SELECT pk, n_months, zs,
        list_transform(range(2, CAST(n_months AS INTEGER)+1),
          i -> CAST(ms[i] - ms[i-1] AS DOUBLE)) AS gaps
      FROM good),
    fitted AS (
      SELECT pk, n_months,
        round(list_reduce(list_prepend(zs[1], zs[2:]),
          (acc, z) -> 0.2*z + 0.8*acc), 9) AS z_hat,
        round(list_reduce(list_prepend(gaps[1], gaps[2:]),
          (acc, g) -> 0.2*g + 0.8*acc), 9) AS p_hat
      FROM gapped)
    SELECT pk, n_months, z_hat, p_hat,
      round(z_hat / p_hat, 6) AS forecast_per_month
    FROM fitted ORDER BY pk LIMIT 100
  """))

  /** Wilson score intervals on conversion rates — the CI every
    * conversion dashboard should draw instead of the Wald interval
    * that collapses at small n or extreme p (Wilson 1927, Brown
    * Cai DasGupta 2001's recommendation): per event type, the share
    * of its users who also purchased, with the 95% Wilson bounds
    *   (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n).
    * Counts are exact (distinct users via one aggregation); the
    * bounds are identical double expression trees over the two
    * integers with z = 1.96 literal. One events scan, one user-keyed
    * agg, one type-keyed agg. */
  private val qWilsonCi = BoundQuery("q_wilson_ci", (s, d) => {
    val byUser = Tables.events(s, d)
      .groupBy("user_id")
      .agg(collect_set(col("event_type")).as("types"))
    val perType = byUser
      .select(explode(col("types")).as("event_type"),
        array_contains(col("types"), "purchase").cast("long").as("conv"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
    val z = 1.96
    val nD = col("n").cast("double"); val p = col("k").cast("double") / nD
    val z2n = lit(z * z) / nD
    val centre = (p + z2n / 2.0) / (lit(1.0) + z2n)
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      lit(z * z) / (lit(4.0) * nD * nD))) / (lit(1.0) + z2n)
    perType.select(col("event_type"), col("n"), col("k"),
        expr("(k * 1000000) div n").as("p_ppm"),
        round(centre - half, 6).as("wilson_lo"),
        round(centre + half, 6).as("wilson_hi"))
      .orderBy("event_type")
  }, Some("""
    WITH byuser AS (
      SELECT user_id, list(DISTINCT event_type) AS types,
        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id),
    pertype AS (
      SELECT unnest(types) AS event_type, conv FROM byuser),
    agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(conv) AS BIGINT) AS k
      FROM pertype GROUP BY 1)
    SELECT event_type, n, k,
      CAST((k * 1000000) // n AS BIGINT) AS p_ppm,
      round((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
             + (1.96 * 1.96) / CAST(n AS DOUBLE) / 2.0)
            / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
          - (1.96 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)
              + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
            / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS wilson_lo,
      round((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
             + (1.96 * 1.96) / CAST(n AS DOUBLE) / 2.0)
            / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
          + (1.96 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)
              + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
            / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS wilson_hi
    FROM agg ORDER BY event_type
  """))

  /** Maximum drawdown of the cumulative daily value series per event
    * type — the risk readout every monitoring dashboard wants beside
    * the trend: running cumulative cents, running peak, drawdown =
    * peak − cum (all EXACT integers under type-partitioned windows —
    * no global window), then one argmax per type. Tie convention
    * pinned on both engines: deepest drawdown, tie → latest day
    * (Spark max(struct(dd, day, peak)) == DuckDB arg_max over the
    * zero-padded printf key). dd_ppm is the depth relative to the
    * peak it fell from, one truncating division. */
  private val qMaxdrawdown = BoundQuery("q_maxdrawdown", (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))
    val dd = daily
      .withColumn("cum", sum(col("y")).over(w))
      .withColumn("peak", max(col("cum")).over(w))
      .withColumn("dd", col("peak") - col("cum"))
    dd.groupBy("event_type")
      .agg(max(struct(col("dd"), col("day"), col("peak"))).as("m"),
        count(lit(1)).as("n_days"))
      .select(col("event_type"), col("n_days"),
        col("m.dd").as("max_dd_cents"),
        col("m.day").as("trough_day"),
        col("m.peak").as("peak_cents"),
        expr("""CASE WHEN m.peak > 0 THEN
                  (1000000 * CAST(m.dd AS DECIMAL(38,0))) div m.peak
                END""").cast("long").as("dd_ppm"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    dd AS (
      SELECT event_type, day,
        CAST(max(cum) OVER (PARTITION BY event_type ORDER BY day) - cum
             AS BIGINT) AS dd,
        CAST(max(cum) OVER (PARTITION BY event_type ORDER BY day)
             AS BIGINT) AS peak
      FROM (SELECT event_type, day,
              CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day)
                   AS BIGINT) AS cum
            FROM daily)),
    am AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        max(dd) AS max_dd_cents,
        arg_max(day,  printf('%020d|%s', dd, CAST(day AS VARCHAR))) AS trough_day,
        arg_max(peak, printf('%020d|%s', dd, CAST(day AS VARCHAR))) AS peak_cents
      FROM dd GROUP BY 1)
    SELECT event_type, n_days, max_dd_cents, trough_day, peak_cents,
      CASE WHEN peak_cents > 0 THEN
        CAST((1000000 * CAST(max_dd_cents AS HUGEINT)) // peak_cents AS BIGINT)
      END AS dd_ppm
    FROM am ORDER BY event_type
  """))

  /** Theil T inequality of customer order revenue with the
    * between-nation / within-nation decomposition (Theil 1967;
    * Shorrocks 1980 on additive decomposability) — the curation
    * twin of q_gini that says WHERE the concentration lives.
    * Float discipline: each customer's ln(x_i·N/X) is rounded ONCE
    * to micro-nats (identical double op over identical integers on
    * both engines), then Σ x_i·l_i is an EXACT decimal sum —
    * order-independent, partition-invariant; same for the nation
    * grain. T = Σx·l / (X·10⁶) is one final double division, and
    * within = (W − B)/(X·10⁶) rides the exact-integer identity
    * T_total = T_between + Σ s_g·T_g. */
  private val qTheilIndex = BoundQuery("q_theil_index", (s, d) => {
    val rev = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sumCents(col("o_totalprice")).as("x"))
    val cust = graft.util.CacheScope.persist(
      rev.join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
        .select(col("x"), col("c_nationkey")))
    val g = cust.agg(count(lit(1)).as("nn"),
      sum(col("x").cast("decimal(38,0)")).as("xx"))
    val w = cust.crossJoin(broadcast(g))
      .select((col("x").cast("decimal(38,0)") *
        round(log(col("x").cast("double") * col("nn").cast("double") /
          col("xx").cast("double")) * lit(1e6), 0).cast("decimal(38,0)"))
        .as("term"))
      .agg(sum(col("term")).as("w"))
    val b = cust.groupBy("c_nationkey")
      .agg(count(lit(1)).as("ng"), sum(col("x").cast("decimal(38,0)")).as("xg"))
      .crossJoin(broadcast(g))
      .select((col("xg") *
        round(log(col("xg").cast("double") * col("nn").cast("double") /
          (col("xx").cast("double") * col("ng").cast("double"))) * lit(1e6), 0)
          .cast("decimal(38,0)")).as("term"),
        lit(1).as("one"))
      .agg(sum(col("term")).as("b"), count(lit(1)).as("k"))
    g.crossJoin(broadcast(w)).crossJoin(broadcast(b))
      .select(col("nn").cast("long").as("n_cust"), col("k").as("n_nations"),
        round(col("w").cast("double") / (col("xx").cast("double") * lit(1e6)), 9)
          .as("theil_total"),
        round(col("b").cast("double") / (col("xx").cast("double") * lit(1e6)), 9)
          .as("theil_between"),
        round((col("w") - col("b")).cast("double") /
          (col("xx").cast("double") * lit(1e6)), 9).as("theil_within"))
  }, Some("""
    WITH rev AS (
      SELECT o_custkey,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1),
    cust AS (
      SELECT x, c_nationkey FROM rev JOIN customer ON o_custkey = c_custkey),
    g AS (SELECT CAST(count(*) AS BIGINT) AS nn,
                 CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS xx FROM cust),
    w AS (
      SELECT sum(CAST(x AS HUGEINT) *
        CAST(round(ln(CAST(x AS DOUBLE) * CAST(nn AS DOUBLE)
                      / CAST(xx AS DOUBLE)) * 1e6, 0) AS HUGEINT)) AS w
      FROM cust, g),
    b AS (
      SELECT sum(CAST(xg AS HUGEINT) *
        CAST(round(ln(CAST(xg AS DOUBLE) * CAST(nn AS DOUBLE)
                      / (CAST(xx AS DOUBLE) * CAST(ng AS DOUBLE))) * 1e6, 0)
             AS HUGEINT)) AS b,
        CAST(count(*) AS BIGINT) AS k
      FROM (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS ng,
              CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS xg
            FROM cust GROUP BY 1), g)
    SELECT nn AS n_cust, k AS n_nations,
      round(CAST(w AS DOUBLE) / (CAST(xx AS DOUBLE) * 1e6), 9) AS theil_total,
      round(CAST(b AS DOUBLE) / (CAST(xx AS DOUBLE) * 1e6), 9) AS theil_between,
      round(CAST(w - b AS DOUBLE) / (CAST(xx AS DOUBLE) * 1e6), 9) AS theil_within
    FROM g, w, b
  """))

  /** Peaks-over-threshold GPD tail fit of order values (Pickands
    * 1975; method-of-moments estimators per Hosking & Wallis 1987):
    * threshold = 1.5× the mean in EXACT cents (one truncating
    * division — no quantile, whose interpolation semantics differ
    * between engines), excesses z = value − thr, and the
    * moment estimators collapse to integer-ratio forms
    * ξ = ½·(1 − Sz²/(n·Szz − Sz²)), σ = ½·(Sz/n)·(1 + Sz²/(n·Szz −
    * Sz²)) — exact decimal sums, two double finishes. The tail
    * report every risk/outlier monitor wants from a value column. */
  private val qGpdTail = BoundQuery("q_gpd_tail", (s, d) => {
    val vals = graft.util.CacheScope.persist(
      Tables.orders(s, d).select(cents(col("o_totalprice")).as("bc")))
    val thr = vals.agg(
      expr("(3 * CAST(sum(bc) AS DECIMAL(38,0))) div (2 * count(1))")
        .cast("long").as("thr"))
    vals.crossJoin(broadcast(thr))
      .where(col("bc") > col("thr"))
      .select(col("thr"), (col("bc") - col("thr")).cast("decimal(38,0)").as("z"))
      .groupBy(col("thr"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("nz"),
        sum(col("z")).as("sz"), sum(col("z") * col("z")).as("szz"))
      .select(col("thr").as("thr_cents"), col("nz").cast("long").as("n_exceed"),
        round(expr("""0.5 * (1.0 -
          CAST(sz*sz AS DOUBLE) / CAST(nz*szz - sz*sz AS DOUBLE))"""), 9)
          .as("xi"),
        round(expr("""0.5 * (CAST(sz AS DOUBLE) / CAST(nz AS DOUBLE)) *
          (1.0 + CAST(sz*sz AS DOUBLE) / CAST(nz*szz - sz*sz AS DOUBLE))"""), 4)
          .as("sigma_cents"))
  }, Some("""
    WITH vals AS (
      SELECT CAST(round(o_totalprice*100, 0) AS BIGINT) AS bc FROM orders),
    thr AS (
      SELECT CAST((3 * CAST(sum(bc) AS HUGEINT)) // (2 * count(*)) AS BIGINT)
        AS thr FROM vals),
    ex AS (
      SELECT thr, CAST(count(*) AS HUGEINT) AS nz,
        CAST(sum(CAST(bc - thr AS HUGEINT)) AS HUGEINT) AS sz,
        CAST(sum(CAST(bc - thr AS HUGEINT) * CAST(bc - thr AS HUGEINT))
             AS HUGEINT) AS szz
      FROM vals, thr WHERE bc > thr GROUP BY thr)
    SELECT thr AS thr_cents, CAST(nz AS BIGINT) AS n_exceed,
      round(0.5 * (1.0 - CAST(sz*sz AS DOUBLE)
                   / CAST(nz*szz - sz*sz AS DOUBLE)), 9) AS xi,
      round(0.5 * (CAST(sz AS DOUBLE) / CAST(nz AS DOUBLE)) *
            (1.0 + CAST(sz*sz AS DOUBLE)
                   / CAST(nz*szz - sz*sz AS DOUBLE)), 4) AS sigma_cents
    FROM ex
  """))

  /** Generalized-entropy inequality companions to q_theil_index
    * (GE(1)): the mean log deviation GE(0) = (1/N)Σ ln(μ/xᵢ) —
    * bottom-sensitive where Theil is top-sensitive — and GE(2) =
    * ((1/N)Σ(xᵢ/μ)² − 1)/2, which clears COMPLETELY to
    * (N·Σx² − (Σx)²) / (2·(Σx)²): exact integers, one double. GE(0)
    * follows the micro-nat discipline: each ln(Σx) − ln(N·xᵢ) is
    * rounded once, summed exactly, one truncating division. */
  private val qMld = BoundQuery("q_mld", (s, d) => {
    val rev = graft.util.CacheScope.persist(
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sumCents(col("o_totalprice")).as("x")))
    val g = rev.agg(count(lit(1)).cast("decimal(38,0)").as("nn"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("qx"))
    rev.crossJoin(broadcast(g))
      .select(col("nn"), col("sx"), col("qx"),
        expr("""CAST(round((ln(CAST(sx AS DOUBLE))
          - ln(CAST(nn AS DOUBLE) * CAST(x AS DOUBLE))) * 1000000, 0)
          AS DECIMAL(38,0))""").as("l"))
      .groupBy("nn", "sx", "qx")
      .agg(sum(col("l")).as("sl"))
      .select(col("nn").cast("long").as("n_cust"),
        expr("CAST(sl div nn AS BIGINT)").as("mld_micronats"),
        round(expr("""CAST(nn*qx - sx*sx AS DOUBLE)
          / (2.0 * CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""), 9).as("ge2"))
  }, Some("""
    WITH rev AS (
      SELECT o_custkey,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1),
    g AS (SELECT CAST(count(*) AS HUGEINT) AS nn,
                 CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qx
          FROM rev),
    terms AS (
      SELECT nn, sx, qx,
        CAST(round((ln(CAST(sx AS DOUBLE))
          - ln(CAST(nn AS DOUBLE) * CAST(x AS DOUBLE))) * 1000000, 0)
          AS HUGEINT) AS l
      FROM rev, g)
    SELECT CAST(nn AS BIGINT) AS n_cust,
      CAST(sum(l) // nn AS BIGINT) AS mld_micronats,
      round(CAST(nn*qx - sx*sx AS DOUBLE)
        / (2.0 * CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS ge2
    FROM terms GROUP BY nn, sx, qx
  """))

  /** Price–volume–mix decomposition of each brand's 1997→1998
    * revenue change (the FP&A bridge: ΔR = price effect + volume
    * effect + residual mix): with per-(brand, year) exact integer
    * Q = Σ quantity-cents and R = Σ revenue-cents, unit prices stay
    * RATIONAL (R/Q never materializes) —
    * price = (R₁Q₀ − R₀Q₁) div Q₁, volume = (Q₁−Q₀)·R₀ div Q₀, and
    * mix is the exact remainder ΔR − price − volume, so the bridge
    * ADDS UP BY CONSTRUCTION. One fact scan, one broadcast part
    * join, one brand-grain pivot. */
  private val qPriceVolumeMix = BoundQuery("q_price_volume_mix", (s, d) => {
    val li = Tables.lineitem(s, d)
      .where(year(col("l_shipdate")).isin(1997, 1998))
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        year(col("l_shipdate")).as("yr"))
      .agg(sum(cents(col("l_quantity")).cast("decimal(38,0)")).as("q"),
        sum(cents(col("l_extendedprice")).cast("decimal(38,0)")).as("r"))
    li.groupBy("brand")
      .agg(sum(when(col("yr") === 1997, col("q"))).as("q0"),
        sum(when(col("yr") === 1998, col("q"))).as("q1"),
        sum(when(col("yr") === 1997, col("r"))).as("r0"),
        sum(when(col("yr") === 1998, col("r"))).as("r1"))
      .where(col("q0").isNotNull && col("q1").isNotNull)
      .select(col("brand"),
        (col("r1") - col("r0")).cast("long").as("delta_cents"),
        expr("CAST((r1*q0 - r0*q1) div q1 AS BIGINT)").as("price_effect_cents"),
        expr("CAST(((q1 - q0) * r0) div q0 AS BIGINT)").as("volume_effect_cents"),
        expr("""CAST((r1 - r0) - ((r1*q0 - r0*q1) div q1)
          - (((q1 - q0) * r0) div q0) AS BIGINT)""").as("mix_effect_cents"))
      .orderBy("brand")
  }, Some("""
    WITH li AS (
      SELECT p_brand AS brand, year(l_shipdate) AS yr,
        CAST(sum(CAST(round(l_quantity*100, 0) AS BIGINT)) AS HUGEINT) AS q,
        CAST(sum(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS HUGEINT) AS r
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE year(l_shipdate) IN (1997, 1998)
      GROUP BY 1, 2),
    p AS (
      SELECT brand,
        sum(CASE WHEN yr = 1997 THEN q END) AS q0,
        sum(CASE WHEN yr = 1998 THEN q END) AS q1,
        sum(CASE WHEN yr = 1997 THEN r END) AS r0,
        sum(CASE WHEN yr = 1998 THEN r END) AS r1
      FROM li GROUP BY 1)
    SELECT brand, CAST(r1 - r0 AS BIGINT) AS delta_cents,
      CAST((r1*q0 - r0*q1) // q1 AS BIGINT) AS price_effect_cents,
      CAST(((q1 - q0) * r0) // q0 AS BIGINT) AS volume_effect_cents,
      CAST((r1 - r0) - ((r1*q0 - r0*q1) // q1) - (((q1 - q0) * r0) // q0)
        AS BIGINT) AS mix_effect_cents
    FROM p WHERE q0 IS NOT NULL AND q1 IS NOT NULL
    ORDER BY brand
  """))

  /** Atkinson inequality indices at ε = 1 and ε = 2 (Atkinson, JET
    * 1970) over per-customer revenue — the welfare-weighted
    * companions to q_gini/q_theil_index: A(1) = 1 − geomean/mean
    * (log-utility), A(2) = 1 − harmean/mean (the inequality view
    * most sensitive to the poorest tail). House parity rules: exact
    * cents sums; ln(x) and 1/x rounded ONCE per row to fixed
    * integer units (micro-nats / 1e-12 reciprocals) so every
    * aggregate is an order-invariant integer sum; two double
    * finishes replayed by the identical expression tree in DuckDB.
    * One scan, one 4-sum aggregate — at 100 TB this is a map-side
    * partial plus a 1-row combine. */
  private val qAtkinson = BoundQuery("q_atkinson", (s, d) => {
    val rev = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sumCents(col("o_totalprice")).as("x"))
    val agg = rev.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("xx"),
      sum(round(log(col("x").cast("double")) * 1e6, 0).cast("long")).as("sln"),
      sum(round(lit(1e12) / col("x").cast("double"), 0).cast("long")).as("sinv"))
    agg.select(
      col("n").cast("long").as("n_cust"),
      round(col("xx").cast("double") / col("n").cast("double") / 100.0, 6)
        .as("mean_rev"),
      round(lit(1.0) - exp(col("sln").cast("double") /
          (col("n").cast("double") * 1e6)) /
        (col("xx").cast("double") / col("n").cast("double")), 9)
        .as("atkinson_1"),
      round(lit(1.0) - (col("n").cast("double") * 1e12 /
          col("sinv").cast("double")) /
        (col("xx").cast("double") / col("n").cast("double")), 9)
        .as("atkinson_2"))
  }, Some("""
    WITH rev AS (
      SELECT o_custkey,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS xx,
        CAST(sum(CAST(round(ln(CAST(x AS DOUBLE)) * 1e6, 0) AS BIGINT))
             AS BIGINT) AS sln,
        CAST(sum(CAST(round(1e12 / CAST(x AS DOUBLE), 0) AS BIGINT))
             AS BIGINT) AS sinv
      FROM rev)
    SELECT n AS n_cust,
      round(CAST(xx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mean_rev,
      round(1.0 - exp(CAST(sln AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6))
        / (CAST(xx AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS atkinson_1,
      round(1.0 - (CAST(n AS DOUBLE) * 1e12 / CAST(sinv AS DOUBLE))
        / (CAST(xx AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS atkinson_2
    FROM a
  """))

  /** Palma ratio — top-10% revenue share over bottom-40% share
    * (Palma 2011; Cobham & Sumner 2013), the inequality readout that
    * ignores the stable middle. Cutoffs are EXACT integer counts
    * (n div 10, 4·n div 10 — no quantile interpolation semantics to
    * disagree on); membership comes from the two-phase
    * Ranking.globalRowNumber (desc revenue, custkey tiebreak), so no
    * single-partition window at any scale; shares are exact cents
    * ratios finished as doubles. */
  private val qPalma = BoundQuery("q_palma", (s, d) => {
    val rev = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sumCents(col("o_totalprice")).as("x"))
    val ranked = graft.operators.Ranking.globalRowNumber(
      rev, "rn", col("x").desc, col("o_custkey"))
    val g = ranked.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("xx"))
    ranked.crossJoin(broadcast(g))
      .select(col("x"), col("rn"), col("n"), col("xx"),
        (col("rn") < expr("n div 10")).as("is_top"),
        (col("rn") >= col("n") - expr("(4 * n) div 10")).as("is_bot"))
      .agg(
        max(col("n")).cast("long").as("n_cust"),
        sum(when(col("is_top"), col("x")).otherwise(lit(0L))
          .cast("decimal(38,0)")).as("top_c"),
        sum(when(col("is_bot"), col("x")).otherwise(lit(0L))
          .cast("decimal(38,0)")).as("bot_c"),
        max(col("xx")).as("xx"))
      .select(col("n_cust"),
        round(col("top_c").cast("double") / col("xx").cast("double"), 9)
          .as("top10_share"),
        round(col("bot_c").cast("double") / col("xx").cast("double"), 9)
          .as("bottom40_share"),
        round(col("top_c").cast("double") / col("bot_c").cast("double"), 9)
          .as("palma_ratio"))
  }, Some("""
    WITH rev AS (
      SELECT o_custkey,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT x, CAST(row_number() OVER (ORDER BY x DESC, o_custkey) - 1
                     AS BIGINT) AS rn
      FROM rev),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS xx FROM ranked)
    SELECT n AS n_cust,
      round(CAST(sum(CASE WHEN rn < n // 10 THEN CAST(x AS HUGEINT)
                          ELSE 0 END) AS DOUBLE)
            / CAST(xx AS DOUBLE), 9) AS top10_share,
      round(CAST(sum(CASE WHEN rn >= n - (4 * n) // 10
                          THEN CAST(x AS HUGEINT) ELSE 0 END) AS DOUBLE)
            / CAST(xx AS DOUBLE), 9) AS bottom40_share,
      round(CAST(sum(CASE WHEN rn < n // 10 THEN CAST(x AS HUGEINT)
                          ELSE 0 END) AS DOUBLE)
            / CAST(sum(CASE WHEN rn >= n - (4 * n) // 10
                            THEN CAST(x AS HUGEINT) ELSE 0 END) AS DOUBLE),
            9) AS palma_ratio
    FROM ranked, g
    GROUP BY n, xx
  """))

  val all: Seq[BoundQuery] = Seq(qFunnelSig, qElasticity, qXyzClass,
    qFisherIndex, qCroston, qWilsonCi, qMaxdrawdown, qTheilIndex, qGpdTail,
    qMld, qPriceVolumeMix, qAtkinson, qPalma)
}
