package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 stats wave 6 (r5): partial autocorrelation (the AR
  * order-selection readout on top of q_acf) and variance inflation
  * factors (the multicollinearity audit for the q_ols3 feature set).
  *
  * Both finish through GENERATED expression strings applied verbatim
  * on both engines — the Durbin–Levinson recursion and the 3×3
  * correlation-inverse diagonals are built once in Scala and pasted
  * into the Spark plan and the DuckDB oracle alike, so the double
  * trees cannot drift (the q_dtw column-unroll school).
  */
object StatsQueries6 {

  private val pacfLags = 5

  /** Durbin–Levinson levels as (columnName, sqlExpr) pairs over
    * r1..r5 — shared verbatim by both engines. */
  private def dlExprs: Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    out += (("phi_1_1", "r1"))
    for (k <- 2 to pacfLags) {
      val num = s"r$k - (" +
        (1 until k).map(j => s"phi_${k - 1}_$j * r${k - j}").mkString(" + ") + ")"
      val den = "1.0 - (" +
        (1 until k).map(j => s"phi_${k - 1}_$j * r$j").mkString(" + ") + ")"
      out += ((s"phi_${k}_$k", s"($num) / ($den)"))
      for (j <- 1 until k)
        out += ((s"phi_${k}_$j", s"phi_${k - 1}_$j - phi_${k}_$k * phi_${k - 1}_${k - j}"))
    }
    out.toSeq
  }

  /** PACF at lags 1..5 of the daily-revenue series via
    * Durbin–Levinson on the EXACT integer ACF (the q_acf ppm values
    * — n·x − Σx centering in decimals, one truncating division per
    * lag): both engines read identical ρ ppm integers, convert once
    * to doubles, and replay the identical generated recursion.
    * Scale shape: q_acf's — calendar-bounded series, lag joins on
    * date keys, then a 1-row scalar pipeline. */
  private val qPacf = BoundQuery("q_pacf", (s, d) => {
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
    val lags = s.range(1, pacfLags + 1).select(col("id").as("lag"))
    val acf = y.crossJoin(broadcast(lags))
      .join(y.select(col("day").as("bday"), col("y").as("yb")),
        col("bday") === date_add(col("day"), col("lag").cast("int")))
      .groupBy("lag")
      .agg(sum(col("y") * col("yb")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), expr("num div den_m").as("acf_ppm"))
    var wide: DataFrame = acf.groupBy()
      .agg(max(when(col("lag") === 1, col("acf_ppm"))).as("a1"),
        (2 to pacfLags).map(k =>
          max(when(col("lag") === k, col("acf_ppm"))).as(s"a$k")): _*)
      .select((1 to pacfLags).map(k =>
        (col(s"a$k").cast("double") / 1e6).as(s"r$k")): _*)
    for ((nm, sql) <- dlExprs) wide = wide.withColumn(nm, expr(sql))
    (1 to pacfLags).map(k =>
      wide.select(lit(k.toLong).as("lag"),
        round(col(s"phi_${k}_$k"), 9).as("pacf")))
      .reduce(_ unionByName _).orderBy("lag")
  }, Some {
    val chain = new StringBuilder
    var prev = "wide"
    var idx = 0
    for ((nm, sql) <- dlExprs) {
      idx += 1
      chain.append(s",\n    t$idx AS (SELECT *, $sql AS $nm FROM $prev)")
      prev = s"t$idx"
    }
    val arms = (1 to pacfLags).map(k =>
      s"SELECT CAST($k AS BIGINT) AS lag, round(phi_${k}_$k, 9) AS pacf FROM $prev")
      .mkString("\n    UNION ALL ")
    s"""
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
      CROSS JOIN (SELECT unnest(range(1, ${pacfLags + 1})) AS lag) l
      JOIN y b ON b.day = a.day + CAST(l.lag AS INTEGER)
      CROSS JOIN den
      GROUP BY l.lag, den_m),
    wide AS (
      SELECT ${(1 to pacfLags).map(k =>
        s"CAST(max(CASE WHEN lag = $k THEN acf_ppm END) AS DOUBLE)/1e6 AS r$k")
        .mkString(",\n             ")}
      FROM acf)$chain
    $arms
    ORDER BY lag
  """
  })

  /** Variance inflation factors of the 3-feature per-order design
    * (total quantity, line count, summed discount bp — the q_ols3
    * features plus the discount channel): VIF_j = [R⁻¹]_jj from the
    * 3×3 Pearson correlation matrix, closed-form
    *   VIF_1 = (1 − r23²)/detR,  detR = 1 + 2·r12·r13·r23 − r12² −
    *   r13² − r23²
    * (and cyclically). Correlations come from ONE exact-integer
    * moment pass (small-domain units — BIGINT headroom at any n);
    * the ratios are identical double trees. VIF > 5-10 is the
    * standard "drop a feature" alarm for q_ols3's normal equations. */
  private val qVif = BoundQuery("q_vif", (s, d) => {
    val per = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("x1"),
        count(lit(1)).as("x2"),
        sum(expr("CAST(round(l_discount*10000, 0) AS LONG)")).as("x3"))
    val m = per.agg(count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("x3")).as("s3"),
      sum(col("x1") * col("x1")).as("s11"), sum(col("x2") * col("x2")).as("s22"),
      sum(col("x3") * col("x3")).as("s33"), sum(col("x1") * col("x2")).as("s12"),
      sum(col("x1") * col("x3")).as("s13"), sum(col("x2") * col("x3")).as("s23"))
    def cD(nm: String) = col(nm).cast("double")
    def corr(sab: String, sa: String, sb: String, saa: String, sbb: String) =
      (cD("n") * cD(sab) - cD(sa) * cD(sb)) /
        sqrt((cD("n") * cD(saa) - cD(sa) * cD(sa)) *
          (cD("n") * cD(sbb) - cD(sb) * cD(sb)))
    val withR = m
      .withColumn("r12", corr("s12", "s1", "s2", "s11", "s22"))
      .withColumn("r13", corr("s13", "s1", "s3", "s11", "s33"))
      .withColumn("r23", corr("s23", "s2", "s3", "s22", "s33"))
      .withColumn("detr", lit(1.0) + lit(2.0) * col("r12") * col("r13") * col("r23")
        - col("r12") * col("r12") - col("r13") * col("r13") - col("r23") * col("r23"))
    Seq(("qty", "r23"), ("lines", "r13"), ("disc", "r12")).map { case (f, rOpp) =>
      withR.select(lit(f).as("feature"), col("n"),
        round((lit(1.0) - col(rOpp) * col(rOpp)) / col("detr"), 9).as("vif"))
    }.reduce(_ unionByName _).orderBy("feature")
  }, Some("""
    WITH per AS (
      SELECT l_orderkey,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x1,
        CAST(count(*) AS BIGINT) AS x2,
        CAST(sum(CAST(round(l_discount*10000, 0) AS BIGINT)) AS BIGINT) AS x3
      FROM lineitem GROUP BY 1),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
        CAST(sum(x3) AS BIGINT) AS s3,
        CAST(sum(x1*x1) AS BIGINT) AS s11, CAST(sum(x2*x2) AS BIGINT) AS s22,
        CAST(sum(x3*x3) AS BIGINT) AS s33, CAST(sum(x1*x2) AS BIGINT) AS s12,
        CAST(sum(x1*x3) AS BIGINT) AS s13, CAST(sum(x2*x3) AS BIGINT) AS s23
      FROM per),
    r AS (
      SELECT n,
        (CAST(n AS DOUBLE)*CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s2 AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE)*CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE))
               * (CAST(n AS DOUBLE)*CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(s2 AS DOUBLE))) AS r12,
        (CAST(n AS DOUBLE)*CAST(s13 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s3 AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE)*CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE))
               * (CAST(n AS DOUBLE)*CAST(s33 AS DOUBLE) - CAST(s3 AS DOUBLE)*CAST(s3 AS DOUBLE))) AS r13,
        (CAST(n AS DOUBLE)*CAST(s23 AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(s3 AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE)*CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(s2 AS DOUBLE))
               * (CAST(n AS DOUBLE)*CAST(s33 AS DOUBLE) - CAST(s3 AS DOUBLE)*CAST(s3 AS DOUBLE))) AS r23
      FROM m),
    dd AS (
      SELECT *, 1.0 + 2.0*r12*r13*r23 - r12*r12 - r13*r13 - r23*r23 AS detr
      FROM r)
    SELECT 'disc' AS feature, n, round((1.0 - r12*r12) / detr, 9) AS vif FROM dd
    UNION ALL
    SELECT 'lines', n, round((1.0 - r13*r13) / detr, 9) FROM dd
    UNION ALL
    SELECT 'qty', n, round((1.0 - r23*r23) / detr, 9) FROM dd
    ORDER BY feature
  """))

  /** Odds ratio with Woolf logit CI (Woolf 1955) on the 2×2 of
    * URGENT-priority × above-global-mean order value: the four cell
    * counts and the mean threshold are exact integers; ln(OR) is one
    * double over the exact cross-product ratio, Woolf's
    * SE = √(1/a+1/b+1/c+1/d) is a FIXED-ORDER four-term double sum
    * under an IEEE-exact sqrt, and the CI finishes through exp with
    * the 1.959964 literal written on both sides. */
  private val qOddsRatio = BoundQuery("q_odds_ratio", (s, d) => {
    val o = graft.util.CacheScope.persist(
      Tables.orders(s, d).select(
        (col("o_orderpriority") === "1-URGENT").cast("long").as("u"),
        cents(col("o_totalprice")).as("bc")))
    val thr = o.agg(
      expr("CAST(sum(bc) AS DECIMAL(38,0)) div count(1)").as("thr"))
    o.crossJoin(broadcast(thr))
      .select(col("u"), (col("bc") > col("thr")).cast("long").as("hi"))
      .agg(sum(expr("u * hi")).as("a"),
        sum(expr("u * (1 - hi)")).as("b"),
        sum(expr("(1 - u) * hi")).as("c"),
        sum(expr("(1 - u) * (1 - hi)")).as("dd"))
      .select(col("a"), col("b"), col("c"), col("dd").as("d"),
        round(expr("""(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE))
                    / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"""), 6)
          .as("odds_ratio"),
        round(expr("""exp(ln((CAST(a AS DOUBLE) * CAST(dd AS DOUBLE))
                           / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
          - 1.959964 * sqrt(1.0/CAST(a AS DOUBLE) + 1.0/CAST(b AS DOUBLE)
                          + 1.0/CAST(c AS DOUBLE) + 1.0/CAST(dd AS DOUBLE)))"""), 6)
          .as("ci_lo"),
        round(expr("""exp(ln((CAST(a AS DOUBLE) * CAST(dd AS DOUBLE))
                           / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
          + 1.959964 * sqrt(1.0/CAST(a AS DOUBLE) + 1.0/CAST(b AS DOUBLE)
                          + 1.0/CAST(c AS DOUBLE) + 1.0/CAST(dd AS DOUBLE)))"""), 6)
          .as("ci_hi"))
  }, Some("""
    WITH o AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS u,
             CAST(round(o_totalprice*100, 0) AS BIGINT) AS bc
      FROM orders),
    thr AS (SELECT CAST(sum(bc) AS HUGEINT) // count(*) AS thr FROM o),
    cells AS (
      SELECT
        CAST(sum(u * hi) AS BIGINT) AS a,
        CAST(sum(u * (1 - hi)) AS BIGINT) AS b,
        CAST(sum((1 - u) * hi) AS BIGINT) AS c,
        CAST(sum((1 - u) * (1 - hi)) AS BIGINT) AS dd
      FROM (SELECT u, CASE WHEN bc > thr THEN 1 ELSE 0 END AS hi FROM o, thr))
    SELECT a, b, c, dd AS d,
      round((CAST(a AS DOUBLE) * CAST(dd AS DOUBLE))
          / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 6) AS odds_ratio,
      round(exp(ln((CAST(a AS DOUBLE) * CAST(dd AS DOUBLE))
                 / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
        - 1.959964 * sqrt(1.0/CAST(a AS DOUBLE) + 1.0/CAST(b AS DOUBLE)
                        + 1.0/CAST(c AS DOUBLE) + 1.0/CAST(dd AS DOUBLE))), 6)
        AS ci_lo,
      round(exp(ln((CAST(a AS DOUBLE) * CAST(dd AS DOUBLE))
                 / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
        + 1.959964 * sqrt(1.0/CAST(a AS DOUBLE) + 1.0/CAST(b AS DOUBLE)
                        + 1.0/CAST(c AS DOUBLE) + 1.0/CAST(dd AS DOUBLE))), 6)
        AS ci_hi
    FROM cells
  """))

  /** Cochran–Armitage trend test (Cochran 1954; Armitage 1955) for a
    * monotone share of above-mean order values across the FIVE
    * ordered priorities (scores 1..5 from the priority label's
    * leading digit): with rᵢ successes of nᵢ at score sᵢ, the
    * statistic clears to Z² = U²·N / (R(N−R)·(N·Σnᵢsᵢ² − (Σnᵢsᵢ)²))
    * with U = N·Σsᵢrᵢ − R·Σsᵢnᵢ — every term an exact integer, one
    * double division at the end. One scan, one 5-row aggregate. */
  private val qCochranArmitage = BoundQuery("q_cochran_armitage", (s, d) => {
    val o = graft.util.CacheScope.persist(
      Tables.orders(s, d).select(
        expr("CAST(substring(o_orderpriority, 1, 1) AS LONG)").as("sc"),
        cents(col("o_totalprice")).as("bc")))
    val thr = o.agg(
      expr("CAST(sum(bc) AS DECIMAL(38,0)) div count(1)").as("thr"))
    o.crossJoin(broadcast(thr))
      .select(col("sc"), (col("bc") > col("thr")).cast("long").as("hi"))
      .groupBy("sc").agg(count(lit(1)).as("n"), sum(col("hi")).as("r"))
      .agg(sum(expr("CAST(n AS DECIMAL(38,0))")).as("nn"),
        sum(expr("CAST(r AS DECIMAL(38,0))")).as("rr"),
        sum(expr("CAST(sc AS DECIMAL(38,0)) * r")).as("sr"),
        sum(expr("CAST(sc AS DECIMAL(38,0)) * n")).as("sn"),
        sum(expr("CAST(sc AS DECIMAL(38,0)) * sc * n")).as("ssn"),
        count(lit(1)).as("k"))
      .select(col("k"), col("nn").cast("long").as("n_total"),
        col("rr").cast("long").as("n_success"),
        round(expr("""
          (CAST(nn*sr - rr*sn AS DOUBLE) * CAST(nn*sr - rr*sn AS DOUBLE)
           * CAST(nn AS DOUBLE))
          / (CAST(rr AS DOUBLE) * CAST(nn - rr AS DOUBLE)
             * CAST(nn*ssn - sn*sn AS DOUBLE))"""), 6).as("ca_z2"))
  }, Some("""
    WITH o AS (
      SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS sc,
             CAST(round(o_totalprice*100, 0) AS BIGINT) AS bc
      FROM orders),
    thr AS (SELECT CAST(sum(bc) AS HUGEINT) // count(*) AS thr FROM o),
    g AS (
      SELECT sc, CAST(count(*) AS HUGEINT) AS n,
        CAST(sum(CASE WHEN bc > thr THEN 1 ELSE 0 END) AS HUGEINT) AS r
      FROM o, thr GROUP BY 1),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS k, sum(n) AS nn, sum(r) AS rr,
        sum(sc * r) AS sr, sum(sc * n) AS sn, sum(sc * sc * n) AS ssn
      FROM g)
    SELECT k, CAST(nn AS BIGINT) AS n_total, CAST(rr AS BIGINT) AS n_success,
      round((CAST(nn*sr - rr*sn AS DOUBLE) * CAST(nn*sr - rr*sn AS DOUBLE)
             * CAST(nn AS DOUBLE))
            / (CAST(rr AS DOUBLE) * CAST(nn - rr AS DOUBLE)
               * CAST(nn*ssn - sn*sn AS DOUBLE)), 6) AS ca_z2
    FROM m
  """))

  /** Likelihood-ratio G-test of independence on the segment ×
    * priority contingency (Sokal & Rohlf; the χ² twin that stays
    * calibrated at small expected counts): G = 2·Σ O·ln(O·N/(R·C)).
    * Cell/margin counts are exact; each cell's ln is micro-rounded
    * once and weighted by the exact O, so the sum is
    * order-independent; G finishes with one division by 10⁶. */
  private val qGTest = BoundQuery("q_g_test", (s, d) => {
    val cells = graft.util.CacheScope.persist(
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("o")))
    val rows = cells.groupBy("seg").agg(sum(col("o")).as("r"))
    val cols = cells.groupBy("pri").agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("nn"), count(lit(1)).as("n_cells"))
    cells.join(broadcast(rows), "seg").join(broadcast(cols), "pri")
      .crossJoin(broadcast(tot))
      .select(col("n_cells"), col("nn"),
        (col("o").cast("decimal(38,0)") *
          expr("""CAST(round(ln(CAST(o AS DOUBLE) * CAST(nn AS DOUBLE)
            / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))) * 1000000, 0)
            AS DECIMAL(38,0))""")).as("term"))
      .groupBy("n_cells", "nn")
      .agg(sum(col("term")).as("st"))
      .select(col("n_cells"), col("nn").as("n_obs"),
        round(expr("2.0 * CAST(st AS DOUBLE) / 1000000.0"), 6).as("g_stat"))
  }, Some("""
    WITH cells AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri,
        CAST(count(*) AS BIGINT) AS o
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    r AS (SELECT seg, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
    c AS (SELECT pri, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
                   CAST(count(*) AS BIGINT) AS n_cells FROM cells),
    terms AS (
      SELECT n_cells, nn,
        CAST(o AS HUGEINT) *
          CAST(round(ln(CAST(o AS DOUBLE) * CAST(nn AS DOUBLE)
            / (CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE))) * 1000000, 0)
            AS HUGEINT) AS term
      FROM cells JOIN r USING (seg) JOIN c USING (pri) CROSS JOIN tot)
    SELECT n_cells, nn AS n_obs,
      round(2.0 * CAST(sum(term) AS DOUBLE) / 1000000.0, 6) AS g_stat
    FROM terms GROUP BY n_cells, nn
  """))

  /** Fisher z test for a CHANGE in correlation: is the view↔purchase
    * daily-revenue correlation different in the second half of the
    * window than the first? Each half's Pearson r comes from exact
    * integer moments over aligned days (the q_ccf lag-0 machinery
    * split at the q_rate_ratio integer midpoint); z = atanh(r) as the
    * written-out ½·ln((1+r)/(1−r)) tree, and the difference is scored
    * against √(1/(n₁−3) + 1/(n₂−3)). */
  private val qFisherZ = BoundQuery("q_fisher_z", (s, d) => {
    val daily = graft.util.CacheScope.persist(
      Tables.events(s, d)
        .where(col("event_type").isin("view", "purchase"))
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(sum(cents(col("value"))).as("y"))
        .withColumn("ud", expr("unix_date(day)")))
    val mid = daily.agg(expr("(min(ud) + max(ud)) div 2").as("mid"))
    val x = daily.where(col("event_type") === "view")
      .select(col("day"), col("ud"), col("y").cast("decimal(38,0)").as("x"))
    val yv = daily.where(col("event_type") === "purchase")
      .select(col("day").as("d2"), col("y").cast("decimal(38,0)").as("yy"))
    val m = x.join(yv, col("day") === col("d2"))
      .crossJoin(broadcast(mid))
      .groupBy((col("ud") <= col("mid")).cast("long").as("h"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("yy")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("yy") * col("yy")).as("syy"),
        sum(col("x") * col("yy")).as("sxy"))
      .withColumn("r", expr("""CAST(n*sxy - sx*sy AS DOUBLE)
        / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))"""))
      .select(col("h"), col("n").cast("long").as("n"), col("r"))
    m.groupBy()
      .agg(sum(when(col("h") === 1L, col("n"))).as("n1"),
        sum(when(col("h") === 0L, col("n"))).as("n2"),
        sum(when(col("h") === 1L, col("r"))).as("r1"),
        sum(when(col("h") === 0L, col("r"))).as("r2"))
      .select(col("n1"), col("n2"), round(col("r1"), 9).as("r_first"),
        round(col("r2"), 9).as("r_second"),
        round(expr("""(0.5 * ln((1.0 + r1) / (1.0 - r1))
            - 0.5 * ln((1.0 + r2) / (1.0 - r2)))
          / sqrt(1.0 / (CAST(n1 AS DOUBLE) - 3.0)
               + 1.0 / (CAST(n2 AS DOUBLE) - 3.0))"""), 6).as("z"))
  }, Some("""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y,
        CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ud
      FROM events WHERE event_type IN ('view', 'purchase')
      GROUP BY 1, 2, 4),
    mid AS (SELECT (min(ud) + max(ud)) // 2 AS mid FROM daily),
    x AS (SELECT day, ud, CAST(y AS HUGEINT) AS x FROM daily
          WHERE event_type = 'view'),
    yv AS (SELECT day AS d2, CAST(y AS HUGEINT) AS yy FROM daily
           WHERE event_type = 'purchase'),
    halves AS (
      SELECT CASE WHEN ud <= mid THEN 1 ELSE 0 END AS h,
        CAST(count(*) AS HUGEINT) AS n,
        sum(x) AS sx, sum(yy) AS sy, sum(x*x) AS sxx,
        sum(yy*yy) AS syy, sum(x*yy) AS sxy
      FROM x JOIN yv ON day = d2 CROSS JOIN mid
      GROUP BY 1),
    rs AS (
      SELECT h, CAST(n AS BIGINT) AS n,
        CAST(n*sxy - sx*sy AS DOUBLE)
          / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
          AS r
      FROM halves)
    SELECT
      CAST(sum(CASE WHEN h = 1 THEN n END) AS BIGINT) AS n1,
      CAST(sum(CASE WHEN h = 0 THEN n END) AS BIGINT) AS n2,
      round(sum(CASE WHEN h = 1 THEN r END), 9) AS r_first,
      round(sum(CASE WHEN h = 0 THEN r END), 9) AS r_second,
      round((0.5 * ln((1.0 + sum(CASE WHEN h = 1 THEN r END))
                    / (1.0 - sum(CASE WHEN h = 1 THEN r END)))
           - 0.5 * ln((1.0 + sum(CASE WHEN h = 0 THEN r END))
                    / (1.0 - sum(CASE WHEN h = 0 THEN r END))))
        / sqrt(1.0 / (CAST(sum(CASE WHEN h = 1 THEN n END) AS DOUBLE) - 3.0)
             + 1.0 / (CAST(sum(CASE WHEN h = 0 THEN n END) AS DOUBLE) - 3.0)), 6)
        AS z
    FROM rs
  """))

  /** TOST equivalence test (Schuirmann 1987): is mean order value in
    * the second half of the window EQUIVALENT to the first, within
    * ±2% of the pooled mean? The inverse question of q_ab_test's
    * difference test — shipping teams need "provably unchanged", not
    * "not provably changed". Bounds are exact integers
    * (δ = 2·ΣX div (100·N) cents); the two one-sided t statistics
    * share a Welch SE over exact half moments; equivalence holds when
    * min(t₁, t₂) > 1.645 (the 5% one-sided normal cut, reported as a
    * flag beside the statistics). */
  private val qTost = BoundQuery("q_tost", (s, d) => {
    val o = graft.util.CacheScope.persist(
      Tables.orders(s, d)
        .select(expr("unix_date(to_date(o_orderdate))").as("ud"),
          cents(col("o_totalprice")).cast("decimal(38,0)").as("bc")))
    val mid = o.agg(expr("(min(ud) + max(ud)) div 2").as("mid"),
      expr("(2 * sum(bc)) div (100 * count(1))").as("delta"))
    o.crossJoin(broadcast(mid))
      .groupBy(col("delta"), (col("ud") <= col("mid")).cast("long").as("h"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("bc")).as("sx"), sum(col("bc") * col("bc")).as("qx"))
      .groupBy("delta")
      .agg(sum(when(col("h") === 1L, col("n"))).as("n1"),
        sum(when(col("h") === 0L, col("n"))).as("n2"),
        sum(when(col("h") === 1L, col("sx"))).as("s1"),
        sum(when(col("h") === 0L, col("sx"))).as("s2"),
        sum(when(col("h") === 1L, col("qx"))).as("q1"),
        sum(when(col("h") === 0L, col("qx"))).as("q2"))
      .withColumn("md", expr(
        "CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE)"))
      .withColumn("se", expr("""sqrt(
        CAST(n1*q1 - s1*s1 AS DOUBLE) / (CAST(n1 AS DOUBLE)*CAST(n1 AS DOUBLE)*(CAST(n1 AS DOUBLE)-1.0))
        + CAST(n2*q2 - s2*s2 AS DOUBLE) / (CAST(n2 AS DOUBLE)*CAST(n2 AS DOUBLE)*(CAST(n2 AS DOUBLE)-1.0)))"""))
      .select(col("n1").cast("long").as("n_first"),
        col("n2").cast("long").as("n_second"),
        col("delta").cast("long").as("delta_cents"),
        round(expr("(md + CAST(delta AS DOUBLE)) / se"), 6).as("t_lower"),
        round(expr("(CAST(delta AS DOUBLE) - md) / se"), 6).as("t_upper"),
        (expr("least((md + CAST(delta AS DOUBLE)) / se, (CAST(delta AS DOUBLE) - md) / se)")
          > lit(1.645)).as("equivalent"))
  }, Some("""
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS ud,
        CAST(CAST(round(o_totalprice*100, 0) AS BIGINT) AS HUGEINT) AS bc
      FROM orders),
    mid AS (SELECT (min(ud) + max(ud)) // 2 AS mid,
                   (2 * sum(bc)) // (100 * count(*)) AS delta FROM o),
    halves AS (
      SELECT delta, CASE WHEN ud <= mid THEN 1 ELSE 0 END AS h,
        CAST(count(*) AS HUGEINT) AS n, sum(bc) AS sx, sum(bc*bc) AS qx
      FROM o, mid GROUP BY 1, 2),
    m AS (
      SELECT delta,
        sum(CASE WHEN h = 1 THEN n END) AS n1,
        sum(CASE WHEN h = 0 THEN n END) AS n2,
        sum(CASE WHEN h = 1 THEN sx END) AS s1,
        sum(CASE WHEN h = 0 THEN sx END) AS s2,
        sum(CASE WHEN h = 1 THEN qx END) AS q1,
        sum(CASE WHEN h = 0 THEN qx END) AS q2
      FROM halves GROUP BY delta),
    fin AS (
      SELECT *,
        CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE)
          - CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE) AS md,
        sqrt(CAST(n1*q1 - s1*s1 AS DOUBLE)
               / (CAST(n1 AS DOUBLE)*CAST(n1 AS DOUBLE)*(CAST(n1 AS DOUBLE)-1.0))
           + CAST(n2*q2 - s2*s2 AS DOUBLE)
               / (CAST(n2 AS DOUBLE)*CAST(n2 AS DOUBLE)*(CAST(n2 AS DOUBLE)-1.0)))
          AS se
      FROM m)
    SELECT CAST(n1 AS BIGINT) AS n_first, CAST(n2 AS BIGINT) AS n_second,
      CAST(delta AS BIGINT) AS delta_cents,
      round((md + CAST(delta AS DOUBLE)) / se, 6) AS t_lower,
      round((CAST(delta AS DOUBLE) - md) / se, 6) AS t_upper,
      least((md + CAST(delta AS DOUBLE)) / se,
            (CAST(delta AS DOUBLE) - md) / se) > 1.645 AS equivalent
    FROM fin
  """))

  /** Wald instrumental-variable estimate (the 1-instrument 2SLS
    * closed form): β_IV = (ȳ|z=1 − ȳ|z=0) / (x̄|z=1 − x̄|z=0), here
    * instrumenting order size (x = line count) with the urgency flag
    * on order value (y, cents) — the causal-inference third leg
    * beside q_ipw (weighting) and q_caliper_match (matching). On a
    * near-independent synthetic instrument the first stage is weak
    * and the estimate is a placebo audit, exactly like q_did — the
    * engine contract is the ESTIMATOR, exact conditional sums with
    * one double finish per emitted value. One join, one 2-group
    * reduction. */
  private val qIvWald = BoundQuery("q_iv_wald", (s, d) => {
    val feats = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("x"))
      .join(Tables.orders(s, d).select(
        col("o_orderkey").as("l_orderkey"),
        graft.functions.Num.cents(col("o_totalprice")).as("y"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long").as("z")),
        Seq("l_orderkey"))
    feats.agg(
      count(lit(1)).as("n"), sum(col("z")).as("nz"),
      sum(col("z") * col("x")).as("x1"), sum(col("z") * col("y")).as("y1"),
      sum((lit(1L) - col("z")) * col("x")).as("x0"),
      sum((lit(1L) - col("z")) * col("y")).as("y0"))
      .select(col("n").cast("long").as("n_orders"), col("nz").as("n_instrumented"),
        round(col("x1").cast("double") / col("nz").cast("double")
          - col("x0").cast("double") / (col("n") - col("nz")).cast("double"), 9)
          .as("first_stage"),
        round((col("y1").cast("double") / col("nz").cast("double")
            - col("y0").cast("double") / (col("n") - col("nz")).cast("double"))
          / (col("x1").cast("double") / col("nz").cast("double")
            - col("x0").cast("double") / (col("n") - col("nz")).cast("double")),
          6).as("beta_iv_cents"))
  }, Some("""
    WITH feats AS (
      SELECT l.x, o.y, o.z FROM (
        SELECT l_orderkey, CAST(count(*) AS BIGINT) AS x
        FROM lineitem GROUP BY 1) l
      JOIN (
        SELECT o_orderkey,
          CAST(round(o_totalprice*100, 0) AS BIGINT) AS y,
          CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END AS z
        FROM orders) o ON o.o_orderkey = l.l_orderkey),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(z) AS BIGINT) AS nz,
        CAST(sum(z*x) AS BIGINT) AS x1, CAST(sum(z*y) AS BIGINT) AS y1,
        CAST(sum((1-z)*x) AS BIGINT) AS x0,
        CAST(sum((1-z)*y) AS BIGINT) AS y0
      FROM feats)
    SELECT n AS n_orders, nz AS n_instrumented,
      round(CAST(x1 AS DOUBLE)/CAST(nz AS DOUBLE)
        - CAST(x0 AS DOUBLE)/CAST(n - nz AS DOUBLE), 9) AS first_stage,
      round((CAST(y1 AS DOUBLE)/CAST(nz AS DOUBLE)
          - CAST(y0 AS DOUBLE)/CAST(n - nz AS DOUBLE))
        / (CAST(x1 AS DOUBLE)/CAST(nz AS DOUBLE)
          - CAST(x0 AS DOUBLE)/CAST(n - nz AS DOUBLE)), 6) AS beta_iv_cents
    FROM m
  """))

  /** Oaxaca–Blinder decomposition of the A-vs-B mean order-value gap
    * (md5-split cohorts, q_did's placebo convention) into the part
    * explained by the order-size covariate and the unexplained
    * (coefficient) part: gap = β_B·(x̄_A − x̄_B) + [unexplained].
    * Per-group OLS slopes come from the exact count/cents moments
    * (β = (n·Sxy − SxSy)/(n·Sxx − Sx²)); every emitted number is one
    * double tree over those integers, replayed verbatim. One scan,
    * one 2-group moment reduction. */
  private val qOaxaca = BoundQuery("q_oaxaca", (s, d) => {
    def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val feats = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("x"))
      .join(Tables.orders(s, d).select(
        col("o_orderkey").as("l_orderkey"),
        graft.functions.Num.cents(col("o_totalprice")).as("y"),
        when(substring(md5(col("o_custkey").cast("string")), 1, 2) < "80", "A")
          .otherwise("B").as("grp")), Seq("l_orderkey"))
    val m = feats.groupBy("grp").agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(d19(col("x")) * col("x")).as("sxx"),
      sum(d19(col("x")) * col("y")).as("sxy"))
    val a = m.where(col("grp") === "A").select(
      col("n").as("na"), col("sx").as("sxa"), col("sy").as("sya"),
      col("sxx").as("sxxa"), col("sxy").as("sxya"))
    val b = m.where(col("grp") === "B").select(
      col("n").as("nb"), col("sx").as("sxb"), col("sy").as("syb"),
      col("sxx").as("sxxb"), col("sxy").as("sxyb"))
    def beta(n: String, sx: String, sy: String, sxx: String, sxy: String) =
      (col(n).cast("double") * col(sxy).cast("double")
        - col(sx).cast("double") * col(sy).cast("double")) /
      (col(n).cast("double") * col(sxx).cast("double")
        - col(sx).cast("double") * col(sx).cast("double"))
    a.crossJoin(broadcast(b)).select(
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      round(col("sya").cast("double") / col("na").cast("double")
        - col("syb").cast("double") / col("nb").cast("double"), 6).as("gap_cents"),
      round(beta("nb", "sxb", "syb", "sxxb", "sxyb")
        * (col("sxa").cast("double") / col("na").cast("double")
          - col("sxb").cast("double") / col("nb").cast("double")), 6)
        .as("explained_cents"),
      round((col("sya").cast("double") / col("na").cast("double")
          - col("syb").cast("double") / col("nb").cast("double"))
        - beta("nb", "sxb", "syb", "sxxb", "sxyb")
          * (col("sxa").cast("double") / col("na").cast("double")
            - col("sxb").cast("double") / col("nb").cast("double")), 6)
        .as("unexplained_cents"))
  }, Some("""
    WITH feats AS (
      SELECT l.x, o.y, o.grp FROM (
        SELECT l_orderkey, CAST(count(*) AS BIGINT) AS x
        FROM lineitem GROUP BY 1) l
      JOIN (
        SELECT o_orderkey,
          CAST(round(o_totalprice*100, 0) AS BIGINT) AS y,
          CASE WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 2) < '80'
               THEN 'A' ELSE 'B' END AS grp
        FROM orders) o ON o.o_orderkey = l.l_orderkey),
    m AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
        sum(x*x) AS sxx, sum(x*y) AS sxy
      FROM feats GROUP BY 1),
    ab AS (
      SELECT
        (SELECT n FROM m WHERE grp='A') AS na,
        (SELECT sx FROM m WHERE grp='A') AS sxa,
        (SELECT sy FROM m WHERE grp='A') AS sya,
        (SELECT n FROM m WHERE grp='B') AS nb,
        (SELECT sx FROM m WHERE grp='B') AS sxb,
        (SELECT sy FROM m WHERE grp='B') AS syb,
        (SELECT sxx FROM m WHERE grp='B') AS sxxb,
        (SELECT sxy FROM m WHERE grp='B') AS sxyb),
    fin AS (
      SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        CAST(sya AS DOUBLE)/CAST(na AS DOUBLE)
          - CAST(syb AS DOUBLE)/CAST(nb AS DOUBLE) AS gap,
        ((CAST(nb AS DOUBLE)*CAST(sxyb AS DOUBLE)
          - CAST(sxb AS DOUBLE)*CAST(syb AS DOUBLE))
         / (CAST(nb AS DOUBLE)*CAST(sxxb AS DOUBLE)
          - CAST(sxb AS DOUBLE)*CAST(sxb AS DOUBLE)))
        * (CAST(sxa AS DOUBLE)/CAST(na AS DOUBLE)
          - CAST(sxb AS DOUBLE)/CAST(nb AS DOUBLE)) AS explained
      FROM ab)
    SELECT n_a, n_b, round(gap, 6) AS gap_cents,
      round(explained, 6) AS explained_cents,
      round(gap - explained, 6) AS unexplained_cents
    FROM fin
  """))

  val all: Seq[BoundQuery] = Seq(qPacf, qVif, qOddsRatio, qCochranArmitage,
    qGTest, qFisherZ, qTost, qIvWald, qOaxaca)
}
