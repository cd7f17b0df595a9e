package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions._
import graft.functions.Num.cents

/** SURVEY §2.6 survey-statistics wave: iterative proportional fitting
  * (raking) of sample weights to target margins, and Fleiss' κ
  * multi-rater agreement — the two instruments a measurement team
  * runs before trusting labels or reweighting a panel. Exact: ppm
  * weights with one truncating division per cell per round; κ from
  * fully cleared integer forms.
  */
object AgreementQueries {

  /** IPF / raking (Deming & Stephan 1940): adjust per-cell weights on
    * the (segment × priority) contingency so BOTH margins match the
    * uniform target, two unrolled rounds (rows then columns — one full
    * IPF sweep; margins land within per-cell ppm truncation of target,
    * which the spec checks). Weights stay exact ppm integers:
    * w' = (w·T) div M with T the target µ-mass per margin slice and
    * M the slice's current weighted µ-mass — deterministic truncation,
    * identical engines. Scale shape: one contingency aggregation, two
    * 5-row margin joins, all broadcast. */
  private val qIpfRaking = BoundQuery("q_ipf_raking", (s, d) => {
    val cells = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w0", lit(1000000L))
    val tot = cells.agg(sum(col("n")).as("nn"),
      countDistinct(col("seg")).as("kr"), countDistinct(col("pri")).as("kc"))
    val c1 = cells.crossJoin(broadcast(tot))
      .withColumn("t_row", expr("(1000000 * nn) div kr"))
      .withColumn("t_col", expr("(1000000 * nn) div kc"))
    val rowMass = c1.groupBy(col("seg").as("rs"))
      .agg(sum(expr("CAST(n AS DECIMAL(38,0)) * w0")).as("m_row"))
    val r1 = c1.join(broadcast(rowMass), col("seg") === col("rs"))
      .withColumn("w1", expr(
        "CAST((CAST(w0 AS DECIMAL(38,0)) * t_row) div m_row AS BIGINT)"))
    val colMass = r1.groupBy(col("pri").as("cp"))
      .agg(sum(expr("CAST(n AS DECIMAL(38,0)) * w1")).as("m_col"))
    r1.join(broadcast(colMass), col("pri") === col("cp"))
      .withColumn("w2", expr(
        "CAST((CAST(w1 AS DECIMAL(38,0)) * t_col) div m_col AS BIGINT)"))
      .select(col("seg"), col("pri"), col("n"), col("w2").as("w_ppm"))
      .orderBy("seg", "pri")
  }, Some("""
    WITH cells AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri,
        CAST(count(*) AS BIGINT) AS n, CAST(1000000 AS BIGINT) AS w0
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
      CAST(count(DISTINCT seg) AS BIGINT) AS kr,
      CAST(count(DISTINCT pri) AS BIGINT) AS kc FROM cells),
    c1 AS (
      SELECT *, (1000000 * nn) // kr AS t_row, (1000000 * nn) // kc AS t_col
      FROM cells CROSS JOIN tot),
    rm AS (SELECT seg AS rs, CAST(sum(CAST(n AS HUGEINT) * w0) AS HUGEINT)
             AS m_row FROM c1 GROUP BY 1),
    r1 AS (
      SELECT c1.*, CAST((CAST(w0 AS HUGEINT) * t_row) // m_row AS BIGINT)
        AS w1
      FROM c1 JOIN rm ON seg = rs),
    cm AS (SELECT pri AS cp, CAST(sum(CAST(n AS HUGEINT) * w1) AS HUGEINT)
             AS m_col FROM r1 GROUP BY 1)
    SELECT seg, pri, n,
      CAST((CAST(w1 AS HUGEINT) * t_col) // m_col AS BIGINT) AS w_ppm
    FROM r1 JOIN cm ON pri = cp
    ORDER BY seg, pri
  """))

  /** Fleiss' κ over three deterministic language "raters" of every
    * document — the stored label, the stopword heuristic on the full
    * text, and the heuristic on the first 120 chars (q_mcnemar's
    * truncated twin). Where q_cohen_kappa compares TWO raters, Fleiss
    * generalizes to n=3 with chance correction from the pooled
    * category distribution. Fully cleared:
    *   κ_ppm = 10⁶·(3N·SP − 2·C2) div (18N² − 2·C2),
    * SP = Σ_docs(Σ_cat n_ij² − 3), C2 = Σ_cat c_j² — exact longs; the
    * identity P̄ = SP/(6N), Pe = C2/(9N²) is in the Scaladoc proof.
    * One ratings union, two partial aggs, a 1×1 join. */
  private val qFleissKappa = BoundQuery("q_fleiss_kappa", (s, d) => {
    val docs = Tables.documents(s, d)
    val ratings = docs.select(col("doc_id"), col("lang").as("cat"))
      .unionByName(docs.select(col("doc_id"),
        langId(tokens(col("text"))).as("cat")))
      .unionByName(docs.select(col("doc_id"),
        langId(tokens(substring(col("text"), 1, 120))).as("cat")))
    val nij = ratings.groupBy("doc_id", "cat").agg(count(lit(1)).as("c"))
    val sp = nij.groupBy("doc_id")
      .agg((sum(col("c") * col("c")) - lit(3L)).as("pi_num"))
      .agg(sum(col("pi_num")).as("sp"), count(lit(1)).as("n_docs"))
    val c2 = ratings.groupBy("cat").agg(count(lit(1)).as("cj"))
      .agg(sum(expr("CAST(cj AS DECIMAL(38,0)) * cj")).as("c2"),
        count(lit(1)).as("n_cats"))
    sp.crossJoin(broadcast(c2))
      .select(col("n_docs"), col("n_cats"), col("sp"),
        col("c2").cast("long").as("c2"),
        expr("(1000000 * sp) div (6 * n_docs)").as("p_bar_ppm"),
        expr("""CAST((1000000 * c2)
                div (9 * CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)""")
          .as("p_e_ppm"),
        expr("""CAST((1000000 * (3 * CAST(n_docs AS DECIMAL(38,0)) * sp - 2 * c2))
                div (18 * CAST(n_docs AS DECIMAL(38,0)) * n_docs - 2 * c2)
                AS BIGINT)""").as("kappa_ppm"))
  }, Some("""
    WITH docs AS (SELECT doc_id, text, lang FROM documents),
    heur AS (
      SELECT doc_id, text,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS c_en,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('el','la','de','los','y'))) AS BIGINT) AS c_es,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS c_de,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('le','les','des','et','une'))) AS BIGINT) AS c_fr
      FROM (SELECT doc_id, text, text AS t FROM docs) x),
    heur120 AS (
      SELECT doc_id,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS c_en,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('el','la','de','los','y'))) AS BIGINT) AS c_es,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS c_de,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('le','les','des','et','une'))) AS BIGINT) AS c_fr
      FROM (SELECT doc_id, substr(text, 1, 120) AS t FROM docs) x),
    pred AS (
      SELECT doc_id,
        CASE WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
             WHEN c_es > 0 AND c_es >= c_de AND c_es >= c_fr THEN 'es'
             WHEN c_de > 0 AND c_de >= c_fr THEN 'de'
             WHEN c_fr > 0 THEN 'fr' ELSE 'und' END AS cat
      FROM heur),
    pred120 AS (
      SELECT doc_id,
        CASE WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
             WHEN c_es > 0 AND c_es >= c_de AND c_es >= c_fr THEN 'es'
             WHEN c_de > 0 AND c_de >= c_fr THEN 'de'
             WHEN c_fr > 0 THEN 'fr' ELSE 'und' END AS cat
      FROM heur120),
    ratings AS (
      SELECT doc_id, lang AS cat FROM docs
      UNION ALL SELECT doc_id, cat FROM pred
      UNION ALL SELECT doc_id, cat FROM pred120),
    nij AS (SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS c
            FROM ratings GROUP BY 1, 2),
    sp AS (
      SELECT CAST(sum(pi_num) AS BIGINT) AS sp,
        CAST(count(*) AS BIGINT) AS n_docs
      FROM (SELECT doc_id, sum(c * c) - 3 AS pi_num FROM nij GROUP BY 1)),
    c2 AS (
      SELECT CAST(sum(CAST(cj AS HUGEINT) * cj) AS HUGEINT) AS c2,
        CAST(count(*) AS BIGINT) AS n_cats
      FROM (SELECT cat, CAST(count(*) AS BIGINT) AS cj
            FROM ratings GROUP BY 1))
    SELECT n_docs, n_cats, sp, CAST(c2 AS BIGINT) AS c2,
      (1000000 * sp) // (6 * n_docs) AS p_bar_ppm,
      CAST((1000000 * c2) // (9 * CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT)
        AS p_e_ppm,
      CAST((1000000 * (3 * CAST(n_docs AS HUGEINT) * sp - 2 * c2))
           // (18 * CAST(n_docs AS HUGEINT) * n_docs - 2 * c2) AS BIGINT)
        AS kappa_ppm
    FROM sp CROSS JOIN c2
  """))

  /** Cronbach's α internal-consistency over the five event-type
    * daily-value "items" (Cronbach 1951): cases are days, items are
    * the per-type daily cents (0 for a type silent that day — the
    * conditional-sum pivot makes the day×type grid complete without a
    * join). α = k/(k−1) · (1 − Σᵢvarᵢ / var_total) collapses to ONE
    * double over exact integers: with population variances,
    * Σᵢ(n·Σxᵢ² − Sᵢ²) and n·Σtot² − S_tot² share the n² denominator.
    * One scan, one day-grain aggregate, one 30-row fold. */
  private val qCronbach = BoundQuery("q_cronbach_alpha", (s, d) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val itemCols = types.map(t =>
      sum(when(col("event_type") === t, cents(col("value")))
        .otherwise(lit(0L))).cast("decimal(38,0)").as(s"x_$t"))
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(itemCols.head, itemCols.tail: _*)
    val tot = daily.withColumn("xt",
      types.map(t => col(s"x_$t")).reduce(_ + _))
    val momentCols =
      count(lit(1)).cast("decimal(38,0)").as("n") +:
        (types.flatMap(t => Seq(
          sum(col(s"x_$t")).as(s"s_$t"),
          sum(col(s"x_$t") * col(s"x_$t")).as(s"q_$t"))) ++
          Seq(sum(col("xt")).as("st"),
            sum(col("xt") * col("xt")).as("qt")))
    val m = tot.agg(momentCols.head, momentCols.tail: _*)
    val itemVarNum = types.map(t =>
      expr(s"n*q_$t - s_$t*s_$t")).reduce(_ + _)
    m.select(lit(types.size).cast("long").as("k"),
      col("n").cast("long").as("n_days"),
      round(lit(types.size.toDouble / (types.size - 1)) *
        (lit(1.0) - itemVarNum.cast("double") /
          expr("CAST(n*qt - st*st AS DOUBLE)")), 9).as("alpha"))
  }, Some("""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
        CAST(sum(CASE WHEN event_type = 'click'    THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x_click,
        CAST(sum(CASE WHEN event_type = 'error'    THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x_error,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x_purchase,
        CAST(sum(CASE WHEN event_type = 'signup'   THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x_signup,
        CAST(sum(CASE WHEN event_type = 'view'     THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x_view
      FROM events GROUP BY 1),
    tot AS (
      SELECT *, x_click + x_error + x_purchase + x_signup + x_view AS xt
      FROM daily),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
        sum(x_click) AS s_click, sum(x_click*x_click) AS q_click,
        sum(x_error) AS s_error, sum(x_error*x_error) AS q_error,
        sum(x_purchase) AS s_purchase, sum(x_purchase*x_purchase) AS q_purchase,
        sum(x_signup) AS s_signup, sum(x_signup*x_signup) AS q_signup,
        sum(x_view) AS s_view, sum(x_view*x_view) AS q_view,
        sum(xt) AS st, sum(xt*xt) AS qt
      FROM tot)
    SELECT CAST(5 AS BIGINT) AS k, CAST(n AS BIGINT) AS n_days,
      round((5.0/4.0) * (1.0 -
        CAST((n*q_click - s_click*s_click) + (n*q_error - s_error*s_error)
           + (n*q_purchase - s_purchase*s_purchase)
           + (n*q_signup - s_signup*s_signup)
           + (n*q_view - s_view*s_view) AS DOUBLE)
        / CAST(n*qt - st*st AS DOUBLE)), 9) AS alpha
    FROM m
  """))

  /** Kendall's coefficient of concordance W (Kendall & Babington
    * Smith 1939): do the days AGREE on how the five event types rank
    * by revenue? Each day ranks the types (row_number over exact
    * cents, type tie-break — a 5-row window per day), rank sums Rⱼ
    * feed the fully-cleared form W = 3·Σ(2Rⱼ − m(k+1))² /
    * (m²·k·(k²−1)) — exact integers, one double division. W ≈ 1 ⇒ a
    * stable type hierarchy; W ≈ 0 ⇒ daily shuffle. The m-rater
    * generalization of q_kendall_tau, complementing q_fleiss_kappa's
    * categorical agreement. */
  private val qKendallW = BoundQuery("q_kendall_w", (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day").orderBy(desc("y"), col("event_type"))
    val ranked = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(cents(col("value"))).as("y"))
      .withColumn("rnk", row_number().over(w).cast("long"))
    val k = 5L
    ranked.groupBy("event_type")
      .agg(sum(col("rnk")).as("rj"), count(lit(1)).as("m0"))
      .agg(max(col("m0")).as("m"), count(lit(1)).as("k"),
        sum(expr(s"""CAST((2*rj - m0*(${k}+1)) AS DECIMAL(38,0))
          * (2*rj - m0*(${k}+1))""")).as("s4"))
      .select(col("m"), col("k"),
        round(expr("""3.0 * CAST(s4 AS DOUBLE)
          / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE) * CAST(k AS DOUBLE)
             * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))"""), 9)
          .as("kendall_w"))
  }, Some("""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT event_type,
        CAST(row_number() OVER (PARTITION BY day ORDER BY y DESC, event_type)
          AS BIGINT) AS rnk
      FROM daily),
    rs AS (
      SELECT event_type, CAST(sum(rnk) AS BIGINT) AS rj,
        CAST(count(*) AS BIGINT) AS m0
      FROM ranked GROUP BY 1),
    agg AS (
      SELECT max(m0) AS m, CAST(count(*) AS BIGINT) AS k,
        CAST(sum(CAST(2*rj - m0*6 AS HUGEINT) * (2*rj - m0*6)) AS HUGEINT)
          AS s4
      FROM rs)
    SELECT m, k,
      round(3.0 * CAST(s4 AS DOUBLE)
        / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE) * CAST(k AS DOUBLE)
           * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)), 9) AS kendall_w
    FROM agg
  """))

  /** Linear-weighted Cohen's kappa (Cohen 1968) between two ORDINAL
    * "raters" of order importance — the stated priority class (1..5)
    * and the exact order-value quintile — where plain kappa
    * (q_cohen_kappa) treats a 1-step disagreement the same as a
    * 4-step one. Quintiles come from the two-phase globalRowNumber
    * (bucket = (5·rank) div n, integer cutoffs — no percentile
    * interpolation semantics); with w_ij = |i−j| the estimator clears
    * to κw_ppm = 10⁶·(ΣwE − n·ΣwO) div ΣwE over exact decimal
    * products of the margin counts. One rank pass + a 25-cell
    * contingency reduction. */
  private val qKappaWeighted = BoundQuery("q_kappa_weighted", (s, d) => {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      graft.functions.Num.cents(col("o_totalprice")).as("v"),
      substring(col("o_orderpriority"), 1, 1).cast("long").as("pri"))
    val ranked = graft.operators.Ranking
      .globalRowNumber(o, "rn", col("v"), col("k"))
    val withN = ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as("n"))))
      .withColumn("q", expr("(5 * rn) div n") + 1)
    val cells = graft.util.CacheScope.persist(
      withN.groupBy("pri", "q").agg(count(lit(1)).as("c")))
    val wo = cells.agg(sum(col("c")).as("n"),
      sum(abs(col("pri") - col("q")).cast(dec) * col("c")).as("swo"))
    val margins = cells.groupBy("pri").agg(sum(col("c")).as("r"))
      .crossJoin(broadcast(cells.groupBy("q").agg(sum(col("c")).as("cc"))))
      .agg(sum(abs(col("pri") - col("q")).cast(dec)
        * col("r") * col("cc")).as("swe"))
    wo.crossJoin(broadcast(margins))
      .select(col("n").cast("long").as("n_orders"),
        col("swo").cast("long").as("w_observed"),
        expr("CAST((1000000 * (swe - CAST(n AS DECIMAL(38,0)) * swo)) div swe AS BIGINT)")
          .as("kappa_w_ppm"))
  }, Some("""
    WITH o AS (
      SELECT o_orderkey AS k,
        CAST(round(o_totalprice*100, 0) AS BIGINT) AS v,
        CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pri
      FROM orders),
    ranked AS (
      SELECT pri,
        CAST(row_number() OVER (ORDER BY v, k) - 1 AS BIGINT) AS rn
      FROM o),
    n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked),
    withq AS (SELECT pri, (5 * rn) // n + 1 AS q FROM ranked, n0),
    cells AS (SELECT pri, q, CAST(count(*) AS BIGINT) AS c
              FROM withq GROUP BY 1, 2),
    wo AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                  CAST(sum(CAST(abs(pri - q) AS HUGEINT) * c) AS HUGEINT) AS swo
           FROM cells),
    marg AS (
      SELECT CAST(sum(CAST(abs(r.pri - c2.q) AS HUGEINT) * r.r * c2.cc)
             AS HUGEINT) AS swe
      FROM (SELECT pri, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY 1) r
      CROSS JOIN (SELECT q, CAST(sum(c) AS BIGINT) AS cc
                  FROM cells GROUP BY 1) c2)
    SELECT n AS n_orders, CAST(swo AS BIGINT) AS w_observed,
      CAST((1000000 * (swe - CAST(n AS HUGEINT) * swo)) // swe AS BIGINT)
        AS kappa_w_ppm
    FROM wo, marg
  """))

  /** Goodman–Kruskal γ and Stuart's τ_c over the same ordinal pair
    * as q_kappa_weighted (priority class × exact value quintile) —
    * the ASSOCIATION view where κw measures agreement: γ =
    * (C−D)/(C+D) ignores ties entirely, τ_c = 2m(C−D)/(n²(m−1))
    * corrects for the table shape — here with m = min(R,C) = 5
    * HARDCODED in the final expression on BOTH engines (priority has
    * 5 levels, the value axis is cut into quintiles, so 2m/(m−1) =
    * 10/4 appears literally as `…*10 … div (n*n*4)`): changing the
    * quantile count in the binding requires changing those constants
    * in the Spark expression AND the oracle together (round-6 verdict
    * item 7). Concordant/discordant pair counts
    * come from the 25-cell contingency table's self-join (cells are
    * driver-tiny after the aggregation — the pair counting is exact
    * decimal products, never a row-level pair join), and both
    * readouts clear to one truncating ppm division. */
  private val qOrdinalGamma = BoundQuery("q_ordinal_gamma", (s, d) => {
    val dec = "decimal(38,0)"
    val o = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      graft.functions.Num.cents(col("o_totalprice")).as("v"),
      substring(col("o_orderpriority"), 1, 1).cast("long").as("pri"))
    val ranked = graft.operators.Ranking
      .globalRowNumber(o, "rn", col("v"), col("k"))
    val withN = ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as("n"))))
      .withColumn("q", expr("(5 * rn) div n") + 1)
    val cells = graft.util.CacheScope.persist(
      withN.groupBy("pri", "q").agg(count(lit(1)).as("c")))
    val pairs = cells.as("x").join(broadcast(cells.as("y")),
        col("y.pri") > col("x.pri"))
      .select(col("x.c").cast(dec).as("cx"), col("y.c").cast(dec).as("cy"),
        (col("y.q") > col("x.q")).as("conc"),
        (col("y.q") < col("x.q")).as("disc"))
      .agg(sum(when(col("conc"), col("cx") * col("cy"))
          .otherwise(lit(0).cast(dec))).as("cc"),
        sum(when(col("disc"), col("cx") * col("cy"))
          .otherwise(lit(0).cast(dec))).as("dd"))
    cells.agg(sum(col("c")).cast(dec).as("n"))
      .crossJoin(broadcast(pairs))
      .select(col("n").cast("long").as("n_orders"),
        col("cc").cast("long").as("concordant"),
        col("dd").cast("long").as("discordant"),
        expr("CAST((1000000 * (cc - dd)) div (cc + dd) AS BIGINT)")
          .as("gamma_ppm"),
        expr("CAST((1000000 * 10 * (cc - dd)) div (n * n * 4) AS BIGINT)")
          .as("tau_c_ppm"))
  }, Some("""
    WITH o AS (
      SELECT o_orderkey AS k,
        CAST(round(o_totalprice*100, 0) AS BIGINT) AS v,
        CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pri
      FROM orders),
    ranked AS (
      SELECT pri,
        CAST(row_number() OVER (ORDER BY v, k) - 1 AS BIGINT) AS rn
      FROM o),
    n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked),
    withq AS (SELECT pri, (5 * rn) // n + 1 AS q FROM ranked, n0),
    cells AS (SELECT pri, q, CAST(count(*) AS BIGINT) AS c
              FROM withq GROUP BY 1, 2),
    pairs AS (
      SELECT
        CAST(sum(CASE WHEN y.q > x.q
          THEN CAST(x.c AS HUGEINT) * y.c ELSE 0 END) AS HUGEINT) AS cc,
        CAST(sum(CASE WHEN y.q < x.q
          THEN CAST(x.c AS HUGEINT) * y.c ELSE 0 END) AS HUGEINT) AS dd
      FROM cells x JOIN cells y ON y.pri > x.pri),
    tot AS (SELECT CAST(sum(c) AS HUGEINT) AS n FROM cells)
    SELECT CAST(n AS BIGINT) AS n_orders,
      CAST(cc AS BIGINT) AS concordant, CAST(dd AS BIGINT) AS discordant,
      CAST((1000000 * (cc - dd)) // (cc + dd) AS BIGINT) AS gamma_ppm,
      CAST((1000000 * 10 * (cc - dd)) // (n * n * 4) AS BIGINT) AS tau_c_ppm
    FROM tot, pairs
  """))

  val all: Seq[BoundQuery] =
    Seq(qIpfRaking, qFleissKappa, qCronbach, qKendallW, qKappaWeighted,
      qOrdinalGamma)
}
