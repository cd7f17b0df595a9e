package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.4 feature-engineering wave: the three tabular-ML feature
  * builders every training pipeline runs upstream of a model —
  * lag/rolling feature matrices (forecasting), m-estimate target
  * encoding (high-cardinality categoricals), and weight-of-evidence /
  * information value (the credit-scoring feature audit). All exact:
  * cents longs, cleared rationals, one integral division per emitted
  * value, micro-nat logs rounded once per row (the house rules).
  */
object FeatureQueries {

  /** Supervised lag-feature matrix per (type, day): yesterday, last
    * week, the trailing-7 mean, day-of-week, and tomorrow's target —
    * the table a forecaster trains on, emitted only where every
    * feature exists (rank ≥ 8 and a next-day target). All windows
    * partition by type over the calendar-bounded series; ma7 is a
    * truncating integral division of the exact frame sum. */
  private val qLagFeatures = BoundQuery("q_lag_features", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val f7 = w.rowsBetween(-6, 0)
    daily
      .withColumn("rn", row_number().over(w))
      .withColumn("lag1", lag(col("y"), 1).over(w))
      .withColumn("lag7", lag(col("y"), 7).over(w))
      .withColumn("ma7", expr("sum(y) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) div 7"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
      .withColumn("target_next", lead(col("y"), 1).over(w))
      .where(col("rn") >= 8 && col("target_next").isNotNull)
      .select("event_type", "day", "y", "lag1", "lag7", "ma7", "dow",
        "target_next")
      .orderBy("event_type", "day")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    f AS (
      SELECT event_type, day, y,
        row_number() OVER w AS rn,
        lag(y, 1) OVER w AS lag1,
        lag(y, 7) OVER w AS lag7,
        CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) // 7 AS ma7,
        CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
        lead(y, 1) OVER w AS target_next
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type, day, y, CAST(lag1 AS BIGINT) AS lag1,
      CAST(lag7 AS BIGINT) AS lag7, ma7, dow,
      CAST(target_next AS BIGINT) AS target_next
    FROM f WHERE rn >= 8 AND target_next IS NOT NULL
    ORDER BY event_type, day
  """))

  /** m-estimate target encoding (Micci-Barreca 2001, m=100) of the
    * customer market segment against order value: enc = (Σ_c + m·μ)
    * / (n_c + m) — the shrinkage that keeps rare categories from
    * memorizing their own noise. EXACT: with μ = S/N the global-mean
    * rational, enc_c = (Σ_c·N + m·S) div ((n_c + m)·N) in cents —
    * cleared denominators, one truncating division. The raw per-
    * category mean rides along so the shrinkage is visible. */
  private val qTargetEncoding = BoundQuery("q_target_encoding", (s, d) => {
    val o = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), cents(col("o_totalprice")).as("vc"))
    val tot = o.agg(sum(col("vc")).as("sg"), count(lit(1)).as("ng"))
    o.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sc"))
      .crossJoin(broadcast(tot))
      .select(col("c_mktsegment"), col("n"),
        expr("sc div n").as("raw_mean_c"),
        expr("""CAST((CAST(sc AS DECIMAL(38,0)) * ng + 100 * CAST(sg AS DECIMAL(38,0)))
                div (CAST(n + 100 AS DECIMAL(38,0)) * ng) AS BIGINT)""")
          .as("enc_c"),
        expr("sg div ng").as("global_mean_c"))
      .orderBy("c_mktsegment")
  }, Some("""
    WITH o AS (
      SELECT c_mktsegment, CAST(round(o_totalprice*100, 0) AS BIGINT) AS vc
      FROM orders JOIN customer ON o_custkey = c_custkey),
    tot AS (SELECT CAST(sum(vc) AS BIGINT) AS sg, CAST(count(*) AS BIGINT) AS ng
            FROM o)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(vc) AS BIGINT) // count(*) AS raw_mean_c,
      CAST((CAST(sum(vc) AS HUGEINT) * ng + 100 * CAST(sg AS HUGEINT))
           // (CAST(count(*) + 100 AS HUGEINT) * ng) AS BIGINT) AS enc_c,
      sg // ng AS global_mean_c
    FROM o CROSS JOIN tot
    GROUP BY c_mktsegment, sg, ng ORDER BY c_mktsegment
  """))

  /** Weight of evidence + information value of the order priority
    * against the F-status outcome — the categorical-strength audit
    * (IV < 0.02 useless, > 0.3 strong) run before a feature enters a
    * model. Per category: woe_u = round(10⁶·ln(gshare/bshare)) with
    * ONE rounding, iv_u = (gshare_ppm − bshare_ppm)·woe_u div 10⁶ —
    * exact long arithmetic after the single log; the TOTAL row sums
    * the per-category IV contributions exactly (the q_prf1 macro-row
    * shape). */
  private val qWoeIv = BoundQuery("q_woe_iv", (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderpriority"),
        (col("o_orderstatus") === "F").cast("long").as("bad"))
    val tot = o.agg(sum(lit(1L) - col("bad")).as("gg"), sum(col("bad")).as("bb"))
    val per = o.groupBy("o_orderpriority")
      .agg(sum(lit(1L) - col("bad")).as("g"), sum(col("bad")).as("b"))
      .crossJoin(broadcast(tot))
      .withColumn("gshare_ppm", expr("(1000000 * g) div gg"))
      .withColumn("bshare_ppm", expr("(1000000 * b) div bb"))
      .withColumn("woe_u", round(
        log((col("g").cast("double") / col("gg").cast("double")) /
          (col("b").cast("double") / col("bb").cast("double"))) * 1e6, 0)
        .cast("long"))
      .withColumn("iv_u",
        expr("((gshare_ppm - bshare_ppm) * woe_u) div 1000000"))
    val rows = per.select(col("o_orderpriority"), col("g"), col("b"),
      col("gshare_ppm"), col("bshare_ppm"), col("woe_u"), col("iv_u"))
    val total = per.agg(sum(col("g")).as("g"), sum(col("b")).as("b"),
        sum(col("gshare_ppm")).as("gshare_ppm"),
        sum(col("bshare_ppm")).as("bshare_ppm"),
        sum(col("woe_u")).as("woe_u"), sum(col("iv_u")).as("iv_u"))
      .withColumn("o_orderpriority", lit("TOTAL"))
      .select("o_orderpriority", "g", "b", "gshare_ppm", "bshare_ppm",
        "woe_u", "iv_u")
    rows.unionByName(total).orderBy("o_orderpriority")
  }, Some("""
    WITH o AS (
      SELECT o_orderpriority,
        CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      FROM orders),
    tot AS (SELECT CAST(sum(1 - bad) AS BIGINT) AS gg,
                   CAST(sum(bad) AS BIGINT) AS bb FROM o),
    per AS (
      SELECT o_orderpriority, CAST(sum(1 - bad) AS BIGINT) AS g,
        CAST(sum(bad) AS BIGINT) AS b, gg, bb
      FROM o CROSS JOIN tot GROUP BY 1, gg, bb),
    scored AS (
      SELECT o_orderpriority, g, b,
        (1000000 * g) // gg AS gshare_ppm,
        (1000000 * b) // bb AS bshare_ppm,
        CAST(round(ln((CAST(g AS DOUBLE) / CAST(gg AS DOUBLE))
          / (CAST(b AS DOUBLE) / CAST(bb AS DOUBLE))) * 1e6, 0) AS BIGINT)
          AS woe_u
      FROM per),
    final_ AS (
      SELECT o_orderpriority, g, b, gshare_ppm, bshare_ppm, woe_u,
        ((gshare_ppm - bshare_ppm) * woe_u) // 1000000 AS iv_u
      FROM scored)
    SELECT * FROM final_
    UNION ALL
    SELECT 'TOTAL', CAST(sum(g) AS BIGINT), CAST(sum(b) AS BIGINT),
      CAST(sum(gshare_ppm) AS BIGINT), CAST(sum(bshare_ppm) AS BIGINT),
      CAST(sum(woe_u) AS BIGINT), CAST(sum(iv_u) AS BIGINT)
    FROM final_
    ORDER BY o_orderpriority
  """))

  /** Empirical-Bayes rate smoothing (beta-binomial shrinkage): per
    * user, purchase-per-event rate shrunk toward a method-of-moments
    * Beta prior fit on the population — the principled fix for
    * "user with 2 events, 1 purchase, rate 50%" leaderboard noise
    * that q_target_encoding's fixed-m smoothing approximates.
    *
    * Parity discipline: per-user raw rates quantize ONCE to exact
    * ppm longs (k·10⁶ div n), so the prior's moment sums are exact
    * integers; α, β and each shrunk rate (k+α)/(n+α+β) are then
    * identical double expression trees. Top-20 by shrunk rate with
    * id tie-break. One user-keyed partial agg + one broadcast of the
    * 1-row prior — fully scan-shaped. */
  private val qEbSmooth = BoundQuery("q_eb_smooth", (s, d) => {
    val u = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("k"))
      .withColumn("rate_ppm", expr("(k * 1000000) div n"))
    val prior = u.agg(count(lit(1)).as("uu"),
        sum("rate_ppm").as("sr"), sum(expr("rate_ppm * rate_ppm")).as("srr"))
      .select(
        (col("sr").cast("double") / col("uu").cast("double") / 1e6).as("m"),
        ((col("srr").cast("double") -
          col("sr").cast("double") * col("sr").cast("double") /
            col("uu").cast("double")) /
          (col("uu") - 1).cast("double") / 1e12).as("v"))
      .select(col("m"), col("v"),
        (col("m") * (lit(1.0) - col("m")) / col("v") - lit(1.0)).as("nu"))
      .select((col("m") * col("nu")).as("alpha"),
        ((lit(1.0) - col("m")) * col("nu")).as("beta"))
    u.crossJoin(broadcast(prior))
      .select(col("user_id"), col("n"), col("k"), col("rate_ppm"),
        round((col("k").cast("double") + col("alpha")) /
          (col("n").cast("double") + col("alpha") + col("beta")), 6)
          .as("shrunk_rate"),
        round(col("alpha"), 6).as("alpha"), round(col("beta"), 6).as("beta"))
      .orderBy(desc("shrunk_rate"), col("user_id")).limit(20)
  }, Some("""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM events GROUP BY 1),
    r AS (SELECT user_id, n, k, CAST((k * 1000000) // n AS BIGINT) AS rate_ppm
          FROM u),
    pm AS (
      SELECT CAST(count(*) AS BIGINT) AS uu,
        CAST(sum(rate_ppm) AS BIGINT) AS sr,
        CAST(sum(rate_ppm * rate_ppm) AS BIGINT) AS srr
      FROM r),
    mv AS (
      SELECT CAST(sr AS DOUBLE) / CAST(uu AS DOUBLE) / 1e6 AS m,
        (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)
          / CAST(uu AS DOUBLE)) / CAST(uu - 1 AS DOUBLE) / 1e12 AS v
      FROM pm),
    nu AS (SELECT m, v, m * (1.0 - m) / v - 1.0 AS nu FROM mv),
    prior AS (SELECT m * nu AS alpha, (1.0 - m) * nu AS beta FROM nu)
    SELECT user_id, n, k, rate_ppm,
      round((CAST(k AS DOUBLE) + alpha)
            / (CAST(n AS DOUBLE) + alpha + beta), 6) AS shrunk_rate,
      round(alpha, 6) AS alpha, round(beta, 6) AS beta
    FROM r CROSS JOIN prior
    ORDER BY shrunk_rate DESC, user_id LIMIT 20
  """))

  val all: Seq[BoundQuery] = Seq(qLagFeatures, qTargetEncoding, qWoeIv,
    qEbSmooth)
}
