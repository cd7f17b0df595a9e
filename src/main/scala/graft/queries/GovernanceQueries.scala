package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 governance wave 2: distributional privacy
  * (t-closeness, completing the k-anonymity → l-diversity ladder),
  * group-fairness audit of the in-engine scorer (demographic parity
  * and equalized odds), and market-concentration measurement (HHI) —
  * the release-gate queries a data platform runs before a dataset or
  * model leaves the building.
  *
  * Numeric rule: exact integer counts, one truncating division to
  * ppm per emitted rate, signed gaps as integer differences of ppm.
  */
object GovernanceQueries {

  /** t-closeness audit — the step after q_l_diversity: a QI class can
    * be k-anonymous AND l-diverse yet still leak if its sensitive-
    * attribute MIX differs sharply from the table's (e.g. a class
    * that is 90% one market segment when the population is 20%).
    * t-closeness bounds the distance between each class's sensitive
    * distribution and the global one; for a categorical attribute the
    * distance is total variation, which is EXACTLY rational:
    * t(c) = Σ_s |n_cs/n_c − n_s/N| / 2
    *      = Σ_s |N·n_cs − n_c·n_s| / (2·n_c·N).
    * Segments absent from a class contribute n_c·n_s, folded in
    * WITHOUT densifying the (class × segment) grid:
    * Σ_absent n_c·n_s = n_c·(N − Σ_present n_s).
    *
    * Output mirrors q_k_anonymity: for t ∈ {10%, 20%, 30%} (as ppm
    * thresholds), how many classes exceed t and what row share sits
    * in them.
    *
    * Scale shape: one (QI, segment)-keyed partial agg (sparse — never
    * the dense grid), broadcast joins of the |segments|-row totals
    * and the |QI-domain|-row class totals, a class-keyed reduction,
    * then a 3-row threshold explode. No window, no row-level join. */
  private val qTCloseness = BoundQuery("q_t_closeness", (s, d) => {
    val cs = Tables.customer(s, d)
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_band"),
        col("c_mktsegment"))
      .agg(count(lit(1)).as("ncs"))
    val seg = cs.groupBy("c_mktsegment").agg(sum(col("ncs")).as("ns"))
    val tot = seg.agg(sum(col("ns")).as("n"))
    val clsTot = cs.groupBy("c_nationkey", "bal_band")
      .agg(sum(col("ncs")).as("nc"))
    val cls = cs.join(broadcast(seg), Seq("c_mktsegment"))
      .join(broadcast(clsTot), Seq("c_nationkey", "bal_band"))
      .crossJoin(broadcast(tot))
      .groupBy("c_nationkey", "bal_band")
      .agg(max(col("nc")).as("nc"), max(col("n")).as("n"),
        sum(abs(col("n") * col("ncs") - col("nc") * col("ns"))).as("sum_present"),
        sum(col("ns")).as("sp"))
      .withColumn("sum_abs",
        col("sum_present") + col("nc") * (col("n") - col("sp")))
      .withColumn("t_ppm", expr("(1000000 * sum_abs) div (2 * nc * n)"))
    cls.select(col("nc"), col("t_ppm"),
        explode(array(lit(100000L), lit(200000L), lit(300000L))).as("t_thresh_ppm"))
      .groupBy("t_thresh_ppm")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("t_ppm") > col("t_thresh_ppm"), 1L).otherwise(0L))
          .as("classes_above"),
        sum(when(col("t_ppm") > col("t_thresh_ppm"), col("nc")).otherwise(0L))
          .as("rows_at_risk"),
        sum(col("nc")).as("total_rows"))
      .select(col("t_thresh_ppm"), col("n_classes"), col("classes_above"),
        col("rows_at_risk"),
        expr("CAST((1000000 * rows_at_risk) div total_rows AS BIGINT)")
          .as("risk_ppm"))
      .orderBy("t_thresh_ppm")
  }, Some("""
    WITH cs AS (
      SELECT c_nationkey, CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        c_mktsegment, CAST(count(*) AS BIGINT) AS ncs
      FROM customer GROUP BY 1, 2, 3),
    seg AS (SELECT c_mktsegment, CAST(sum(ncs) AS BIGINT) AS ns FROM cs GROUP BY 1),
    tot AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM seg),
    clstot AS (
      SELECT c_nationkey, bal_band, CAST(sum(ncs) AS BIGINT) AS nc
      FROM cs GROUP BY 1, 2),
    cls AS (
      SELECT cs.c_nationkey, cs.bal_band, max(nc) AS nc, max(n) AS n,
        CAST(sum(abs(n * ncs - nc * ns)) AS BIGINT) AS sum_present,
        CAST(sum(ns) AS BIGINT) AS sp
      FROM cs
      JOIN seg USING (c_mktsegment)
      JOIN clstot ON cs.c_nationkey = clstot.c_nationkey
                 AND cs.bal_band = clstot.bal_band
      CROSS JOIN tot
      GROUP BY 1, 2),
    t AS (
      SELECT nc,
        (1000000 * (sum_present + nc * (n - sp))) // (2 * nc * n) AS t_ppm
      FROM cls),
    th AS (SELECT CAST(t AS BIGINT) AS t_thresh_ppm
           FROM unnest([100000, 200000, 300000]) AS u(t))
    SELECT t_thresh_ppm, CAST(count(*) AS BIGINT) AS n_classes,
      CAST(sum(CASE WHEN t_ppm > t_thresh_ppm THEN 1 ELSE 0 END) AS BIGINT)
        AS classes_above,
      CAST(sum(CASE WHEN t_ppm > t_thresh_ppm THEN nc ELSE 0 END) AS BIGINT)
        AS rows_at_risk,
      CAST((1000000 * sum(CASE WHEN t_ppm > t_thresh_ppm THEN nc ELSE 0 END))
           // sum(nc) AS BIGINT) AS risk_ppm
    FROM t CROSS JOIN th
    GROUP BY t_thresh_ppm ORDER BY t_thresh_ppm
  """))

  /** Group-fairness audit of the q_calibration scorer: train the
    * per-priority completion-rate model on the md5 train half,
    * threshold it at the TRAIN base rate (predict 'F' when the
    * group's score exceeds the global train positive rate — the
    * data-derived operating point, no magic constant), and read out,
    * per customer MARKET SEGMENT on the held-out half:
    * demographic parity (predicted-positive share), TPR (equal
    * opportunity) and FPR — each with its signed ppm gap vs the
    * all-population rate. The standard pre-release model audit:
    * "does the score treat segments differently?"
    *
    * Scale shape: orders joins the broadcast 5-row model and the
    * broadcast scalar threshold; the customer→segment attach is the
    * standard dim equi-join (shuffle-hash/broadcast by size); then
    * one segment-keyed conditional agg and a 5-row gap join. Rates
    * are exact: counts, one truncating division each. */
  private val qFairness = BoundQuery("q_fairness", (s, d) => {
    val h = substring(md5(col("o_orderkey").cast("string")), 1, 2)
    val model = Tables.orders(s, d)
      .withColumn("is_train", (h < "80").cast("long"))
      .withColumn("is_f", (col("o_orderstatus") === "F").cast("long"))
      .groupBy("o_orderpriority")
      .agg(sum(col("is_train")).as("n_train"),
        sum(col("is_train") * col("is_f")).as("f_train"))
      .withColumn("score_ppm", expr("(1000000 * f_train) div n_train"))
    val base = model.agg(
      expr("(1000000 * sum(f_train)) div sum(n_train)").as("base_ppm"))
    val scored = Tables.orders(s, d)
      .where(h >= "80")
      .join(broadcast(model.select("o_orderpriority", "score_ppm")),
        Seq("o_orderpriority"))
      .crossJoin(broadcast(base))
      .withColumn("pred", (col("score_ppm") > col("base_ppm")).cast("long"))
      .withColumn("y", (col("o_orderstatus") === "F").cast("long"))
      .join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val grp = scored.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_test"),
        sum(col("pred")).as("pp"),
        sum(col("y")).as("pos"),
        sum(col("pred") * col("y")).as("tp"),
        sum(col("pred") * (lit(1L) - col("y"))).as("fp"))
      .withColumn("ppos_ppm", expr("(1000000 * pp) div n_test"))
      .withColumn("tpr_ppm", expr("(1000000 * tp) div pos"))
      .withColumn("fpr_ppm", expr("(1000000 * fp) div (n_test - pos)"))
    val glob = grp.agg(
      expr("(1000000 * sum(pp)) div sum(n_test)").as("g_ppos"),
      expr("(1000000 * sum(tp)) div sum(pos)").as("g_tpr"),
      expr("(1000000 * sum(fp)) div (sum(n_test) - sum(pos))").as("g_fpr"))
    grp.crossJoin(broadcast(glob))
      .select(col("c_mktsegment"), col("n_test"), col("ppos_ppm"),
        col("tpr_ppm"), col("fpr_ppm"),
        (col("ppos_ppm") - col("g_ppos")).as("dp_gap_ppm"),
        (col("tpr_ppm") - col("g_tpr")).as("tpr_gap_ppm"),
        (col("fpr_ppm") - col("g_fpr")).as("fpr_gap_ppm"))
      .orderBy("c_mktsegment")
  }, Some("""
    WITH model AS (
      SELECT o_orderpriority,
        CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '80'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '80'
                  AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_train
      FROM orders GROUP BY 1),
    m2 AS (
      SELECT o_orderpriority, (1000000 * f_train) // n_train AS score_ppm
      FROM model),
    base AS (
      SELECT (1000000 * sum(f_train)) // sum(n_train) AS base_ppm FROM model),
    scored AS (
      SELECT c.c_mktsegment,
        CASE WHEN score_ppm > base_ppm THEN 1 ELSE 0 END AS pred,
        CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders o
      JOIN m2 USING (o_orderpriority)
      CROSS JOIN base
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) >= '80'),
    grp AS (
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_test,
        CAST(sum(pred) AS BIGINT) AS pp, CAST(sum(y) AS BIGINT) AS pos,
        CAST(sum(pred * y) AS BIGINT) AS tp,
        CAST(sum(pred * (1 - y)) AS BIGINT) AS fp
      FROM scored GROUP BY 1),
    r AS (
      SELECT c_mktsegment, n_test,
        (1000000 * pp) // n_test AS ppos_ppm,
        (1000000 * tp) // pos AS tpr_ppm,
        (1000000 * fp) // (n_test - pos) AS fpr_ppm,
        pp, pos, tp, fp
      FROM grp),
    gall AS (
      SELECT (1000000 * sum(pp)) // sum(n_test) AS g_ppos,
        (1000000 * sum(tp)) // sum(pos) AS g_tpr,
        (1000000 * sum(fp)) // (sum(n_test) - sum(pos)) AS g_fpr
      FROM grp)
    SELECT c_mktsegment, n_test,
      CAST(ppos_ppm AS BIGINT) AS ppos_ppm,
      CAST(tpr_ppm AS BIGINT) AS tpr_ppm,
      CAST(fpr_ppm AS BIGINT) AS fpr_ppm,
      CAST(ppos_ppm - g_ppos AS BIGINT) AS dp_gap_ppm,
      CAST(tpr_ppm - g_tpr AS BIGINT) AS tpr_gap_ppm,
      CAST(fpr_ppm - g_fpr AS BIGINT) AS fpr_gap_ppm
    FROM r CROSS JOIN gall ORDER BY c_mktsegment
  """))

  /** Herfindahl–Hirschman concentration index of order revenue per
    * nation: HHI = Σ_customers (revenue share)², the antitrust-grade
    * "is this market owned by a few accounts?" number (10 000·HHI >
    * 2 500 is 'highly concentrated'; here in ppm, > 250 000). Exactly
    * rational: hhi_ppm = 10⁶·Σ r_c² div (Σ r_c)² over cents-exact
    * customer revenues — no per-customer division at all.
    *
    * Scale shape: (nation, customer)-keyed partial agg (map-side
    * combined — the only pass over orders), the customer→nation
    * attach is the standard dim equi-join, then a nation-keyed
    * reduction to 25 rows. The second moment accumulates in
    * decimal(38,0): a 10⁸-cent account squares to 10¹⁶ and a nation
    * can hold 10⁵ of them at sf-scale. */
  private val qHhi = BoundQuery("q_hhi", (s, d) => {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("o_custkey"))
      .agg(sumCents(col("o_totalprice")).as("r"))
    rev.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("r")).as("rev_cents"),
        sum(col("r").cast("decimal(38,0)") * col("r")).as("q2"))
      .select(col("c_nationkey"), col("n_customers"), col("rev_cents"),
        expr("""CAST((1000000 * q2)
                     div (CAST(rev_cents AS DECIMAL(38,0)) * rev_cents)
                     AS BIGINT)""").as("hhi_ppm"))
      .orderBy("c_nationkey")
  }, Some("""
    WITH rev AS (
      SELECT c_nationkey, o_custkey,
        CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) AS r
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2)
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
      CAST(sum(r) AS BIGINT) AS rev_cents,
      CAST((1000000 * sum(CAST(r AS HUGEINT) * r))
           // (CAST(sum(r) AS HUGEINT) * sum(r)) AS BIGINT) AS hhi_ppm
    FROM rev GROUP BY 1 ORDER BY 1
  """))

  val all: Seq[BoundQuery] = Seq(qTCloseness, qFairness, qHhi)
}
