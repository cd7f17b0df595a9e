package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2.4 recursive-partitioning wave: a depth-2 CART-style
  * decision tree grown RELATIONALLY — each level is one candidate
  * aggregation + an exact argmin, so "fit a small tree on 100 TB" is
  * two scans and some broadcast-sized bookkeeping, not a driver loop
  * over rows. Extends q_decision_stump (depth 1) with the actual
  * recursive step, including the data-dependent branch handled
  * DECLARATIVELY: the chosen split broadcasts back and every row
  * routes itself with a CASE — the plan never depends on the data.
  *
  * Split family: one-vs-rest on a categorical value of either
  * feature (market segment / order priority); target = F-status.
  * Split quality is the weighted Gini impurity in the cleared
  * integer form: with A_s = n_s² − g_s² − b_s² (= n_s²·gini_s),
  * total = A_L/n_L + A_R/n_R, emitted and ranked as
  * score_milli = 1000·(A_L·n_R + A_R·n_L) div (n_L·n_R) — one
  * truncating division, argmin tie-broken by (feature, value), so
  * both engines grow the identical tree. */
object TreeQueries {

  private val feats = Seq("seg", "pri")

  private def scoreCands(byVal: DataFrame, keyCols: Seq[String]): DataFrame =
    byVal
      .withColumn("no", col("tn") - col("ni"))
      .withColumn("bo", col("tb") - col("bi"))
      .where(col("ni") > 0 && col("no") > 0)
      .withColumn("score_milli", expr(
        """CAST((1000 * (
             (CAST(ni AS DECIMAL(38,0))*ni
              - CAST(ni - bi AS DECIMAL(38,0))*(ni - bi)
              - CAST(bi AS DECIMAL(38,0))*bi) * no
           + (CAST(no AS DECIMAL(38,0))*no
              - CAST(no - bo AS DECIMAL(38,0))*(no - bo)
              - CAST(bo AS DECIMAL(38,0))*bo) * ni))
           div (CAST(ni AS DECIMAL(38,0)) * no) AS BIGINT)"""))

  private val qTreeDepth2 = BoundQuery("q_tree_depth2", (s, d) => {
    val base = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"),
        (col("o_orderstatus") === "F").cast("long").as("bad"))
    def candsOf(df: DataFrame, part: Seq[String]): DataFrame = {
      val tot = df.groupBy(part.map(col): _*)
        .agg(count(lit(1)).as("tn"), sum(col("bad")).as("tb"))
      feats.map { f =>
        df.groupBy((part.map(col) :+ col(f).as("v")): _*)
          .agg(count(lit(1)).as("ni"), sum(col("bad")).as("bi"))
          .withColumn("feature", lit(f))
      }.reduce(_ unionByName _)
        .join(broadcast(tot), part)
    }
    // level 1
    val best1 = scoreCands(candsOf(base.withColumn("all", lit(1)), Seq("all")),
        Seq("all"))
      .orderBy(col("score_milli"), col("feature"), col("v")).limit(1)
      .select(col("feature").as("bf"), col("v").as("bv"),
        col("score_milli").as("bscore"), col("tn").as("bn"),
        col("tb").as("bb"))
    val sided = base.crossJoin(broadcast(best1))
      .withColumn("side", when(
        when(col("bf") === "seg", col("seg")).otherwise(col("pri"))
          === col("bv"), lit("L")).otherwise(lit("R")))
    // level 2: best split per side
    val best2 = scoreCands(candsOf(sided, Seq("side")), Seq("side"))
      .withColumn("rn", row_number().over(Window.partitionBy("side")
        .orderBy(col("score_milli"), col("feature"), col("v"))))
      .where(col("rn") === 1)
      .select(col("side"), col("feature").as("cf"), col("v").as("cv"),
        col("score_milli").as("cscore"), col("tn").as("cn"),
        col("tb").as("cb"))
    // leaves
    val leaves = sided.join(broadcast(best2), "side")
      .withColumn("leaf", concat(col("side"), when(
        when(col("cf") === "seg", col("seg")).otherwise(col("pri"))
          === col("cv"), lit("L")).otherwise(lit("R"))))
      .groupBy("leaf")
      .agg(count(lit(1)).as("n"), sum(col("bad")).as("n_bad"))
      .select(col("leaf").as("node"), lit(null).cast("string").as("split_feature"),
        lit(null).cast("string").as("split_value"),
        lit(null).cast("long").as("score_milli"),
        col("n"), col("n_bad"),
        expr("(1000000 * n_bad) div n").as("rate_ppm"))
    val rootRow = best1.select(lit("root").as("node"),
      col("bf").as("split_feature"), col("bv").as("split_value"),
      col("bscore").as("score_milli"), col("bn").as("n"), col("bb").as("n_bad"),
      expr("(1000000 * bb) div bn").as("rate_ppm"))
    val childRows = best2.select(col("side").as("node"),
      col("cf").as("split_feature"), col("cv").as("split_value"),
      col("cscore").as("score_milli"), col("cn").as("n"), col("cb").as("n_bad"),
      expr("(1000000 * cb) div cn").as("rate_ppm"))
    rootRow.unionByName(childRows).unionByName(leaves).orderBy("node")
  }, Some("""
    WITH base AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri,
        CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      FROM orders JOIN customer ON o_custkey = c_custkey),
    tot1 AS (SELECT CAST(count(*) AS BIGINT) AS tn,
                    CAST(sum(bad) AS BIGINT) AS tb FROM base),
    cand1 AS (
      SELECT feature, v, ni, bi, tn, tb, tn - ni AS no, tb - bi AS bo
      FROM (
        SELECT 'seg' AS feature, seg AS v, CAST(count(*) AS BIGINT) AS ni,
          CAST(sum(bad) AS BIGINT) AS bi FROM base GROUP BY seg
        UNION ALL
        SELECT 'pri', pri, CAST(count(*) AS BIGINT), CAST(sum(bad) AS BIGINT)
        FROM base GROUP BY pri) u
      CROSS JOIN tot1),
    sc1 AS (
      SELECT *, CAST((1000 * (
          (CAST(ni AS HUGEINT)*ni - CAST(ni-bi AS HUGEINT)*(ni-bi)
             - CAST(bi AS HUGEINT)*bi) * no
        + (CAST(no AS HUGEINT)*no - CAST(no-bo AS HUGEINT)*(no-bo)
             - CAST(bo AS HUGEINT)*bo) * ni))
        // (CAST(ni AS HUGEINT) * no) AS BIGINT) AS score_milli
      FROM cand1 WHERE ni > 0 AND no > 0),
    best1 AS (
      SELECT feature AS bf, v AS bv, score_milli AS bscore, tn AS bn, tb AS bb
      FROM sc1 ORDER BY score_milli, feature, v LIMIT 1),
    sided AS (
      SELECT base.*, CASE WHEN
        (CASE WHEN bf = 'seg' THEN seg ELSE pri END) = bv
        THEN 'L' ELSE 'R' END AS side
      FROM base CROSS JOIN best1),
    tot2 AS (SELECT side, CAST(count(*) AS BIGINT) AS tn,
                    CAST(sum(bad) AS BIGINT) AS tb FROM sided GROUP BY side),
    cand2 AS (
      SELECT u.side, feature, v, ni, bi, t.tn, t.tb,
        t.tn - ni AS no, t.tb - bi AS bo
      FROM (
        SELECT side, 'seg' AS feature, seg AS v,
          CAST(count(*) AS BIGINT) AS ni, CAST(sum(bad) AS BIGINT) AS bi
        FROM sided GROUP BY side, seg
        UNION ALL
        SELECT side, 'pri', pri, CAST(count(*) AS BIGINT),
          CAST(sum(bad) AS BIGINT)
        FROM sided GROUP BY side, pri) u
      JOIN tot2 t ON u.side = t.side),
    sc2 AS (
      SELECT *, CAST((1000 * (
          (CAST(ni AS HUGEINT)*ni - CAST(ni-bi AS HUGEINT)*(ni-bi)
             - CAST(bi AS HUGEINT)*bi) * no
        + (CAST(no AS HUGEINT)*no - CAST(no-bo AS HUGEINT)*(no-bo)
             - CAST(bo AS HUGEINT)*bo) * ni))
        // (CAST(ni AS HUGEINT) * no) AS BIGINT) AS score_milli
      FROM cand2 WHERE ni > 0 AND no > 0),
    best2 AS (
      SELECT side, feature AS cf, v AS cv, score_milli AS cscore,
        tn AS cn, tb AS cb
      FROM (SELECT *, row_number() OVER (PARTITION BY side
              ORDER BY score_milli, feature, v) AS rn FROM sc2)
      WHERE rn = 1),
    leaves AS (
      SELECT s.side || (CASE WHEN
          (CASE WHEN b.cf = 'seg' THEN s.seg ELSE s.pri END) = b.cv
          THEN 'L' ELSE 'R' END) AS node,
        CAST(NULL AS VARCHAR) AS split_feature,
        CAST(NULL AS VARCHAR) AS split_value,
        CAST(NULL AS BIGINT) AS score_milli,
        CAST(count(*) AS BIGINT) AS n, CAST(sum(s.bad) AS BIGINT) AS n_bad
      FROM sided s JOIN best2 b ON s.side = b.side
      GROUP BY 1)
    SELECT 'root' AS node, bf AS split_feature, bv AS split_value,
      bscore AS score_milli, bn AS n, bb AS n_bad,
      (1000000 * bb) // bn AS rate_ppm
    FROM best1
    UNION ALL
    SELECT side, cf, cv, cscore, cn, cb, (1000000 * cb) // cn FROM best2
    UNION ALL
    SELECT node, split_feature, split_value, score_milli, n, n_bad,
      (1000000 * n_bad) // n
    FROM leaves
    ORDER BY node
  """))

  /** Two rounds of L2 gradient boosting with one-vs-rest categorical
    * stumps (Friedman 2001, ν = 1/2) on order value — the additive-
    * model counterpart of q_tree_depth2's single tree: each round fits
    * a stump to the CURRENT residuals and adds half its side means to
    * the prediction. Everything stays exact integer: residuals are
    * cents longs (predictions only ever come from truncating
    * divisions), stump quality is the cleared between-group
    * sum-of-squares argmax over WHOLE-DOLLAR residuals
    * (score = (Sᵢnₒ − Sₒnᵢ)² div (nᵢnₒ·10⁶), the q_changepoint form
    * with the quotient rescaled so it stays inside int64 at sf1 —
    * Spark's div WRAPS past int64, the q_logreg_newton finding),
    * and the learning-rate halving is `div 2`. Emitted: per stage the
    * chosen split, its side updates, and the exact train MSE in
    * cents² — which the spec proves non-increasing across stages.
    * Scale shape: per round ONE candidate aggregation + broadcast of
    * the 1-row winner; rows re-derive their own prediction via CASE,
    * so the plan is data-independent (the q_tree_depth2 trick). */
  private val qGbmBoost = BoundQuery("q_gbm_boost", (s, d) => {
    val base = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100, 0).cast("long").as("y"))
    val f0row = base.agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
      .select(expr("sy div n").as("f0"), col("n").as("n_all"))
    def bestStump(df: DataFrame, residCol: String): DataFrame = {
      // candidates over whole-dollar residuals (sf1-safe squares)
      val tot = df.agg(sum(expr(s"$residCol div 100")).as("ts"),
        count(lit(1)).as("tn"))
      feats.map { f =>
        df.groupBy(col(f).as("v"))
          .agg(sum(expr(s"$residCol div 100")).as("si"),
            count(lit(1)).as("ni"))
          .withColumn("feature", lit(f))
      }.reduce(_ unionByName _)
        .crossJoin(broadcast(tot))
        .withColumn("no", col("tn") - col("ni"))
        .where(col("ni") > 0 && col("no") > 0)
        .withColumn("score", expr(
          """CAST(((CAST(si AS DECIMAL(38,0))*no - CAST(ts - si AS DECIMAL(38,0))*ni)
                 * (CAST(si AS DECIMAL(38,0))*no - CAST(ts - si AS DECIMAL(38,0))*ni))
               div (CAST(ni AS DECIMAL(38,0)) * no * 1000000) AS BIGINT)"""))
        .orderBy(desc("score"), col("feature"), col("v")).limit(1)
        .select(col("feature").as("bf"), col("v").as("bv"),
          col("score").as("bscore"))
    }
    // round 1 on r1 = y - f0
    val b1 = base.crossJoin(broadcast(f0row))
      .withColumn("r1", col("y") - col("f0"))
    val s1 = bestStump(b1, "r1")
    val side1 = b1.crossJoin(broadcast(s1))
      .withColumn("in1",
        when(col("bf") === "seg", col("seg")).otherwise(col("pri"))
          === col("bv"))
    val upd1 = side1.groupBy("in1")
      .agg(expr("(sum(r1) div count(1)) div 2").as("u1"))
    val p1 = side1.join(broadcast(upd1), "in1")
      .withColumn("f1", col("f0") + col("u1"))
      .withColumn("r2", col("y") - col("f1"))
    // round 2 on r2
    val s2 = bestStump(p1, "r2")
    val side2 = p1.crossJoin(broadcast(
        s2.select(col("bf").as("bf2"), col("bv").as("bv2"),
          col("bscore").as("bscore2"))))
      .withColumn("in2",
        when(col("bf2") === "seg", col("seg")).otherwise(col("pri"))
          === col("bv2"))
    val upd2 = side2.groupBy("in2")
      .agg(expr("(sum(r2) div count(1)) div 2").as("u2"))
    val fin = side2.join(broadcast(upd2), "in2")
      .withColumn("f2", col("f1") + col("u2"))
    val mse = fin.agg(
      expr("""sum((CAST(y AS DECIMAL(38,0)) - f0) * (CAST(y AS DECIMAL(38,0)) - f0))
              div count(1)""").cast("long").as("mse0"),
      expr("""sum((CAST(y AS DECIMAL(38,0)) - f1) * (CAST(y AS DECIMAL(38,0)) - f1))
              div count(1)""").cast("long").as("mse1"),
      expr("""sum((CAST(y AS DECIMAL(38,0)) - f2) * (CAST(y AS DECIMAL(38,0)) - f2))
              div count(1)""").cast("long").as("mse2"))
    val r0 = f0row.crossJoin(broadcast(mse)).select(lit("init").as("stage"),
      lit(null).cast("string").as("split_feature"),
      lit(null).cast("string").as("split_value"),
      col("f0").as("base_pred_c"), col("mse0").as("mse_c2"))
    val uw1 = upd1.groupBy().pivot("in1", Seq(true, false)).agg(first(col("u1")))
      .select(col("true").as("u_in"), col("false").as("u_out"))
    val r1row = s1.crossJoin(broadcast(mse)).crossJoin(broadcast(uw1))
      .select(lit("round1").as("stage"), col("bf").as("split_feature"),
        col("bv").as("split_value"),
        col("u_in").as("base_pred_c"), col("mse1").as("mse_c2"))
    val uw2 = upd2.groupBy().pivot("in2", Seq(true, false)).agg(first(col("u2")))
      .select(col("true").as("u_in"), col("false").as("u_out"))
    val r2row = s2.crossJoin(broadcast(mse)).crossJoin(broadcast(uw2))
      .select(lit("round2").as("stage"), col("bf").as("split_feature"),
        col("bv").as("split_value"),
        col("u_in").as("base_pred_c"), col("mse2").as("mse_c2"))
    r0.unionByName(r1row).unionByName(r2row).orderBy("stage")
  }, Some("""
    WITH base AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri,
        CAST(round(o_totalprice*100, 0) AS BIGINT) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey),
    f0 AS (SELECT CAST(sum(y) AS BIGINT) // count(*) AS f0,
                  CAST(count(*) AS BIGINT) AS n_all FROM base),
    b1 AS (SELECT base.*, y - f0 AS r1, f0 FROM base CROSS JOIN f0),
    t1 AS (SELECT CAST(sum(r1 // 100) AS BIGINT) AS ts,
                  CAST(count(*) AS BIGINT) AS tn FROM b1),
    c1 AS (
      SELECT feature, v, si, ni, ts, tn, tn - ni AS no FROM (
        SELECT 'seg' AS feature, seg AS v,
          CAST(sum(r1 // 100) AS BIGINT) AS si, CAST(count(*) AS BIGINT) AS ni
        FROM b1 GROUP BY seg
        UNION ALL
        SELECT 'pri', pri, CAST(sum(r1 // 100) AS BIGINT),
          CAST(count(*) AS BIGINT)
        FROM b1 GROUP BY pri) u CROSS JOIN t1),
    s1 AS (
      SELECT feature AS bf, v AS bv,
        CAST(((CAST(si AS HUGEINT)*no - CAST(ts - si AS HUGEINT)*ni)
             * (CAST(si AS HUGEINT)*no - CAST(ts - si AS HUGEINT)*ni))
          // (CAST(ni AS HUGEINT) * no * 1000000) AS BIGINT) AS bscore
      FROM c1 WHERE ni > 0 AND no > 0
      ORDER BY bscore DESC, feature, v LIMIT 1),
    sd1 AS (
      SELECT b1.*, (CASE WHEN bf = 'seg' THEN seg ELSE pri END) = bv AS in1
      FROM b1 CROSS JOIN s1),
    u1 AS (SELECT in1, (CAST(sum(r1) AS BIGINT) // count(*)) // 2 AS u1
           FROM sd1 GROUP BY in1),
    p1 AS (
      SELECT sd1.*, f0 + u1 AS f1, y - (f0 + u1) AS r2
      FROM sd1 JOIN u1 USING (in1)),
    t2 AS (SELECT CAST(sum(r2 // 100) AS BIGINT) AS ts,
                  CAST(count(*) AS BIGINT) AS tn FROM p1),
    c2 AS (
      SELECT feature, v, si, ni, ts, tn, tn - ni AS no FROM (
        SELECT 'seg' AS feature, seg AS v,
          CAST(sum(r2 // 100) AS BIGINT) AS si, CAST(count(*) AS BIGINT) AS ni
        FROM p1 GROUP BY seg
        UNION ALL
        SELECT 'pri', pri, CAST(sum(r2 // 100) AS BIGINT),
          CAST(count(*) AS BIGINT)
        FROM p1 GROUP BY pri) u CROSS JOIN t2),
    s2 AS (
      SELECT feature AS bf2, v AS bv2,
        CAST(((CAST(si AS HUGEINT)*no - CAST(ts - si AS HUGEINT)*ni)
             * (CAST(si AS HUGEINT)*no - CAST(ts - si AS HUGEINT)*ni))
          // (CAST(ni AS HUGEINT) * no * 1000000) AS BIGINT) AS bscore2
      FROM c2 WHERE ni > 0 AND no > 0
      ORDER BY bscore2 DESC, feature, v LIMIT 1),
    sd2 AS (
      SELECT p1.*, (CASE WHEN bf2 = 'seg' THEN seg ELSE pri END) = bv2 AS in2
      FROM p1 CROSS JOIN s2),
    u2 AS (SELECT in2, (CAST(sum(r2) AS BIGINT) // count(*)) // 2 AS u2
           FROM sd2 GROUP BY in2),
    fin AS (SELECT sd2.*, f1 + u2 AS f2 FROM sd2 JOIN u2 USING (in2)),
    mse AS (
      SELECT
        CAST(sum((CAST(y AS HUGEINT) - f0) * (CAST(y AS HUGEINT) - f0))
          // count(*) AS BIGINT) AS mse0,
        CAST(sum((CAST(y AS HUGEINT) - f1) * (CAST(y AS HUGEINT) - f1))
          // count(*) AS BIGINT) AS mse1,
        CAST(sum((CAST(y AS HUGEINT) - f2) * (CAST(y AS HUGEINT) - f2))
          // count(*) AS BIGINT) AS mse2
      FROM fin)
    SELECT 'init' AS stage, CAST(NULL AS VARCHAR) AS split_feature,
      CAST(NULL AS VARCHAR) AS split_value, f0 AS base_pred_c,
      mse0 AS mse_c2
    FROM f0 CROSS JOIN mse
    UNION ALL
    SELECT 'round1', bf, bv, (SELECT u1 FROM u1 WHERE in1), mse1
    FROM s1 CROSS JOIN mse
    UNION ALL
    SELECT 'round2', bf2, bv2, (SELECT u2 FROM u2 WHERE in2), mse2
    FROM s2 CROSS JOIN mse
    ORDER BY stage
  """))

  val all: Seq[BoundQuery] = Seq(qTreeDepth2, qGbmBoost)
}
