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

  val all: Seq[BoundQuery] = Seq(qTreeDepth2)
}
