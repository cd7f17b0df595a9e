package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Similarity

/** SURVEY §2.6 evaluation-metric wave: the three classic "how good is
  * the model/ranking?" primitives a training-data pipeline runs beside
  * its curation jobs — graded ranking quality (NDCG), probability
  * calibration (per-group Brier), and the one-rule decision stump that
  * every real classifier must beat to justify its cost.
  *
  * All three are engine-proven end-to-end: the only transcendental
  * (log2 in the NDCG discount) is frozen into shared integer literals
  * generated once and inlined in BOTH the Spark plan and the DuckDB
  * oracle, so no runtime float crosses an engine boundary.
  */
object EvalQueries {

  /** 10⁶/log2(1+r) for r = 1..10, HALF_UP — the NDCG@10 discount
    * table as exact micro-unit literals. Computed offline (python
    * Decimal) and pasted as constants; the oracle interpolates the
    * SAME array, so both engines share one frozen rounding. */
  private val disc: Seq[Long] = Seq(
    1000000L, 630930L, 500000L, 430677L, 386853L,
    356207L, 333333L, 315465L, 301030L, 289065L)
  private val discSqlList = disc.mkString("[", ", ", "]")
  private val discSparkArr = s"array(${disc.mkString("L, ")}L)"

  /** NDCG@10 of the exact-cosine neighbor ranking, graded against
    * label agreement (a neighbor is relevant iff it shares the query
    * vector's class label) — the retrieval-quality audit for the ANN
    * surface: q_ann_eval measures recall of the approximate index
    * against the exact ranking; this measures whether the exact
    * ranking itself surfaces the RIGHT items, position-weighted.
    *
    * DCG sums the discount literal at each relevant rank; IDCG slices
    * the same literal array to min(10, n_rel); the quotient is one
    * final integral division to ppm. Scale shape: the ranking is
    * Similarity.bruteForceTopK (5-query broadcast + WindowGroupLimit
    * top-k — the q_ann_topk plan); labels arrive by one keyed join;
    * everything after the top-k is 50 rows. */
  private val qNdcg = BoundQuery("q_ndcg", (s, d) => {
    val e = Tables.embeddings(s, d)
    val top = Similarity.bruteForceTopK(
      e, col("vec_id"), col("embedding"),
      e.where(col("vec_id") < 5), col("vec_id"), col("embedding"), k = 10)
    val labels = e.select(col("vec_id").as("id"), col("label"))
    val qlab = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"))
    val dcg = top
      .join(labels, "id").join(broadcast(qlab), "query_id")
      .groupBy("query_id")
      .agg(sum(when(col("label") === col("qlabel"),
        element_at(expr(discSparkArr), col("rnk").cast("int")))
        .otherwise(0L)).as("dcg_u"))
    val nrel = broadcast(qlab).join(labels,
        col("label") === col("qlabel") && col("id") =!= col("query_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    dcg.join(nrel, "query_id")
      .select(col("query_id"), col("n_rel"), col("dcg_u"),
        expr(s"aggregate(slice($discSparkArr, 1, " +
          "cast(least(10L, n_rel) as int)), 0L, (a, x) -> a + x)")
          .as("idcg_u"))
      .withColumn("ndcg_ppm", expr("(1000000 * dcg_u) div idcg_u"))
      .orderBy("query_id")
  }, Some(s"""
    WITH e AS (SELECT vec_id, label, embedding, ${VectorQueries.duckNorm} AS nrm
               FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS qlabel,
             a.vec_id AS id, a.label AS alabel,
             round(${VectorQueries.duckCosine("a", "q")}, 6) AS cosine
      FROM e a JOIN e q ON q.vec_id < 5 AND a.vec_id <> q.vec_id),
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, id) AS BIGINT) AS rnk
      FROM scored),
    d AS (SELECT $discSqlList AS disc),
    dcg AS (
      SELECT query_id,
        CAST(sum(CASE WHEN alabel = qlabel THEN disc[CAST(rnk AS INT)]
                      ELSE 0 END) AS BIGINT) AS dcg_u
      FROM ranked, d WHERE rnk <= 10 GROUP BY query_id),
    nr AS (
      SELECT q.vec_id AS query_id, CAST(count(*) AS BIGINT) AS n_rel
      FROM e q JOIN e a
        ON q.vec_id < 5 AND a.vec_id <> q.vec_id AND a.label = q.label
      GROUP BY 1),
    i AS (
      SELECT query_id, n_rel,
        CAST(list_sum(disc[1:CAST(least(10, n_rel) AS INT)]) AS BIGINT)
          AS idcg_u
      FROM nr, d)
    SELECT query_id, n_rel, dcg_u, idcg_u,
      (1000000 * dcg_u) // idcg_u AS ndcg_ppm
    FROM dcg JOIN i USING (query_id) ORDER BY query_id
  """))

  /** Calibration audit (reliability-diagram rows + per-group Brier):
    * train a per-priority completion rate on the md5-hash train half
    * (the q_train_split determinism rule — no RNG, partition-invariant)
    * and grade it on the held-out half. Σ(p−y)² expands to
    * n·p² − 2·10⁶·p·f + f·10¹² over exact longs (y ∈ {0,10⁶} and
    * y² = y·10⁶·… — the binary-outcome identity), so the Brier score
    * needs no per-row float: one scan, one groupBy, k=5 output rows.
    *
    * p and o are ppm by truncating division — both engines' `div`
    * truncates toward zero, verified including negative operands. */
  private val qCalibration = BoundQuery("q_calibration", (s, d) => {
    val h = substring(md5(col("o_orderkey").cast("string")), 1, 2)
    val g = Tables.orders(s, d)
      .withColumn("is_train", (h < "80").cast("long"))
      .withColumn("is_f", (col("o_orderstatus") === "F").cast("long"))
      .groupBy("o_orderpriority")
      .agg(sum(col("is_train")).as("n_train"),
        sum(col("is_train") * col("is_f")).as("f_train"),
        sum(lit(1L) - col("is_train")).as("n_test"),
        sum((lit(1L) - col("is_train")) * col("is_f")).as("f_test"))
    g.select(col("o_orderpriority"), col("n_train"), col("n_test"),
        col("f_test"),
        expr("(1000000 * f_train) div n_train").as("p_f_ppm"),
        expr("(1000000 * f_test) div n_test").as("o_f_ppm"))
      .withColumn("brier_ppm", expr(
        """(n_test * p_f_ppm * p_f_ppm
            - 2000000 * p_f_ppm * f_test
            + f_test * 1000000000000)
           div (n_test * 1000000)"""))
      .select("o_orderpriority", "n_train", "n_test", "p_f_ppm",
        "o_f_ppm", "brier_ppm")
      .orderBy("o_orderpriority")
  }, Some("""
    WITH g AS (
      SELECT o_orderpriority,
        CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '80'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '80'
                  AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_train,
        CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) >= '80'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
        CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) >= '80'
                  AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_test
      FROM orders GROUP BY 1),
    p AS (
      SELECT o_orderpriority, n_train, n_test,
        (1000000 * f_train) // n_train AS p_f_ppm,
        (1000000 * f_test) // n_test AS o_f_ppm,
        f_test
      FROM g)
    SELECT o_orderpriority, n_train, n_test, p_f_ppm, o_f_ppm,
      (n_test * p_f_ppm * p_f_ppm - 2000000 * p_f_ppm * f_test
        + f_test * 1000000000000) // (n_test * 1000000) AS brier_ppm
    FROM p ORDER BY o_orderpriority
  """))

  /** EXACT ROC AUC of the q_calibration model via the Mann–Whitney
    * identity AUC = (R⁺ − n₁(n₁+1)/2) / (n₁n₀): train per-priority
    * completion rates on the md5 train half, score the held-out half,
    * and rank-sum the scores — ties handled by the doubled-rank trick
    * (2·avgrank integer, the q_spearman convention), so the whole
    * statistic is exact longs and ONE final integral division to ppm.
    * No trapezoid, no float: rank-sum AUC IS the full ROC integral.
    *
    * Scale shape: one scan aggregates to the priority grain (k=5);
    * scoring joins the broadcast 5-row model; the rank accumulation
    * runs over DISTINCT SCORES (≤ k rows) under the bounded-domain
    * window contract. Row volume never reaches a window. */
  private val qAuc = BoundQuery("q_auc", (s, d) => {
    val h = substring(md5(col("o_orderkey").cast("string")), 1, 2)
    val g = Tables.orders(s, d)
      .withColumn("is_train", (h < "80").cast("long"))
      .withColumn("is_f", (col("o_orderstatus") === "F").cast("long"))
      .groupBy("o_orderpriority")
      .agg(sum(col("is_train")).as("n_train"),
        sum(col("is_train") * col("is_f")).as("f_train"),
        sum(lit(1L) - col("is_train")).as("n_test"),
        sum((lit(1L) - col("is_train")) * col("is_f")).as("f_test"))
      .withColumn("score", expr("(1000000 * f_train) div n_train"))
    val byScore = g.groupBy("score")
      .agg(sum(col("n_test")).as("m"), sum(col("f_test")).as("f"))
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byScore
      .withColumn("cum", sum(col("m")).over(w))
      .withColumn("r2", lit(2L) * (col("cum") - col("m")) + col("m") + 1L)
    ranked.agg(sum(col("f")).as("n_pos"),
        sum(col("m") - col("f")).as("n_neg"),
        sum(col("f") * col("r2")).as("rsum2"))
      .select(col("n_pos"), col("n_neg"),
        expr("""(1000000 * (rsum2 - n_pos * (n_pos + 1)))
                div (2 * n_pos * n_neg)""").as("auc_ppm"))
  }, Some("""
    WITH g AS (
      SELECT o_orderpriority,
        CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '80'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '80'
                  AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_train,
        CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) >= '80'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
        CAST(sum(CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) >= '80'
                  AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_test
      FROM orders GROUP BY 1),
    sc AS (
      SELECT (1000000 * f_train) // n_train AS score,
        CAST(sum(n_test) AS BIGINT) AS m, CAST(sum(f_test) AS BIGINT) AS f
      FROM g GROUP BY 1),
    r AS (
      SELECT score, m, f,
        CAST(sum(m) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS BIGINT) AS cum
      FROM sc),
    a AS (
      SELECT CAST(sum(f) AS BIGINT) AS n_pos,
        CAST(sum(m - f) AS BIGINT) AS n_neg,
        CAST(sum(f * (2 * (cum - m) + m + 1)) AS BIGINT) AS rsum2
      FROM r)
    SELECT n_pos, n_neg,
      (1000000 * (rsum2 - n_pos * (n_pos + 1))) // (2 * n_pos * n_neg) AS auc_ppm
    FROM a
  """))

  /** One-rule decision stump: the best single threshold on l_quantity
    * for predicting a returned line (l_returnflag = 'R'), by exact
    * misclassification count over both orientations — the canonical
    * "is your classifier better than one if-statement?" baseline
    * (Holte '93) for the in-engine NB/CV family.
    *
    * Scale shape: one map-side-combined groupBy collapses any number
    * of rows to the FEATURE DOMAIN (50 distinct quantities); the
    * cumulative scan runs over those 50 rows under a documented
    * bounded-domain contract (the q_decile quarantine rule), and the
    * argmin collapses to a TakeOrdered(1). Row volume never reaches
    * the window. */
  private val qDecisionStump = BoundQuery("q_decision_stump", (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_quantity").cast("long").as("qty"),
        (col("l_returnflag") === "R").cast("long").as("pos"))
    val dist = li.groupBy("qty")
      .agg(count(lit(1)).as("n_t"), sum(col("pos")).as("pos_t"))
    val tot = dist.agg(sum(col("n_t")).as("n"), sum(col("pos_t")).as("p"))
    val w = Window.orderBy("qty")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dist
      .withColumn("cn", sum(col("n_t")).over(w))
      .withColumn("cp", sum(col("pos_t")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("err_le", col("cn") - col("cp") + col("p") - col("cp"))
      .withColumn("err_gt",
        col("cp") + col("n") - col("cn") - (col("p") - col("cp")))
      .withColumn("orientation",
        when(col("err_le") <= col("err_gt"), "pred_R_below").otherwise("pred_R_above"))
      .withColumn("err", least(col("err_le"), col("err_gt")))
      .orderBy(col("err"), col("qty"))
      .limit(1)
      .select(col("qty").as("split_qty"), col("orientation"),
        col("err").as("n_misclass"), col("n").as("n_rows"),
        expr("(1000000 * (n - err)) div n").as("acc_ppm"))
  }, Some("""
    WITH li AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
        CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
      FROM lineitem),
    dist AS (
      SELECT qty, CAST(count(*) AS BIGINT) AS n_t,
        CAST(sum(pos) AS BIGINT) AS pos_t
      FROM li GROUP BY 1),
    tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS n,
                   CAST(sum(pos_t) AS BIGINT) AS p FROM dist),
    cum AS (
      SELECT qty,
        CAST(sum(n_t) OVER (ORDER BY qty ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS BIGINT) AS cn,
        CAST(sum(pos_t) OVER (ORDER BY qty ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS BIGINT) AS cp
      FROM dist),
    e AS (
      SELECT qty, n, p,
        cn - cp + p - cp AS err_le,
        cp + n - cn - (p - cp) AS err_gt
      FROM cum, tot)
    SELECT qty AS split_qty,
      CASE WHEN err_le <= err_gt THEN 'pred_R_below'
           ELSE 'pred_R_above' END AS orientation,
      least(err_le, err_gt) AS n_misclass, n AS n_rows,
      (1000000 * (n - least(err_le, err_gt))) // n AS acc_ppm
    FROM e ORDER BY least(err_le, err_gt), qty LIMIT 1
  """))

  val all: Seq[BoundQuery] = Seq(qNdcg, qCalibration, qAuc, qDecisionStump)
}
