package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 stats wave 5: the exact-moment statistical surface
  * widened with (1) the raw Gram/scatter moment table itself as a
  * first-class query — the direct oracle gate for the new
  * expressions.GramAggLong partial-aggregable moment pass, (2) the
  * Grubbs max-normed-residual outlier test, (3) partial correlation
  * (the confounder-adjusted Pearson), and (4) Youden's J optimal
  * decision threshold on the q_auc scoring fixture.
  *
  * House numeric discipline throughout: every aggregation sums exact
  * integers (cents/milli units), transcendental finishes are
  * identical double expression trees over the same exact integers on
  * both engines, and any argmax ties break through zero-padded
  * printf keys (the DuckDB arg_max-without-struct-ordering rule).
  */
object StatsQueries5 {

  /** The exact integer scatter moments of the embedding collection —
    * upper-triangle Σ xmᵢ·xmⱼ over milli-quantized coordinates, the
    * shared input of q_pca / q_pca_power / ml.Pca — computed by ONE
    * GramAggLong pass (per-partition d(d+1)/2-cell buffers, only
    * buffers shuffle) and exploded back to (i, j, mij) rows. The
    * DuckDB oracle builds the SAME cells the quadratic way (explode ×
    * self-join on vec_id), so this query certifies the aggregate's
    * exactness cell-by-cell against an independent formulation.
    *
    * Scale shape: the Spark side is O(n·d²) multiply-adds into O(d²)
    * state with NO shuffled row inflation; the 2080-cell result is a
    * driver handful by construction. Reference analogue:
    * mlqueries.py's feature moments stop at 2-D; this is the d-dim
    * generalization a 100 TB embedding store needs. */
  private val qGramMoments = BoundQuery("q_gram_moments", (s, d) => {
    import s.implicits._
    val dim = 64
    val g = Tables.embeddings(s, d)
      .select(graft.expressions.Gram.gramAggLong(s,
        transform(col("embedding"), x => round(x.cast("double") * 1000, 0).cast("long")),
        dim).as("g"))
    val idx = (for (i <- 1 to dim; j <- i to dim)
      yield (graft.expressions.GramFns.triIndex(dim, i - 1, j - 1), i.toLong, j.toLong))
      .toDF("k", "i", "j")
    g.select(col("g.n").as("n_vecs"), posexplode(col("g.g")).as(Seq("k", "mij_dec")))
      .join(broadcast(idx), "k")
      .select(col("i"), col("j"), col("mij_dec").cast("long").as("mij"), col("n_vecs"))
      .orderBy("i", "j")
  }, Some("""
    WITH dm AS MATERIALIZED (
      SELECT vec_id, i,
        CAST(round(CAST(embedding[i] AS DOUBLE)*1000, 0) AS BIGINT) AS xm
      FROM embeddings, unnest(range(1, 65)) AS t(i)),
    nn AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs FROM dm)
    SELECT a.i AS i, b.i AS j, CAST(sum(a.xm * b.xm) AS BIGINT) AS mij, n_vecs
    FROM dm a JOIN dm b ON a.vec_id = b.vec_id AND a.i <= b.i, nn
    GROUP BY 1, 2, 4 ORDER BY i, j
  """))

  /** Grubbs' max-normed-residual outlier test per order priority
    * (Grubbs 1950): G = max|x − x̄| / s over order totals in DOLLARS.
    * The deviation argmax is EXACT — max|n·x − S| is pure integer
    * arithmetic, no float mean subtraction — and the outlier order is
    * pinned by a zero-padded printf key (largest deviation, then
    * smallest orderkey). Only the final G = dev·√((n−1)/(n·(nQ−S²)))
    * runs in doubles, as identical trees over the same integers.
    *
    * Scale shape: one map-side-combined groupBy per priority; the
    * printf-max rides the same partial agg. Integer headroom: the
    * dev² product stays inside BIGINT through sf1-class groups
    * (dollars ≤ 5·10⁵, n ≤ 10⁶); the double finish is scale-free. */
  private val qGrubbs = BoundQuery("q_grubbs", (s, d) => {
    val x = expr("CAST(round(o_totalprice*100, 0) AS LONG) div 100")
    val g = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), x.as("x"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        max(col("x")).as("mx"), min(col("x")).as("mn"))
    val keyed = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), x.as("x"))
      .join(broadcast(g), "o_orderpriority")
      .groupBy(col("o_orderpriority"), col("n"), col("sx"), col("sxx"))
      .agg(max(format_string("%020d:%020d",
        abs(col("n") * col("x") - col("sx")),
        lit(99999999999L) - col("o_orderkey"))).as("mk"))
    keyed.select(col("o_orderpriority"), col("n"),
        substring(col("mk"), 1, 20).cast("long").as("max_dev_ndollars"),
        (lit(99999999999L) - substring(col("mk"), 22, 20).cast("long"))
          .as("outlier_orderkey"),
        round(substring(col("mk"), 1, 20).cast("long").cast("double") *
          sqrt((col("n").cast("double") - 1.0) /
            (col("n").cast("double") *
              (col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")))), 6)
          .as("grubbs_g"))
      .orderBy("o_orderpriority")
  }, Some("""
    WITH b AS (
      SELECT o_orderpriority, o_orderkey,
        CAST(round(o_totalprice*100, 0) AS BIGINT) // 100 AS x
      FROM orders),
    m AS (
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x*x) AS BIGINT) AS sxx
      FROM b GROUP BY 1),
    k AS (
      SELECT b.o_orderpriority, n, sx, sxx,
        max(printf('%020d:%020d', abs(n * x - sx),
                   99999999999 - o_orderkey)) AS mk
      FROM b JOIN m ON b.o_orderpriority = m.o_orderpriority
      GROUP BY 1, 2, 3, 4)
    SELECT o_orderpriority, n,
      CAST(substr(mk, 1, 20) AS BIGINT) AS max_dev_ndollars,
      99999999999 - CAST(substr(mk, 22, 20) AS BIGINT) AS outlier_orderkey,
      round(CAST(CAST(substr(mk, 1, 20) AS BIGINT) AS DOUBLE) *
        sqrt((CAST(n AS DOUBLE) - 1.0) /
          (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))), 6) AS grubbs_g
    FROM k ORDER BY o_orderpriority
  """))

  /** Partial correlation of quantity and line value CONTROLLING for
    * discount, per return flag — "does buying more still correlate
    * with paying more once the discount channel is held fixed?":
    * ρ_xy·z from the 3×3 exact-integer moment matrix (q_correlation
    * widened by one confounder; Cramer-style covariance identities
    * C_ab = n·Σab − Σa·Σb). x = quantity units, y = dollars,
    * z = discount basis points — all small-domain integers, so every
    * second moment stays in BIGINT at any realistic n. The three
    * covariance terms combine in doubles as identical trees:
    * ρ_xy·z = (Cxy·Czz − Cxz·Cyz) / √((Cxx·Czz − Cxz²)(Cyy·Czz − Cyz²)). */
  private val qPartialCorr = BoundQuery("q_partial_corr", (s, d) => {
    val xq = col("l_quantity").cast("long")
    val yd = expr("CAST(round(l_extendedprice*100, 0) AS LONG) div 100")
    val zb = expr("CAST(round(l_discount*10000, 0) AS LONG)")
    val m = Tables.lineitem(s, d)
      .select(col("l_returnflag"), xq.as("x"), yd.as("y"), zb.as("z"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("z") * col("z")).as("szz"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("z")).as("sxz"), sum(col("y") * col("z")).as("syz"))
    def cD(nm: String) = col(nm).cast("double")
    val (n, sx, sy, sz) = (cD("n"), cD("sx"), cD("sy"), cD("sz"))
    val cxx = n * cD("sxx") - sx * sx
    val cyy = n * cD("syy") - sy * sy
    val czz = n * cD("szz") - sz * sz
    val cxy = n * cD("sxy") - sx * sy
    val cxz = n * cD("sxz") - sx * sz
    val cyz = n * cD("syz") - sy * sz
    m.select(col("l_returnflag"), col("n"),
        round(cxy / sqrt(cxx * cyy), 9).as("r_xy"),
        round((cxy * czz - cxz * cyz) /
          sqrt((cxx * czz - cxz * cxz) * (cyy * czz - cyz * cyz)), 9)
          .as("r_xy_given_z"))
      .orderBy("l_returnflag")
  }, Some("""
    WITH b AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        CAST(round(l_extendedprice*100, 0) AS BIGINT) // 100 AS y,
        CAST(round(l_discount*10000, 0) AS BIGINT) AS z
      FROM lineitem),
    m AS (
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(z) AS BIGINT) AS sz,
        CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
        CAST(sum(z*z) AS BIGINT) AS szz, CAST(sum(x*y) AS BIGINT) AS sxy,
        CAST(sum(x*z) AS BIGINT) AS sxz, CAST(sum(y*z) AS BIGINT) AS syz
      FROM b GROUP BY 1)
    SELECT l_returnflag, n,
      round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 9)
        AS r_xy,
      round(((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE)*CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)*CAST(sz AS DOUBLE))
            - (CAST(n AS DOUBLE)*CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sz AS DOUBLE))
              * (CAST(n AS DOUBLE)*CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sz AS DOUBLE)))
        / sqrt(((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                 * (CAST(n AS DOUBLE)*CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)*CAST(sz AS DOUBLE))
               - (CAST(n AS DOUBLE)*CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sz AS DOUBLE))
                 * (CAST(n AS DOUBLE)*CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sz AS DOUBLE)))
              * ((CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))
                 * (CAST(n AS DOUBLE)*CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)*CAST(sz AS DOUBLE))
               - (CAST(n AS DOUBLE)*CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sz AS DOUBLE))
                 * (CAST(n AS DOUBLE)*CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sz AS DOUBLE)))), 9)
        AS r_xy_given_z
    FROM m ORDER BY l_returnflag
  """))

  /** Youden's J optimal threshold on the q_auc scoring fixture: the
    * train-split per-priority F-rates score the test split; each
    * candidate threshold (predict F when score ≥ t) gets
    * J = TPR − FPR in exact ppm integral divisions, and the winner
    * pins ties to the SMALLEST threshold (highest specificity at
    * equal J). The whole ROC walk runs over the ≤5-row distinct-score
    * domain — the q_auc bounded-domain window contract; row volume
    * never reaches a window. */
  private val qYouden = BoundQuery("q_youden", (s, d) => {
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
    val wDesc = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = byScore
      .withColumn("cum_m", sum(col("m")).over(wDesc))
      .withColumn("cum_f", sum(col("f")).over(wDesc))
    val tot = walked.agg(sum(col("f")).as("n_pos"),
      sum(col("m") - col("f")).as("n_neg"))
    walked.crossJoin(broadcast(tot))
      .select(col("score").as("threshold"),
        expr("(1000000 * cum_f) div n_pos").as("tpr_ppm"),
        expr("(1000000 * (cum_m - cum_f)) div n_neg").as("fpr_ppm"))
      .withColumn("j_ppm", col("tpr_ppm") - col("fpr_ppm"))
      .orderBy(col("j_ppm").desc, col("threshold").asc)
      .limit(1)
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
    w AS (
      SELECT score, m, f,
        CAST(sum(m) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS BIGINT) AS cum_m,
        CAST(sum(f) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS BIGINT) AS cum_f
      FROM sc),
    t AS (SELECT CAST(sum(f) AS BIGINT) AS n_pos,
                 CAST(sum(m - f) AS BIGINT) AS n_neg FROM w)
    SELECT score AS threshold,
      (1000000 * cum_f) // n_pos AS tpr_ppm,
      (1000000 * (cum_m - cum_f)) // n_neg AS fpr_ppm,
      (1000000 * cum_f) // n_pos - (1000000 * (cum_m - cum_f)) // n_neg AS j_ppm
    FROM w, t
    ORDER BY j_ppm DESC, threshold ASC LIMIT 1
  """))

  val all: Seq[BoundQuery] =
    Seq(qGramMoments, qGrubbs, qPartialCorr, qYouden)
}
