package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 explainability wave (r5): exact Shapley attributions
  * for the q_ols3 linear model, and the intraclass correlation
  * coefficient — "which features explain THIS row" and "how much do
  * rows within a group resemble each other", the two questions a
  * model-debugging session asks after the fit.
  */
object ExplainQueries {

  /** Exact per-order Shapley values of the q_ols3 model — for a
    * linear model the Shapley attribution has the closed form
    * φ_j(x) = β_j·(x_j − x̄_j) (Lundberg & Lee 2017, linear SHAP
    * with feature independence), so no sampling is needed: the same
    * exact integer moment pass that fits the model also centers the
    * features, and each order's attributions are one broadcast join
    * away. Emits the top-20 orders by |φ₁|+|φ₂| (rounded before
    * ranking, orderkey tiebreak — the rounded-rank determinism rule)
    * with prediction and residual. Scale shape: q_ols3's one
    * all-reduce to a 1-row model + one broadcast join over the
    * per-order features; the top-20 is a TakeOrdered. */
  private val qShapLinear = BoundQuery("q_shap_linear", (s, d) => {
    val feats = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_quantity"))).as("x1"),
        count(lit(1)).as("x2"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"),
          cents(col("o_totalprice")).as("y")), Seq("l_orderkey"))
    def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val m = feats.agg(
      count(lit(1)).as("n"), sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"), sum(d19(col("x1")) * col("x1")).as("s11"),
      sum(d19(col("x1")) * col("x2")).as("s12"),
      sum(d19(col("x2")) * col("x2")).as("s22"),
      sum(d19(col("x1")) * col("y")).as("s1y"),
      sum(d19(col("x2")) * col("y")).as("s2y"))
    val n = col("n").cast("double"); val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double"); val sy = col("sy").cast("double")
    val s11 = col("s11").cast("double"); val s12 = col("s12").cast("double")
    val s22 = col("s22").cast("double"); val s1y = col("s1y").cast("double")
    val s2y = col("s2y").cast("double")
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / det
    val model = m.select(b0.as("b0"), b1.as("b1"), b2.as("b2"),
      (s1 / n).as("m1"), (s2 / n).as("m2"))
    feats.crossJoin(broadcast(model))
      .select(col("l_orderkey").as("orderkey"),
        round(col("b1") * (col("x1").cast("double") - col("m1")), 6).as("phi_qty"),
        round(col("b2") * (col("x2").cast("double") - col("m2")), 6).as("phi_lines"),
        round(col("b0") + col("b1") * col("x1").cast("double") +
          col("b2") * col("x2").cast("double"), 6).as("pred_cents"),
        col("y").as("y_cents"))
      .withColumn("total_abs",
        round(abs(col("phi_qty")) + abs(col("phi_lines")), 6))
      .orderBy(desc("total_abs"), col("orderkey")).limit(20)
      .select("orderkey", "phi_qty", "phi_lines", "pred_cents", "y_cents")
  }, Some("""
    WITH feats AS (
      SELECT l_orderkey,
        sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS x1,
        CAST(count(*) AS BIGINT) AS x2,
        any_value(y) AS y
      FROM lineitem JOIN (
        SELECT o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS y
        FROM orders) o ON o.o_orderkey = l_orderkey
      GROUP BY l_orderkey),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(x1) AS s1, sum(x2) AS s2,
        sum(y) AS sy, sum(x1*x1) AS s11, sum(x1*x2) AS s12,
        sum(x2*x2) AS s22, sum(x1*y) AS s1y, sum(x2*y) AS s2y
      FROM feats),
    dbl AS (
      SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
        CAST(s2 AS DOUBLE) AS s2, CAST(sy AS DOUBLE) AS sy,
        CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12,
        CAST(s22 AS DOUBLE) AS s22, CAST(s1y AS DOUBLE) AS s1y,
        CAST(s2y AS DOUBLE) AS s2y FROM m),
    sol AS (
      SELECT
        (sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y)) /
        (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)) AS b0,
        (n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2)) /
        (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)) AS b1,
        (n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2)) /
        (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)) AS b2,
        s1/n AS m1, s2/n AS m2 FROM dbl)
    SELECT orderkey, phi_qty, phi_lines, pred_cents, y_cents FROM (
      SELECT f.l_orderkey AS orderkey,
        round(b1 * (CAST(x1 AS DOUBLE) - m1), 6) AS phi_qty,
        round(b2 * (CAST(x2 AS DOUBLE) - m2), 6) AS phi_lines,
        round(b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE), 6)
          AS pred_cents,
        y AS y_cents,
        round(abs(round(b1 * (CAST(x1 AS DOUBLE) - m1), 6))
            + abs(round(b2 * (CAST(x2 AS DOUBLE) - m2), 6)), 6) AS total_abs
      FROM feats f CROSS JOIN sol)
    ORDER BY total_abs DESC, orderkey LIMIT 20
  """))

  /** Intraclass correlation ICC(1) of order values within priority
    * groups (one-way random effects, Shrout & Fleiss 1979) — "does
    * knowing the priority tell you anything about the price":
    * per-group exact integer moments (n, Σ, Σ², dollars domain), the
    * cross-group reductions walk a SORTED group list with pinned
    * double folds (the q_ewma rule — a bare double sum over groups
    * would be partition-order dependent), then the unbalanced-design
    * closed form with n₀ = (N − Σn²/N)/(g−1). */
  private val qIcc = BoundQuery("q_icc", (s, d) => {
    val x = expr("CAST(round(o_totalprice*100, 0) AS LONG) div 100")
    val g = Tables.orders(s, d)
      .select(col("o_orderpriority").as("pri"), x.as("x"))
      .groupBy("pri")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("ss"))
    val one = g.agg(count(lit(1)).as("gk"), sum(col("n")).as("nn"),
      sort_array(collect_list(struct(col("pri"),
        col("n").cast("double").as("n"), col("s").cast("double").as("s"),
        col("ss").cast("double").as("ss")))).as("gr"))
    val folded = one.select(col("gk"), col("nn"),
      expr("aggregate(gr, CAST(0.0 AS DOUBLE), (acc, v) -> acc + (v.ss - v.s*v.s/v.n))").as("ssw"),
      expr("aggregate(gr, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v.s*v.s/v.n)").as("sb"),
      expr("aggregate(gr, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v.n*v.n)").as("sn2"),
      expr("aggregate(gr, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v.s)").as("stot"))
    val nD = col("nn").cast("double"); val gD = col("gk").cast("double")
    val ssb = col("sb") - col("stot") * col("stot") / nD
    val msw = col("ssw") / (nD - gD)
    val msb = ssb / (gD - 1.0)
    val n0 = (nD - col("sn2") / nD) / (gD - 1.0)
    folded.select(col("nn").as("n"), col("gk").as("n_groups"),
      round(msb, 2).as("msb"), round(msw, 2).as("msw"),
      round((msb - msw) / (msb + (n0 - 1.0) * msw), 9).as("icc1"))
  }, Some("""
    WITH b AS (
      SELECT o_orderpriority AS pri,
        CAST(round(o_totalprice*100, 0) AS BIGINT) // 100 AS x
      FROM orders),
    g AS (
      SELECT pri, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
        CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss
      FROM b GROUP BY 1),
    one AS (
      SELECT CAST(count(*) AS BIGINT) AS gk, CAST(sum(n) AS BIGINT) AS nn,
        list_sort(list(struct_pack(pri := pri,
          n := CAST(n AS DOUBLE), s := CAST(s AS DOUBLE),
          ss := CAST(ss AS DOUBLE)))) AS gr
      FROM g),
    folded AS (
      SELECT gk, nn,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(gr, v -> v.ss - v.s*v.s/v.n)),
          (acc, v) -> acc + v) AS ssw,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(gr, v -> v.s*v.s/v.n)), (acc, v) -> acc + v) AS sb,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(gr, v -> v.n*v.n)), (acc, v) -> acc + v) AS sn2,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(gr, v -> v.s)), (acc, v) -> acc + v) AS stot
      FROM one)
    SELECT nn AS n, gk AS n_groups,
      round((sb - stot*stot/CAST(nn AS DOUBLE)) / (CAST(gk AS DOUBLE) - 1.0), 2)
        AS msb,
      round(ssw / (CAST(nn AS DOUBLE) - CAST(gk AS DOUBLE)), 2) AS msw,
      round(((sb - stot*stot/CAST(nn AS DOUBLE)) / (CAST(gk AS DOUBLE) - 1.0)
             - ssw / (CAST(nn AS DOUBLE) - CAST(gk AS DOUBLE)))
          / ((sb - stot*stot/CAST(nn AS DOUBLE)) / (CAST(gk AS DOUBLE) - 1.0)
             + ((CAST(nn AS DOUBLE) - sn2/CAST(nn AS DOUBLE))
                / (CAST(gk AS DOUBLE) - 1.0) - 1.0)
               * (ssw / (CAST(nn AS DOUBLE) - CAST(gk AS DOUBLE)))), 9) AS icc1
    FROM folded
  """))

  val all: Seq[BoundQuery] = Seq(qShapLinear, qIcc)
}
