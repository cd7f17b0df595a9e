package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._
import graft.functions.TextFunctions.tokens

/** SURVEY §2.6 wave 8 (r5): Kneser–Ney bigram smoothing (the LM
  * estimator production tokenizer/LM pipelines actually use, beside
  * q_bigram_lm's add-one), polynomial-kernel MMD (a moments-exact
  * two-sample distance), and rolling correlation (the windowed
  * monitoring companion to q_correlation).
  */
object LmStatsQueries {

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman 1999 eq. 4.25) with fixed discount D = 0.75 for
    * the top-50 bigrams by count:
    *   P(w2|w1) = max(c12−D,0)/c1 + D·N1+(w1·)/c1 · N1+(·w2)/N1+(··)
    * Every count — bigram tokens, left/right continuation type
    * counts, total bigram types — is an exact integer aggregation;
    * the probability is one identical double tree. The continuation-
    * count idea (how many CONTEXTS a word completes, not how often)
    * is exactly the statistic SQL group-distinct computes. Top-50 by
    * (c12, w1, w2) via TakeOrdered. */
  private val qKneserNey = BoundQuery("q_kneser_ney", (s, d) => {
    val bigrams = graft.util.CacheScope.persist(
      graft.util.Spread(Tables.documents(s, d))
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS w1, toks[i] AS w2))"))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2")))
    val c12 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"),
      countDistinct(col("w2")).as("n1p_right"))
    val cont = bigrams.groupBy("w2").agg(countDistinct(col("w1")).as("n1p_left"))
    val types = c12.agg(count(lit(1)).as("n1p_all"))
    val dD = lit(0.75)
    c12.join(c1, "w1").join(cont, "w2").crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1p_right"), col("n1p_left"), col("n1p_all"),
        round(greatest(col("c12").cast("double") - dD, lit(0.0)) /
            col("c1").cast("double") +
          dD * col("n1p_right").cast("double") / col("c1").cast("double") *
            (col("n1p_left").cast("double") / col("n1p_all").cast("double")), 9)
          .as("p_kn"))
      .orderBy(desc("c12"), col("w1"), col("w2")).limit(50)
  }, Some("""
    WITH docs AS (
      SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
      FROM documents),
    bigrams AS (
      SELECT toks[i] AS w1, toks[i+1] AS w2
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
            FROM docs WHERE len(toks) >= 2)),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM bigrams GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1,
                  CAST(count(DISTINCT w2) AS BIGINT) AS n1p_right
           FROM bigrams GROUP BY 1),
    cont AS (SELECT w2, CAST(count(DISTINCT w1) AS BIGINT) AS n1p_left
             FROM bigrams GROUP BY 1),
    types AS (SELECT CAST(count(*) AS BIGINT) AS n1p_all FROM c12)
    SELECT w1, w2, c12, c1, n1p_right, n1p_left, n1p_all,
      round(greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE)
        + 0.75 * CAST(n1p_right AS DOUBLE) / CAST(c1 AS DOUBLE)
          * (CAST(n1p_left AS DOUBLE) / CAST(n1p_all AS DOUBLE)), 9) AS p_kn
    FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN types
    ORDER BY c12 DESC, w1, w2 LIMIT 50
  """))

  /** Two-sample MMD² with the degree-2 polynomial kernel
    * k(x,y) = (1 + xy)² between 1998's and 1999's order values per
    * priority — the kernel two-sample distance that needs NO pairwise
    * pass: for the polynomial kernel the biased V-statistic collapses
    * to pure moments, Ê[k] = 1 + 2·μ₁ᵃμ₁ᵇ + m₂ᵃm₂ᵇ with μ₁ = S₁/n,
    * m₂ = S₂/n, so two exact integer sums per side are the whole
    * computation (values in kilo-dollars inside the kernel to keep
    * the double terms in a sane range). Complements q_wasserstein
    * (geometry) and q_ks_test (sup-norm) with a kernel-space view. */
  private val qMmd = BoundQuery("q_mmd", (s, d) => {
    val x = expr("CAST(round(o_totalprice*100, 0) AS LONG) div 100")
    val g = Tables.orders(s, d)
      .where(year(col("o_orderdate")).isin(1998, 1999))
      .select(col("o_orderpriority").as("pri"),
        (year(col("o_orderdate")) === 1998).cast("long").as("isA"), x.as("x"))
      .groupBy("pri")
      .agg(sum(col("isA")).as("na"), sum(lit(1L) - col("isA")).as("nb"),
        sum(col("isA") * col("x")).as("s1a"),
        sum((lit(1L) - col("isA")) * col("x")).as("s1b"),
        sum(expr("CAST(isA * x AS DECIMAL(38,0)) * x")).as("s2a"),
        sum(expr("CAST((1 - isA) * x AS DECIMAL(38,0)) * x")).as("s2b"))
    def m1(sn: String, nn: String) =
      col(sn).cast("double") / col(nn).cast("double") / 1e3
    def m2(sn: String, nn: String) =
      col(sn).cast("double") / col(nn).cast("double") / 1e6
    val eaa = lit(1.0) + lit(2.0) * m1("s1a", "na") * m1("s1a", "na") +
      m2("s2a", "na") * m2("s2a", "na")
    val ebb = lit(1.0) + lit(2.0) * m1("s1b", "nb") * m1("s1b", "nb") +
      m2("s2b", "nb") * m2("s2b", "nb")
    val eab = lit(1.0) + lit(2.0) * m1("s1a", "na") * m1("s1b", "nb") +
      m2("s2a", "na") * m2("s2b", "nb")
    g.select(col("pri"), col("na").as("n_1998"), col("nb").as("n_1999"),
        round(eaa + ebb - lit(2.0) * eab, 6).as("mmd2_poly2"))
      .orderBy("pri")
  }, Some("""
    WITH g AS (
      SELECT o_orderpriority AS pri,
        CAST(sum(CASE WHEN year(o_orderdate) = 1998 THEN 1 ELSE 0 END)
          AS BIGINT) AS na,
        CAST(sum(CASE WHEN year(o_orderdate) = 1999 THEN 1 ELSE 0 END)
          AS BIGINT) AS nb,
        CAST(sum(CASE WHEN year(o_orderdate) = 1998
          THEN CAST(round(o_totalprice*100, 0) AS BIGINT) // 100 ELSE 0 END)
          AS BIGINT) AS s1a,
        CAST(sum(CASE WHEN year(o_orderdate) = 1999
          THEN CAST(round(o_totalprice*100, 0) AS BIGINT) // 100 ELSE 0 END)
          AS BIGINT) AS s1b,
        CAST(sum(CASE WHEN year(o_orderdate) = 1998
          THEN CAST(CAST(round(o_totalprice*100, 0) AS BIGINT) // 100 AS HUGEINT)
               * (CAST(round(o_totalprice*100, 0) AS BIGINT) // 100) ELSE 0 END)
          AS HUGEINT) AS s2a,
        CAST(sum(CASE WHEN year(o_orderdate) = 1999
          THEN CAST(CAST(round(o_totalprice*100, 0) AS BIGINT) // 100 AS HUGEINT)
               * (CAST(round(o_totalprice*100, 0) AS BIGINT) // 100) ELSE 0 END)
          AS HUGEINT) AS s2b
      FROM orders WHERE year(o_orderdate) IN (1998, 1999)
      GROUP BY 1)
    SELECT pri, na AS n_1998, nb AS n_1999,
      round(
        (1.0 + 2.0 * (CAST(s1a AS DOUBLE)/CAST(na AS DOUBLE)/1e3)
                   * (CAST(s1a AS DOUBLE)/CAST(na AS DOUBLE)/1e3)
             + (CAST(s2a AS DOUBLE)/CAST(na AS DOUBLE)/1e6)
             * (CAST(s2a AS DOUBLE)/CAST(na AS DOUBLE)/1e6))
      + (1.0 + 2.0 * (CAST(s1b AS DOUBLE)/CAST(nb AS DOUBLE)/1e3)
                   * (CAST(s1b AS DOUBLE)/CAST(nb AS DOUBLE)/1e3)
             + (CAST(s2b AS DOUBLE)/CAST(nb AS DOUBLE)/1e6)
             * (CAST(s2b AS DOUBLE)/CAST(nb AS DOUBLE)/1e6))
      - 2.0 * (1.0 + 2.0 * (CAST(s1a AS DOUBLE)/CAST(na AS DOUBLE)/1e3)
                         * (CAST(s1b AS DOUBLE)/CAST(nb AS DOUBLE)/1e3)
                   + (CAST(s2a AS DOUBLE)/CAST(na AS DOUBLE)/1e6)
                   * (CAST(s2b AS DOUBLE)/CAST(nb AS DOUBLE)/1e6)), 6)
        AS mmd2_poly2
    FROM g ORDER BY pri
  """))

  /** Rolling 30-day correlation between daily event count and daily
    * revenue per event type — q_correlation windowed for monitoring:
    * the six moment sums accumulate as EXACT integers inside
    * 30-row windows partitioned by type (calendar-bounded, the
    * q_spearman contract), and each row's Pearson finish is one
    * identical double tree. Rows before a full 30-day window are
    * skipped identically on both engines. */
  private val qRollingCorr = BoundQuery("q_rolling_corr", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"), sumCents(col("value")).as("y"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-29, Window.currentRow)
    val wn = Window.partitionBy("event_type").orderBy("day")
    val r = daily
      .withColumn("rn", row_number().over(wn))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(expr("CAST(y AS DECIMAL(38,0)) * y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .where(col("rn") >= 30)
    def cD(nm: String) = col(nm).cast("double")
    r.select(col("event_type"), col("day"),
        round((cD("n") * cD("sxy") - cD("sx") * cD("sy")) /
          (sqrt(cD("n") * cD("sxx") - cD("sx") * cD("sx")) *
           sqrt(cD("n") * cD("syy") - cD("sy") * cD("sy"))), 6)
          .as("corr30"))
      .orderBy("event_type", "day")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(count(*) AS BIGINT) AS x,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, day,
        row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
        CAST(count(*) OVER w AS BIGINT) AS n,
        CAST(sum(x) OVER w AS BIGINT) AS sx,
        CAST(sum(y) OVER w AS BIGINT) AS sy,
        CAST(sum(x*x) OVER w AS BIGINT) AS sxx,
        CAST(sum(CAST(y AS HUGEINT)*y) OVER w AS HUGEINT) AS syy,
        CAST(sum(x*y) OVER w AS BIGINT) AS sxy
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
    SELECT event_type, day,
      round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
         * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS corr30
    FROM r WHERE rn >= 30
    ORDER BY event_type, day
  """))

  val all: Seq[BoundQuery] = Seq(qKneserNey, qMmd, qRollingCorr)
}
