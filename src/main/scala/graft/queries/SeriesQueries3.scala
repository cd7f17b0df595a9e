package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Num.{cents, money}
import graft.sources.Tables

/** SURVEY §2.6 wave 39 — series complexity and distribution-shape
  * diagnostics: permutation entropy of the daily revenue series
  * (Bandt & Pompe 2002), the bullwhip variance-amplification ratio
  * along the order→ship chain, and a two-segment decile QQ table.
  * Exact-integer discipline throughout: ordinal patterns are pure
  * integer comparisons, variances stay rational until one cleared
  * division, quantiles are exact rank-picked cents.
  */
object SeriesQueries3 {

  /** Permutation entropy (order 3) of the daily revenue series:
    * every triple of CONSECUTIVE calendar days maps to its ordinal
    * pattern (ranks with earlier-position-wins tie-break — the
    * Bandt–Pompe convention), H = −Σp·ln p over the ≤6 pattern
    * frequencies, normalized by ln 6 to ppm. White noise reads
    * ~10⁶ ppm, a monotone trend reads 0 — the series-complexity
    * gauge beside q_acf's linear view and q_entropy_rate's symbol
    * view. Triples come from two date-shift self-joins (gap days
    * simply contribute no triple — no window, no gap fill); each
    * −p·ln p term rounds to µnats once.
    *
    * Scale shape: one fact scan to the calendar-bounded daily grain;
    * the joins and entropy run on ≤|days| rows in one plan. */
  private val qPermutationEntropy = BoundQuery("q_permutation_entropy",
    (s, d) => {
      val daily = Tables.lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum(cents(col("l_extendedprice"))).as("x"))
      val t = daily.as("a")
        .join(daily.as("b"), col("b.day") === date_add(col("a.day"), 1))
        .join(daily.as("c"), col("c.day") === date_add(col("a.day"), 2))
        .select(col("a.x").as("x1"), col("b.x").as("x2"), col("c.x").as("x3"))
      val pat = t.select((
          (lit(1)
            + when(col("x2") < col("x1"), 1).otherwise(0)
            + when(col("x3") < col("x1"), 1).otherwise(0)) * 100
          + (lit(1)
            + when(col("x1") <= col("x2"), 1).otherwise(0)
            + when(col("x3") < col("x2"), 1).otherwise(0)) * 10
          + (lit(1)
            + when(col("x1") <= col("x3"), 1).otherwise(0)
            + when(col("x2") <= col("x3"), 1).otherwise(0)))
          .cast("long").as("pattern"))
      val counts = pat.groupBy("pattern").agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("nt"))
      val terms = counts.crossJoin(broadcast(tot))
        .withColumn("p_ppm", expr("(1000000 * n) div nt"))
        .withColumn("h_term", expr("""CAST(round(
          -(CAST(n AS DOUBLE) / nt) * ln(CAST(n AS DOUBLE) / nt) * 1000000,
          0) AS BIGINT)"""))
      val h = terms.agg(sum(col("h_term")).as("h_micro"))
        .withColumn("h_norm_ppm", expr(
          "CAST(round(h_micro / ln(6.0), 0) AS BIGINT)"))
      terms.crossJoin(broadcast(h))
        .select(col("pattern"), col("n"), col("p_ppm"),
          col("h_micro"), col("h_norm_ppm"))
        .orderBy("pattern")
    }, Some("""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
        CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
          AS x
      FROM lineitem GROUP BY 1),
    t AS (
      SELECT a.x AS x1, b.x AS x2, c.x AS x3
      FROM daily a
      JOIN daily b ON b.day = a.day + INTERVAL 1 DAY
      JOIN daily c ON c.day = a.day + INTERVAL 2 DAY),
    pat AS (
      SELECT CAST(
        (1 + CASE WHEN x2 < x1 THEN 1 ELSE 0 END
           + CASE WHEN x3 < x1 THEN 1 ELSE 0 END) * 100
        + (1 + CASE WHEN x1 <= x2 THEN 1 ELSE 0 END
             + CASE WHEN x3 < x2 THEN 1 ELSE 0 END) * 10
        + (1 + CASE WHEN x1 <= x3 THEN 1 ELSE 0 END
             + CASE WHEN x2 <= x3 THEN 1 ELSE 0 END) AS BIGINT) AS pattern
      FROM t),
    counts AS (SELECT pattern, CAST(count(*) AS BIGINT) AS n
               FROM pat GROUP BY pattern),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM counts),
    terms AS (
      SELECT pattern, n, (1000000 * n) // nt AS p_ppm,
        CAST(round(-(CAST(n AS DOUBLE) / nt) * ln(CAST(n AS DOUBLE) / nt)
          * 1000000, 0) AS BIGINT) AS h_term
      FROM counts CROSS JOIN tot),
    h AS (SELECT CAST(sum(h_term) AS BIGINT) AS h_micro,
            CAST(round(CAST(sum(h_term) AS BIGINT) / ln(6.0), 0) AS BIGINT)
              AS h_norm_ppm
          FROM terms)
    SELECT pattern, n, p_ppm, h_micro, h_norm_ppm
    FROM terms CROSS JOIN h ORDER BY pattern
  """))

  /** Bullwhip ratio (Lee, Padmanabhan & Whang 1997): monthly demand
    * variance amplification along the chain — var(quantity by ORDER
    * month) / var(quantity by SHIP month). A ratio > 1 means the
    * fulfillment side sees a noisier signal than customers emit.
    * Both variances stay exact rationals (n·Σx² − (Σx)² over
    * decimal(38,0)); the ratio clears to ppm in ONE integral division
    * of cross-multiplied numerators, so no float touches the data
    * path. One row out. */
  private val qBullwhip = BoundQuery("q_bullwhip", (s, d) => {
    def monthly(dateCol: String) = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col(dateCol), "yyyy-MM").as("m"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
        sum(expr("CAST(q AS DECIMAL(38,0)) * q")).as("ss"))
      .select(col("n"),
        expr("n * ss - CAST(s AS DECIMAL(38,0)) * s").as("num"))
    val o = monthly("o_orderdate")
      .select(col("n").as("n_o"), col("num").as("num_o"))
    val sh = monthly("l_shipdate")
      .select(col("n").as("n_s"), col("num").as("num_s"))
    o.crossJoin(broadcast(sh))
      .select(col("n_o").as("n_order_months"), col("n_s").as("n_ship_months"),
        expr("""CAST((num_o * 1000000 * (n_s * (n_s - 1)))
          div (num_s * (n_o * (n_o - 1))) AS BIGINT)""").as("bullwhip_ppm"))
      .withColumn("amplifying", col("bullwhip_ppm") > 1000000L)
  }, Some("""
    WITH om AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS m,
        sum(CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
    sm AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS m,
        sum(CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
    oa AS (SELECT CAST(count(*) AS BIGINT) AS n_o,
             count(*) * sum(CAST(q AS HUGEINT) * q)
               - CAST(sum(q) AS HUGEINT) * sum(q) AS num_o FROM om),
    sa AS (SELECT CAST(count(*) AS BIGINT) AS n_s,
             count(*) * sum(CAST(q AS HUGEINT) * q)
               - CAST(sum(q) AS HUGEINT) * sum(q) AS num_s FROM sm)
    SELECT n_o AS n_order_months, n_s AS n_ship_months,
      CAST((num_o * 1000000 * (n_s * (n_s - 1)))
        // (num_s * (n_o * (n_o - 1))) AS BIGINT) AS bullwhip_ppm,
      CAST((num_o * 1000000 * (n_s * (n_s - 1)))
        // (num_s * (n_o * (n_o - 1))) AS BIGINT) > 1000000 AS amplifying
    FROM oa CROSS JOIN sa
  """))

  /** Two-segment decile QQ table: BUILDING vs MACHINERY order-value
    * deciles side by side (exact rank-picked cents, rank =
    * ⌈q·n⌉ by pure integer (q·n+9) div 10 — the q_group_quantiles
    * convention), with the per-decile ratio in ppm. A flat ratio
    * column ≈ 10⁶ says the distributions differ only in scale; a
    * sloped one localizes WHERE they diverge — the distribution-shape
    * diagnostic beside q_ks_test's single max-gap number.
    *
    * Scale shape: segment-partitioned ranks (never a global window),
    * the 9 deciles ride one conditional-agg pass. */
  private val qQqDeciles = BoundQuery("q_qq_deciles", (s, d) => {
    val segs = Seq("BUILDING", "MACHINERY")
    val j = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment").isin(segs: _*))
      .select(col("c_mktsegment").as("seg"), cents(col("o_totalprice")).as("c"))
    val w = Window.partitionBy("seg").orderBy(col("c"))
    val ranked = j
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("seg")))
    val dec = ranked
      .select(col("seg"), col("c"), col("rn"), col("n"),
        explode(array((1 to 9).map(i => lit(i.toLong)): _*)).as("qt"))
      .where(col("rn") === expr("(qt * n + 9) div 10"))
    dec.groupBy("qt")
      .agg(max(when(col("seg") === "BUILDING", col("c"))).as("b_c"),
        max(when(col("seg") === "MACHINERY", col("c"))).as("m_c"))
      .select(col("qt").as("decile"),
        money(col("b_c")).as("building"), money(col("m_c")).as("machinery"),
        expr("(1000000 * b_c) div m_c").as("ratio_ppm"))
      .orderBy("decile")
  }, Some("""
    WITH j AS (
      SELECT c_mktsegment AS seg,
        CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
    ranked AS (
      SELECT seg, c,
        CAST(row_number() OVER (PARTITION BY seg ORDER BY c) AS BIGINT) AS rn,
        CAST(count(*) OVER (PARTITION BY seg) AS BIGINT) AS n
      FROM j),
    dec AS (
      SELECT seg, c, qt FROM ranked
      CROSS JOIN (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS qt)
      WHERE rn = (qt * n + 9) // 10)
    SELECT qt AS decile,
      CAST(max(CASE WHEN seg = 'BUILDING' THEN c END) AS DOUBLE) / 100.0
        AS building,
      CAST(max(CASE WHEN seg = 'MACHINERY' THEN c END) AS DOUBLE) / 100.0
        AS machinery,
      (1000000 * max(CASE WHEN seg = 'BUILDING' THEN c END))
        // max(CASE WHEN seg = 'MACHINERY' THEN c END) AS ratio_ppm
    FROM dec GROUP BY qt ORDER BY decile
  """))

  val all: Seq[BoundQuery] =
    Seq(qPermutationEntropy, qBullwhip, qQqDeciles)
}
