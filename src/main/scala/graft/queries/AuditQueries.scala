package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num.cents

/** SURVEY §2.6 wave 35 — dataset-governance audits and cross-segment
  * effect synthesis: referential-integrity orphan rates (the first
  * pre-flight any warehouse load runs), the rich-club coefficient of
  * the co-purchase graph (does the dense core trade with itself?),
  * fixed-effect meta-analysis across customer segments (Cochran's Q +
  * I² heterogeneity), and Cohen's h arcsine effect sizes for
  * proportion gaps. All exact-integer until a final documented
  * division or a deterministic double finish over already-exact
  * aggregates.
  */
object AuditQueries {

  /** Referential-integrity audit over the star schema's four FK
    * relationships: child rows, orphan rows (no matching parent key),
    * orphan ppm. On conforming TPC-H-shaped data every orphan count
    * is 0 — the audit's value is the guarantee, and the shape is what
    * matters at 100 TB: each relationship is ONE left-anti join on
    * the FK (shuffle on the key, map-side partial counts, no row ever
    * leaves the executor), and the four audits ride one plan as
    * broadcast 1-row aggregates. */
  private val qRefIntegrity = BoundQuery("q_ref_integrity", (s, d) => {
    import org.apache.spark.sql.{Column, DataFrame}
    def audit(name: String, child: DataFrame, key: Column,
              parent: DataFrame, pkey: Column): DataFrame = {
      val total = child.agg(count(lit(1)).as("child_rows"))
      val orph = child.join(parent, key === pkey, "left_anti")
        .agg(count(lit(1)).as("orphan_rows"))
      total.crossJoin(broadcast(orph))
        .select(lit(name).as("rel"), col("child_rows"), col("orphan_rows"),
          expr("(1000000 * orphan_rows) div child_rows").as("orphan_ppm"))
    }
    val li = Tables.lineitem(s, d)
    audit("lineitem->orders", li.select("l_orderkey"), col("l_orderkey"),
        Tables.orders(s, d).select("o_orderkey"), col("o_orderkey"))
      .union(audit("lineitem->part", li.select("l_partkey"), col("l_partkey"),
        Tables.part(s, d).select("p_partkey"), col("p_partkey")))
      .union(audit("lineitem->supplier", li.select("l_suppkey"), col("l_suppkey"),
        Tables.supplier(s, d).select("s_suppkey"), col("s_suppkey")))
      .union(audit("orders->customer",
        Tables.orders(s, d).select("o_custkey"), col("o_custkey"),
        Tables.customer(s, d).select("c_custkey"), col("c_custkey")))
      .orderBy("rel")
  }, Some("""
    WITH a AS (
      SELECT 'lineitem->orders' AS rel,
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS child_rows,
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)) AS orphan_rows
      UNION ALL
      SELECT 'lineitem->part',
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey))
      UNION ALL
      SELECT 'lineitem->supplier',
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM supplier su
                            WHERE su.s_suppkey = l.l_suppkey))
      UNION ALL
      SELECT 'orders->customer',
        (SELECT CAST(count(*) AS BIGINT) FROM orders),
        (SELECT CAST(count(*) AS BIGINT) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
    )
    SELECT rel, child_rows, orphan_rows,
      (1000000 * orphan_rows) // child_rows AS orphan_ppm
    FROM a ORDER BY rel
  """))

  /** Rich-club coefficient (Zhou & Mondragón 2004) of the part
    * co-purchase graph at degree thresholds k ∈ {4,8,16,32}:
    * φ(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph of nodes with
    * degree > k — rising φ(k) means the hubs preferentially connect
    * to each other (a "rich club"), the structural signal behind
    * popularity-bias audits of co-occurrence data. Exact: E_k and
    * N_k are conditional counts; φ in ppm via one truncating
    * division.
    *
    * Scale shape: the edge list is canonicalized ONCE, degrees are
    * one node-keyed partial agg, the degree attach is the same
    * two-join shape q_triangles pays, and ALL FOUR thresholds come
    * from a single conditional-sum pass — adding a threshold costs
    * one column, never a rescan. */
  private val qRichClub = BoundQuery("q_rich_club", (s, d) => {
    val pp = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val canon = pp.as("x").join(pp.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
    val deg = canon.select(col("a").as("n")).union(canon.select(col("b")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val wd = canon
      .join(deg.select(col("n").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("dg").as("db")), "b")
    def ek(k: Int) = sum(when(col("da") > k && col("db") > k, 1L)
      .otherwise(0L)).as(s"e$k")
    def nk(k: Int) = sum(when(col("dg") > k, 1L).otherwise(0L)).as(s"n$k")
    val es = wd.agg(ek(4), ek(8), ek(16), ek(32))
    val ns = deg.agg(nk(4), nk(8), nk(16), nk(32))
    es.crossJoin(broadcast(ns))
      .select(expr("stack(4, 4L, n4, e4, 8L, n8, e8, 16L, n16, e16, " +
        "32L, n32, e32) AS (k, n_k, e_k)"))
      .withColumn("phi_ppm",
        when(col("n_k") > 1, expr("(2000000 * e_k) div (n_k * (n_k - 1))")))
      .orderBy("k")
  }, Some("""
    WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    ed AS (SELECT DISTINCT x.p AS a, y.p AS b
           FROM pp x JOIN pp y ON x.o = y.o AND x.p < y.p),
    deg AS (SELECT n, CAST(count(*) AS BIGINT) AS dg FROM (
              SELECT a AS n FROM ed UNION ALL SELECT b FROM ed) GROUP BY n),
    wd AS (SELECT da.dg AS da, db.dg AS db
           FROM ed JOIN deg da ON da.n = ed.a JOIN deg db ON db.n = ed.b),
    ks AS (SELECT unnest([4, 8, 16, 32]) AS k),
    es AS (SELECT k, CAST(sum(CASE WHEN da > k AND db > k THEN 1 ELSE 0 END)
                     AS BIGINT) AS e_k
           FROM wd CROSS JOIN ks GROUP BY k),
    nsx AS (SELECT k, CAST(sum(CASE WHEN dg > k THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_k
            FROM deg CROSS JOIN ks GROUP BY k)
    SELECT CAST(es.k AS BIGINT) AS k, n_k, e_k,
      CASE WHEN n_k > 1 THEN (2000000 * e_k) // (n_k * (n_k - 1)) END
        AS phi_ppm
    FROM es JOIN nsx ON es.k = nsx.k ORDER BY k
  """))

  /** Fixed-effect meta-analysis (inverse-variance pooling) of the
    * "high-priority orders are larger" effect across the five
    * customer segments, each segment one "study": per study the mean
    * order-value difference d (URGENT/HIGH vs rest, cents) and its
    * variance v = s₁²/n₁ + s₂²/n₂; pooled d̂ = Σw·d/Σw with w = 1/v;
    * Cochran's Q = Σw·(d−d̂)² and I² = (Q−(k−1))/Q — the DerSimonian–
    * Laird pre-flight before trusting a pooled number.
    *
    * Exactness: per-study sums (n, Σcents, Σcents²) are exact
    * decimals; d and v finish as doubles then round ONCE to
    * milli-cent integers, after which pooling is pure integer work —
    * w = 10¹⁸ div v_milli (v_milli ~ 10¹³ for order totals, so w
    * lands ~10⁵; a 10¹² numerator would truncate every study to 0),
    * d̂_milli = Σ(w·d_milli) div Σw, Q in decimal(38,0) with a
    * documented 10¹⁵ unit clearing (Q_scaled = 10¹⁸·10⁻³·Q_true·10⁶·
    * 10⁻⁶ → q_micro = Q_scaled div 10¹⁵). Scale: one fact-table agg
    * to 10 rows, everything after is driver-free 5-row arithmetic in
    * the same plan. */
  private val qMetaAnalysis = BoundQuery("q_meta_analysis", (s, d) => {
    val per = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .withColumn("hi",
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int"))
      .withColumn("v", cents(col("o_totalprice")))
      .groupBy(col("c_mktsegment").as("seg"), col("hi"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("ss"))
    val study = per.groupBy("seg").agg(
        max(when(col("hi") === 1, col("n"))).as("n1"),
        max(when(col("hi") === 1, col("sv"))).as("s1"),
        max(when(col("hi") === 1, col("ss"))).as("ss1"),
        max(when(col("hi") === 0, col("n"))).as("n2"),
        max(when(col("hi") === 0, col("sv"))).as("s2"),
        max(when(col("hi") === 0, col("ss"))).as("ss2"))
      .withColumn("d_milli", expr("""CAST(round(1000.0 * (
          CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2), 0) AS BIGINT)"""))
      .withColumn("v_milli", expr("""CAST(round(1000.0 * (
          CAST(n1 * ss1 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
            / n1 / (n1 - 1) / n1 +
          CAST(n2 * ss2 - CAST(s2 AS DECIMAL(38,0)) * s2 AS DOUBLE)
            / n2 / (n2 - 1) / n2), 0) AS BIGINT)"""))
      .withColumn("w", expr("1000000000000000000L div v_milli"))
    val pooled = study.agg(
        count(lit(1)).as("k_studies"),
        sum(col("w")).as("sw"),
        sum(expr("w * d_milli")).as("swd"))
      .withColumn("pooled_milli", expr("swd div sw"))
    study.crossJoin(broadcast(pooled))
      .agg(max(col("k_studies")).as("k_studies"),
        max(col("pooled_milli")).as("pooled_d_milli"),
        sum(expr("""CAST(w AS DECIMAL(38,0)) *
          (d_milli - pooled_milli) * (d_milli - pooled_milli)"""))
          .as("q_scaled"))
      .select(col("k_studies"), col("pooled_d_milli"),
        expr("CAST(q_scaled div 1000000000000000 AS BIGINT)").as("q_micro"))
      .withColumn("i2_ppm", expr("""CASE
          WHEN q_micro > (k_studies - 1) * 1000000
          THEN ((q_micro - (k_studies - 1) * 1000000) * 1000000) div q_micro
          ELSE 0 END"""))
  }, Some("""
    WITH per AS (
      SELECT c_mktsegment AS seg,
        CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END AS hi,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sv,
        sum(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)
            * CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS ss
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    study AS (
      SELECT seg,
        max(CASE WHEN hi = 1 THEN n END) AS n1,
        max(CASE WHEN hi = 1 THEN sv END) AS s1,
        max(CASE WHEN hi = 1 THEN ss END) AS ss1,
        max(CASE WHEN hi = 0 THEN n END) AS n2,
        max(CASE WHEN hi = 0 THEN sv END) AS s2,
        max(CASE WHEN hi = 0 THEN ss END) AS ss2
      FROM per GROUP BY seg),
    st2 AS (
      SELECT seg,
        CAST(round(1000.0 * (
          CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2), 0) AS BIGINT)
          AS d_milli,
        CAST(round(1000.0 * (
          CAST(n1 * ss1 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
            / n1 / (n1 - 1) / n1 +
          CAST(n2 * ss2 - CAST(s2 AS HUGEINT) * s2 AS DOUBLE)
            / n2 / (n2 - 1) / n2), 0) AS BIGINT) AS v_milli
      FROM study),
    st3 AS (SELECT seg, d_milli, 1000000000000000000 // v_milli AS w
            FROM st2),
    pooled AS (
      SELECT CAST(count(*) AS BIGINT) AS k_studies,
        CAST(sum(w) AS BIGINT) AS sw,
        CAST(sum(w * d_milli) AS BIGINT) AS swd
      FROM st3),
    p2 AS (SELECT k_studies, swd // sw AS pooled_milli FROM pooled),
    qq AS (
      SELECT max(k_studies) AS k_studies,
        CAST(max(pooled_milli) AS BIGINT) AS pooled_d_milli,
        sum(CAST(w AS HUGEINT)
            * (d_milli - pooled_milli) * (d_milli - pooled_milli)) AS q_scaled
      FROM st3 CROSS JOIN p2)
    SELECT k_studies, pooled_d_milli,
      CAST(q_scaled // 1000000000000000 AS BIGINT) AS q_micro,
      CASE WHEN CAST(q_scaled // 1000000000000000 AS BIGINT)
                > (k_studies - 1) * 1000000
        THEN ((CAST(q_scaled // 1000000000000000 AS BIGINT)
               - (k_studies - 1) * 1000000) * 1000000)
             // CAST(q_scaled // 1000000000000000 AS BIGINT)
        ELSE 0 END AS i2_ppm
    FROM qq
  """))

  /** Cohen's h (Cohen 1988) for every customer-segment pair's return
    * rate: h = 2·asin√p₁ − 2·asin√p₂, the arcsine-stabilized effect
    * size whose magnitude is comparable ACROSS base rates (a 2 pp gap
    * at p=0.5 is tiny, at p=0.02 it is huge — h says so, the raw gap
    * doesn't). Rates come from exact integer counts; the double
    * asin/sqrt finish is the identical expression on both engines,
    * rounded once to µ-units. 10 rows from a 5-row self-join. */
  private val qCohenH = BoundQuery("q_cohen_h", (s, d) => {
    val rate = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
    val a = rate.select(col("seg").as("seg_a"), col("n").as("na"),
      col("r").as("ra"))
    val b = rate.select(col("seg").as("seg_b"), col("n").as("nb"),
      col("r").as("rb"))
    a.join(broadcast(b), col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        expr("(1000000 * ra) div na").as("p_a_ppm"),
        expr("(1000000 * rb) div nb").as("p_b_ppm"),
        expr("""CAST(round(1000000.0 * (
            2.0 * asin(sqrt(CAST(ra AS DOUBLE) / na))
          - 2.0 * asin(sqrt(CAST(rb AS DOUBLE) / nb))), 0) AS BIGINT)""")
          .as("h_micro"))
      .orderBy("seg_a", "seg_b")
  }, Some("""
    WITH rate AS (
      SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
          AS r
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      GROUP BY 1)
    SELECT a.seg AS seg_a, b.seg AS seg_b,
      (1000000 * a.r) // a.n AS p_a_ppm,
      (1000000 * b.r) // b.n AS p_b_ppm,
      CAST(round(1000000.0 * (
          2.0 * asin(sqrt(CAST(a.r AS DOUBLE) / a.n))
        - 2.0 * asin(sqrt(CAST(b.r AS DOUBLE) / b.n))), 0) AS BIGINT)
        AS h_micro
    FROM rate a JOIN rate b ON a.seg < b.seg
    ORDER BY seg_a, seg_b
  """))

  val all: Seq[BoundQuery] =
    Seq(qRefIntegrity, qRichClub, qMetaAnalysis, qCohenH)
}
