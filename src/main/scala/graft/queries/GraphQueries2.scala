package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2.6 wave 38 (graph/spectral): conductance of a natural
  * partition of the co-purchase graph, and fixed-frequency spectral
  * power of the daily revenue series — the two "is there structure
  * here?" instruments beside the clustering/seasonality estimators.
  */
object GraphQueries2 {

  /** Conductance φ(C) = cut(C) / min(vol(C), vol(V∖C)) of each
    * p_brand community over the part co-purchase graph — community
    * quality of the NATURAL partition (brands) without running a
    * community detector: low φ means parts of a brand are bought
    * together, high φ means the brand label cuts across real basket
    * structure. Exact integer cut/volume counts, one ppm division.
    *
    * Scale shape: order-blocked pair generation (≤C(items,2) per
    * order), one distinct, brands attached via TWO broadcast joins of
    * the parts-grain dimension, then k=25-row aggregates; the 2|E|
    * total-volume scalar rides as a broadcast 1-row aggregate. */
  private val qConductance = BoundQuery("q_conductance", (s, d) => {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val canon = items.as("x").join(items.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
    val brand = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
    val withBr = canon
      .join(broadcast(brand.select(col("p_partkey").as("a"),
        col("p_brand").as("br_a"))), "a")
      .join(broadcast(brand.select(col("p_partkey").as("b"),
        col("p_brand").as("br_b"))), "b")
    val vol = withBr.select(col("br_a").as("brand"))
      .union(withBr.select(col("br_b")))
      .groupBy("brand").agg(count(lit(1)).as("vol"))
    val cut = withBr.where(col("br_a") =!= col("br_b"))
      .select(col("br_a").as("brand"))
      .union(withBr.where(col("br_a") =!= col("br_b")).select(col("br_b")))
      .groupBy("brand").agg(count(lit(1)).as("cut"))
    val tot = withBr.agg((count(lit(1)) * 2L).as("vol_all"))
    vol.join(cut, Seq("brand"), "left").na.fill(0L, Seq("cut"))
      .crossJoin(broadcast(tot))
      .select(col("brand"), col("vol"), col("cut"),
        expr("""CASE WHEN least(vol, vol_all - vol) > 0
          THEN (1000000 * cut) div least(vol, vol_all - vol) END""")
          .as("phi_ppm"))
      .orderBy("brand")
  }, Some("""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    ed AS (SELECT DISTINCT x.pk AS a, y.pk AS b
           FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk),
    wb AS (SELECT pa.p_brand AS br_a, pb.p_brand AS br_b
           FROM ed JOIN part pa ON pa.p_partkey = ed.a
                   JOIN part pb ON pb.p_partkey = ed.b),
    vol AS (SELECT brand, CAST(count(*) AS BIGINT) AS vol FROM (
              SELECT br_a AS brand FROM wb
              UNION ALL SELECT br_b FROM wb) GROUP BY brand),
    cut AS (SELECT brand, CAST(count(*) AS BIGINT) AS cut FROM (
              SELECT br_a AS brand FROM wb WHERE br_a <> br_b
              UNION ALL SELECT br_b FROM wb WHERE br_a <> br_b)
            GROUP BY brand),
    tot AS (SELECT 2 * CAST(count(*) AS BIGINT) AS vol_all FROM wb)
    SELECT brand, vol, COALESCE(cut, 0) AS cut,
      CASE WHEN least(vol, vol_all - vol) > 0
        THEN (1000000 * COALESCE(cut, 0)) // least(vol, vol_all - vol) END
        AS phi_ppm
    FROM vol LEFT JOIN cut USING (brand) CROSS JOIN tot
    ORDER BY brand
  """))

  /** Fixed-frequency spectral power (single-bin DFT, the Goertzel
    * question) of the demeaned daily-revenue series at candidate
    * periods T ∈ {7, 14, 30} days: power(T) = (Σx̃ₜcos(2πt/T))² +
    * (Σx̃ₜsin(2πt/T))² — "which calendar rhythm dominates?" beside
    * q_acf's lag view and q_seasonal_strength's decomposition view.
    * Exactness: x̃ₜ is exact cents minus the truncating-mean; each
    * trig term rounds to an integer ONCE per (day, T); the two sums
    * are exact longs; squares land in decimal(38,0) and clear to a
    * µ-scaled BIGINT by one documented 10⁶ division. Dominant period
    * flagged by max.
    *
    * Scale shape: one fact scan to the daily grain (calendar-bounded
    * rows), scalars broadcast, 3 periods from one conditional pass —
    * the sequential part never scales with data, only with days. */
  private val qSpectralPeak = BoundQuery("q_spectral_peak", (s, d) => {
    val daily = Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
        .as("rev"))
    val scal = daily.agg(min(col("day")).as("d0"),
      count(lit(1)).as("n"), sum(col("rev")).as("srev"))
    val base = daily.crossJoin(broadcast(scal))
      .select(datediff(col("day"), col("d0")).cast("long").as("t"),
        (col("rev") - expr("srev div n")).as("x"))
    val terms = base
      .select(col("t"), col("x"),
        explode(array(lit(7), lit(14), lit(30))).as("period"))
      .select(col("period"),
        expr("""CAST(round(x * cos(2.0 * pi() * t / period), 0) AS BIGINT)""")
          .as("ct"),
        expr("""CAST(round(x * sin(2.0 * pi() * t / period), 0) AS BIGINT)""")
          .as("st"))
    val pw = terms.groupBy("period")
      .agg(sum(col("ct")).as("sc"), sum(col("st")).as("ss"))
      .select(col("period").cast("long").as("period"),
        expr("""CAST((CAST(sc AS DECIMAL(38,0)) * sc
          + CAST(ss AS DECIMAL(38,0)) * ss) div 1000000 AS BIGINT)""")
          .as("power_micro"))
    pw.crossJoin(broadcast(pw.agg(max(col("power_micro")).as("mx"))))
      .select(col("period"), col("power_micro"),
        (col("power_micro") === col("mx")).as("dominant"))
      .orderBy("period")
  }, Some("""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
        CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
          AS rev
      FROM lineitem GROUP BY 1),
    scal AS (SELECT min(day) AS d0, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(rev) AS BIGINT) AS srev FROM daily),
    base AS (
      SELECT CAST(datediff('day', d0, day) AS BIGINT) AS t,
             rev - (srev // n) AS x
      FROM daily CROSS JOIN scal),
    terms AS (
      SELECT period,
        CAST(round(x * cos(2.0 * pi() * t / period), 0) AS BIGINT) AS ct,
        CAST(round(x * sin(2.0 * pi() * t / period), 0) AS BIGINT) AS st
      FROM base CROSS JOIN (SELECT unnest([7, 14, 30]) AS period)),
    pw AS (
      SELECT CAST(period AS BIGINT) AS period,
        CAST((CAST(sum(ct) AS HUGEINT) * sum(ct)
          + CAST(sum(st) AS HUGEINT) * sum(st)) // 1000000 AS BIGINT)
          AS power_micro
      FROM terms GROUP BY period)
    SELECT period, power_micro,
      power_micro = (SELECT max(power_micro) FROM pw) AS dominant
    FROM pw ORDER BY period
  """))

  val all: Seq[BoundQuery] = Seq(qConductance, qSpectralPeak)
}
