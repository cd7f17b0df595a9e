package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2.6 recommender-analytics wave: the two classical
  * neighborhood-model readouts a catalog team runs over co-purchase
  * data — item-item cosine similarity (the "people who bought X also
  * bought Y" score) and exact association rules with
  * support/confidence/lift (the engine-proven twin that closes
  * q_association_rules' rows-only gap the way q_kmeans_arith closed
  * q_kmeans's).
  *
  * Reference scope: mlqueries.py's FPGrowth pipeline (rules with
  * min-confidence over order baskets); re-derived here Spark-first on
  * the same basket model with exact integer statistics so the DuckDB
  * oracle replays every term.
  *
  * Shared scale shape (the q_adamic_adar contract): candidate pairs
  * are generated per ORDER — the blocking key — and a TPC-H-shaped
  * order holds ≤7 items, so fan-out is ≤ C(7,2) per order and
  * candidates grow linearly with orders, never parts². Degrees join
  * back via a parts-grain table (broadcast-eligible: |parts| ≪
  * |lineitem|). For unbounded basket sizes the ngram joins'
  * maxShingleDf cap applies unchanged.
  */
object RecsysQueries {

  /** Item-item collaborative filtering: cosine similarity between
    * parts over the orders-that-contain-them incidence vectors,
    * cos(a,b) = cooc / sqrt(deg_a·deg_b). Emitted as the SIGNED
    * SQUARE in ppm — 10⁶·cooc² div (deg_a·deg_b) — the
    * q_spearman sqrt-avoidance convention (cooc ≥ 0 so the sign is
    * always +; squaring preserves the ranking because cos ≥ 0),
    * making every step an exact integer both engines agree on.
    *
    * Top-50 by (cos²ppm, part_a, part_b) via TakeOrdered — no global
    * sort materializes. */
  private val qItemCf = BoundQuery("q_item_cf", (s, d) => {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val deg = items.groupBy("pk").agg(count(lit(1)).as("deg"))
    val pairs = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("cooc"))
      .where(col("cooc") >= 2)
    pairs
      .join(broadcast(deg.withColumnRenamed("pk", "part_a")
        .withColumnRenamed("deg", "deg_a")), "part_a")
      .join(broadcast(deg.withColumnRenamed("pk", "part_b")
        .withColumnRenamed("deg", "deg_b")), "part_b")
      .select(col("part_a"), col("part_b"), col("cooc"),
        col("deg_a"), col("deg_b"),
        expr("(1000000 * cooc * cooc) div (deg_a * deg_b)").as("cos2_ppm"))
      .orderBy(desc("cos2_ppm"), col("part_a"), col("part_b")).limit(50)
  }, Some("""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    deg AS (SELECT pk, CAST(count(*) AS BIGINT) AS deg FROM items GROUP BY pk),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS cooc
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT part_a, part_b, cooc, da.deg AS deg_a, db.deg AS deg_b,
      CAST((1000000 * cooc * cooc) // (da.deg * db.deg) AS BIGINT) AS cos2_ppm
    FROM pairs
    JOIN deg da ON da.pk = part_a
    JOIN deg db ON db.pk = part_b
    ORDER BY cos2_ppm DESC, part_a, part_b LIMIT 50
  """))

  /** Exact association rules over order baskets: for every directed
    * pair a→b with pair support ≥ 3,
    * confidence = sup(ab)/sup(a) and lift = N·sup(ab)/(sup(a)·sup(b)),
    * both as exact integral divisions to ppm. This is the
    * engine-proven deterministic twin of q_association_rules
    * (MLlib FPGrowth): on baskets of ≤7 items, 1-item antecedents
    * with 1-item consequents ARE the rule set FPGrowth emits at this
    * support floor — but every number here is replayed bit-exact by
    * the oracle, whereas FPGrowth's itemset enumeration order is not
    * SQL-expressible.
    *
    * Products stay inside int64 with headroom at the sf1 smoke:
    * lift's numerator 10⁶·sup_ab·N ≤ 10⁶·7·|orders| (a pair appears
    * at most once per order) and conf's 10⁶·sup_ab ≤ 10⁶·|orders| —
    * both ≪ 9.2e18 even at 100× sf1. Top-50 by confidence with full
    * tie-breaks. */
  private val qAssocRulesExact = BoundQuery("q_assoc_rules_exact", (s, d) => {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nOrders = items.select(countDistinct(col("ok")).as("n"))
    val sup = items.groupBy("pk").agg(count(lit(1)).as("sup"))
    val co = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("sup_ab"))
      .where(col("sup_ab") >= 3)
    val directed = co.select(col("pa").as("ante"), col("pb").as("cons"), col("sup_ab"))
      .unionAll(co.select(col("pb").as("ante"), col("pa").as("cons"), col("sup_ab")))
    directed
      .join(broadcast(sup.withColumnRenamed("pk", "ante")
        .withColumnRenamed("sup", "sup_a")), "ante")
      .join(broadcast(sup.withColumnRenamed("pk", "cons")
        .withColumnRenamed("sup", "sup_c")), "cons")
      .crossJoin(broadcast(nOrders))
      .select(col("ante"), col("cons"), col("sup_ab"), col("sup_a"), col("sup_c"),
        expr("(1000000 * sup_ab) div sup_a").as("conf_ppm"),
        expr("(1000000 * sup_ab * n) div (sup_a * sup_c)").as("lift_ppm"))
      .orderBy(desc("conf_ppm"), desc("lift_ppm"), col("ante"), col("cons"))
      .limit(50)
  }, Some("""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM items),
    sup AS (SELECT pk, CAST(count(*) AS BIGINT) AS sup FROM items GROUP BY pk),
    co AS (
      SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS sup_ab
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING count(*) >= 3),
    directed AS (
      SELECT pa AS ante, pb AS cons, sup_ab FROM co
      UNION ALL
      SELECT pb AS ante, pa AS cons, sup_ab FROM co)
    SELECT ante, cons, sup_ab, sa.sup AS sup_a, sc.sup AS sup_c,
      CAST((1000000 * sup_ab) // sa.sup AS BIGINT) AS conf_ppm,
      CAST((1000000 * sup_ab * n.n) // (sa.sup * sc.sup) AS BIGINT) AS lift_ppm
    FROM directed
    JOIN sup sa ON sa.pk = ante
    JOIN sup sc ON sc.pk = cons
    CROSS JOIN n
    ORDER BY conf_ppm DESC, lift_ppm DESC, ante, cons LIMIT 50
  """))

  /** Recommender-quality readout for the item-item CF model: catalog
    * COVERAGE (what share of sellable parts ever appear in the
    * servable pair set — a model recommending 50 blockbusters scores
    * high accuracy and zero discovery) and NOVELTY (mean
    * self-information −log₂ popularity of the recommended items,
    * Vargas & Castells 2011 — higher = deeper into the tail). The
    * pair set is q_item_cf's exact definition (cooc ≥ 2); novelty's
    * per-item −log₂(deg/orders) rounds ONCE to micro-bits, then exact
    * long averaging; coverage is pure counts. One row, emitted beside
    * per-brand coverage would be the production cut — the global
    * numbers gate model promotion. */
  private val qRecEval = BoundQuery("q_rec_eval", (s, d) => {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val deg = items.groupBy("pk").agg(count(lit(1)).as("deg"))
    val nOrders = items.agg(countDistinct(col("ok")).as("no"))
    val recItems = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("cooc"))
      .where(col("cooc") >= 2)
      .select(explode(array(col("part_a"), col("part_b"))).as("pk"))
      .distinct()
    val catalog = Tables.part(s, d).agg(count(lit(1)).as("n_parts"))
    val novelty = recItems.join(deg, "pk").crossJoin(broadcast(nOrders))
      // ln/ln2 in BOTH engines — a native log2 could differ by an ulp
      // from the quotient form and flip a rounding boundary
      .withColumn("si_u", round(
        -(log(col("deg").cast("double") / col("no").cast("double"))
          / lit(0.6931471805599453)) * 1e6, 0).cast("long"))
      .agg(count(lit(1)).as("n_rec_items"), sum(col("si_u")).as("si_sum"))
    novelty.crossJoin(broadcast(catalog))
      .select(col("n_rec_items"), col("n_parts"),
        expr("(1000000 * n_rec_items) div n_parts").as("coverage_ppm"),
        expr("si_sum div n_rec_items").as("novelty_ubits"))
  }, Some("""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    deg AS (SELECT pk, CAST(count(*) AS BIGINT) AS deg FROM items GROUP BY pk),
    no_ AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS no FROM items),
    rec AS (
      SELECT DISTINCT pk FROM (
        SELECT unnest([a.pk, b.pk]) AS pk
        FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY a.pk, b.pk HAVING count(*) >= 2) x),
    cat AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM part),
    nov AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rec_items,
        CAST(sum(CAST(round(-(ln(CAST(deg AS DOUBLE) / CAST(no AS DOUBLE))
          / 0.6931471805599453) * 1e6, 0) AS BIGINT)) AS BIGINT) AS si_sum
      FROM rec JOIN deg USING (pk) CROSS JOIN no_)
    SELECT n_rec_items, n_parts,
      (1000000 * n_rec_items) // n_parts AS coverage_ppm,
      si_sum // n_rec_items AS novelty_ubits
    FROM nov CROSS JOIN cat
  """))

  /** Slope One collaborative filtering (Lemire & Maclachlan 2005):
    * the average rating deviation dev(i,j) = Σ(r_i − r_j)/|co-raters|
    * between every part pair, over customer-grain quantity "ratings".
    * The per-customer item list is capped to the TOP 12 parts by
    * (quantity, part id) — the same bounded-blocking-key discipline
    * as maxShingleDf: pair fan-out is ≤ C(12,2) per customer, so
    * candidates grow with customers, never parts². Deviations are
    * exact integer sums cleared to milli-units by one truncating
    * division; top-40 by (support, |dev|) with full tie-breaks.
    *
    * Scale shape: one fact join to customer grain, one partitioned
    * window for the cap, one blocked self-join — no global window,
    * no parts² anywhere. */
  private val qSlopeOne = BoundQuery("q_slope_one", (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ck").orderBy(desc("r"), col("pk"))
    val ratings = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("long")).as("r"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 12)
    ratings.as("a").join(ratings.as("b"),
        col("a.ck") === col("b.ck") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("support"),
        sum(col("a.r") - col("b.r")).as("sdiff"))
      .where(col("support") >= 3)
      .select(col("part_a"), col("part_b"), col("support"),
        expr("(1000 * sdiff) div support").as("dev_milli"))
      .orderBy(col("support").desc, abs(col("dev_milli")).desc,
        col("part_a"), col("part_b"))
      .limit(40)
  }, Some("""
    WITH ratings AS (
      SELECT ck, pk, r FROM (
        SELECT o_custkey AS ck, l_partkey AS pk,
          sum(CAST(l_quantity AS BIGINT)) AS r,
          row_number() OVER (PARTITION BY o_custkey
                             ORDER BY sum(CAST(l_quantity AS BIGINT)) DESC,
                                      l_partkey) AS rn
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey, l_partkey)
      WHERE rn <= 12)
    SELECT a.pk AS part_a, b.pk AS part_b,
      CAST(count(*) AS BIGINT) AS support,
      (1000 * CAST(sum(a.r - b.r) AS BIGINT)) // CAST(count(*) AS BIGINT)
        AS dev_milli
    FROM ratings a JOIN ratings b ON a.ck = b.ck AND a.pk < b.pk
    GROUP BY 1, 2 HAVING count(*) >= 3
    ORDER BY support DESC, abs(dev_milli) DESC, part_a, part_b LIMIT 40
  """))

  /** Recommendation novelty (self-information): each part's top-5
    * co-purchase neighbors score novelty = mean(−log₂ popularity),
    * popularity = orders-containing-the-neighbor / total orders —
    * the audit that catches a recommender collapsed onto head items
    * (Zhou et al. 2010's surprisal form). −log₂p is µ-bit-rounded
    * ONCE per part (deterministic double off exact counts), the
    * 5-neighbor mean is an integer division, top-30 most-novel seeds.
    *
    * Scale shape: co-occurrence pairs are order-blocked as ever;
    * the neighbor cap is a part-partitioned window; popularity joins
    * back broadcast at parts grain. */
  private val qNovelty = BoundQuery("q_novelty", (s, d) => {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val tot = items.select(countDistinct(col("ok")).as("tot"))
    val pop = items.groupBy(col("pk")).agg(count(lit(1)).as("nj"))
    val co = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .groupBy(col("a.pk").as("seed"), col("b.pk").as("nb"))
      .agg(count(lit(1)).as("cooc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("seed").orderBy(desc("cooc"), col("nb"))
    co.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .join(broadcast(pop.withColumnRenamed("pk", "nb")), "nb")
      .crossJoin(broadcast(tot))
      .withColumn("nl", expr("""CAST(round(1000000.0 *
        (ln(CAST(tot AS DOUBLE)) - ln(CAST(nj AS DOUBLE))) / ln(2.0), 0)
        AS BIGINT)"""))
      .groupBy(col("seed"))
      .agg(count(lit(1)).as("k_nb"), sum(col("nl")).as("snl"))
      .select(col("seed"), col("k_nb"),
        expr("snl div k_nb").as("novelty_microbits"))
      .orderBy(desc("novelty_microbits"), col("seed")).limit(30)
  }, Some("""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS tot FROM items),
    pop AS (SELECT pk, CAST(count(*) AS BIGINT) AS nj FROM items GROUP BY pk),
    co AS (
      SELECT a.pk AS seed, b.pk AS nb, CAST(count(*) AS BIGINT) AS cooc
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk <> b.pk
      GROUP BY 1, 2),
    top5 AS (
      SELECT seed, nb FROM (
        SELECT seed, nb,
          row_number() OVER (PARTITION BY seed
                             ORDER BY cooc DESC, nb) AS rn
        FROM co) WHERE rn <= 5),
    nl AS (
      SELECT seed,
        CAST(round(1000000.0 *
          (ln(CAST(tot AS DOUBLE)) - ln(CAST(nj AS DOUBLE))) / ln(2.0), 0)
          AS BIGINT) AS nl
      FROM top5 JOIN pop ON pop.pk = top5.nb CROSS JOIN tot)
    SELECT seed, CAST(count(*) AS BIGINT) AS k_nb,
      CAST(sum(nl) AS BIGINT) // CAST(count(*) AS BIGINT)
        AS novelty_microbits
    FROM nl GROUP BY seed
    ORDER BY novelty_microbits DESC, seed LIMIT 30
  """))

  val all: Seq[BoundQuery] =
    Seq(qItemCf, qAssocRulesExact, qRecEval, qSlopeOne, qNovelty)
}
