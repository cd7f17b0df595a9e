package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.5 completion: the remaining TPC-H queries expressible on
  * the driver schema (no partsupp table, no l_commitdate /
  * l_receiptdate / c_phone columns — Q2/Q9/Q11/Q12/Q16/Q20/Q21 need
  * them; Q4's commit-vs-receipt lateness and Q22's phone prefix are
  * re-anchored on columns that exist, noted per query). Together with
  * q1/q3/q5/q7 in Registry this closes the feasible classic-OLAP
  * suite: scan-bound agg (Q6), snowflake market share (Q8), top-k
  * revenue join (Q10), outer-join distribution (Q13), conditional
  * share (Q14), argmax-per-relation (Q15), correlated scalar
  * per-group threshold (Q17), group-HAVING semi filter (Q18),
  * disjunctive predicate pushdown (Q19), anti-join + global scalar
  * (Q22 shape).
  *
  * Numeric rule (graft.functions.Num): money doubles are cents-exact
  * longs before any aggregation; ep·(1±disc/tax) products are rounded
  * per-row to cents exactly as q1 does, so both engines sum identical
  * integers in any order — partition-invariance at 1000 executors,
  * bit-parity with the DuckDB oracle here.
  */
object TpchQueries {

  private val ship = col("l_shipdate")

  /** Q6 — forecasting revenue change: one scan, three pushed
    * predicates, scalar result. The discount band compares CENTS
    * (round(d*100) IN 3..5), never raw doubles — 0.03 has no exact
    * binary form and a `>=` on it is engine-dependent. revenue =
    * Σ ep·disc is summed in 10⁻⁴-unit longs (ep_cents·disc_cents):
    * exact per row, headroom ~10⁹ rows per partial sum at TPC-H
    * magnitudes. At 100 TB this query is pure scan bandwidth:
    * `PushedFilters` carries the date range, and the agg is a single
    * map-side partial with no shuffle beyond the 1-row combine. */
  private val q6 = BoundQuery("q6_forecast_revenue", (s, d) => {
    Tables.lineitem(s, d)
      .where(ship >= lit("1996-01-01").cast("timestamp") &&
        ship < lit("1997-01-01").cast("timestamp") &&
        cents(col("l_discount")).between(3, 5) &&
        col("l_quantity") < 24)
      .agg(sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
        .as("r4"), count(lit(1)).as("n_rows"))
      .select((col("r4").cast("double") / lit(10000.0)).as("revenue"),
        col("n_rows"))
  }, Some("""
    SELECT CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                    * CAST(round(l_discount*100,0) AS BIGINT)) AS DOUBLE)
           / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND CAST(round(l_discount*100,0) AS BIGINT) BETWEEN 3 AND 5
      AND l_quantity < 24
  """))

  /** Q8 — national market share: the widest feasible snowflake (6
    * tables, lineitem at the center). NATION_2's share of ASIA-market
    * PROMO volume per order year. Join order is the one Catalyst
    * should pick and AQE will enforce: the three true dims (nation×2,
    * region) and the filtered part side broadcast; lineitem↔orders and
    * lineitem↔part-keys are the only shuffles, both on their natural
    * keys. Share = nation_cents/total_cents — two exact sums from ONE
    * conditional aggregation pass (no second scan, no join back). */
  private val q8 = BoundQuery("q8_market_share", (s, d) => {
    val promo = Tables.part(s, d).where(col("p_type") === "PROMO")
      .select("p_partkey")
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cust_nationkey"))
    val cust = Tables.customer(s, d)
      .join(broadcast(asiaNations),
        col("c_nationkey") === col("cust_nationkey"))
      .select("c_custkey")
    val ord = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val suppNation = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val vol = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    // ord is the two-year window already semi-filtered to ASIA
    // customers — a slim (orderkey, year) relation around ~6% of
    // orders. Broadcast it explicitly: statically its post-join size
    // is unknown, so Catalyst shuffles the promo-filtered lineitem
    // side for an SMJ and AQE's conversion arrives after that
    // exchange wrote. With the hint the fact table never shuffles at
    // all — scan → three BHJs → partial agg on o_year (a handful of
    // groups) → 1-wave combine (sf10: 2.4→2.0 s; the remaining cost is the 60M-row scan+probe itself).
    // The hint is SIZE-GATED (round-6 advice item 1): ord is a fixed
    // ~6% fraction of orders (2 of ~7 order years × 1 of 5 regions'
    // customers), so it grows linearly with scale — the gate estimates
    // the true build from the scan-rooted slim projection's file stats
    // × that analytic selectivity and falls back to AQE's runtime
    // conversion once the slice outgrows a safe broadcast. Measured
    // crossing (round-8): at sf10 the ~14 MB estimate arms and wins;
    // at sf100 the ~141 MB / 8.6M-row build LOST to the sort-merge it
    // replaced (23.2 s armed vs 13.4 s disarmed under bench confs) —
    // which set the gate's 128 MB ceiling (Hints.DefaultCapBytes).
    val ordGated = graft.util.Hints.gatedBroadcast(ord,
      scanProxy = Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
      selectivity = 0.06)
    Tables.lineitem(s, d)
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .join(ordGated, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_2", vol).otherwise(lit(0L)))
          .as("nc"),
        sum(vol).as("tc"))
      .select(col("o_year").cast("long").as("o_year"),
        money(col("nc")).as("nation_volume"),
        money(col("tc")).as("total_volume"),
        (col("nc").cast("double") / col("tc").cast("double"))
          .as("mkt_share"))
      .orderBy("o_year")
  }, Some("""
    WITH v AS (
      SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation,
        CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT) AS vc
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey AND p_type = 'PROMO'
      JOIN orders   ON o_orderkey = l_orderkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey AND r_name = 'ASIA'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey)
    SELECT CAST(o_year AS BIGINT) AS o_year,
      CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vc ELSE 0 END)
           AS DOUBLE)/100.0 AS nation_volume,
      CAST(sum(vc) AS DOUBLE)/100.0 AS total_volume,
      CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vc ELSE 0 END)
           AS DOUBLE) / CAST(sum(vc) AS DOUBLE) AS mkt_share
    FROM v GROUP BY o_year ORDER BY o_year
  """))

  /** Q10 — returned-item revenue ranking: which customers returned the
    * most value in a quarter. orders is date-pruned BEFORE its join,
    * lineitem is flag-pruned at the scan; the customer join runs on
    * the already-aggregated 20-row top-k? No — aggregation needs
    * c_custkey only, so the plan aggregates the FACT join on custkey
    * first and joins the 20 survivors to customer/nation afterwards:
    * the wide name/acctbal columns never enter the shuffle. Top-k is
    * TakeOrdered (no global sort) with custkey tie-break. */
  private val q10 = BoundQuery("q10_returned_items", (s, d) => {
    val ord = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    // the quarter-filtered orders projection is ~4% of the table and
    // two slim columns — broadcast it EXPLICITLY: statically Catalyst
    // can't see the filter's selectivity, plans SMJ, and shuffles the
    // R-flagged lineitem side (the BIG side) for the join; AQE's BHJ
    // conversion lands after that exchange already wrote. The hint
    // makes the fact table flow scan→BHJ→partial-agg with the only
    // full exchange on the slim (custkey, cents) agg (sf10: 2.0→1.2 s).
    // SIZE-GATED (round-6 advice item 1): one quarter of a ~7-year
    // span is a fixed ~4% of orders — linear in scale — so the gate
    // estimates the true build from the slim scan projection's file
    // stats × 0.04 and disarms the hint (AQE fallback) once the slice
    // would be a multi-hundred-MB build.
    val ordGated = graft.util.Hints.gatedBroadcast(ord,
      scanProxy = Tables.orders(s, d).select("o_orderkey", "o_custkey"),
      selectivity = 0.04)
    val rev = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
      .join(ordGated, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sumCents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rc"))
      .orderBy(col("rc").desc, col("o_custkey"))
      .limit(20)
    rev.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), money(col("rc")).as("revenue"),
        col("c_acctbal"), col("n_name"), col("c_mktsegment"))
      .orderBy(col("revenue").desc, col("c_custkey"))
  }, Some("""
    WITH rev AS (
      SELECT o_custkey,
        CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT))
             AS BIGINT) AS rc
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY o_custkey
      ORDER BY rc DESC, o_custkey LIMIT 20)
    SELECT c_custkey, c_name, CAST(rc AS DOUBLE)/100.0 AS revenue,
           c_acctbal, n_name, c_mktsegment
    FROM rev JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    ORDER BY revenue DESC, c_custkey
  """))

  /** Q13 — customer order-count distribution: the classic OUTER-join
    * histogram (customers with zero orders must appear in bucket 0,
    * which an inner join silently drops). Non-urgent orders only, so
    * the filter sits under the join's right side. Two cascaded
    * count-aggs: per-customer (shuffles on custkey — the big one, but
    * count is map-side partial) then per-count (tiny). */
  private val q13 = BoundQuery("q13_order_distribution", (s, d) => {
    // agg-BEFORE-join: counting per custkey on the orders side first
    // shrinks the join's probe input from |orders| rows to |custkeys
    // with orders| — the left join then attaches a ready count (0 via
    // coalesce for order-less customers) instead of fanning customer
    // rows out to order grain and re-aggregating the join output.
    // Same result (count(o_orderkey) counts only matched rows), one
    // fact-grain shuffle fewer.
    val per = Tables.orders(s, d)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("oc"))
    Tables.customer(s, d).select("c_custkey")
      .join(per, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("oc"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }, Some("""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
  """))

  /** Q14 — promotion effect: conditional share of one ship-month's
    * revenue. One fact scan (month-pruned), one broadcast of the
    * 2-column part projection, ONE aggregation computing both the
    * conditional and total sums — the textbook "share" shape that
    * needs no self-join. Share emitted as an exact-cents ratio. */
  private val q14 = BoundQuery("q14_promo_effect", (s, d) => {
    val vol = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    // Only PROMO membership matters, so broadcast the PROMO slice and
    // read membership off a LEFT join hit — same answer because every
    // l_partkey exists in part (TPC-H FK; guarded by SourcesSpec's
    // left-anti orphan check so a generator change fails loudly
    // instead of silently counting orphans in tc), and the broadcast build
    // hashes ~1/5 of the part table (round-7 sf10 profile: the 2M-row
    // full-part build dominated the warm latency; 1.35 → 0.22 s,
    // ratio vs DuckDB 2.8× → 0.45×). At 100 TB the build ships to
    // every executor, so slice-before-broadcast is the cluster rule.
    Tables.lineitem(s, d)
      .where(ship >= lit("1996-03-01").cast("timestamp") &&
        ship < lit("1996-04-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d).where(col("p_type") === "PROMO")
          .select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"), "left")
      .agg(
        sum(when(col("p_type").isNotNull, vol).otherwise(lit(0L)))
          .as("pc"),
        sum(vol).as("tc"))
      .select(money(col("pc")).as("promo_revenue"),
        money(col("tc")).as("total_revenue"),
        (lit(100.0) * col("pc").cast("double") / col("tc").cast("double"))
          .as("promo_pct"))
  }, Some("""
    SELECT
      CAST(sum(CASE WHEN p_type = 'PROMO'
        THEN CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT)
        ELSE 0 END) AS DOUBLE)/100.0 AS promo_revenue,
      CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT))
        AS DOUBLE)/100.0 AS total_revenue,
      100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        THEN CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT)
        ELSE 0 END) AS DOUBLE)
      / CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT))
        AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
  """))

  /** Q15 — top supplier(s): argmax over a derived relation. The
    * quarter's per-supplier revenue aggregates once and is reused for
    * both the max and the filter via a 1-row broadcast join — the
    * distributed replacement for Q15's CREATE VIEW + correlated max
    * (a window over an empty partition would drag every row through
    * one task). Ties all surface (spec of the original). */
  private val q15 = BoundQuery("q15_top_supplier", (s, d) => {
    // the supplier-grain rev relation feeds BOTH the scalar max and
    // the filter join — persist it so the quarter's fact aggregation
    // runs once, not once per consumer (the CREATE VIEW reuse Q15's
    // original formulation expresses)
    val rev = graft.util.CacheScope.persist(Tables.lineitem(s, d)
      .where(ship >= lit("1996-01-01").cast("timestamp") &&
        ship < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sumCents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rc")))
    val top = rev.agg(max(col("rc")).as("mx"))
    rev.join(broadcast(top), col("rc") === col("mx"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        money(col("rc")).as("total_revenue"))
      .orderBy("s_suppkey")
  }, Some("""
    WITH rev AS (
      SELECT l_suppkey,
        CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT))
             AS BIGINT) AS rc
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(rc AS DOUBLE)/100.0 AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE rc = (SELECT max(rc) FROM rev)
    ORDER BY s_suppkey
  """))

  /** Q17 — small-quantity revenue: the correlated scalar subquery
    * (l_quantity < 0.2·avg(l_quantity) for the part) decorrelated into
    * a per-part pre-aggregation joined back on partkey. The threshold
    * compare is EXACT INTEGER: qty < sumq/(5·n) ⟺ 5·qty_cents·n <
    * sumq_cents — no division ever happens, so no float boundary can
    * disagree between engines. Both joins hash on l_partkey; the
    * brand-filtered part side broadcasts. */
  private val q17 = BoundQuery("q17_small_qty_revenue", (s, d) => {
    val brandParts = Tables.part(s, d)
      .where(col("p_brand") === "Brand#23" && col("p_size") <= 10)
      .select("p_partkey")
    // li feeds both the per-part threshold agg and the final probe —
    // persist the brand-pruned slice (~1/25 of lineitem) so the
    // broadcast join against the fact table runs once
    val li = graft.util.CacheScope.persist(Tables.lineitem(s, d)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), cents(col("l_quantity")).as("qc"),
        cents(col("l_extendedprice")).as("ec")))
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("qc")).as("sq"), count(lit(1)).as("nq"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .where(col("qc") * lit(5L) * col("nq") < col("sq"))
      .agg(sum(col("ec")).as("tot"), count(lit(1)).as("n_rows"))
      .select((col("tot").cast("double") / lit(100.0) / lit(7.0))
        .as("avg_yearly"), col("n_rows"))
  }, Some("""
    WITH li AS (
      SELECT l_partkey, CAST(round(l_quantity*100,0) AS BIGINT) AS qc,
             CAST(round(l_extendedprice*100,0) AS BIGINT) AS ec
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#23' AND p_size <= 10),
    pp AS (
      SELECT l_partkey AS pk, CAST(sum(qc) AS BIGINT) AS sq,
             CAST(count(*) AS BIGINT) AS nq
      FROM li GROUP BY 1)
    SELECT CAST(sum(ec) AS DOUBLE)/100.0/7.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM li JOIN pp ON l_partkey = pk
    WHERE qc * 5 * nq < sq
  """))

  /** Q18 — large-volume orders: HAVING on a fact aggregation used as
    * a semi filter. The per-order quantity agg (map-side partial,
    * shuffle on orderkey) keeps only >300-qty orders — a handful —
    * which then broadcast-join back to orders and customer; the big
    * table is touched once. Top 100 by (totalprice, orderkey). */
  private val q18 = BoundQuery("q18_large_orders", (s, d) => {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_quantity"))).as("sumq"))
      .where(col("sumq") > 300L * 100L)
    // broadcast the HAVING survivors EXPLICITLY: statically the agg's
    // size is unknown so Catalyst plans SMJ over a full orders
    // exchange+sort, and AQE's BHJ conversion lands only AFTER that
    // shuffle already wrote (it runs in the same stage wave as the
    // agg). Local sf10 wall time is a wash (the 60M-row lineitem agg
    // dominates), but the hint deletes an entire orders-table
    // exchange from the plan — at cluster scale that is the orders
    // table crossing the network once for nothing. >300-qty orders
    // are a per-SF handful (TPC-H spec returns ~57/SF), so the
    // broadcast stays KB-to-MB at any realistic scale.
    Tables.orders(s, d)
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        money(col("sumq")).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }, Some("""
    WITH big AS (
      SELECT l_orderkey,
        CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sumq
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity*100,0) AS BIGINT)) > 30000)
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sumq AS DOUBLE)/100.0 AS sum_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
  """))

  /** Q19 — discounted revenue under a disjunction of (brand, size,
    * quantity) triplets. The OR across triplets shares the join: part
    * broadcasts once with (brand,size), the predicate evaluates
    * post-join inside codegen. The join-independent bounds (qty ≤ 30,
    * size ≤ 25 — the union of the branches) are ALSO applied to the
    * scans so pushdown prunes before the join, without changing the
    * disjunction's result. */
  private val q19 = BoundQuery("q19_discounted_revenue", (s, d) => {
    val qtyC = cents(col("l_quantity"))
    val pred =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        qtyC.between(1 * 100, 11 * 100)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        qtyC.between(10 * 100, 20 * 100)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 25) &&
        qtyC.between(20 * 100, 30 * 100))
    Tables.lineitem(s, d).where(col("l_quantity") <= 30)
      .join(broadcast(Tables.part(s, d).where(col("p_size") <= 25)
        .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .where(pred)
      .agg(sumCents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rc"), count(lit(1)).as("n_rows"))
      .select(money(col("rc")).as("revenue"), col("n_rows"))
  }, Some("""
    SELECT
      CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT))
           AS DOUBLE)/100.0 AS revenue,
      CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND CAST(round(l_quantity*100,0) AS BIGINT) BETWEEN 100 AND 1100)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND CAST(round(l_quantity*100,0) AS BIGINT) BETWEEN 1000 AND 2000)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
           AND CAST(round(l_quantity*100,0) AS BIGINT) BETWEEN 2000 AND 3000)
  """))

  /** Q22 shape — dormant high-balance customers ("global sales
    * opportunity"): customers whose balance beats the global positive
    * average but placed no orders, grouped by market segment (the
    * driver schema has no c_phone, so segment replaces the phone
    * country code; the plan shape — global scalar, anti join, group —
    * is Q22's). "Dormant" = no order since 1999 (every synthetic
    * customer has SOME order, so Q22's no-orders-ever predicate is
    * vacuous here; the date cut keeps the anti join non-trivial AND
    * shrinks its build side at the scan). The average-compare is
    * exact: bal_cents·n_pos > sum_pos_cents. The scalar is a 1-row
    * broadcast; the anti join shuffles only the date-pruned slice,
    * DEDUPED to distinct o_custkey first (round-8, sf100: the slice
    * is 58.6M rows over 14.7M keys — anti join semantics ignore
    * duplicates, and the distinct's exchange hash-partitions on the
    * join key, so the anti join reuses it and its sort/build side
    * shrinks 4×; sf100 15.3 → see BASELINE round-8 appendix). */
  private val q22 = BoundQuery("q22_dormant_customers", (s, d) => {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        cents(col("c_acctbal")).as("bc"))
    val posAvg = cust.where(col("bc") > 0L)
      .agg(sum(col("bc")).as("sp"), count(lit(1)).as("np"))
    cust.join(broadcast(posAvg))
      .where(col("bc") * col("np") > col("sp"))
      .join(Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select("o_custkey").distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), sum(col("bc")).as("tb"))
      .select(col("c_mktsegment"), col("numcust"),
        money(col("tb")).as("totacctbal"))
      .orderBy("c_mktsegment")
  }, Some("""
    WITH cust AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(c_acctbal*100,0) AS BIGINT) AS bc
      FROM customer),
    pa AS (
      SELECT CAST(sum(bc) AS BIGINT) AS sp, CAST(count(*) AS BIGINT) AS np
      FROM cust WHERE bc > 0)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(bc) AS DOUBLE)/100.0 AS totacctbal
    FROM cust, pa
    WHERE bc * np > sp
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
  """))

  val all: Seq[BoundQuery] =
    Seq(q6, q8, q10, q13, q14, q15, q17, q18, q19, q22)
}
