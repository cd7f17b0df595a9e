package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 round-3 data-reliability surface: declarative
  * constraint validation (the Deequ/dbt-tests shape), rolling
  * z-score anomaly detection, and sequential pattern mining — the
  * monitoring queries that run BESIDE a production pipeline.
  */
object QualityQueries {

  /** Declarative data-quality check suite over orders+lineitem in
    * TWO scans total: every orders-side constraint (completeness,
    * key uniqueness, value range, set membership, freshness) is a
    * conditional aggregate in ONE pass, unpivoted to a (check,
    * metric, passed) report; the referential-integrity check is one
    * broadcast-able left-anti join. The Deequ insight, relationally:
    * N checks don't cost N scans. */
  private val qDqChecks = BoundQuery("q_dq_checks", (s, d) => {
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val oAgg = o.agg(
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("null_orderdate"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_orderkey"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpos_price"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("bad_status"),
      datediff(lit("1998-12-31").cast("date"), max(col("o_orderdate")).cast("date"))
        .cast("long").as("staleness_days"))
    val orphans = li.join(o.select("o_orderkey"),
        li("l_orderkey") === o("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_lineitems"))
    oAgg.crossJoin(orphans)
      .select(expr(
        """stack(6,
             'completeness_orderdate', null_orderdate,
             'uniqueness_orderkey',    dup_orderkey,
             'range_totalprice',       nonpos_price,
             'domain_orderstatus',     bad_status,
             'freshness_days',         staleness_days,
             'ref_lineitem_orders',    orphan_lineitems) AS (check, metric)"""))
      .withColumn("passed",
        when(col("check") === "freshness_days", col("metric") <= 365)
          .otherwise(col("metric") === 0))
      .orderBy("check")
  }, Some("""
    WITH o AS (SELECT
        CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderdate,
        CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_orderkey,
        CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_price,
        CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
        CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '1998-12-31') AS BIGINT) AS staleness_days
      FROM orders),
    orph AS (SELECT CAST(count(*) AS BIGINT) AS orphan_lineitems
             FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
    rep AS (
      SELECT 'completeness_orderdate' AS "check", null_orderdate AS metric FROM o
      UNION ALL SELECT 'uniqueness_orderkey', dup_orderkey FROM o
      UNION ALL SELECT 'range_totalprice', nonpos_price FROM o
      UNION ALL SELECT 'domain_orderstatus', bad_status FROM o
      UNION ALL SELECT 'freshness_days', staleness_days FROM o
      UNION ALL SELECT 'ref_lineitem_orders', orphan_lineitems FROM orph)
    SELECT "check", metric,
           CASE WHEN "check" = 'freshness_days' THEN metric <= 365
                ELSE metric = 0 END AS passed
    FROM rep ORDER BY "check"
  """))

  /** Rolling z-score anomaly detection over per-user DAILY value
    * sums: each day scored against its user's trailing 7 days
    * (excluding itself). The window carries exact integer state —
    * n, Σcents, Σcents² — so mean/variance derive from identical
    * integers on both engines and the final float ops (one division
    * chain + sqrt, IEEE-deterministic) agree bit-for-bit; z rounds
    * to 6 decimals before the threshold so a last-ulp divergence
    * cannot flip membership. Scale shape: the window partitions by
    * user over the DAILY series (≤ 365 rows/user/year), never over
    * raw events; the daily rollup is one partial-aggregated shuffle. */
  /** Per-user daily exact-cents sums — the maintained state the
    * anomaly detector scores over. Public so the streaming twin
    * (StreamingSpec) can maintain the same state incrementally. */
  def dailySums(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    events.groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(sumCents(col("value")).as("vc"))

  /** The z-scorer over a (user_id, day, vc) daily table — shared by
    * the batch binding and the streaming replay spec so both paths
    * flag the identical anomaly set. */
  def anomalies(daily: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(-7, -1)
    val scored = daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sum7", sum(col("vc")).over(w))
      .withColumn("sq7", sum(col("vc") * col("vc")).over(w))
      .where(col("n") >= 3)
      .withColumn("mean", col("sum7").cast("double") / col("n").cast("double"))
      .withColumn("variance",
        (col("sq7").cast("double") - col("sum7").cast("double") * col("sum7").cast("double")
          / col("n").cast("double")) / (col("n") - 1).cast("double"))
      .where(col("variance") > 0)
      .withColumn("z", round(
        (col("vc").cast("double") - col("mean")) / sqrt(col("variance")), 6))
    scored.where(abs(col("z")) > 2.0)
      .select(col("user_id"), col("day"), money(col("vc")).as("value"), col("z"))
      .orderBy("user_id", "day")
  }

  private val qAnomaly = BoundQuery("q_anomaly", (s, d) => {
    anomalies(dailySums(Tables.events(s, d)))
  }, Some("""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             sum(CAST(round(value*100, 0) AS BIGINT)) AS vc
      FROM events GROUP BY 1, 2),
    win AS (
      SELECT user_id, day, vc,
        CAST(count(*) OVER w AS BIGINT) AS n,
        CAST(sum(vc) OVER w AS BIGINT) AS sum7,
        CAST(sum(vc * vc) OVER w AS BIGINT) AS sq7
      FROM daily
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
    scored AS (
      SELECT user_id, day, vc,
        CAST(sum7 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        (CAST(sq7 AS DOUBLE) - CAST(sum7 AS DOUBLE) * CAST(sum7 AS DOUBLE)
          / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS variance
      FROM win WHERE n >= 3),
    z AS (
      SELECT user_id, day, vc,
             round((CAST(vc AS DOUBLE) - mean) / sqrt(variance), 6) AS z
      FROM scored WHERE variance > 0)
    SELECT user_id, day, CAST(vc AS DOUBLE) / 100.0 AS value, z
    FROM z WHERE abs(z) > 2.0 ORDER BY user_id, day
  """))

  /** Frequent event-type trigrams over per-user time-ordered event
    * sequences (sequential pattern mining, the n-gram special case):
    * lag windows per user (ns-exact ordering, event_id tiebreak)
    * build the trigrams, a partial-aggregated count ranks them.
    * Per-user windows scale with the user's own history; the count
    * shuffle is by trigram — no global ordering anywhere except the
    * final top-20. */
  private val qSeqMining = BoundQuery("q_seq_mining", (s, d) => {
    // order on µs + event_id, not raw ns: the DuckDB twin sees the
    // parquet ns timestamps µs-truncated (epoch_ns(TIMESTAMP) carries
    // µs precision), so a same-µs pair ordered by sub-µs nanos here
    // but by event_id there would silently disagree — align both
    // engines on the µs grid and let event_id break every tie
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val tri = Tables.events(s, d)
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("trigram"))
    tri.groupBy("trigram").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("trigram")).limit(20)
  }, Some("""
    WITH seq AS (
      SELECT user_id, event_type,
        lead(event_type, 1) OVER w AS e2,
        lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    tri AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS trigram
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
    SELECT trigram, CAST(count(*) AS BIGINT) AS n
    FROM tri GROUP BY trigram ORDER BY n DESC, trigram LIMIT 20
  """))

  /** Mergeable distinct-user telemetry via DataSketches HLL (Spark's
    * native hll_sketch_agg/hll_union_agg): one sketch per event_type
    * plus the merged ALL row — the monitoring shape where per-shard /
    * per-day sketches are persisted and UNIONED instead of recounting
    * raw events (a union is O(sketch), a recount is O(data)). The
    * estimate depends on the sketch implementation (no DuckDB twin),
    * so the GATE carries exact distinct counts plus an in-engine
    * envelope boolean per row — the estimate itself is graded where
    * it is computed; QualitySpec additionally pins union
    * consistency. */
  private val qHllUnion = BoundQuery("q_hll_union", (s, d) => {
    val ev = Tables.events(s, d)
    val perType = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("exact_users"))
    val typed = perType.select(col("event_type"), col("n_events"),
      col("exact_users"), hll_sketch_estimate(col("sk")).as("approx_users"))
    val allExact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
    val merged = perType.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
      sum(col("n_events")).as("n_events"))
      .crossJoin(broadcast(allExact))
      .select(lit("ALL").as("event_type"), col("n_events"),
        col("exact_users"), col("approx_users"))
    // lgK=12 → rsd ≈ 1.04/√4096 ≈ 1.6%; 3σ envelope = 5%. A sketch
    // (or union) regression flips the boolean and breaks the gate.
    typed.unionByName(merged)
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users").cast("double")) <=
          col("exact_users").cast("double") * 0.05).as("in_envelope"))
      .orderBy("event_type")
  }, Some("""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS in_envelope
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL', CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT user_id) AS BIGINT), TRUE
    FROM events
    ORDER BY event_type
  """))

  /** Trailing-7-row distinct users per (event_type, day) by UNIONING
    * the daily HLL sketches over a sliding window — each day's raw
    * events are scanned once ever; the trailing-window "distinct over
    * 7 days of data" that an exact recount would re-scan 7× comes
    * from merging seven ~4 KB sketches. The at-scale shape for every
    * "rolling unique users" dashboard tile. The estimate has no
    * DuckDB twin, so the gate emits the exact trailing distinct
    * (windowed set union — the test-scale recount the sketch path
    * replaces in production) plus an in-engine 5% envelope boolean
    * per row (lgK=12 → 3σ ≈ 5%); QualitySpec additionally pins
    * union consistency. */
  private val qHllSliding = BoundQuery("q_hll_sliding", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
        collect_set(col("user_id")).as("us"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    daily.select(col("event_type"), col("day"),
        count(lit(1)).over(w).as("n_days"),
        size(array_distinct(flatten(collect_list(col("us")).over(w))))
          .cast("long").as("exact_users_7d"),
        hll_sketch_estimate(hll_union_agg(col("sk")).over(w)).as("approx"))
      .select(col("event_type"), col("day").cast("string").as("day"),
        col("n_days"), col("exact_users_7d"),
        (abs(col("approx") - col("exact_users_7d").cast("double")) <=
          col("exact_users_7d").cast("double") * 0.05).as("in_envelope"))
      .orderBy("event_type", "day")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             list(DISTINCT user_id) AS us
      FROM events GROUP BY 1, 2)
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           CAST(count(*) OVER w AS BIGINT) AS n_days,
           CAST(len(list_distinct(flatten(list(us) OVER w))) AS BIGINT)
             AS exact_users_7d,
           TRUE AS in_envelope
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY event_type, day
  """))

  /** Trending detection: each event_type's LAST full day of volume
    * against its trailing-28-day daily average — the lift ratio a
    * monitoring page sorts by. Lift is exact-integer counts with one
    * deterministic division chain at the end (count·28 / sum28 as
    * doubles, round 6), so the trending order is hash-stable. One
    * daily rollup shuffle; the 28-day window runs over the tiny
    * per-type daily series. */
  private val qTrending = BoundQuery("q_trending", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-28, -1)
    val scored = daily
      .withColumn("n_days", count(lit(1)).over(w))
      .withColumn("sum28", sum(col("n")).over(w))
    val wLast = Window.partitionBy("event_type").orderBy(desc("day"))
    scored.withColumn("rn", row_number().over(wLast))
      .where(col("rn") === 1 && col("n_days") === 28)
      .select(col("event_type"), col("day").cast("string").as("day"), col("n"),
        round((col("n").cast("double") * lit(28.0)) / col("sum28").cast("double"), 6)
          .as("lift"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    scored AS (
      SELECT event_type, day, n,
             CAST(count(*) OVER w AS BIGINT) AS n_days,
             CAST(sum(n) OVER w AS BIGINT) AS sum28,
             row_number() OVER (PARTITION BY event_type ORDER BY day DESC) AS rn
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING))
    SELECT event_type, CAST(day AS VARCHAR) AS day, n,
           round((CAST(n AS DOUBLE) * 28.0) / CAST(sum28 AS DOUBLE), 6) AS lift
    FROM scored WHERE rn = 1 AND n_days = 28 ORDER BY event_type
  """))

  /** Audience-overlap estimation via bottom-k (KMV) sketches: the
    * pairwise Jaccard of per-type active-(user, day) sets from each
    * set's k = 256 smallest md5 values — the set-INTERSECTION
    * estimate HLL fundamentally cannot give (union-only), delivered
    * by the Beyer et al. (SIGMOD'07) bottom-k estimator: rank the
    * union's sketch, count members of both sketches among its k
    * smallest, divide by k. Deterministic hash ⇒ the estimate is an
    * exact integer ppm, so the whole sketch pipeline carries a full
    * DuckDB oracle — unlike the DataSketches HLL rows (q_hll_union),
    * nothing here depends on a library's internal representation.
    * Scale shape: per-set work collapses to k rows via a
    * WindowGroupLimit-able rank (literal rn <= k); the pair stage
    * touches |pairs| × 2k sketch rows, never the raw events. */
  private val qKmvJaccard = BoundQuery("q_kmv_jaccard", (s, d) => {
    val k = 256
    val elems = Tables.events(s, d)
      .select(col("event_type"),
        md5(concat_ws("-", col("user_id").cast("string"),
          col("ts").cast("date").cast("string"))).as("h"))
      .distinct()
    val wT = Window.partitionBy("event_type").orderBy("h")
    val sk = elems.withColumn("rn", row_number().over(wT))
      .where(col("rn") <= k).select(col("event_type"), col("h"))
    val types = sk.select("event_type").distinct()
    val pairs = types.as("a").join(types.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
    val flagged = broadcast(pairs).join(sk,
        col("event_type") === col("ta") || col("event_type") === col("tb"))
      .groupBy(col("ta"), col("tb"), col("h"))
      .agg(max(when(col("event_type") === col("ta"), 1L).otherwise(0L)).as("ina"),
        max(when(col("event_type") === col("tb"), 1L).otherwise(0L)).as("inb"))
    val wP = Window.partitionBy("ta", "tb").orderBy("h")
    flagged.withColumn("rn", row_number().over(wP))
      .where(col("rn") <= k)
      .groupBy(col("ta"), col("tb"))
      .agg(sum(col("ina") * col("inb")).as("both_in_topk"))
      .select(col("ta"), col("tb"), col("both_in_topk"),
        expr(s"(both_in_topk * 1000000) div $k").as("jaccard_est_ppm"))
      .orderBy("ta", "tb")
  }, Some("""
    WITH elems AS (
      SELECT DISTINCT event_type,
             md5(CAST(user_id AS VARCHAR) || '-' ||
                 CAST(CAST(ts AS DATE) AS VARCHAR)) AS h
      FROM events),
    sk AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM elems) WHERE rn <= 256),
    types AS (SELECT DISTINCT event_type FROM sk),
    pairs AS (SELECT a.event_type AS ta, b.event_type AS tb
              FROM types a JOIN types b ON a.event_type < b.event_type),
    flagged AS (
      SELECT p.ta, p.tb, sk.h,
             max(CASE WHEN sk.event_type = p.ta THEN 1 ELSE 0 END) AS ina,
             max(CASE WHEN sk.event_type = p.tb THEN 1 ELSE 0 END) AS inb
      FROM pairs p JOIN sk ON sk.event_type IN (p.ta, p.tb)
      GROUP BY 1, 2, 3),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
      FROM flagged)
    SELECT ta, tb, CAST(sum(ina * inb) AS BIGINT) AS both_in_topk,
           CAST((sum(ina * inb) * 1000000) // 256 AS BIGINT) AS jaccard_est_ppm
    FROM ranked WHERE rn <= 256 GROUP BY ta, tb ORDER BY ta, tb
  """))

  /** Per-source winsorized mean of document length — the robust
    * location estimate a corpus card reports next to the raw mean
    * (one boilerplate 10 MB page would drag a raw mean; it can't
    * move the winsorized one).
    *
    * Exactness: the p10/p90 fences are TYPE-1 quantiles — the value
    * at rank ceil(p·n) in the (n_chars, doc_id) total order — picked
    * values, never interpolated, so both engines select the identical
    * integer fence. Clamping and summation are all exact longs; the
    * only double op is one final division, rounded to 6.
    *
    * Shape at 100 TB: both windows partition by source (the same
    * shuffle), rank-k selection is a conditional max over the
    * partition — no global sort, no per-source collect; sources are
    * the unit of parallelism. */
  private val qWinsorize = BoundQuery("q_winsorize", (s, d) => {
    val w = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    val part = Window.partitionBy("source")
    val ranked = Tables.documents(s, d).select("source", "doc_id", "n_chars")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(part))
    val fenced = ranked
      .withColumn("klo", expr("(n + 9) div 10"))
      .withColumn("khi", expr("(9 * n + 9) div 10"))
      .withColumn("plo", max(when(col("rn") === col("klo"), col("n_chars"))).over(part))
      .withColumn("phi", max(when(col("rn") === col("khi"), col("n_chars"))).over(part))
    fenced.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        min("plo").as("p10"),
        min("phi").as("p90"),
        sum(col("n_chars")).as("raw_sum"),
        sum(greatest(least(col("n_chars"), col("phi")), col("plo"))).as("win_sum"))
      .select(col("source"), col("n_docs"), col("p10"), col("p90"),
        round(col("raw_sum").cast("double") / col("n_docs").cast("double"), 6).as("raw_mean"),
        round(col("win_sum").cast("double") / col("n_docs").cast("double"), 6).as("win_mean"))
      .orderBy("source")
  }, Some("""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
        row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        count(*) OVER (PARTITION BY source) AS n
      FROM documents),
    fenced AS (
      SELECT source, n_chars, n,
        max(CASE WHEN rn = (n + 9) // 10 THEN n_chars END)
          OVER (PARTITION BY source) AS plo,
        max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END)
          OVER (PARTITION BY source) AS phi
      FROM ranked)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(min(plo) AS BIGINT) AS p10, CAST(min(phi) AS BIGINT) AS p90,
      round(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS raw_mean,
      round(CAST(sum(greatest(least(n_chars, phi), plo)) AS DOUBLE)
        / CAST(count(*) AS DOUBLE), 6) AS win_mean
    FROM fenced GROUP BY source ORDER BY source
  """))

  /** CUSUM changepoint detection over the daily event-count series —
    * the upward-shift monitor (Page 1954) that complements q_anomaly's
    * rolling z-score: S_t = max(0, S_{t-1} + x_t − μ − k) accumulates
    * sustained drift that per-day z-scores miss; S_t > h alarms.
    *
    * The recursion is rewritten to its WINDOW-EXPRESSIBLE prefix
    * identity — with y_i = x_i − μ − k and P_t = Σ_{i≤t} y_i,
    * S_t = P_t − min(0, min_{j≤t} P_j) — so there is no sequential
    * fold at all: two cumulative windows per event_type replace the
    * recurrence exactly (proof: both sides satisfy the same
    * recurrence and base case).
    *
    * Exactness: counts are integers, μ and slack k are integer
    * micro-units by integer division, prefix sums and running mins
    * are exact longs — bit-identical in any engine, invariant to
    * partitioning. Shape at 100 TB: one partial-agg groupBy to
    * days, type-partitioned windows over calendar-bounded series,
    * never a global sort. */
  private val qCusum = BoundQuery("q_cusum", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("cnt").as("total"))
      .withColumn("mu_u", expr("(total * 1000000) div n_days"))
      .withColumn("k_u", expr("mu_u div 10"))
      .withColumn("h_u", col("mu_u") * 4)
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(stats), "event_type")
      .withColumn("p", sum(col("cnt") * lit(1000000L) - col("mu_u") - col("k_u")).over(w))
      .withColumn("minp", min(col("p")).over(w))
      .withColumn("s_t", col("p") - least(lit(0L), col("minp")))
      .groupBy("event_type").agg(
        first(col("n_days")).as("n_days"),
        round(first(col("mu_u")).cast("double") / 1e6, 6).as("mu"),
        sum(when(col("s_t") > col("h_u"), 1L).otherwise(0L)).as("n_alarms"),
        round(max(col("s_t")).cast("double") / 1e6, 6).as("max_s"))
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        (CAST(sum(cnt) AS BIGINT) * 1000000) // count(*) AS mu_u
      FROM daily GROUP BY 1),
    cum AS (
      SELECT daily.event_type, day, n_days, mu_u, mu_u * 4 AS h_u,
        sum(cnt * 1000000 - mu_u - (mu_u // 10))
          OVER (PARTITION BY daily.event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM daily JOIN stats USING (event_type)),
    st AS (
      SELECT event_type, n_days, mu_u, h_u,
        p - least(CAST(0 AS BIGINT),
          min(p) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN
            UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_t
      FROM cum)
    SELECT event_type, CAST(min(n_days) AS BIGINT) AS n_days,
      round(CAST(min(mu_u) AS DOUBLE) / 1e6, 6) AS mu,
      CAST(sum(CASE WHEN s_t > h_u THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
      round(CAST(max(s_t) AS DOUBLE) / 1e6, 6) AS max_s
    FROM st GROUP BY event_type ORDER BY event_type
  """))

  /** Shuffle-skew audit — the pre-flight check for the exact failure
    * mode this engine's salting/AQE machinery exists to absorb:
    * simulate hash-partitioning the event log on its join key
    * (user_id) into 32 buckets with the corpus's replayable arithmetic
    * fingerprint, and report each bucket's predicted task load, key
    * count, and heaviest resident key, plus its load relative to the
    * perfectly-balanced average in exact ppm (decimal(38,0) integral
    * division — no float, valid at any row count). A bucket showing
    * load_x_avg_ppm ≫ 1e6 is the straggler task a 1000-executor
    * shuffle would stall on; the heaviest-key column says whether
    * salting the one key fixes it or the bucket is just unlucky.
    *
    * Scale shape: one keyed aggregation (user_id), one 32-group
    * reaggregation, one broadcast of the 1-row total — the audit
    * costs a single map-side-combined pass over the log. */
  private val qSkewAudit = BoundQuery("q_skew_audit", (s, d) => {
    val keyCnt = Tables.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", pmod(
        graft.functions.TextFunctions.rollingFingerprint(
          col("user_id").cast("string")), lit(32L)))
    val tot = keyCnt.agg(sum(col("cnt")).as("total"))
    keyCnt.groupBy("bucket")
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("load"),
        max(col("cnt")).as("max_key_cnt"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_keys"), col("load"), col("max_key_cnt"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * load * 32)
                DIV CAST(total AS DECIMAL(38,0)) AS BIGINT)""")
          .as("load_x_avg_ppm"))
      .orderBy("bucket")
  }, Some("""
    WITH kc AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(1, len(CAST(user_id AS VARCHAR)) + 1),
            i -> CAST(ascii(substring(CAST(user_id AS VARCHAR), i, 1)) AS BIGINT))),
          (a, c) -> (a*31 + c) % 1000000007) % 32 AS bucket
      FROM events GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM kc)
    SELECT CAST(bucket AS BIGINT) AS bucket,
      CAST(count(*) AS BIGINT) AS n_keys,
      CAST(sum(cnt) AS BIGINT) AS load,
      CAST(max(cnt) AS BIGINT) AS max_key_cnt,
      CAST((1000000 * CAST(sum(cnt) AS HUGEINT) * 32)
           // CAST(total AS HUGEINT) AS BIGINT) AS load_x_avg_ppm
    FROM kc, tot GROUP BY bucket, total ORDER BY bucket
  """))

  /** k-anonymity audit of the customer table under the
    * quasi-identifier (nation, market segment, $1000 balance band) —
    * the re-identification risk readout a privacy review needs BEFORE
    * a release (q_dp_release's prerequisite): for each k threshold,
    * how many QI equivalence classes have fewer than k members and
    * what share of ROWS sits in them. A row in a size-1 class is
    * uniquely re-identifiable by its quasi-identifiers alone.
    *
    * Exactness: the balance band is floor(bal/1000.0) — one identical
    * IEEE division+floor on both engines; class sizes and the ppm
    * risk share are exact integer counts and one truncating division.
    *
    * Scale shape: one QI-keyed partial agg (the class-size table,
    * ≤ |QI-space| rows), then a 4-row explode over thresholds and a
    * k-keyed reduction — no window, no join. */
  private val qKAnonymity = BoundQuery("q_k_anonymity", (s, d) => {
    val sizes = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("n"))
    sizes
      .select(col("n"), explode(array(lit(2L), lit(5L), lit(10L), lit(25L))).as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < col("k"), 1L).otherwise(0L)).as("classes_below"),
        sum(when(col("n") < col("k"), col("n")).otherwise(0L)).as("rows_at_risk"),
        sum(col("n")).as("total_rows"))
      .select(col("k"), col("n_classes"), col("classes_below"),
        col("rows_at_risk"),
        expr("CAST((1000000 * rows_at_risk) div total_rows AS BIGINT)")
          .as("risk_ppm"))
      .orderBy("k")
  }, Some("""
    WITH sizes AS (
      SELECT c_nationkey, c_mktsegment,
        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2, 3),
    ks AS (SELECT CAST(k AS BIGINT) AS k FROM unnest([2, 5, 10, 25]) AS t(k))
    SELECT k, CAST(count(*) AS BIGINT) AS n_classes,
      CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT) AS classes_below,
      CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
      CAST((1000000 * sum(CASE WHEN n < k THEN n ELSE 0 END)) // sum(n) AS BIGINT)
        AS risk_ppm
    FROM sizes CROSS JOIN ks
    GROUP BY k ORDER BY k
  """))

  /** l-diversity audit — q_k_anonymity's sensitive-attribute
    * companion: a QI class can be large (k-anonymous) yet still leak
    * if every member shares the SAME sensitive value. Under QI =
    * (nation, $1000 balance band) with market segment as the
    * sensitive attribute, count classes whose distinct-sensitive
    * count falls below l ∈ {2, 3, 5} and the row share trapped in
    * them (l=1 classes are full attribute-disclosure).
    *
    * Scale shape: one QI-keyed agg carrying count + count-distinct
    * (two-stage expand, map-side combined), then a 3-row threshold
    * explode over the class table. */
  private val qLDiversity = BoundQuery("q_l_diversity", (s, d) => {
    val classes = Tables.customer(s, d)
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("c_mktsegment")).as("ldiv"))
    classes
      .select(col("n"), col("ldiv"),
        explode(array(lit(2L), lit(3L), lit(5L))).as("l"))
      .groupBy("l")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("ldiv") < col("l"), 1L).otherwise(0L)).as("classes_below"),
        sum(when(col("ldiv") < col("l"), col("n")).otherwise(0L)).as("rows_at_risk"),
        sum(col("n")).as("total_rows"))
      .select(col("l"), col("n_classes"), col("classes_below"),
        col("rows_at_risk"),
        expr("CAST((1000000 * rows_at_risk) div total_rows AS BIGINT)")
          .as("risk_ppm"))
      .orderBy("l")
  }, Some("""
    WITH classes AS (
      SELECT c_nationkey, CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        CAST(count(*) AS BIGINT) AS n,
        CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS ldiv
      FROM customer GROUP BY 1, 2),
    ls AS (SELECT CAST(l AS BIGINT) AS l FROM unnest([2, 3, 5]) AS t(l))
    SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
      CAST(sum(CASE WHEN ldiv < l THEN 1 ELSE 0 END) AS BIGINT) AS classes_below,
      CAST(sum(CASE WHEN ldiv < l THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
      CAST((1000000 * sum(CASE WHEN ldiv < l THEN n ELSE 0 END)) // sum(n) AS BIGINT)
        AS risk_ppm
    FROM classes CROSS JOIN ls
    GROUP BY l ORDER BY l
  """))

  /** Calendar completeness per event type — the DQ readout every
    * pipeline SLA dashboard leads with: observed days vs the
    * min–max span, the missing-day count, the LONGEST silent gap
    * (consecutive-day lag under a per-type window), and completeness
    * in exact ppm. A feed whose longest gap grows is failing
    * upstream even while its row counts look healthy. Fully
    * integer. */
  private val qCalendarGaps = BoundQuery("q_calendar_gaps", (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("ud")
    Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(unix_date(to_date(ts)) AS LONG)").as("ud"))
      .distinct()
      .withColumn("gap", col("ud") - lag(col("ud"), 1).over(w) - 1)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        (max(col("ud")) - min(col("ud")) + 1).as("span_days"),
        coalesce(max(col("gap")), lit(0L)).as("longest_gap"))
      .select(col("event_type"), col("n_days"), col("span_days"),
        (col("span_days") - col("n_days")).as("missing_days"),
        col("longest_gap"),
        expr("(1000000 * n_days) div span_days").as("complete_ppm"))
      .orderBy("event_type")
  }, Some("""
    WITH days AS (
      SELECT DISTINCT event_type,
        CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ud
      FROM events),
    lagd AS (
      SELECT event_type, ud,
        ud - lag(ud) OVER (PARTITION BY event_type ORDER BY ud) - 1 AS gap
      FROM days),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        CAST(max(ud) - min(ud) + 1 AS BIGINT) AS span_days,
        CAST(COALESCE(max(gap), 0) AS BIGINT) AS longest_gap
      FROM lagd GROUP BY 1)
    SELECT event_type, n_days, span_days,
      span_days - n_days AS missing_days, longest_gap,
      (1000000 * n_days) // span_days AS complete_ppm
    FROM g ORDER BY event_type
  """))

  val all: Seq[BoundQuery] =
    Seq(qDqChecks, qAnomaly, qSeqMining, qHllUnion, qHllSliding, qTrending,
      qKmvJaccard, qWinsorize, qCusum, qSkewAudit, qKAnonymity, qLDiversity,
      qCalendarGaps)
}
