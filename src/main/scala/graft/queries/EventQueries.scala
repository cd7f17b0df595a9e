package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-stream analytics wave: ordered funnels, gap-filled
  * time series, cohort retention — the product-analytics surface a
  * large event pipeline serves (complementing q_window_sessions /
  * q_stream_hourly).
  *
  * All timestamp ordering uses the exact ns-epoch long (`ts_ns`, see
  * Tables) so strict `>` comparisons can't be flipped by
  * microsecond truncation between engines. */
object EventQueries {

  private val stepNs = 24L * 3600 * 1000000000L // 24h per funnel step

  /** Ordered 3-step funnel (view -> click -> purchase), each step
    * within 24h of the previous. Each stage is one groupBy on user_id
    * + a key-only join back to events — shuffles keyed consistently on
    * user_id, so AQE plans them as one co-partitioned chain; nothing
    * is ever per-(user, event) quadratic. */
  private val qFunnel = BoundQuery("q_funnel", (s, d) => {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts_ns")
    val t1 = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_ns").as("t1"))
    val t2 = ev.where(col("event_type") === "click").join(t1, "user_id")
      .where(col("ts_ns") > col("t1") && col("ts_ns") - col("t1") <= lit(stepNs))
      .groupBy("user_id").agg(min("ts_ns").as("t2"))
    val t3 = ev.where(col("event_type") === "purchase").join(t2, "user_id")
      .where(col("ts_ns") > col("t2") && col("ts_ns") - col("t2") <= lit(stepNs))
      .groupBy("user_id").agg(min("ts_ns").as("t3"))
    t1.agg(count(lit(1)).as("users")).select(lit("1_view").as("step"), col("users"))
      .unionAll(t2.agg(count(lit(1)).as("users")).select(lit("2_click").as("step"), col("users")))
      .unionAll(t3.agg(count(lit(1)).as("users")).select(lit("3_purchase").as("step"), col("users")))
      .orderBy("step")
  }, Some("""
    WITH t1 AS (SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
                WHERE event_type='view' GROUP BY 1),
    t2 AS (SELECT e.user_id, min(epoch_ns(ts)) AS t2 FROM events e JOIN t1 USING (user_id)
           WHERE event_type='click' AND epoch_ns(ts) > t1
             AND epoch_ns(ts) - t1 <= 86400000000000 GROUP BY 1),
    t3 AS (SELECT e.user_id, min(epoch_ns(ts)) AS t3 FROM events e JOIN t2 USING (user_id)
           WHERE event_type='purchase' AND epoch_ns(ts) > t2
             AND epoch_ns(ts) - t2 <= 86400000000000 GROUP BY 1)
    SELECT step, users FROM (
      SELECT '1_view' AS step, CAST(count(*) AS BIGINT) AS users FROM t1
      UNION ALL
      SELECT '2_click', CAST(count(*) AS BIGINT) FROM t2
      UNION ALL
      SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM t3)
    ORDER BY step
  """))

  /** Gap-filled daily purchase series + 7-day moving average. The date
    * spine comes from a 1-row bounds agg exploded with sequence() — no
    * driver collect. The trailing window is a global orderBy, safe
    * here by construction: it runs over the DAILY series (rows =
    * calendar days, thousands at most), not over raw events. */
  private val qGapFill = BoundQuery("q_gap_fill", (s, d) => {
    val ev = Tables.events(s, d)
    val daily = ev.where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("cnt"))
    val spine = ev.agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    spine.join(daily, Seq("day"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("cnt"),
        (sum(col("cnt")).over(w).cast("double") /
          count(col("cnt")).over(w).cast("double")).as("ma7"))
      .orderBy("day")
  }, Some("""
    WITH daily AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
                   FROM events WHERE event_type='purchase' GROUP BY 1),
    bounds AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds),
    filled AS (SELECT spine.day AS day, coalesce(cnt, CAST(0 AS BIGINT)) AS cnt
               FROM spine LEFT JOIN daily USING (day))
    SELECT strftime(day, '%Y-%m-%d') AS day, cnt,
      CAST(sum(cnt) OVER w AS DOUBLE) / CAST(count(cnt) OVER w AS DOUBLE) AS ma7
    FROM filled
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY day
  """))

  /** Cohort retention: users grouped by first-active week, distinct
    * actives counted per week offset. Two shuffles (per-user min,
    * per-cohort distinct) — both partial-agg friendly. */
  private val qRetention = BoundQuery("q_retention", (s, d) => {
    val ev = Tables.events(s, d)
    val firstW = ev.groupBy("user_id").agg(date_trunc("week", min(col("ts"))).as("cw"))
    val activeW = ev.select(col("user_id"), date_trunc("week", col("ts")).as("aw")).distinct()
    firstW.join(activeW, "user_id")
      .select(col("cw"), (datediff(col("aw"), col("cw")) / 7).cast("long").as("week_offset"),
        col("user_id"))
      .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy("cohort_week", "week_offset")
  }, Some("""
    WITH fw AS (SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY 1),
    aw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events)
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cw, aw.aw)/7 AS BIGINT) AS week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users
    FROM fw JOIN aw USING (user_id)
    GROUP BY 1, 2 ORDER BY cohort_week, week_offset
  """))

  /** Sliding-window counts: 2h windows sliding by 1h (each event lands
    * in exactly two windows). The batch twin of the streaming
    * `window(slide)` shape; the oracle expands the two covering window
    * starts per event explicitly. */
  private val qSlidingWindow = BoundQuery("q_sliding_window", (s, d) => {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00").as("win_start"),
        col("event_type"), col("cnt"))
      .orderBy("win_start", "event_type")
  }, Some("""
    SELECT strftime(ws, '%Y-%m-%d %H:00') AS win_start, event_type,
           CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT event_type,
            unnest([date_trunc('hour', ts),
                    date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
          FROM events)
    GROUP BY ws, event_type ORDER BY win_start, event_type
  """))

  /** The engine's raw-SQL surface: the exact same ANSI string runs on
    * Spark (over Tables.registerViews temp views) and on the DuckDB
    * oracle — dialect-shared by construction. */
  private val sharedSql = """
    SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY nation
  """

  private val qSqlSurface = BoundQuery("q_sql_surface", (s, d) => {
    Tables.registerViews(s, d)
    s.sql(sharedSql)
  }, Some(sharedSql))

  /** Per-user exponentially-weighted moving average of event values —
    * an ORDER-DEPENDENT float fold made engine-exact by pinning the
    * fold order: collect per user, sort on (ts_ns, event_id) (unique),
    * fold left with literal coefficients. Both engines execute the
    * identical IEEE op sequence, so even this "inherently floaty"
    * statistic is bit-checkable. Scale note: collect_list is bounded
    * by per-user event counts (state the watermarked streaming twin
    * would hold anyway); the fold itself is codegen'd, no UDF. */
  private val qEwma = BoundQuery("q_ewma", (s, d) => {
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col("ts_ns"), col("event_id"), col("value")))).as("seq"))
      .select(col("user_id"),
        size(col("seq")).cast("long").as("n"),
        round(aggregate(col("seq"), lit(0.0),
          (acc, x) => lit(0.3) * x("value") + lit(0.7) * acc), 9).as("ewma"))
      .orderBy("user_id")
  }, Some("""
    WITH seqs AS (
      SELECT user_id,
        list_transform(
          list_sort(list(struct_pack(ts_ns := epoch_ns(ts), eid := event_id, v := value))),
          x -> x.v) AS vals
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(len(vals) AS BIGINT) AS n,
      round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
        (acc, v) -> 0.3*v + 0.7*acc), 9) AS ewma
    FROM seqs ORDER BY user_id
  """))

  /** Incremental aggregation (operators.Incremental): history is
    * aggregated once into per-key partial state, the new slice is
    * aggregated alone, and the two partial tables merge — the answer
    * must be IDENTICAL to re-aggregating everything (the oracle is
    * exactly that direct groupBy). Cents-integer partials make the
    * equivalence exact, not approximate. */
  private val qIncremental = BoundQuery("q_incremental", (s, d) => {
    import graft.functions.Num._
    val ev = Tables.events(s, d)
    val cut = lit("2024-01-15").cast("date")
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("vc"),
          min("ts_ns").as("first_ns"), max("ts_ns").as("last_ns"))
    val state = partial(ev.where(to_date(col("ts")) < cut))
    val delta = partial(ev.where(to_date(col("ts")) >= cut))
    graft.operators.Incremental.merge(state, delta,
        keys = Seq("user_id", "event_type"), sums = Seq("cnt", "vc"),
        mins = Seq("first_ns"), maxs = Seq("last_ns"))
      .select(col("user_id"), col("event_type"), col("cnt"),
        money(col("vc")).as("sum_value"),
        // us-epochs in the OUTPUT: DuckDB reads TIMESTAMP(NANOS) parquet
        // micro-truncated, so ns values can't cross-check; min/max
        // commute with the monotone truncation, so partials stay exact ns
        expr("first_ns div 1000").as("first_us"),
        expr("last_ns div 1000").as("last_us"))
      .orderBy("user_id", "event_type")
  }, Some("""
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value,
           CAST(epoch_us(min(ts)) AS BIGINT) AS first_us,
           CAST(epoch_us(max(ts)) AS BIGINT) AS last_us
    FROM events GROUP BY user_id, event_type
    ORDER BY user_id, event_type
  """))

  /** Explicit GROUPING SETS through the SQL surface (the DataFrame
    * API offers rollup/cube; arbitrary set lists are SQL-only) —
    * per-type totals and per-day totals in ONE pass over events,
    * grouping() disambiguating the all-rows from the null-key sets. */
  private val qGroupingSets = BoundQuery("q_grouping_sets", (s, d) => {
    Tables.registerViews(s, d)
    s.sql("""
      SELECT coalesce(event_type, 'ALL') AS type_g,
             coalesce(CAST(dayofmonth(ts) AS BIGINT), -1) AS day_g,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(grouping(event_type) AS BIGINT) AS g_type
      FROM events
      GROUP BY GROUPING SETS ((event_type), (dayofmonth(ts)))
      ORDER BY type_g, day_g
    """)
  }, Some("""
    SELECT coalesce(event_type, 'ALL') AS type_g,
           coalesce(CAST(dayofmonth(ts) AS BIGINT), -1) AS day_g,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(grouping(event_type) AS BIGINT) AS g_type
    FROM events
    GROUP BY GROUPING SETS ((event_type), (dayofmonth(ts)))
    ORDER BY type_g, day_g
  """))

  /** OHLC bars per (event_type, hour): open/close are the values at
    * the first/last event of the bar (total-ordered by (ts_us,
    * event_id) so ties can't flip between engines), high/low are
    * plain min/max — no value is ever SUMMED, so doubles stay exact.
    * Spark side picks open/close via struct-ordered min/max (one
    * partial-aggregable pass); the oracle uses arg_min/arg_max over a
    * zero-padded composite key (DuckDB's arg_min can't take struct
    * ordering keys). Time lives on the µs grid via exact integral
    * division (`div`, never `/`: ts_ns ≈ 1.8e18 exceeds double's 2^53
    * exact range) — DuckDB reads these TIMESTAMP(NANOS) files
    * µs-truncated, so µs is the finest grid both engines share. */
  private val qOhlcBars = BoundQuery("q_ohlc_bars", (s, d) => {
    Tables.events(s, d)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("hr", expr("ts_us div 3600000000"))
      .groupBy("event_type", "hr")
      .agg(
        min(struct(col("ts_us"), col("event_id"), col("value"))).as("o"),
        max(struct(col("ts_us"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("hr"),
        col("o.value").as("open"), col("high"), col("low"),
        col("c.value").as("close"), col("n_events"))
      .orderBy("event_type", "hr")
  }, Some("""
    SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      arg_min(value, printf('%020d%020d', epoch_us(ts), event_id)) AS open,
      max(value) AS high, min(value) AS low,
      arg_max(value, printf('%020d%020d', epoch_us(ts), event_id)) AS close,
      CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2 ORDER BY event_type, hr
  """))

  /** Time-weighted average value per (event_type, day): each event's
    * value holds until the next event of that type that day (the last
    * holds to day end) — the TWAP/metering aggregate. Weights are
    * exact: cents(value) × duration-µs products summed as longs
    * (max cents·day-µs ≈ 4·10¹⁵, no overflow), divided once at the
    * end. Per-(type,day) lead window — partitioned, scale-safe. */
  private val qTwap = BoundQuery("q_twap", (s, d) => {
    import graft.functions.Num._
    val w = Window.partitionBy("event_type", "day").orderBy("ts_us", "event_id")
    Tables.events(s, d)
      .withColumn("ts_us", expr("ts_ns div 1000")) // µs grid — see q_ohlc_bars
      .withColumn("day", expr("ts_us div 86400000000"))
      .withColumn("end_us",
        coalesce(lead(col("ts_us"), 1).over(w), (col("day") + 1) * lit(86400000000L)))
      .withColumn("dur_us", col("end_us") - col("ts_us"))
      .groupBy("event_type", "day")
      .agg(sum(cents(col("value")) * col("dur_us")).as("wsum"),
        sum(col("dur_us")).as("dur"), count(lit(1)).as("n_events"))
      .select(col("event_type"), col("day"),
        round(col("wsum").cast("double") / col("dur").cast("double") / 100.0, 6).as("twap"),
        col("n_events"))
      .orderBy("event_type", "day")
  }, Some("""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS ts_us, event_id, value,
        epoch_us(ts) // 86400000000 AS day
      FROM events),
    spans AS (
      SELECT event_type, day, value,
        coalesce(lead(ts_us) OVER (PARTITION BY event_type, day ORDER BY ts_us, event_id),
                 (day + 1) * 86400000000) - ts_us AS dur_us
      FROM e)
    SELECT event_type, day,
      round(CAST(sum(CAST(round(value*100, 0) AS BIGINT) * dur_us) AS DOUBLE)
        / CAST(sum(dur_us) AS DOUBLE) / 100.0, 6) AS twap,
      CAST(count(*) AS BIGINT) AS n_events
    FROM spans GROUP BY 1, 2 ORDER BY event_type, day
  """))

  /** Interval-union coverage per user: merge overlapping
    * [ts, ts+5 min) activity intervals (gaps-and-islands via the
    * running max-end trick) and report merged-island count and total
    * covered time — the "how much wall-clock was this user active"
    * aggregate, all exact µs longs (the grid both engines share — see
    * q_ohlc_bars). Per-user windows, scale-safe. */
  private val qIntervalCoverage = BoundQuery("q_interval_coverage", (s, d) => {
    val span = 300000000L // 5 min in µs (the shared exact grid)
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        (col("ts_us") + lit(span)).as("end_us"))
      .withColumn("prev_max_end", max(col("end_us")).over(wPrev))
      .withColumn("new_island",
        when(col("prev_max_end").isNull || col("prev_max_end") < col("ts_us"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(wRun))
      .groupBy("user_id", "island")
      .agg(min(col("ts_us")).as("start_us"), max(col("end_us")).as("iend_us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("iend_us") - col("start_us")).as("covered_us"))
      .orderBy("user_id")
  }, Some("""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        epoch_us(ts) + 300000000 AS end_us
      FROM events),
    flagged AS (
      SELECT user_id, ts_us, event_id, end_us,
        CASE WHEN max(end_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) < ts_us
             OR max(end_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        THEN 1 ELSE 0 END AS new_island
      FROM iv),
    islands AS (
      SELECT user_id, ts_us, end_us,
        sum(new_island) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged),
    merged AS (
      SELECT user_id, island, min(ts_us) AS start_us, max(end_us) AS iend_us
      FROM islands GROUP BY 1, 2)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
      CAST(sum(iend_us - start_us) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id ORDER BY user_id
  """))

  /** Time-decay multi-touch attribution: every purchase distributes
    * its value over the user's click/view touches in the preceding
    * 7 days, weighted exp(-Δt/τ) with τ = 1 day — the marketing-
    * attribution shape, which is also exactly the credit-assignment
    * shape for "which upstream crawl touched this training doc".
    *
    * Exactness: Δt is the exact ns-epoch long; each decay weight is
    * rounded to integer micro-units BEFORE any aggregation (the one
    * per-row exp() is computed on identical operands in both
    * engines), per-conversion normalization is INTEGER division
    * (cents × w_u × 1e6 div Σw_u — fits long: ≤1e5·1e6·1e6 < 2^63),
    * and all sums are exact longs. One display division at the end.
    *
    * Shape at 100 TB: conversions and touches co-shuffle on user_id
    * (one exchange, AQE-coalesced), the 7-day predicate bounds the
    * per-user pair fan-out, and the per-conversion normalizer is a
    * groupBy on the conversion id — never a global window. */
  private val qAttribution = BoundQuery("q_attribution", (s, d) => {
    val tauNs = 24L * 3600 * 1000000000L        // 1-day decay constant
    val horizonNs = 7L * 24 * 3600 * 1000000000L // 7-day lookback
    val ev = Tables.events(s, d)
    val conv = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts_ns").as("conv_ns"), graft.functions.Num.cents(col("value")).as("val_cents"))
    val touch = ev.where(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type").as("touch_type"),
        col("ts_ns").as("touch_ns"))
    val pairs = conv.join(touch, "user_id")
      .where(col("touch_ns") < col("conv_ns") &&
        col("conv_ns") - col("touch_ns") <= lit(horizonNs))
      .withColumn("w_u", round(
        exp((col("touch_ns") - col("conv_ns")).cast("double") / lit(tauNs.toDouble)) * 1e6,
        0).cast("long"))
    val norm = pairs.groupBy("conv_id").agg(sum("w_u").as("sumw_u"))
    pairs.join(norm, "conv_id")
      .withColumn("credit_u", expr("(val_cents * w_u * 1000000) div sumw_u"))
      .groupBy("touch_type").agg(
        count(lit(1)).as("n_touches"),
        countDistinct(col("conv_id")).as("n_conversions"),
        sum("credit_u").as("credit_u"))
      .select(col("touch_type"), col("n_touches"), col("n_conversions"),
        col("credit_u"),
        round(col("credit_u").cast("double") / 1e8, 4).as("credit"))
      .orderBy("touch_type")
  }, Some("""
    WITH conv AS (
      SELECT user_id, event_id AS conv_id, epoch_ns(ts) AS conv_ns,
             CAST(round(value * 100, 0) AS BIGINT) AS val_cents
      FROM events WHERE event_type = 'purchase'),
    touch AS (
      SELECT user_id, event_type AS touch_type, epoch_ns(ts) AS touch_ns
      FROM events WHERE event_type IN ('click', 'view')),
    pairs AS (
      SELECT conv_id, touch_type, val_cents,
        CAST(round(exp(CAST(touch_ns - conv_ns AS DOUBLE) / 86400000000000.0) * 1e6, 0)
          AS BIGINT) AS w_u
      FROM conv JOIN touch USING (user_id)
      WHERE touch_ns < conv_ns AND conv_ns - touch_ns <= 604800000000000),
    norm AS (SELECT conv_id, sum(w_u) AS sumw_u FROM pairs GROUP BY 1)
    SELECT touch_type,
      CAST(count(*) AS BIGINT) AS n_touches,
      CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
      CAST(sum((val_cents * w_u * 1000000) // sumw_u) AS BIGINT) AS credit_u,
      round(CAST(sum((val_cents * w_u * 1000000) // sumw_u) AS DOUBLE) / 1e8, 4) AS credit
    FROM pairs JOIN norm USING (conv_id)
    GROUP BY touch_type ORDER BY touch_type
  """))

  /** First-passage-to-purchase probabilities from every event state —
    * the absorbing-Markov-chain readout built on q_transition_matrix's
    * bigram model: H_k(s) = P(a user in state s reaches 'purchase'
    * within k steps), for k = 1..6, answering "how many interactions
    * away is conversion?".
    *
    * Transitions FROM purchase are excluded (absorbing); each
    * transition probability is ONE ppm rounding (1e6·n div out_n,
    * both engines truncate alike), and the recurrence
    * H_{k+1}(s) = p(s→P) + (Σ_t p(s→t)·H_k(t)) div 1e6
    * does ONE truncating division per state per round after an exact
    * long sum (terms ≤ 5·10¹² — int64-safe at any data size since
    * probabilities, not counts, recurse). The 6 rounds are unrolled
    * DataFrame joins over the ≤|states|² probability table; the
    * DuckDB oracle replays them as 6 CTE steps term-for-term (the
    * q_kmeans_arith convention for bounded iteration).
    *
    * Scale shape: ONE user-keyed lead window + type-pair aggregation
    * builds the ≤25-row chain (the only data-sized work); every round
    * after that is a broadcast join of constant-size tables — cost
    * independent of |events|. */
  private val qAbsorption = BoundQuery("q_absorption", (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val bigrams = Tables.events(s, d)
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .where(col("nxt").isNotNull && col("event_type") =!= "purchase")
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n"))
    val outTotals = bigrams.groupBy("cur").agg(sum(col("n")).as("out_n"))
    val p = graft.util.CacheScope.persist(
      bigrams.join(broadcast(outTotals), "cur")
        .select(col("cur"), col("nxt"),
          expr("(1000000 * n) div out_n").as("p_ppm")))
    val pAbs = p.where(col("nxt") === "purchase")
      .select(col("cur").as("state"), col("p_ppm").as("p_hit"))
    val pTrans = p.where(col("nxt") =!= "purchase")
    val states = p.select(col("cur").as("state")).distinct()
    var h = states.join(pAbs, Seq("state"), "left")
      .select(col("state"), coalesce(col("p_hit"), lit(0L)).as("h"))
    var out = h.select(col("state"), lit(1L).as("k"), col("h").as("hit_ppm"))
    for (k <- 2 to 6) {
      val sums = pTrans
        .join(h.select(col("state").as("nxt"), col("h")), Seq("nxt"))
        .groupBy(col("cur").as("state"))
        .agg(sum(col("p_ppm") * col("h")).as("sprod"))
      h = states.join(pAbs, Seq("state"), "left")
        .join(sums, Seq("state"), "left")
        .select(col("state"),
          (coalesce(col("p_hit"), lit(0L)) +
            expr("coalesce(sprod, 0L) div 1000000L")).as("h"))
      out = out.unionAll(
        h.select(col("state"), lit(k.toLong).as("k"), col("h").as("hit_ppm")))
    }
    out.orderBy("k", "state")
  }, Some("""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS nxt
      FROM events),
    bi AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE nxt IS NOT NULL AND cur <> 'purchase' GROUP BY 1, 2),
    tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS out_n FROM bi GROUP BY 1),
    p AS (SELECT cur, nxt, (1000000 * n) // out_n AS p_ppm
          FROM bi JOIN tot USING (cur)),
    pabs AS (SELECT cur AS state, p_ppm AS p_hit FROM p WHERE nxt = 'purchase'),
    ptr AS (SELECT cur, nxt, p_ppm FROM p WHERE nxt <> 'purchase'),
    states AS (SELECT DISTINCT cur AS state FROM p),
    h1 AS (SELECT s.state, coalesce(p_hit, 0) AS h
           FROM states s LEFT JOIN pabs USING (state)),
    h2 AS (SELECT s.state, coalesce(p_hit, 0) + coalesce(sp.sprod, 0) // 1000000 AS h
           FROM states s LEFT JOIN pabs USING (state)
           LEFT JOIN (SELECT cur AS state, sum(p_ppm * h1.h) AS sprod
                      FROM ptr JOIN h1 ON ptr.nxt = h1.state GROUP BY 1) sp
             USING (state)),
    h3 AS (SELECT s.state, coalesce(p_hit, 0) + coalesce(sp.sprod, 0) // 1000000 AS h
           FROM states s LEFT JOIN pabs USING (state)
           LEFT JOIN (SELECT cur AS state, sum(p_ppm * h2.h) AS sprod
                      FROM ptr JOIN h2 ON ptr.nxt = h2.state GROUP BY 1) sp
             USING (state)),
    h4 AS (SELECT s.state, coalesce(p_hit, 0) + coalesce(sp.sprod, 0) // 1000000 AS h
           FROM states s LEFT JOIN pabs USING (state)
           LEFT JOIN (SELECT cur AS state, sum(p_ppm * h3.h) AS sprod
                      FROM ptr JOIN h3 ON ptr.nxt = h3.state GROUP BY 1) sp
             USING (state)),
    h5 AS (SELECT s.state, coalesce(p_hit, 0) + coalesce(sp.sprod, 0) // 1000000 AS h
           FROM states s LEFT JOIN pabs USING (state)
           LEFT JOIN (SELECT cur AS state, sum(p_ppm * h4.h) AS sprod
                      FROM ptr JOIN h4 ON ptr.nxt = h4.state GROUP BY 1) sp
             USING (state)),
    h6 AS (SELECT s.state, coalesce(p_hit, 0) + coalesce(sp.sprod, 0) // 1000000 AS h
           FROM states s LEFT JOIN pabs USING (state)
           LEFT JOIN (SELECT cur AS state, sum(p_ppm * h5.h) AS sprod
                      FROM ptr JOIN h5 ON ptr.nxt = h5.state GROUP BY 1) sp
             USING (state))
    SELECT state, k, h AS hit_ppm FROM (
      SELECT state, CAST(1 AS BIGINT) AS k, CAST(h AS BIGINT) AS h FROM h1
      UNION ALL SELECT state, 2, CAST(h AS BIGINT) FROM h2
      UNION ALL SELECT state, 3, CAST(h AS BIGINT) FROM h3
      UNION ALL SELECT state, 4, CAST(h AS BIGINT) FROM h4
      UNION ALL SELECT state, 5, CAST(h AS BIGINT) FROM h5
      UNION ALL SELECT state, 6, CAST(h AS BIGINT) FROM h6) u
    ORDER BY k, state
  """))

  /** DAU/MAU stickiness per (event type, month): mean daily active
    * users over the month's active days divided by monthly actives —
    * the engagement ratio product analytics tracks beside q_retention
    * (1e6 = every monthly user active every day). Exact as
    * 10⁶·Σ_day DAU div (n_days·MAU): distinct counts are exact longs,
    * one truncating division.
    *
    * Scale shape: two distinct aggregations — (type,month,day,user)
    * and (type,month,user) grain — each a partial-agg shuffle (the
    * distinct rewrites to a two-stage agg, map-side combined), then a
    * broadcast-able join of two month-grain tables. No window. */
  private val qStickiness = BoundQuery("q_stickiness", (s, d) => {
    val ev = Tables.events(s, d).select(col("event_type"),
      to_date(col("ts")).as("day"),
      date_trunc("month", col("ts")).cast("date").as("month"),
      col("user_id"))
    val daily = ev.groupBy("event_type", "month", "day")
      .agg(countDistinct(col("user_id")).as("dau"))
      .groupBy("event_type", "month")
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
    val monthly = ev.groupBy("event_type", "month")
      .agg(countDistinct(col("user_id")).as("mau"))
    daily.join(monthly, Seq("event_type", "month"))
      .select(col("event_type"), col("month"), col("n_days"), col("mau"),
        expr("CAST((1000000 * sum_dau) div (n_days * mau) AS BIGINT)")
          .as("stickiness_ppm"))
      .orderBy("event_type", "month")
  }, Some("""
    WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(date_trunc('month', ts) AS DATE) AS month, user_id
                FROM events),
    daily AS (SELECT event_type, month, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(dau) AS BIGINT) AS sum_dau
              FROM (SELECT event_type, month, day,
                      CAST(count(DISTINCT user_id) AS BIGINT) AS dau
                    FROM ev GROUP BY 1, 2, 3)
              GROUP BY 1, 2),
    monthly AS (SELECT event_type, month,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS mau
                FROM ev GROUP BY 1, 2)
    SELECT event_type, month, n_days, mau,
      CAST((1000000 * sum_dau) // (n_days * mau) AS BIGINT) AS stickiness_ppm
    FROM daily JOIN monthly USING (event_type, month)
    ORDER BY event_type, month
  """))

  /** Exact time-to-convert distribution: per user, seconds from the
    * FIRST view to the first purchase at-or-after it; p25/p50/p90 as
    * EXACT order statistics (no interpolation, no approx sketch) via
    * operators.Ranking.globalRowNumber — range-partitioned two-phase
    * rank, so the selection runs with NO single-partition window (the
    * q_global_median shape over a derived metric). Durations divide
    * exact ns-epoch longs to whole seconds; ties in the rank order
    * break by user_id.
    *
    * Scale shape: two user-keyed partial aggs (first view, first
    * qualifying purchase), one user-keyed join, then the two-phase
    * rank; final reduction is one row. */
  private val qTimeToConvert = BoundQuery("q_time_to_convert", (s, d) => {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts_ns")
    val firstView = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_ns").as("v_ns"))
    val firstBuy = ev.where(col("event_type") === "purchase")
      .join(firstView, "user_id")
      .where(col("ts_ns") >= col("v_ns"))
      .groupBy("user_id", "v_ns").agg(min("ts_ns").as("p_ns"))
    val durs = firstBuy.select(col("user_id"),
      expr("(p_ns - v_ns) div 1000000000").as("dur_s"))
    val tot = durs.agg(count(lit(1)).as("n"))
    val ranked = graft.operators.Ranking
      .globalRowNumber(durs, "rn0", col("dur_s"), col("user_id"))
      .crossJoin(broadcast(tot))
      .withColumn("rn", col("rn0") + 1)
    ranked.agg(
      max(col("n")).as("n_users"),
      max(when(col("rn") === expr("(n + 3) div 4"), col("dur_s"))).as("p25_s"),
      max(when(col("rn") === expr("(n + 1) div 2"), col("dur_s"))).as("median_s"),
      max(when(col("rn") === expr("(9 * n + 9) div 10"), col("dur_s"))).as("p90_s"))
  }, Some("""
    WITH fv AS (SELECT user_id, min(epoch_ns(ts)) AS v_ns
                FROM events WHERE event_type = 'view' GROUP BY user_id),
    fb AS (SELECT e.user_id, fv.v_ns, min(epoch_ns(e.ts)) AS p_ns
           FROM events e JOIN fv ON e.user_id = fv.user_id
           WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= fv.v_ns
           GROUP BY e.user_id, fv.v_ns),
    durs AS (SELECT user_id, (p_ns - v_ns) // 1000000000 AS dur_s FROM fb),
    ranked AS (SELECT dur_s,
                 CAST(row_number() OVER (ORDER BY dur_s, user_id) AS BIGINT) AS rn
               FROM durs),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM durs)
    SELECT n AS n_users,
      max(CASE WHEN rn = (n + 3) // 4 THEN dur_s END) AS p25_s,
      max(CASE WHEN rn = (n + 1) // 2 THEN dur_s END) AS median_s,
      max(CASE WHEN rn = (9 * n + 9) // 10 THEN dur_s END) AS p90_s
    FROM ranked, tot GROUP BY n
  """))

  /** Inter-arrival gap distribution: exact p50/p90/p99 of the
    * seconds between a user's consecutive events (all types) — the
    * session-timeout calibrator: q_window_sessions' 30-minute gap
    * threshold should sit in this distribution's tail, and this query
    * is how that choice gets audited rather than guessed.
    *
    * Scale shape: one user-partitioned lag window (keyed, never
    * global), then the two-phase global rank (Ranking.globalRowNumber)
    * for the order statistics — the q_time_to_convert selection shape
    * over a much bigger derived set (≈ |events| − |users| gaps). */
  private val qInterarrival = BoundQuery("q_interarrival", (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val gaps = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_ns"))
      .withColumn("prev", lag(col("ts_ns"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("user_id"), col("event_id"),
        expr("(ts_ns - prev) div 1000000000").as("gap_s"))
    val tot = gaps.agg(count(lit(1)).as("n"))
    val ranked = graft.operators.Ranking
      .globalRowNumber(gaps, "rn0", col("gap_s"), col("user_id"), col("event_id"))
      .crossJoin(broadcast(tot))
      .withColumn("rn", col("rn0") + 1)
    ranked.agg(
      max(col("n")).as("n_gaps"),
      max(when(col("rn") === expr("(n + 1) div 2"), col("gap_s"))).as("p50_s"),
      max(when(col("rn") === expr("(9 * n + 9) div 10"), col("gap_s"))).as("p90_s"),
      max(when(col("rn") === expr("(99 * n + 99) div 100"), col("gap_s"))).as("p99_s"))
  }, Some("""
    WITH gaps AS (
      SELECT user_id, event_id,
        (epoch_ns(ts) - lag(epoch_ns(ts), 1) OVER
           (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id))
          // 1000000000 AS gap_s
      FROM events),
    g AS (SELECT user_id, event_id, gap_s FROM gaps WHERE gap_s IS NOT NULL),
    ranked AS (SELECT gap_s,
                 CAST(row_number() OVER (ORDER BY gap_s, user_id, event_id) AS BIGINT) AS rn
               FROM g),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g)
    SELECT n AS n_gaps,
      max(CASE WHEN rn = (n + 1) // 2 THEN gap_s END) AS p50_s,
      max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_s END) AS p90_s,
      max(CASE WHEN rn = (99 * n + 99) // 100 THEN gap_s END) AS p99_s
    FROM ranked, tot GROUP BY n
  """))

  /** Time-decayed event counts per type at the stream head — the
    * "trending score" primitive (Ebbinghaus decay with a 7-day
    * half-life): every event contributes exp(−ln2·Δdays/7), so a
    * burst yesterday outweighs steady noise last month. Each row's
    * weight rounds ONCE to micro-units (identical exp tree over the
    * exact µs age on both engines — the µ-nat rule), then the per-type
    * sums are exact integer partials: partition-invariant, streaming-
    * friendly (the same weight is a multiplier a state store applies
    * at read time). */
  private val qDecayedCounts = BoundQuery("q_decayed_counts", (s, d) => {
    val ev = Tables.events(s, d)
    val head = ev.agg(max(expr("ts_ns div 1000")).as("mx"))
    ev.select(col("event_type"), expr("ts_ns div 1000").as("us"))
      .crossJoin(broadcast(head))
      .withColumn("w_micro",
        round(exp((col("us") - col("mx")).cast("double") / 86400e6 *
          (log(lit(2.0)) / 7.0)) * 1e6, 0).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("w_micro")).as("decayed_micro"))
      .orderBy("event_type")
  }, Some("""
    WITH head AS (SELECT max(epoch_us(ts)) AS mx FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      CAST(sum(CAST(round(exp(CAST(epoch_us(ts) - mx AS DOUBLE) / 86400e6
                              * (ln(2.0) / 7.0)) * 1e6, 0) AS BIGINT))
        AS BIGINT) AS decayed_micro
    FROM events CROSS JOIN head
    GROUP BY event_type ORDER BY event_type
  """))

  /** Tail latency of the event stream: per event_type, the p50 / p95 /
    * p99 inter-arrival gap in exact microseconds by RANK arithmetic
    * (rank = max(1, ceil(q·n)), the quantile_disc convention shared
    * with q_kll_quantiles / q_group_quantiles — no sketch, no
    * interpolation floats, so the tail readout is hash-stable). The
    * SRE dashboard staple: p99 divergence from p50 is the queueing
    * signal long before means move. Gaps come from one per-user
    * partitioned lag window; the percentile pass is a per-type
    * partitioned sort — the partitioned-window shuffle shape. */
  private val qTailLatency = BoundQuery("q_tail_latency", (s, d) => {
    val w = Window.partitionBy("event_type", "user_id").orderBy("ts_us", "event_id")
    val gaps = Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"), col("event_id"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .where(col("gap_us").isNotNull)
    val wr = Window.partitionBy("event_type").orderBy(col("gap_us"), col("event_id"))
    val ranked = gaps
      .withColumn("rn", row_number().over(wr).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    def pick(q: Double, as: String) =
      max(when(col("rn") === greatest(lit(1L),
        ceil(lit(q) * col("n").cast("double")).cast("long")), col("gap_us"))).as(as)
    ranked.groupBy("event_type")
      .agg(max(col("n")).as("n_gaps"), pick(0.5, "p50_us"),
        pick(0.95, "p95_us"), pick(0.99, "p99_us"))
      .orderBy("event_type")
  }, Some("""
    WITH gaps AS (
      SELECT event_type, event_id,
        epoch_us(ts) - lag(epoch_us(ts)) OVER (
          PARTITION BY event_type, user_id
          ORDER BY epoch_us(ts), event_id) AS gap_us
      FROM events),
    ranked AS (
      SELECT event_type, gap_us,
        CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY gap_us, event_id) AS BIGINT) AS rn,
        CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM gaps WHERE gap_us IS NOT NULL)
    SELECT event_type, max(n) AS n_gaps,
      max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
           THEN gap_us END) AS p50_us,
      max(CASE WHEN rn = greatest(1, CAST(ceil(0.95 * n) AS BIGINT))
           THEN gap_us END) AS p95_us,
      max(CASE WHEN rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT))
           THEN gap_us END) AS p99_us
    FROM ranked GROUP BY event_type ORDER BY event_type
  """))

  /** Growth accounting (the Social Capital "DAU accounting"
    * identity): every active day of every user is classified NEW
    * (first-ever day), RETAINED (also active the previous calendar
    * day) or RESURRECTED (seen before, silent yesterday); CHURNED
    * counts yesterday's actives who are silent today. The books must
    * balance: active(d) = new + retained + resurrected and
    * active(d) − active(d−1) = new + resurrected − churned — both
    * identities spec-pinned. FULLY integer; the lag/min windows
    * partition PER USER; the day-grain roll-up joins on the date key
    * (never a global window). */
  private val qGrowthAccounting = BoundQuery("q_growth_accounting", (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ud")
    val days = graft.util.CacheScope.persist(
      Tables.events(s, d)
        .select(col("user_id"), expr("unix_date(to_date(ts))").as("ud"))
        .distinct()
        .withColumn("prev", lag(col("ud"), 1).over(w)))
    val classified = days.select(col("ud"),
      when(col("prev").isNull, lit("new"))
        .when(col("prev") === col("ud") - 1, lit("retained"))
        .otherwise(lit("resurrected")).as("cls"))
    val churn = days.select((col("ud") + 1).as("ud"),
        col("user_id"), lit(1L).as("one"))
      .join(days.select(col("ud"), col("user_id"), lit(1L).as("active")),
        Seq("ud", "user_id"), "left_anti")
      .groupBy("ud").agg(count(lit(1)).as("churned"))
    classified.groupBy("ud")
      .agg(count(lit(1)).as("active"),
        sum(when(col("cls") === "new", 1L).otherwise(0L)).as("new_users"),
        sum(when(col("cls") === "retained", 1L).otherwise(0L)).as("retained"),
        sum(when(col("cls") === "resurrected", 1L).otherwise(0L)).as("resurrected"))
      .join(churn, Seq("ud"), "left_outer")
      .select(expr("date_add(DATE '1970-01-01', cast(ud as int))").as("day"),
        col("active"), col("new_users"), col("retained"),
        col("resurrected"), coalesce(col("churned"), lit(0L)).as("churned"))
      .orderBy("day")
  }, Some("""
    WITH days AS (
      SELECT DISTINCT user_id,
        CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ud
      FROM events),
    lagd AS (
      SELECT user_id, ud,
        lag(ud) OVER (PARTITION BY user_id ORDER BY ud) AS prev
      FROM days),
    classified AS (
      SELECT ud, CASE WHEN prev IS NULL THEN 'new'
                      WHEN prev = ud - 1 THEN 'retained'
                      ELSE 'resurrected' END AS cls
      FROM lagd),
    churn AS (
      SELECT a.ud + 1 AS ud, CAST(count(*) AS BIGINT) AS churned
      FROM days a LEFT JOIN days b
        ON b.ud = a.ud + 1 AND b.user_id = a.user_id
      WHERE b.user_id IS NULL
      GROUP BY a.ud + 1),
    g AS (
      SELECT ud, CAST(count(*) AS BIGINT) AS active,
        CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        CAST(sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS retained,
        CAST(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
          AS resurrected
      FROM classified GROUP BY ud)
    SELECT DATE '1970-01-01' + CAST(g.ud AS INT) AS day,
      active, new_users, retained, resurrected,
      COALESCE(churned, 0) AS churned
    FROM g LEFT JOIN churn ON g.ud = churn.ud
    ORDER BY day
  """))

  val all: Seq[BoundQuery] =
    Seq(qFunnel, qGapFill, qRetention, qSlidingWindow, qSqlSurface, qEwma,
      qIncremental, qGroupingSets, qOhlcBars, qTwap, qIntervalCoverage,
      qAttribution, qAbsorption, qStickiness, qTimeToConvert, qInterarrival,
      qRetentionDecay, qDecayedCounts, qTailLatency, qGrowthAccounting)

  /** Exponential-decay fit of the retention curve: pooled over
    * cohorts, ln(retention at week w) regressed on w — the one-number
    * model (λ, and half-life ln2/λ) a growth team quotes where
    * q_retention shows the full triangle. Retention ratios are exact
    * rationals (active_w/cohort_size); each ln rounds ONCE to
    * micro-nats; the slope is the exact cleared OLS of (w, nats_u)
    * pairs (the q_elasticity convention) and the half-life one more
    * integral division (milli-weeks; negative slope ⇒ positive
    * half-life — degenerate non-decaying fits emit NULL, stated). */
  private lazy val qRetentionDecay = BoundQuery("q_retention_decay", (s, d) => {
    val ev = Tables.events(s, d)
    val firstW = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cw"))
    val activeW = ev.select(col("user_id"),
      date_trunc("week", col("ts")).as("aw")).distinct()
    val tri = firstW.join(activeW, "user_id")
      .select(col("cw"),
        (datediff(col("aw"), col("cw")) / 7).cast("long").as("w"),
        col("user_id"))
      .groupBy("cw", "w").agg(countDistinct(col("user_id")).as("users"))
    val base = tri.where(col("w") === 0)
      .select(col("cw").as("cw0"), col("users").as("n0"))
    val pts = tri.join(broadcast(base), col("cw") === col("cw0"))
      .where(col("w") > 0)
      .groupBy("w")
      .agg(sum(col("users")).as("act"), sum(col("n0")).as("cohort"))
      .withColumn("y", round(
        log(col("act").cast("double") / col("cohort").cast("double")) * 1e6, 0)
        .cast("long"))
    pts.agg(count(lit(1)).as("n"), sum(col("w")).as("sx"),
        sum(col("y")).as("sy"), sum(col("w") * col("w")).as("sxx"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * y")).as("sxy"))
      .select(col("n").as("n_weeks"),
        expr("""CAST((1000000 * (CAST(n AS DECIMAL(38,0))*sxy
                                 - CAST(sx AS DECIMAL(38,0))*sy))
                div (1000000 * (CAST(n AS DECIMAL(38,0))*sxx
                                - CAST(sx AS DECIMAL(38,0))*sx)) AS BIGINT)""")
          .as("lambda_u"))
      .withColumn("half_life_milliweeks", expr(
        "CASE WHEN lambda_u < 0 THEN (-693147 * 1000) div (-lambda_u) END"))
  }, Some("""
    WITH fw AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
                FROM events GROUP BY 1),
    aw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events),
    tri AS (
      SELECT cw, CAST(date_diff('day', cw, aw.aw)/7 AS BIGINT) AS w,
        CAST(count(DISTINCT user_id) AS BIGINT) AS users
      FROM fw JOIN aw USING (user_id) GROUP BY 1, 2),
    base AS (SELECT cw AS cw0, users AS n0 FROM tri WHERE w = 0),
    pts AS (
      SELECT w, CAST(round(ln(CAST(sum(users) AS DOUBLE)
          / CAST(sum(n0) AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y
      FROM tri JOIN base ON cw = cw0 WHERE w > 0 GROUP BY w),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(w) AS BIGINT) AS sx,
        CAST(sum(y) AS BIGINT) AS sy, CAST(sum(w*w) AS BIGINT) AS sxx,
        CAST(sum(CAST(w AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM pts)
    SELECT n AS n_weeks,
      CAST((1000000 * (CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy))
           // (1000000 * (CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx))
        AS BIGINT) AS lambda_u,
      CASE WHEN (1000000 * (CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy))
                // (1000000 * (CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx))
                < 0
        THEN CAST((-693147 * 1000)
             // (-((1000000 * (CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy))
                   // (1000000 * (CAST(n AS HUGEINT)*sxx
                                 - CAST(sx AS HUGEINT)*sx))))
             AS BIGINT) END AS half_life_milliweeks
    FROM m
  """))
}
