package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Num._

/** SURVEY §2.6 series-indexing and marketing-science wave: SAX
  * symbolization (the time-series indexing primitive — turn a revenue
  * series into a short string so motif/similarity search becomes
  * string work) and Markov removal-effect attribution (the
  * model-based successor of the positional attribution in
  * q_attribution / q_first_touch).
  *
  * Numeric rule: exact integer cents/ppm, equi-depth symbols from
  * ntile over a uniquely tie-broken order (the q_window_suite
  * convention), one truncating division per emitted rate.
  */
object SeriesQueries {

  /** SAX (Symbolic Aggregate approXimation) of each event type's
    * revenue series: the daily cents series is piecewise-aggregated
    * into calendar weeks (PAA — fixed absolute 7-day windows,
    * epoch_day div 7, so both engines bucket identically with no
    * data-dependent anchor), each week's total is mapped to one of 4
    * equi-depth symbols a–d (ntile over the per-type (paa, week)
    * order — empirical breakpoints instead of the classic Gaussian
    * ones, which keeps the alphabet integer-exact and
    * distribution-free), and the per-type SAX WORD plus its most
    * frequent length-3 motif fall out as string aggregations.
    * This is how a 100 TB metric store indexes millions of series for
    * motif/novelty search: the symbol string is ~50 bytes per
    * series-year, and similar weeks collide on equal substrings.
    *
    * Scale shape: (type, day) preagg → (type, week) preagg (both
    * map-side combined, volume collapses at the first); the ntile and
    * motif windows partition per type over CALENDAR-bounded rows
    * (≤ 53/yr); the argmax per type is a rank-1 filter with a unique
    * (count desc, motif asc) tie-break. */
  private val qSax = BoundQuery("q_sax", (s, d) => {
    val weekly = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))
      .groupBy(col("event_type"), expr("unix_date(day) div 7").as("wk"))
      .agg(sum(col("y")).as("paa"))
    val sym = weekly
      .withColumn("q",
        ntile(4).over(Window.partitionBy("event_type").orderBy("paa", "wk"))
          .cast("long"))
      .withColumn("sym", expr("chr(96 + q)"))
    val word = sym.groupBy("event_type")
      .agg(count(lit(1)).as("n_weeks"),
        expr("""array_join(transform(array_sort(collect_list(struct(wk, sym))),
                                     x -> x.sym), '')""").as("sax_word"))
    val wSeq = Window.partitionBy("event_type").orderBy("wk")
    val motifs = sym
      .withColumn("m", concat(col("sym"),
        lead(col("sym"), 1).over(wSeq), lead(col("sym"), 2).over(wSeq)))
      .where(col("m").isNotNull)
      .groupBy(col("event_type"), col("m"))
      .agg(count(lit(1)).as("motif_n"))
      .withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("motif_n").desc, col("m"))))
      .where(col("rn") === 1)
      .select(col("event_type"), col("m").as("top_motif"), col("motif_n"))
    word.join(motifs, Seq("event_type"))
      .select("event_type", "n_weeks", "sax_word", "top_motif", "motif_n")
      .orderBy("event_type")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    weekly AS (
      SELECT event_type,
        CAST(day - DATE '1970-01-01' AS BIGINT) // 7 AS wk,
        CAST(sum(y) AS BIGINT) AS paa
      FROM daily GROUP BY 1, 2),
    sym AS (
      SELECT event_type, wk,
        chr(CAST(96 + ntile(4) OVER (PARTITION BY event_type
                                     ORDER BY paa, wk) AS INTEGER)) AS sym
      FROM weekly),
    word AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_weeks,
        string_agg(sym, '' ORDER BY wk) AS sax_word
      FROM sym GROUP BY 1),
    tri AS (
      SELECT event_type,
        sym || lead(sym, 1) OVER w || lead(sym, 2) OVER w AS m
      FROM sym WINDOW w AS (PARTITION BY event_type ORDER BY wk)),
    mc AS (
      SELECT event_type, m, CAST(count(*) AS BIGINT) AS motif_n
      FROM tri WHERE m IS NOT NULL GROUP BY 1, 2),
    top AS (
      SELECT event_type, m AS top_motif, motif_n,
        row_number() OVER (PARTITION BY event_type
                           ORDER BY motif_n DESC, m) AS rn
      FROM mc)
    SELECT w.event_type, n_weeks, sax_word, top_motif, motif_n
    FROM word w JOIN top t ON w.event_type = t.event_type AND t.rn = 1
    ORDER BY w.event_type
  """))

  /** Markov removal-effect attribution: how much of total conversion
    * does each channel (non-purchase event type) actually CARRY? For
    * each channel c, delete c from the first-order journey chain
    * (every transition into or out of c dies — users needing c to
    * reach purchase are lost, never re-routed) and recompute the
    * 6-step absorption probability from the empirical start
    * distribution. removal(c) = 1 − conv(−c)/conv(full); credit
    * shares normalize the removals. The causal upgrade of
    * q_attribution's position decay: a channel that only appears on
    * already-converting paths gets ~0 here even if it touches every
    * conversion.
    *
    * Machinery: q_absorption's ppm recurrence with the REMOVED
    * CHANNEL AS A DIMENSION — the (≤k²)-row transition table cross
    * joins the (k+1)-row removal list ('' = remove nothing, the
    * baseline) and all 6 unrolled rounds group by (rc, state), so one
    * pass of constant-size joins prices every ablation at once
    * instead of k+1 separate chain solves. Start mass on the removed
    * channel is dropped, not renormalized (those journeys die — the
    * standard removal-effect convention), which the left-join
    * coalesce encodes for free. Every probability is exact ppm with
    * one truncating division per state per round, replayed
    * term-for-term by the oracle's 6 CTE steps.
    *
    * Scale shape: ONE user-keyed lead window + the (type, type)
    * aggregation builds the chain (the only data-sized work, shared
    * with q_absorption); everything after is broadcast joins of
    * ≤(k+1)·k² rows — cost independent of |events|. */
  private val qMarkovAttribution = BoundQuery("q_markov_attribution", (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val ev = Tables.events(s, d)
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
    val bigrams = ev
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .where(col("nxt").isNotNull && col("event_type") =!= "purchase")
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n"))
    val outTotals = bigrams.groupBy("cur").agg(sum(col("n")).as("out_n"))
    val p = graft.util.CacheScope.persist(
      bigrams.join(broadcast(outTotals), "cur")
        .select(col("cur"), col("nxt"),
          expr("(1000000 * n) div out_n").as("p_ppm")))
    val rcs = p.select(col("cur").as("rc")).distinct()
      .unionAll(s.range(1).select(lit("").as("rc")))
    val prc = p.crossJoin(broadcast(rcs))
      .where(col("cur") =!= col("rc") && col("nxt") =!= col("rc"))
    val pAbs = prc.where(col("nxt") === "purchase")
      .select(col("rc"), col("cur").as("state"), col("p_ppm").as("p_hit"))
    val pTrans = prc.where(col("nxt") =!= "purchase")
    val states = p.select(col("cur").as("state")).distinct()
      .crossJoin(broadcast(rcs)).where(col("state") =!= col("rc"))
    var h = states.join(pAbs, Seq("rc", "state"), "left")
      .select(col("rc"), col("state"),
        coalesce(col("p_hit"), lit(0L)).as("h"))
    for (_ <- 2 to 6) {
      val sums = pTrans
        .join(h.select(col("rc"), col("state").as("nxt"), col("h")),
          Seq("rc", "nxt"))
        .groupBy(col("rc"), col("cur").as("state"))
        .agg(sum(col("p_ppm") * col("h")).as("sprod"))
      h = states.join(pAbs, Seq("rc", "state"), "left")
        .join(sums, Seq("rc", "state"), "left")
        .select(col("rc"), col("state"),
          (coalesce(col("p_hit"), lit(0L)) +
            expr("coalesce(sprod, 0L) div 1000000L")).as("h"))
    }
    val firstEv = ev
      .groupBy("user_id")
      .agg(min(struct(col("ts_us"), col("event_id"), col("event_type")))
        .as("f"))
      .select(col("f.event_type").as("state"))
      .where(col("state") =!= "purchase")
      .groupBy("state").agg(count(lit(1)).as("n0"))
    val p0 = firstEv.crossJoin(broadcast(
        firstEv.agg(sum(col("n0")).as("tot0"))))
      .select(col("state"), expr("(1000000 * n0) div tot0").as("p0_ppm"))
    val conv = p0.crossJoin(broadcast(rcs))
      .join(h, Seq("rc", "state"), "left")
      .groupBy("rc")
      .agg(expr("sum(p0_ppm * coalesce(h, 0L)) div 1000000L").as("conv_ppm"))
    val base = conv.where(col("rc") === "")
      .select(col("conv_ppm").as("conv_full_ppm"))
    val rem = conv.where(col("rc") =!= "")
      .crossJoin(broadcast(base))
      .select(col("rc").as("channel"), col("conv_full_ppm"),
        col("conv_ppm").as("conv_removed_ppm"),
        expr("1000000 - (1000000 * conv_ppm) div conv_full_ppm")
          .as("removal_ppm"))
    val totRem = rem.agg(sum(col("removal_ppm")).as("sum_rem"))
    rem.crossJoin(broadcast(totRem))
      .select(col("channel"), col("conv_full_ppm"), col("conv_removed_ppm"),
        col("removal_ppm"),
        expr("(1000000 * removal_ppm) div sum_rem").as("share_ppm"))
      .orderBy("channel")
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
    rcs AS (SELECT DISTINCT cur AS rc FROM p UNION ALL SELECT ''),
    prc AS (SELECT rc, cur, nxt, p_ppm FROM p CROSS JOIN rcs
            WHERE cur <> rc AND nxt <> rc),
    pabs AS (SELECT rc, cur AS state, p_ppm AS p_hit
             FROM prc WHERE nxt = 'purchase'),
    ptr AS (SELECT rc, cur, nxt, p_ppm FROM prc WHERE nxt <> 'purchase'),
    states AS (SELECT rc, state FROM (SELECT DISTINCT cur AS state FROM p)
               CROSS JOIN rcs WHERE state <> rc),
    h1 AS (SELECT s.rc, s.state, coalesce(p_hit, 0) AS h
           FROM states s LEFT JOIN pabs USING (rc, state)),
    h2 AS (SELECT s.rc, s.state,
             coalesce(p_hit, 0) + coalesce(sp.sprod, 0) // 1000000 AS h
           FROM states s LEFT JOIN pabs USING (rc, state)
           LEFT JOIN (SELECT ptr.rc, cur AS state, sum(p_ppm * h1.h) AS sprod
                      FROM ptr JOIN h1 ON ptr.rc = h1.rc AND ptr.nxt = h1.state
                      GROUP BY 1, 2) sp USING (rc, state)),
    h3 AS (SELECT s.rc, s.state,
             coalesce(p_hit, 0) + coalesce(sp.sprod, 0) // 1000000 AS h
           FROM states s LEFT JOIN pabs USING (rc, state)
           LEFT JOIN (SELECT ptr.rc, cur AS state, sum(p_ppm * h2.h) AS sprod
                      FROM ptr JOIN h2 ON ptr.rc = h2.rc AND ptr.nxt = h2.state
                      GROUP BY 1, 2) sp USING (rc, state)),
    h4 AS (SELECT s.rc, s.state,
             coalesce(p_hit, 0) + coalesce(sp.sprod, 0) // 1000000 AS h
           FROM states s LEFT JOIN pabs USING (rc, state)
           LEFT JOIN (SELECT ptr.rc, cur AS state, sum(p_ppm * h3.h) AS sprod
                      FROM ptr JOIN h3 ON ptr.rc = h3.rc AND ptr.nxt = h3.state
                      GROUP BY 1, 2) sp USING (rc, state)),
    h5 AS (SELECT s.rc, s.state,
             coalesce(p_hit, 0) + coalesce(sp.sprod, 0) // 1000000 AS h
           FROM states s LEFT JOIN pabs USING (rc, state)
           LEFT JOIN (SELECT ptr.rc, cur AS state, sum(p_ppm * h4.h) AS sprod
                      FROM ptr JOIN h4 ON ptr.rc = h4.rc AND ptr.nxt = h4.state
                      GROUP BY 1, 2) sp USING (rc, state)),
    h6 AS (SELECT s.rc, s.state,
             coalesce(p_hit, 0) + coalesce(sp.sprod, 0) // 1000000 AS h
           FROM states s LEFT JOIN pabs USING (rc, state)
           LEFT JOIN (SELECT ptr.rc, cur AS state, sum(p_ppm * h5.h) AS sprod
                      FROM ptr JOIN h5 ON ptr.rc = h5.rc AND ptr.nxt = h5.state
                      GROUP BY 1, 2) sp USING (rc, state)),
    fe AS (
      SELECT user_id, arg_min(event_type,
        printf('%020d%020d', epoch_us(ts), event_id)) AS state
      FROM events GROUP BY 1),
    p0c AS (SELECT state, CAST(count(*) AS BIGINT) AS n0 FROM fe
            WHERE state <> 'purchase' GROUP BY 1),
    p0 AS (SELECT state, (1000000 * n0) // (SELECT sum(n0) FROM p0c) AS p0_ppm
           FROM p0c),
    conv AS (
      SELECT rc, sum(p0_ppm * coalesce(h, 0)) // 1000000 AS conv_ppm
      FROM p0 CROSS JOIN rcs
      LEFT JOIN h6 USING (rc, state)
      GROUP BY rc),
    base AS (SELECT conv_ppm AS conv_full_ppm FROM conv WHERE rc = ''),
    rem AS (
      SELECT rc AS channel, conv_full_ppm, conv_ppm AS conv_removed_ppm,
        1000000 - (1000000 * conv_ppm) // conv_full_ppm AS removal_ppm
      FROM conv CROSS JOIN base WHERE rc <> ''),
    tr AS (SELECT sum(removal_ppm) AS sum_rem FROM rem)
    SELECT channel, CAST(conv_full_ppm AS BIGINT) AS conv_full_ppm,
      CAST(conv_removed_ppm AS BIGINT) AS conv_removed_ppm,
      CAST(removal_ppm AS BIGINT) AS removal_ppm,
      CAST((1000000 * removal_ppm) // sum_rem AS BIGINT) AS share_ppm
    FROM rem CROSS JOIN tr ORDER BY channel
  """))

  /** Pairwise Granger causality over the event-type daily-revenue
    * panel: for every ordered pair (cause, effect), does yesterday's
    * CAUSE revenue improve today's EFFECT forecast beyond the
    * effect's own lag? F-test of the nested OLS pair
    *   restricted:    wₜ = a + b·uₜ₋₁          (u = effect's lag)
    *   unrestricted:  wₜ = a + b·uₜ₋₁ + c·vₜ₋₁ (v = cause's lag)
    * with F = (RSS_r − RSS_u)·(n−3)/RSS_u (one restriction).
    *
    * Numeric path: all ten power/cross sums are EXACT decimal(38,0)
    * over cents; the centered forms C__ = n·S__ − S_·S_ stay exact
    * decimal (~10²² at sf1); the final RSS quotients — whose cleared
    * forms (C-products of degree 3) would pass decimal(38) — are the
    * pinned-structure double tree of the q_jarque_bera convention.
    * The common n-scale of the centered forms cancels inside F, and
    * r2_gain = (RSS_r−RSS_u)/Cww reads the same quotient as share of
    * effect variance.
    *
    * Scale shape: the (type,day) preagg collapses volume; the lag
    * alignment is a calendar-keyed self-join (≤366·k rows); the k²−k
    * pair fan-out is a k-row broadcast cross; one partial-agg
    * reduction to 20 rows does everything else. */
  private val qGranger = BoundQuery("q_granger", (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sumCents(col("value")).as("y"))
    val eff = daily.select(col("event_type").as("te"), col("day"),
      col("y").as("w"))
    val lagE = daily.select(col("event_type").as("te"),
      date_add(col("day"), 1).as("day"), col("y").as("u"))
    val lagC = daily.select(col("event_type").as("tc"),
      date_add(col("day"), 1).as("day"), col("y").as("v"))
    val rows = eff.join(lagE, Seq("te", "day"))
      .join(lagC, Seq("day")).where(col("tc") =!= col("te"))
    val m = rows.groupBy(col("tc").as("cause"), col("te").as("effect"))
      .agg(count(lit(1)).as("n"),
        sum(col("u")).as("su"), sum(col("v")).as("sv"), sum(col("w")).as("sw"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * u")).as("suu"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("svv"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * w")).as("sww"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * v")).as("suv"),
        sum(expr("CAST(u AS DECIMAL(38,0)) * w")).as("suw"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * w")).as("svw"))
    val c = m.select(col("cause"), col("effect"), col("n"),
      expr("CAST(n AS DECIMAL(38,0))*suu - CAST(su AS DECIMAL(38,0))*su").cast("double").as("cuu"),
      expr("CAST(n AS DECIMAL(38,0))*svv - CAST(sv AS DECIMAL(38,0))*sv").cast("double").as("cvv"),
      expr("CAST(n AS DECIMAL(38,0))*sww - CAST(sw AS DECIMAL(38,0))*sw").cast("double").as("cww"),
      expr("CAST(n AS DECIMAL(38,0))*suv - CAST(su AS DECIMAL(38,0))*sv").cast("double").as("cuv"),
      expr("CAST(n AS DECIMAL(38,0))*suw - CAST(su AS DECIMAL(38,0))*sw").cast("double").as("cuw"),
      expr("CAST(n AS DECIMAL(38,0))*svw - CAST(sv AS DECIMAL(38,0))*sw").cast("double").as("cvw"))
    c.select(col("cause"), col("effect"), col("n").as("n_obs"),
        (col("cww") - col("cuw") * col("cuw") / col("cuu")).as("rssr"),
        (col("cww") -
          ((col("cvv") * col("cuw") - col("cuv") * col("cvw")) * col("cuw")
            + (col("cuu") * col("cvw") - col("cuv") * col("cuw")) * col("cvw"))
          / (col("cuu") * col("cvv") - col("cuv") * col("cuv"))).as("rssu"),
        col("cww"))
      .select(col("cause"), col("effect"), col("n_obs"),
        ((col("rssr") - col("rssu")) * (col("n_obs").cast("double") - lit(3.0))
          / col("rssu")).as("f_stat"),
        ((col("rssr") - col("rssu")) / col("cww")).as("r2_gain"))
      .orderBy("cause", "effect")
  }, Some("""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    rows_ AS (
      SELECT lc.event_type AS tc, e.event_type AS te,
        e.y AS w, le.y AS u, lc.y AS v
      FROM daily e
      JOIN daily le ON le.event_type = e.event_type AND le.day + 1 = e.day
      JOIN daily lc ON lc.day + 1 = e.day AND lc.event_type <> e.event_type),
    m AS (
      SELECT tc AS cause, te AS effect, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(u) AS HUGEINT) AS su, CAST(sum(v) AS HUGEINT) AS sv,
        CAST(sum(w) AS HUGEINT) AS sw,
        sum(CAST(u AS HUGEINT)*u) AS suu, sum(CAST(v AS HUGEINT)*v) AS svv,
        sum(CAST(w AS HUGEINT)*w) AS sww, sum(CAST(u AS HUGEINT)*v) AS suv,
        sum(CAST(u AS HUGEINT)*w) AS suw, sum(CAST(v AS HUGEINT)*w) AS svw
      FROM rows_ GROUP BY 1, 2),
    c AS (
      SELECT cause, effect, n,
        CAST(CAST(n AS HUGEINT)*suu - CAST(su AS HUGEINT)*su AS DOUBLE) AS cuu,
        CAST(CAST(n AS HUGEINT)*svv - CAST(sv AS HUGEINT)*sv AS DOUBLE) AS cvv,
        CAST(CAST(n AS HUGEINT)*sww - CAST(sw AS HUGEINT)*sw AS DOUBLE) AS cww,
        CAST(CAST(n AS HUGEINT)*suv - CAST(su AS HUGEINT)*sv AS DOUBLE) AS cuv,
        CAST(CAST(n AS HUGEINT)*suw - CAST(su AS HUGEINT)*sw AS DOUBLE) AS cuw,
        CAST(CAST(n AS HUGEINT)*svw - CAST(sv AS HUGEINT)*sw AS DOUBLE) AS cvw
      FROM m),
    r AS (
      SELECT cause, effect, n AS n_obs,
        cww - cuw * cuw / cuu AS rssr,
        cww - ((cvv * cuw - cuv * cvw) * cuw
               + (cuu * cvw - cuv * cuw) * cvw)
              / (cuu * cvv - cuv * cuv) AS rssu,
        cww
      FROM c)
    SELECT cause, effect, n_obs,
      (rssr - rssu) * (CAST(n_obs AS DOUBLE) - 3.0) / rssu AS f_stat,
      (rssr - rssu) / cww AS r2_gain
    FROM r ORDER BY cause, effect
  """))

  val all: Seq[BoundQuery] = Seq(qSax, qMarkovAttribution, qGranger)
}
