package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions.tokens

/** SURVEY §2.4 late-round-3 wave: distribution-drift and
  * information-theoretic corpus telemetry — the monitoring layer a
  * training-data pipeline runs between ingestion waves (did the new
  * crawl shift the length distribution? did a source's language mix
  * collapse? is the token distribution still Zipfian?).
  *
  * Every log-term follows the q_bigram_lm micro-nat rule: round each
  * ln to integer micro-nats BEFORE summing, so all aggregation is
  * exact long arithmetic in any order on any engine, and every query
  * here carries a FULL DuckDB oracle.
  */
object DriftQueries {

  /** Population Stability Index between the md5 train and test splits
    * (the q_train_split rule), over fixed-width n_chars bins.
    * Laplace-smoothed shares keep every ln finite; per-bin PSI terms
    * are emitted as rows (their exact-long sum is the total PSI —
    * DriftSpec pins it). One scan + a broadcast of the 2-row totals. */
  private val qPsiDrift = BoundQuery("q_psi_drift", (s, d) => {
    val h = substring(md5(col("text")), 1, 2)
    val binned = Tables.documents(s, d)
      .withColumn("split",
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test"))
      .where(col("split") =!= "val")
      .withColumn("bin", least(floor(col("n_chars") / lit(100)), lit(9)).cast("long"))
      .groupBy("bin")
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    val totals = binned.agg(sum(col("n_train")).as("tot_train"),
      sum(col("n_test")).as("tot_test"))
    binned.crossJoin(broadcast(totals))
      .withColumn("p_train",
        (col("n_train") + 1).cast("double") / (col("tot_train") + 10).cast("double"))
      .withColumn("p_test",
        (col("n_test") + 1).cast("double") / (col("tot_test") + 10).cast("double"))
      .withColumn("psi_u",
        round((col("p_test") - col("p_train")) * log(col("p_test") / col("p_train")) * 1e6, 0)
          .cast("long"))
      .select(col("bin"), col("n_train"), col("n_test"),
        round(col("psi_u").cast("double") / 1e6, 6).as("psi_term"))
      .orderBy("bin")
  }, Some("""
    WITH binned AS (
      SELECT least(CAST(floor(n_chars / 100) AS BIGINT), 9) AS bin,
        CAST(sum(CASE WHEN substr(md5(text),1,2) < 'cc' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        CAST(sum(CASE WHEN substr(md5(text),1,2) >= 'e6' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
      FROM documents
      WHERE substr(md5(text),1,2) < 'cc' OR substr(md5(text),1,2) >= 'e6'
      GROUP BY 1),
    tot AS (SELECT sum(n_train) AS tot_train, sum(n_test) AS tot_test FROM binned)
    SELECT bin, n_train, n_test,
      round(CAST(CAST(round(
        (CAST(n_test+1 AS DOUBLE)/CAST(tot_test+10 AS DOUBLE)
          - CAST(n_train+1 AS DOUBLE)/CAST(tot_train+10 AS DOUBLE))
        * ln((CAST(n_test+1 AS DOUBLE)/CAST(tot_test+10 AS DOUBLE))
           / (CAST(n_train+1 AS DOUBLE)/CAST(tot_train+10 AS DOUBLE))) * 1e6, 0) AS BIGINT)
        AS DOUBLE) / 1e6, 6) AS psi_term
    FROM binned CROSS JOIN tot ORDER BY bin
  """))

  /** Per-source language-mix diversity: Simpson index from EXACT
    * integer arithmetic (sum c·(c−1) over N·(N−1), one final
    * division) and Shannon entropy in micro-nats. The per-source
    * totals come from a window partitioned by source — the same hash
    * partitioning the final groupBy needs, so no extra shuffle. */
  private val qDiversity = BoundQuery("q_diversity", (s, d) => {
    val counts = Tables.documents(s, d)
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("source")
    counts
      .withColumn("n", sum(col("c")).over(w))
      .withColumn("ent_u",
        round((col("c").cast("double") / col("n").cast("double")) *
          log(col("c").cast("double") / col("n").cast("double")) * -1e6, 0).cast("long"))
      .groupBy("source")
      .agg(max(col("n")).as("n_docs"),
        count(lit(1)).as("n_langs"),
        sum(col("c") * (col("c") - 1)).as("simp_num"),
        sum(col("ent_u")).as("ent_sum"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        round(col("simp_num").cast("double") /
          (col("n_docs") * (col("n_docs") - 1)).cast("double"), 6).as("simpson"),
        round(col("ent_sum").cast("double") / 1e6, 6).as("entropy"))
      .orderBy("source")
  }, Some("""
    WITH counts AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    withn AS (
      SELECT source, lang, c, sum(c) OVER (PARTITION BY source) AS n
      FROM counts),
    terms AS (
      SELECT source, c, n,
        CAST(round((CAST(c AS DOUBLE)/CAST(n AS DOUBLE)) *
          ln(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)) * -1e6, 0) AS BIGINT) AS ent_u
      FROM withn)
    SELECT source, CAST(max(n) AS BIGINT) AS n_docs, CAST(count(*) AS BIGINT) AS n_langs,
      round(CAST(sum(c*(c-1)) AS DOUBLE) / CAST(max(n)*(max(n)-1) AS DOUBLE), 6) AS simpson,
      round(CAST(sum(ent_u) AS DOUBLE) / 1e6, 6) AS entropy
    FROM terms GROUP BY source ORDER BY source
  """))

  /** Per-document token-distribution entropy — the "is this document
    * degenerate repetition?" quality signal (a 200-token doc of one
    * word has entropy 0; Gopher-class filters cut on exactly this).
    * The low-entropy flag compares the EXACT micro-nat long, not the
    * rounded double, so the cut is engine-invariant. */
  private val qEntropyFilter = BoundQuery("q_entropy_filter", (s, d) => {
    val w = Window.partitionBy("doc_id")
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(w))
      .withColumn("ent_u",
        round((col("c").cast("double") / col("n").cast("double")) *
          log(col("c").cast("double") / col("n").cast("double")) * -1e6, 0).cast("long"))
      .groupBy("doc_id")
      .agg(max(col("n")).as("n_tokens"),
        sum(col("ent_u")).as("ent_sum"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("ent_sum").cast("double") / 1e6, 6).as("entropy"),
        (col("ent_sum") < 2500000L).as("is_low_entropy"))
      .orderBy("doc_id")
  }, Some("""
    WITH counts AS (
      SELECT doc_id, t.token AS token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id,
              unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
            FROM documents) t
      GROUP BY 1, 2),
    withn AS (
      SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n
      FROM counts),
    terms AS (
      SELECT doc_id, c, n,
        CAST(round((CAST(c AS DOUBLE)/CAST(n AS DOUBLE)) *
          ln(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)) * -1e6, 0) AS BIGINT) AS ent_u
      FROM withn)
    SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
      round(CAST(sum(ent_u) AS DOUBLE) / 1e6, 6) AS entropy,
      sum(ent_u) < 2500000 AS is_low_entropy
    FROM terms GROUP BY doc_id ORDER BY doc_id
  """))

  /** Zipf-law audit: least-squares slope of ln(freq) on ln(rank) over
    * the top-100 corpus tokens. Natural text sits near slope −1;
    * synthetic or templated corpora flatten. Ranks come from a
    * TakeOrderedAndProject top-k (scale-safe); the rank window then
    * runs over exactly 100 rows — the documented bounded-input
    * contract. All regression moments are exact-long sums of micro-nat
    * products (≤ 2^60), divided once at the end. */
  private val qZipf = BoundQuery("q_zipf", (s, d) => {
    val top = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token")).limit(100)
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(desc("freq"), asc("token"))).cast("long"))
    val moments = ranked
      .withColumn("x_u", round(log(col("rank").cast("double")) * 1e6, 0).cast("long"))
      .withColumn("y_u", round(log(col("freq").cast("double")) * 1e6, 0).cast("long"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x_u")).as("sx"), sum(col("y_u")).as("sy"),
        sum(col("x_u") * col("y_u")).as("sxy"),
        sum(col("x_u") * col("x_u")).as("sxx"))
    moments.select(col("n_terms"),
      round((col("n_terms") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n_terms") * col("sxx") - col("sx") * col("sx")).cast("double"), 6).as("slope"),
      round(((col("sy").cast("double") -
        ((col("n_terms") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n_terms") * col("sxx") - col("sx") * col("sx")).cast("double"))
          * col("sx").cast("double")) / col("n_terms").cast("double")) / 1e6, 6).as("intercept"))
  }, Some("""
    WITH tf AS (
      SELECT t.token AS token, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
            FROM documents) t
      GROUP BY 1 ORDER BY freq DESC, token LIMIT 100),
    ranked AS (
      SELECT freq,
        CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank
      FROM tf),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_terms,
        sum(CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6, 0) AS BIGINT)) AS sx,
        sum(CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6, 0) AS BIGINT)) AS sy,
        sum(CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6, 0) AS BIGINT)
          * CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6, 0) AS BIGINT)) AS sxy,
        sum(CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6, 0) AS BIGINT)
          * CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6, 0) AS BIGINT)) AS sxx
      FROM ranked)
    SELECT n_terms,
      round(CAST(n_terms*sxy - sx*sy AS DOUBLE) / CAST(n_terms*sxx - sx*sx AS DOUBLE), 6) AS slope,
      round((CAST(sy AS DOUBLE) -
        (CAST(n_terms*sxy - sx*sy AS DOUBLE) / CAST(n_terms*sxx - sx*sx AS DOUBLE))
          * CAST(sx AS DOUBLE)) / CAST(n_terms AS DOUBLE) / 1e6, 6) AS intercept
    FROM m
  """))

  /** Differential-privacy-SHAPED release of per-type event counts:
    * Laplace(1/ε) noise via the inverse CDF applied to a uniform
    * DERIVED FROM A SEEDED HASH of the group key — deterministic by
    * construction, so the whole mechanism (uniform, ln, noise,
    * release) replays in the oracle and the plumbing is testable.
    * DISCLOSED LIMITATION: real DP requires secret, fresh randomness;
    * a keyed-hash uniform gives the release pipeline's shape (noise
    * scale, post-processing, integer rounding) without the privacy
    * guarantee — swap the uniform for a secure RNG in production.
    * The hash uniform is the rollingFingerprint fold over
    * md5(key||salt) hex — pure arithmetic on both engines. */
  private val qDpRelease = BoundQuery("q_dp_release", (s, d) => {
    val eps = 1.0
    // (fold + 0.5)/2^20 ∈ (0,1) strictly — the half-step keeps the
    // uniform off both endpoints so ln(1-2|u|) can never hit ln(0)
    val u = (aggregate(split(substring(md5(concat(col("event_type"), lit("|dp-salt-1"))), 1, 8), ""),
        lit(0L), (acc, ch) => pmod(acc * lit(31L) + ascii(ch), lit(1048576L)))
        .cast("double") + lit(0.5)) / lit(1048576.0) - lit(0.5)
    Tables.events(s, d)
      .groupBy("event_type").agg(count(lit(1)).as("n_true"))
      .withColumn("u", u)
      .withColumn("noise",
        round(lit(-1.0 / eps) * signum(col("u")) *
          log(lit(1.0) - lit(2.0) * abs(col("u"))), 6))
      .select(col("event_type"), col("n_true"),
        col("noise"),
        (col("n_true") + round(col("noise"), 0).cast("long")).as("n_released"))
      .orderBy("event_type")
  }, Some("""
    WITH g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_true FROM events GROUP BY 1),
    uu AS (
      SELECT event_type, n_true,
        (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, 9),
              i -> CAST(ascii(substring(md5(event_type || '|dp-salt-1'), i, 1)) AS BIGINT))),
            (a, c) -> (a*31 + c) % 1048576) AS DOUBLE) + 0.5) / 1048576.0 - 0.5 AS u
      FROM g),
    noised AS (
      SELECT event_type, n_true,
        round(-1.0 * sign(u) * ln(1.0 - 2.0*abs(u)), 6) AS noise
      FROM uu)
    SELECT event_type, n_true, noise,
      n_true + CAST(round(noise, 0) AS BIGINT) AS n_released
    FROM noised ORDER BY event_type
  """))

  /** Mutual information between source and language in micro-nats —
    * the single number that says whether the corpus mix confounds the
    * two (MI = 0 ⇒ balanced-by-design; high MI ⇒ per-source langid
    * priors leak into any source-conditioned model). Per-cell terms
    * p_ij·ln(p_ij·N / (r_i·c_j)) round to integer micro-nats BEFORE
    * the sum (the q_pmi_collocations convention), so the total is an
    * exact long sum — partition- and engine-invariant. MI of the
    * margins' entropies also emitted for the normalized readout
    * downstream (NMI = mi / min(H_src, H_lang), computed by the
    * consumer to keep every column exact).
    *
    * Scale shape: one (source, lang) contingency partial agg; margins
    * broadcast back; all post-scan work on ≤ |src|·|langs| rows. */
  private val qMutualInfo = BoundQuery("q_mutual_info", (s, d) => {
    val cells = Tables.documents(s, d)
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val rm = cells.groupBy("source").agg(sum(col("c")).as("r"))
    val cm = cells.groupBy("lang").agg(sum(col("c")).as("m"))
    val n = cells.agg(sum(col("c")).as("n"))
    val terms = cells.join(broadcast(rm), "source").join(broadcast(cm), "lang")
      .crossJoin(broadcast(n))
      .select(
        round((col("c").cast("double") / col("n").cast("double")) *
          log(col("c").cast("double") * col("n").cast("double") /
            (col("r").cast("double") * col("m").cast("double"))) * 1e6, 0)
          .cast("long").as("term_u"),
        col("c"))
    val hs = rm.crossJoin(broadcast(n))
      .select(round((col("r").cast("double") / col("n").cast("double")) *
        log(col("r").cast("double") / col("n").cast("double")) * -1e6, 0)
        .cast("long").as("h_u"))
      .agg(sum(col("h_u")).as("h_source_u"))
    val hl = cm.crossJoin(broadcast(n))
      .select(round((col("m").cast("double") / col("n").cast("double")) *
        log(col("m").cast("double") / col("n").cast("double")) * -1e6, 0)
        .cast("long").as("h_u"))
      .agg(sum(col("h_u")).as("h_lang_u"))
    terms.agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_cells"),
        sum(col("term_u")).as("mi_micro_nats"))
      .crossJoin(broadcast(hs)).crossJoin(broadcast(hl))
  }, Some("""
    WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
                   FROM documents GROUP BY source, lang),
    rm AS (SELECT source, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY source),
    cm AS (SELECT lang, CAST(sum(c) AS BIGINT) AS m FROM cells GROUP BY lang),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT CAST(round((CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
               ln(CAST(c AS DOUBLE) * CAST(n.n AS DOUBLE) /
                  (CAST(r AS DOUBLE) * CAST(m AS DOUBLE))) * 1e6, 0) AS BIGINT)
          AS term_u,
        c
      FROM cells JOIN rm USING (source) JOIN cm USING (lang) CROSS JOIN n),
    hs AS (SELECT CAST(sum(CAST(round((CAST(r AS DOUBLE) / CAST(n.n AS DOUBLE)) *
                 ln(CAST(r AS DOUBLE) / CAST(n.n AS DOUBLE)) * -1e6, 0) AS BIGINT))
               AS BIGINT) AS h_source_u
           FROM rm CROSS JOIN n),
    hl AS (SELECT CAST(sum(CAST(round((CAST(m AS DOUBLE) / CAST(n.n AS DOUBLE)) *
                 ln(CAST(m AS DOUBLE) / CAST(n.n AS DOUBLE)) * -1e6, 0) AS BIGINT))
               AS BIGINT) AS h_lang_u
           FROM cm CROSS JOIN n)
    SELECT CAST(sum(c) AS BIGINT) AS n_docs,
      CAST(count(*) AS BIGINT) AS n_cells,
      CAST(sum(term_u) AS BIGINT) AS mi_micro_nats,
      h_source_u, h_lang_u
    FROM terms CROSS JOIN hs CROSS JOIN hl
    GROUP BY h_source_u, h_lang_u
  """))

  /** Behavioral-mix entropy trend: each day's Shannon entropy of the
    * event-type mix via the count identity H = ln(n) − (Σc·ln c)/n —
    * micro-rounded ln per distinct count, exact weighted sums, one
    * truncating division per day — then the OLS slope of entropy on
    * the day index from exact moments. A negative slope means user
    * behavior is CONCENTRATING into fewer event types (the drift
    * q_psi_drift scores pairwise, read as one trend number). */
  private val qMixEntropyTrend = BoundQuery("q_mix_entropy_trend", (s, d) => {
    val counts = Tables.events(s, d)
      .groupBy(expr("CAST(unix_date(to_date(ts)) AS LONG)").as("ud"),
        col("event_type"))
      .agg(count(lit(1)).as("c"))
    val hDaily = graft.util.CacheScope.persist(counts
      .groupBy("ud")
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("decimal(38,0)") *
          expr("CAST(round(ln(CAST(c AS DOUBLE)) * 1000000, 0) AS DECIMAL(38,0))"))
          .as("sterm"))
      .select(col("ud"),
        (expr("CAST(round(ln(CAST(n AS DOUBLE)) * 1000000, 0) AS LONG)") -
          expr("CAST(sterm div n AS LONG)")).as("h")))
    val d0 = hDaily.agg(min(col("ud")).as("d0"))
    hDaily.crossJoin(broadcast(d0))
      .select((col("ud") - col("d0")).cast("decimal(38,0)").as("x"),
        col("h").cast("decimal(38,0)").as("y"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n").cast("long").as("n_days"),
        expr("CAST(sy div n AS BIGINT)").as("mean_entropy_micronats"),
        round(expr("CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)"), 6)
          .as("slope_micronats_per_day"))
  }, Some("""
    WITH counts AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ud,
        event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    hd AS (
      SELECT ud,
        CAST(round(ln(CAST(sum(c) AS DOUBLE)) * 1000000, 0) AS BIGINT)
          - CAST(sum(CAST(c AS HUGEINT) *
              CAST(round(ln(CAST(c AS DOUBLE)) * 1000000, 0) AS HUGEINT))
            // sum(c) AS BIGINT) AS h
      FROM counts GROUP BY 1),
    d0 AS (SELECT min(ud) AS d0 FROM hd),
    xy AS (SELECT CAST(ud - d0 AS HUGEINT) AS x, CAST(h AS HUGEINT) AS y
           FROM hd, d0),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
        sum(x*x) AS sxx, sum(x*y) AS sxy
      FROM xy)
    SELECT CAST(n AS BIGINT) AS n_days,
      CAST(sy // n AS BIGINT) AS mean_entropy_micronats,
      round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 6)
        AS slope_micronats_per_day
    FROM m
  """))

  /** Directed KL drift of the brand revenue-share mix, 1997→1998 —
    * the asymmetric companions to q_js_divergence/q_psi_drift: per
    * brand the forward term p₉₈·ln(p₉₈/p₉₇) (surprise of the new mix
    * under the old) and the reverse term p₉₇·ln(p₉₇/p₉₈), Laplace
    * +1-smoothed over the brand count so a vanishing brand stays
    * finite. Counts are exact lineitem tallies off one broadcast-dim
    * scan pair; each term is ONE micro-nat rounding of an identical
    * double tree. Column sums give KL(P₉₈‖P₉₇) / KL(P₉₇‖P₉₈). */
  private val qKlDrift = BoundQuery("q_kl_drift", (s, d) => {
    val li = Tables.lineitem(s, d)
      .where(year(col("l_shipdate")).isin(1997, 1998))
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(when(year(col("l_shipdate")) === 1997, 1L).otherwise(0L)).as("n97"),
        sum(when(year(col("l_shipdate")) === 1998, 1L).otherwise(0L)).as("n98"))
    val tot = li.agg(sum(col("n97")).as("t97"), sum(col("n98")).as("t98"),
      count(lit(1)).as("nb"))
    li.crossJoin(broadcast(tot))
      .withColumn("p97",
        (col("n97") + 1).cast("double") / (col("t97") + col("nb")).cast("double"))
      .withColumn("p98",
        (col("n98") + 1).cast("double") / (col("t98") + col("nb")).cast("double"))
      .select(col("brand"), col("n97"), col("n98"),
        round(round(col("p98") * log(col("p98") / col("p97")) * 1e6, 0) / 1e6, 6)
          .as("kl_term"),
        round(round(col("p97") * log(col("p97") / col("p98")) * 1e6, 0) / 1e6, 6)
          .as("rkl_term"))
      .orderBy("brand")
  }, Some("""
    WITH b AS (
      SELECT p_brand AS brand,
        CAST(sum(CASE WHEN year(l_shipdate) = 1997 THEN 1 ELSE 0 END)
             AS BIGINT) AS n97,
        CAST(sum(CASE WHEN year(l_shipdate) = 1998 THEN 1 ELSE 0 END)
             AS BIGINT) AS n98
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE year(l_shipdate) IN (1997, 1998)
      GROUP BY 1),
    tot AS (SELECT CAST(sum(n97) AS BIGINT) AS t97,
                   CAST(sum(n98) AS BIGINT) AS t98,
                   CAST(count(*) AS BIGINT) AS nb FROM b),
    p AS (
      SELECT brand, n97, n98,
        CAST(n97 + 1 AS DOUBLE) / CAST(t97 + nb AS DOUBLE) AS p97,
        CAST(n98 + 1 AS DOUBLE) / CAST(t98 + nb AS DOUBLE) AS p98
      FROM b, tot)
    SELECT brand, n97, n98,
      round(CAST(CAST(round(p98 * ln(p98 / p97) * 1e6, 0) AS BIGINT)
            AS DOUBLE) / 1e6, 6) AS kl_term,
      round(CAST(CAST(round(p97 * ln(p97 / p98) * 1e6, 0) AS BIGINT)
            AS DOUBLE) / 1e6, 6) AS rkl_term
    FROM p ORDER BY brand
  """))

  val all: Seq[BoundQuery] = Seq(qPsiDrift, qDiversity, qEntropyFilter, qZipf,
    qDpRelease, qMutualInfo, qMixEntropyTrend, qKlDrift)
}
