package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions._

/** SURVEY §2.6 wave 37 — corpus-composition tooling: data-mixture
  * weight selection by divergence grid search (the DoReMi-lite
  * pre-flight), sentence-granularity duplication audit (Lee et al.
  * 2022 measure sentence-level dup before deduping doc-level), and a
  * PII-scrub effectiveness audit (the governance twin of q_pii_scrub:
  * prove the redaction regex leaves zero residue, per event type).
  */
object CorpusQueries5 {

  /** Mixture-weight grid search: approximate the full-corpus unigram
    * distribution (top-100 tokens) by a λ-blend of the two largest
    * sources' distributions, Jensen–Shannon divergence per
    * λ ∈ {0, 0.1, …, 1.0}, best λ flagged — the back-of-envelope
    * data-mixture optimizer (DoReMi's question at grid resolution).
    * All three distributions are ppm integers over the shared top-100
    * token set; each JS term rounds to µnats ONCE per (token, λ), so
    * the 11 sums are exact longs — identical on both engines.
    *
    * Scale shape: ONE corpus-scale token aggregation; everything
    * after operates on a 100-row frame × 11 grid points riding
    * broadcast joins in the same plan. */
  private val qMixOptimal = BoundQuery("q_mix_optimal", (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("c_all"))
      .orderBy(desc("c_all"), col("tok")).limit(100)
    val srcTop = toks.join(broadcast(top.select("tok")), "tok")
      .groupBy("source").agg(sum(lit(1L)).as("c_src"))
      .orderBy(desc("c_src"), col("source")).limit(2)
      .withColumn("which",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("c_src"), col("source"))))
    val perSrc = toks.join(broadcast(top.select("tok")), "tok")
      .join(broadcast(srcTop), "source")
      .groupBy(col("tok"), col("which"), col("c_src"))
      .agg(count(lit(1)).as("c"))
      .withColumn("p_ppm", expr("(1000000 * c) div c_src"))
    val tTot = top.agg(sum(col("c_all")).as("t_tot"))
    val grid = top.crossJoin(broadcast(tTot))
      .withColumn("t_ppm", expr("(1000000 * c_all) div t_tot"))
      .join(perSrc.where(col("which") === 1)
        .select(col("tok"), col("p_ppm").as("a_ppm")), Seq("tok"), "left")
      .join(perSrc.where(col("which") === 2)
        .select(col("tok"), col("p_ppm").as("b_ppm")), Seq("tok"), "left")
      .na.fill(0L, Seq("a_ppm", "b_ppm"))
      .select(col("tok"), col("t_ppm"), col("a_ppm"), col("b_ppm"),
        explode(sequence(lit(0), lit(10))).as("lam"))
      .withColumn("m_ppm", expr("(lam * a_ppm + (10 - lam) * b_ppm) div 10"))
      .withColumn("mid2_ppm", expr("t_ppm + m_ppm"))
      .withColumn("term_t", expr("""CAST(round(t_ppm * ln(
          2.0 * CAST(t_ppm AS DOUBLE) / CAST(mid2_ppm AS DOUBLE)), 0)
          AS BIGINT)"""))
      .withColumn("term_m", expr("""CASE WHEN m_ppm > 0
          THEN CAST(round(m_ppm * ln(
            2.0 * CAST(m_ppm AS DOUBLE) / CAST(mid2_ppm AS DOUBLE)), 0)
            AS BIGINT) ELSE 0 END"""))
    val js = grid.groupBy("lam")
      .agg(expr("sum(term_t + term_m) div 2").as("js_micro"))
    js.crossJoin(broadcast(js.agg(min(col("js_micro")).as("best"))))
      .select(col("lam").cast("long").as("lam_tenths"), col("js_micro"),
        (col("js_micro") === col("best")).as("is_best"))
      .orderBy("lam_tenths")
  }, Some("""
    WITH toks AS (
      SELECT source,
        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents),
    top AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c_all FROM toks
      GROUP BY tok ORDER BY c_all DESC, tok LIMIT 100),
    srctop AS (
      SELECT source, c_src,
        row_number() OVER (ORDER BY c_src DESC, source) AS which
      FROM (SELECT source, CAST(count(*) AS BIGINT) AS c_src
            FROM toks JOIN top USING (tok) GROUP BY source
            ORDER BY c_src DESC, source LIMIT 2)),
    persrc AS (
      SELECT tok, which,
        (1000000 * CAST(count(*) AS BIGINT)) // max(c_src) AS p_ppm
      FROM toks JOIN top USING (tok) JOIN srctop USING (source)
      GROUP BY tok, which),
    ttot AS (SELECT CAST(sum(c_all) AS BIGINT) AS t_tot FROM top),
    base AS (
      SELECT top.tok, (1000000 * c_all) // t_tot AS t_ppm,
        COALESCE(a.p_ppm, 0) AS a_ppm, COALESCE(b.p_ppm, 0) AS b_ppm
      FROM top CROSS JOIN ttot
      LEFT JOIN (SELECT tok, p_ppm FROM persrc WHERE which = 1) a
        ON a.tok = top.tok
      LEFT JOIN (SELECT tok, p_ppm FROM persrc WHERE which = 2) b
        ON b.tok = top.tok),
    grid AS (
      SELECT *, (lam * a_ppm + (10 - lam) * b_ppm) // 10 AS m_ppm
      FROM base CROSS JOIN (SELECT unnest(range(0, 11)) AS lam)),
    terms AS (
      SELECT lam,
        CAST(round(t_ppm * ln(2.0 * CAST(t_ppm AS DOUBLE)
          / CAST(t_ppm + m_ppm AS DOUBLE)), 0) AS BIGINT) AS term_t,
        CASE WHEN m_ppm > 0
          THEN CAST(round(m_ppm * ln(2.0 * CAST(m_ppm AS DOUBLE)
            / CAST(t_ppm + m_ppm AS DOUBLE)), 0) AS BIGINT)
          ELSE 0 END AS term_m
      FROM grid),
    js AS (
      SELECT lam, CAST(sum(term_t + term_m) AS BIGINT) // 2 AS js_micro
      FROM terms GROUP BY lam)
    SELECT CAST(lam AS BIGINT) AS lam_tenths, js_micro,
      js_micro = (SELECT min(js_micro) FROM js) AS is_best
    FROM js ORDER BY lam_tenths
  """))

  /** Sentence-granularity duplication audit: split documents into
    * sentences (period-space boundary, ≥ 20 chars), key each by md5,
    * and report per source the sentence count, distinct count,
    * duplication ppm, and how many of its distinct sentences also
    * appear in ANOTHER source — the measurement pass Lee et al. 2022
    * run before sentence-level dedup, and the cross-source column is
    * the template/boilerplate detector. Exact counts end-to-end.
    *
    * Scale shape: one explode + hash (md5 runs inside codegen), one
    * hash-keyed partial agg for the sentence table, one groupBy per
    * source — no self-join: the cross-source bit rides the same
    * sentence-grain aggregate. */
  private val qSentenceDedup = BoundQuery("q_sentence_dedup", (s, d) => {
    val sent = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), "\\. ")).as("sen"))
      .where(length(col("sen")) >= 20)
      .select(col("source"), md5(col("sen")).as("h"))
    val bySrcSent = sent.groupBy("source", "h").agg(count(lit(1)).as("n"))
    val nSrc = bySrcSent.groupBy("h")
      .agg(count(lit(1)).as("n_src"))
    bySrcSent.join(nSrc, "h")
      .groupBy("source")
      .agg(sum(col("n")).as("n_sentences"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("n_src") >= 2, 1L).otherwise(0L)).as("cross_src_shared"))
      .withColumn("dup_ppm",
        expr("(1000000 * (n_sentences - n_distinct)) div n_sentences"))
      .orderBy("source")
  }, Some("""
    WITH sent AS (
      SELECT source, md5(sen) AS h FROM (
        SELECT source, unnest(string_split(text, '. ')) AS sen
        FROM documents)
      WHERE length(sen) >= 20),
    bysrc AS (
      SELECT source, h, CAST(count(*) AS BIGINT) AS n
      FROM sent GROUP BY source, h),
    nsrc AS (SELECT h, CAST(count(*) AS BIGINT) AS n_src
             FROM bysrc GROUP BY h)
    SELECT source, CAST(sum(n) AS BIGINT) AS n_sentences,
      CAST(count(*) AS BIGINT) AS n_distinct,
      CAST(sum(CASE WHEN n_src >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        AS cross_src_shared,
      (1000000 * (CAST(sum(n) AS BIGINT) - CAST(count(*) AS BIGINT)))
        // CAST(sum(n) AS BIGINT) AS dup_ppm
    FROM bysrc JOIN nsrc USING (h)
    GROUP BY source ORDER BY source
  """))

  /** PII-scrub effectiveness audit — the governance proof that
    * q_pii_scrub's redaction leaves nothing behind: per event type,
    * rows carrying digit runs, total runs, the residual run count
    * AFTER applying the scrub expression (must be 0 — the audit's
    * guarantee), and coverage ppm. The audit applies the SAME
    * regexp_replace the scrub uses and re-scans its output, so a
    * pattern regression shows up as residual_runs > 0 here before it
    * ships. One scan, regexes inside codegen, k-row output. */
  private val qScrubAudit = BoundQuery("q_scrub_audit", (s, d) => {
    Tables.events(s, d)
      .select(col("event_type"),
        size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("long")
          .as("runs"),
        size(expr("""regexp_extract_all(
          regexp_replace(props, '[0-9]+', '#'), '[0-9]+', 0)"""))
          .cast("long").as("resid"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("runs") > 0, 1L).otherwise(0L)).as("rows_with_pii"),
        sum(col("runs")).as("pii_runs"),
        sum(col("resid")).as("residual_runs"))
      .withColumn("coverage_ppm",
        expr("(1000000 * rows_with_pii) div n_rows"))
      .orderBy("event_type")
  }, Some("""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
      CAST(sum(CASE WHEN len(regexp_extract_all(props, '[0-9]+')) > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_pii,
      CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
        AS pii_runs,
      CAST(sum(len(regexp_extract_all(
        regexp_replace(props, '[0-9]+', '#', 'g'), '[0-9]+'))) AS BIGINT)
        AS residual_runs,
      (1000000 * CAST(sum(CASE WHEN len(regexp_extract_all(props, '[0-9]+'))
                     > 0 THEN 1 ELSE 0 END) AS BIGINT))
        // CAST(count(*) AS BIGINT) AS coverage_ppm
    FROM events GROUP BY event_type ORDER BY event_type
  """))

  val all: Seq[BoundQuery] = Seq(qMixOptimal, qSentenceDedup, qScrubAudit)
}
