package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions.{tokens, wordShingles}

/** SURVEY §2.4 curation wave 3: cross-source distribution comparison
  * (pairwise Jensen–Shannon divergence — "which sources are
  * near-duplicates of each other at the distribution level?") and
  * cross-source score calibration (quantile normalization — "make a
  * quality score comparable across sources before a global cut").
  */
object CorpusQueries3 {

  /** 10⁶·ln 2 frozen as a shared double literal: the identical decimal
    * text parses to the identical IEEE double in both engines, so the
    * exclusive-mass term below multiplies the same operands. */
  private val ln2Micro = "CAST(693147.1805599453 AS DOUBLE)"

  /** Pairwise Jensen–Shannon divergence between per-source unigram
    * distributions — the source-similarity matrix a mixture designer
    * reads before setting sampling weights (two sources with near-zero
    * JSD are the same crawl twice; q_source_overlap's 5-gram
    * containment is the lexical view, this is the distributional one).
    *
    * The outer-join-free identity: tokens exclusive to one side
    * contribute p·ln 2 in total mass ln2·(1 − shared_i/n_i), so one
    * INNER join on token + per-source totals covers the whole sum —
    * no full-outer join, no per-pair vocabulary materialization.
    * Per-shared-token KL terms follow the q_bigram_lm micro-nat rule
    * (round each ln-term to µnats BEFORE summing → exact long sums in
    * any order); the two exclusive-mass terms round once per pair by
    * the frozen ln2 literal. Output is 2·JSD in µnats (integer halves
    * avoided — the ½ factors fold into one final `div 2`).
    *
    * Scale shape: counts shuffle once on (source, token); the pair
    * join is token-keyed (a token in s sources yields s(s−1)/2 pair
    * rows — df-driven like the shingle joins, never all-pairs of
    * rows); totals are a 20-row broadcast. */
  private val qJsDivergence = BoundQuery("q_js_divergence", (s, d) => {
    val counts = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("source").agg(sum(col("c")).as("n"))
    val a = counts.as("a").join(broadcast(totals.as("ta")),
      col("a.source") === col("ta.source"))
    val b = counts.as("b").join(broadcast(totals.as("tb")),
      col("b.source") === col("tb.source"))
    val shared = a.join(b,
        col("a.token") === col("b.token") &&
          col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("a.c").as("ca"), col("ta.n").as("na"),
        col("b.c").as("cb"), col("tb.n").as("nb"))
      .withColumn("pa", col("ca").cast("double") / col("na").cast("double"))
      .withColumn("pb", col("cb").cast("double") / col("nb").cast("double"))
      .withColumn("kla_u",
        round(col("pa") * log(lit(2.0) * col("pa") / (col("pa") + col("pb"))) * 1e6, 0)
          .cast("long"))
      .withColumn("klb_u",
        round(col("pb") * log(lit(2.0) * col("pb") / (col("pa") + col("pb"))) * 1e6, 0)
          .cast("long"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"),
        sum(col("kla_u")).as("ka"), sum(col("klb_u")).as("kb"),
        max(col("na")).as("na"), max(col("nb")).as("nb"),
        sum(col("ca")).as("sha"), sum(col("cb")).as("shb"))
    shared
      .withColumn("excl_a", round(expr(s"$ln2Micro * (na - sha) / na"), 0).cast("long"))
      .withColumn("excl_b", round(expr(s"$ln2Micro * (nb - shb) / nb"), 0).cast("long"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        expr("ka + kb + excl_a + excl_b").as("jsd2_unats"))
      .orderBy("source_a", "source_b")
  }, Some(s"""
    WITH counts AS (
      SELECT source, unnest(list_filter(string_split(text, ' '), w -> w <> ''))
               AS token
      FROM documents),
    c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
          FROM counts GROUP BY 1, 2),
    t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
        a.c AS ca, ta.n AS na, b.c AS cb, tb.n AS nb
      FROM c a JOIN c b ON a.token = b.token AND a.source < b.source
      JOIN t ta ON ta.source = a.source
      JOIN t tb ON tb.source = b.source),
    terms AS (
      SELECT source_a, source_b, ca, cb, na, nb,
        CAST(round((CAST(ca AS DOUBLE)/na)
          * ln(2.0*(CAST(ca AS DOUBLE)/na)
               / (CAST(ca AS DOUBLE)/na + CAST(cb AS DOUBLE)/nb)) * 1e6, 0)
          AS BIGINT) AS kla_u,
        CAST(round((CAST(cb AS DOUBLE)/nb)
          * ln(2.0*(CAST(cb AS DOUBLE)/nb)
               / (CAST(ca AS DOUBLE)/na + CAST(cb AS DOUBLE)/nb)) * 1e6, 0)
          AS BIGINT) AS klb_u
      FROM shared),
    agg AS (
      SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared,
        sum(kla_u) AS ka, sum(klb_u) AS kb,
        max(na) AS na, max(nb) AS nb,
        sum(ca) AS sha, sum(cb) AS shb
      FROM terms GROUP BY 1, 2)
    SELECT source_a, source_b, n_shared,
      CAST(ka + kb
        + CAST(round($ln2Micro * (na - sha) / na, 0) AS BIGINT)
        + CAST(round($ln2Micro * (nb - shb) / nb, 0) AS BIGINT)
        AS BIGINT) AS jsd2_unats
    FROM agg ORDER BY source_a, source_b
  """))

  /** Quantile normalization of document length across sources: map
    * each source's n_chars distribution onto the GLOBAL distribution
    * (value at the matching global quantile), so a length-based
    * quality cut means the same thing for every source — the
    * cross-source calibration step before q_quality_filter-style
    * thresholds.
    *
    * Everything runs at the DISTINCT-VALUE grain, not the row grain:
    * per-source and global distributions are (value, count, cumcount)
    * tables; each (source, value) maps to target global rank
    * k = ceil(cum_s · N / m_s) (exact integer arithmetic — ceil of a
    * rational via (a·b + c − 1) div c), and the normalized value is
    * the global value whose cumulative range covers k. The windows
    * iterate distinct values only (bounded domain — n_chars has ~10³
    * distinct values; the q_decile quarantine rule), and the mapping
    * join broadcasts the global DISTRIBUTION, never rows. For a
    * genuinely unbounded domain, the same mapping runs through the
    * bucketized RangeJoin operator instead. */
  private val qQuantileNorm = BoundQuery("q_quantile_norm", (s, d) => {
    val docs = Tables.documents(s, d).select(col("source"), col("n_chars"))
    val srcDist = docs.groupBy("source", "n_chars")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum_s", sum(col("c")).over(Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("m_s", sum(col("c")).over(Window.partitionBy("source")))
    val gDist = docs.groupBy("n_chars").agg(count(lit(1)).as("cg"))
      .withColumn("cum_g", sum(col("cg")).over(Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("lo_g", col("cum_g") - col("cg") + 1)
    val n = docs.agg(count(lit(1)).as("n_total"))
    srcDist.crossJoin(broadcast(n))
      .withColumn("k", expr("(cum_s * n_total + m_s - 1) div m_s"))
      .join(broadcast(gDist.select(col("n_chars").as("g_chars"),
        col("lo_g"), col("cum_g"))),
        col("k") >= col("lo_g") && col("k") <= col("cum_g"))
      .select(col("source"), col("n_chars"), col("c").as("n_docs"),
        col("g_chars").as("norm_chars"))
      .orderBy("source", "n_chars")
  }, Some("""
    WITH sd AS (
      SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    sc AS (
      SELECT source, n_chars, c,
        CAST(sum(c) OVER (PARTITION BY source ORDER BY n_chars
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s,
        CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS m_s
      FROM sd),
    gd AS (
      SELECT n_chars, CAST(count(*) AS BIGINT) AS cg
      FROM documents GROUP BY 1),
    gc AS (
      SELECT n_chars AS g_chars, cg,
        CAST(sum(cg) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g
      FROM gd),
    g AS (SELECT g_chars, cum_g - cg + 1 AS lo_g, cum_g FROM gc),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
    SELECT sc.source, sc.n_chars, sc.c AS n_docs, g.g_chars AS norm_chars
    FROM sc CROSS JOIN n JOIN g
      ON (sc.cum_s * n.n_total + sc.m_s - 1) // sc.m_s >= g.lo_g
     AND (sc.cum_s * n.n_total + sc.m_s - 1) // sc.m_s <= g.cum_g
    ORDER BY sc.source, sc.n_chars
  """))

  /** Per-source Flesch reading ease — the classical readability score
    * beside the Gopher-style quality signals (q_quality_filter,
    * q_repetition_filter): flesch = 206.835 − 1.015·(words/sentence)
    * − 84.6·(syllables/word), emitted in EXACT milli-units.
    *
    * All three counts are codegen'd regexp_count scans both engines
    * replay identically: words = runs of ASCII letters, sentences =
    * runs of [.!?] (floored at 1 per doc so a fragment still counts
    * as one sentence), syllables = the standard vowel-run
    * approximation (runs of [aeiouy] in the lowercased text — exact
    * syllabification needs a dictionary; vowel runs are the
    * deterministic, engine-replayable proxy every readability tool
    * ships). The two rate terms are single truncating integral
    * divisions of per-SOURCE totals (ratio-of-sums, not
    * mean-of-ratios — document-length-weighted, the robust choice for
    * a corpus), so flesch_milli is bit-exact across engines.
    *
    * Scale shape: one documents scan with per-row regexp counts (no
    * tokenize-explode — counting needs no shuffle of token rows),
    * partial-aggregated into ~|sources| groups. */
  private val qReadability = BoundQuery("q_readability", (s, d) => {
    Tables.documents(s, d)
      .select(col("source"),
        expr("regexp_count(text, '[A-Za-z]+')").as("w"),
        greatest(expr("regexp_count(text, '[.!?]+')"), lit(1)).as("sn"),
        expr("regexp_count(lower(text), '[aeiouy]+')").as("sy"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w").cast("long")).as("words"),
        sum(col("sn").cast("long")).as("sentences"),
        sum(col("sy").cast("long")).as("syllables"))
      .select(col("source"), col("n_docs"), col("words"), col("sentences"),
        col("syllables"),
        expr("(1000000 * words) div sentences").as("wps_ppm"),
        expr("(1000000 * syllables) div words").as("spw_ppm"),
        expr("""206835 - (1015 * ((1000000 * words) div sentences)) div 1000000
                       - (84600 * ((1000000 * syllables) div words)) div 1000000""")
          .as("flesch_milli"))
      .orderBy("source")
  }, Some("""
    WITH perdoc AS (
      SELECT source,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS w,
        greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS sn,
        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS sy
      FROM documents),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(w) AS BIGINT) AS words,
        CAST(sum(sn) AS BIGINT) AS sentences,
        CAST(sum(sy) AS BIGINT) AS syllables
      FROM perdoc GROUP BY 1)
    SELECT source, n_docs, words, sentences, syllables,
      CAST((1000000 * words) // sentences AS BIGINT) AS wps_ppm,
      CAST((1000000 * syllables) // words AS BIGINT) AS spw_ppm,
      CAST(206835 - (1015 * ((1000000 * words) // sentences)) // 1000000
                  - (84600 * ((1000000 * syllables) // words)) // 1000000 AS BIGINT)
        AS flesch_milli
    FROM g ORDER BY source
  """))

  /** Per-source trigram novelty: a doc's 3-gram TYPE is "novel" when
    * no lower-id document contains it (owner = corpus-wide min
    * doc_id) — the memorization/boilerplate profile a pretraining mix
    * needs per source: low novelty means the source re-states what the
    * corpus already contains and its marginal token is worth less
    * (the per-source lens on the q_contamination machinery).
    *
    * Exactness: set semantics per (doc, gram) via distinct, exact
    * counts, one ppm division.
    *
    * Scale shape: one explode → distinct (doc, gram) partial agg, a
    * gram-keyed min-owner agg, one gram-keyed shuffle join, then the
    * per-source reduction. Never a cross join; the owner table is
    * gram-vocab-sized and co-partitions with the probe side on g. */
  private val qNgramNovelty = BoundQuery("q_ngram_novelty", (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
    val grams = docs.select(col("doc_id"), col("source"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 2),
          slice(col("toks"), lit(2), size(col("toks")) - 2),
          slice(col("toks"), lit(3), size(col("toks")) - 2))).as("t"))
      .select(col("doc_id"), col("source"),
        concat_ws(" ", col("t.0"), col("t.1"), col("t.2")).as("g"))
      .distinct()
    val owner = grams.groupBy("g").agg(min(col("doc_id")).as("own"))
    grams.join(owner, "g")
      .groupBy("source")
      .agg(count(lit(1)).as("gram_types"),
        sum(when(col("own") === col("doc_id"), 1L).otherwise(0L))
          .as("novel_types"))
      .select(col("source"), col("gram_types"), col("novel_types"),
        expr("CAST((1000000 * novel_types) div gram_types AS BIGINT)")
          .as("novelty_ppm"))
      .orderBy("source")
  }, Some("""
    WITH docs AS (
      SELECT doc_id, source,
        list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source,
        toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
      FROM (SELECT doc_id, source, toks, unnest(range(1, len(toks) - 1)) AS i
            FROM docs WHERE len(toks) >= 3)),
    own AS (SELECT g, min(doc_id) AS own FROM grams GROUP BY g)
    SELECT source, CAST(count(*) AS BIGINT) AS gram_types,
      CAST(sum(CASE WHEN own = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        AS novel_types,
      CAST((1000000 * sum(CASE WHEN own = doc_id THEN 1 ELSE 0 END))
           // count(*) AS BIGINT) AS novelty_ppm
    FROM grams JOIN own USING (g)
    GROUP BY source ORDER BY source
  """))

  /** Heaps-law vocabulary-growth curve: cumulative token instances vs
    * cumulative distinct token types at ten doc_id cutoffs — the
    * "does vocabulary keep growing or has the corpus saturated?"
    * readout that sizes tokenizer vocab and predicts OOV decay as the
    * corpus scales. Computed WITHOUT any sequential pass: a type
    * enters the vocabulary at its min-owner doc, so the cumulative
    * count at a cutoff is a simple filter on the min-owner table —
    * the same trick that parallelizes q_ngram_novelty.
    *
    * Scale shape: one explode → (doc, token-count) and (type,
    * min-owner) partial aggs; each fans out ×10 against the literal
    * cutoff table and reduces to ten rows. */
  private val qHeapsLaw = BoundQuery("q_heaps_law", (s, d) => {
    val words = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val perDoc = words.groupBy("doc_id").agg(count(lit(1)).as("nw"))
    val firstSeen = words.groupBy("w").agg(min(col("doc_id")).as("own"))
    val maxId = perDoc.agg(max(col("doc_id")).as("mx"))
    val cuts = maxId.select(explode(sequence(lit(1L), lit(10L))).as("decile"),
      col("mx"))
      .select(col("decile"), expr("(decile * mx) div 10").as("cutoff"))
    val toks = perDoc.crossJoin(broadcast(cuts))
      .groupBy("decile", "cutoff")
      .agg(sum(when(col("doc_id") <= col("cutoff"), col("nw")).otherwise(0L))
        .as("cum_tokens"))
    val vocab = firstSeen.crossJoin(broadcast(cuts))
      .groupBy("decile", "cutoff")
      .agg(sum(when(col("own") <= col("cutoff"), 1L).otherwise(0L))
        .as("cum_vocab"))
    toks.join(vocab, Seq("decile", "cutoff"))
      .orderBy("decile")
  }, Some("""
    WITH words AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents),
    per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw
                FROM words GROUP BY doc_id),
    first_seen AS (SELECT w, min(doc_id) AS own FROM words GROUP BY w),
    cuts AS (SELECT CAST(decile AS BIGINT) AS decile,
               (decile * (SELECT max(doc_id) FROM per_doc)) // 10 AS cutoff
             FROM unnest(range(1, 11)) AS t(decile)),
    toks AS (SELECT decile, cutoff,
               CAST(sum(CASE WHEN doc_id <= cutoff THEN nw ELSE 0 END) AS BIGINT)
                 AS cum_tokens
             FROM per_doc CROSS JOIN cuts GROUP BY decile, cutoff),
    vocab AS (SELECT decile, cutoff,
                CAST(sum(CASE WHEN own <= cutoff THEN 1 ELSE 0 END) AS BIGINT)
                  AS cum_vocab
              FROM first_seen CROSS JOIN cuts GROUP BY decile, cutoff)
    SELECT decile, cutoff, cum_tokens, cum_vocab
    FROM toks JOIN vocab USING (decile, cutoff)
    ORDER BY decile
  """))

  /** Tokenizer fertility per language: BPE-ish subword tokens per
    * whitespace word (ppm) and characters per subword token (milli) —
    * the per-language compute-cost profile tokenizer choices are made
    * on (a language with fertility 2× pays 2× attention FLOPs per
    * word). Ratio-of-sums over exact per-doc counts, divisions last.
    *
    * Scale shape: one scan with two codegen'd size() counts per row
    * (no explode), partial-aggregated to |langs| rows. */
  private val qFertility = BoundQuery("q_fertility", (s, d) => {
    import graft.functions.TextFunctions.bpeTokens
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("n_words"),
        sum(size(bpeTokens(col("text"))).cast("long")).as("n_subwords"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_subwords"),
        expr("CAST((1000000 * n_subwords) div n_words AS BIGINT)")
          .as("fertility_ppm"),
        expr("CAST((1000 * n_chars) div n_subwords AS BIGINT)")
          .as("chars_per_subword_milli"))
      .orderBy("lang")
  }, Some("""
    WITH t AS (
      SELECT lang,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS w,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS sw,
        CAST(length(text) AS BIGINT) AS ch
      FROM documents)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(w) AS BIGINT) AS n_words,
      CAST(sum(sw) AS BIGINT) AS n_subwords,
      CAST((1000000 * sum(sw)) // sum(w) AS BIGINT) AS fertility_ppm,
      CAST((1000 * sum(ch)) // sum(sw) AS BIGINT) AS chars_per_subword_milli
    FROM t GROUP BY lang ORDER BY lang
  """))

  /** Shingle document-frequency profile: how many 3-gram shingle
    * TYPES fall in each log₂(df) bucket and how much join fan-out
    * they carry (Σ df per bucket; Σ df² would be the pair count).
    * This is the capacity-planning readout behind the
    * `maxShingleDf` cap on the n-gram dedup joins: the top buckets
    * ARE the boilerplate shingles whose df² pair explosion the cap
    * removes, and this query prices that decision before a run.
    *
    * Scale shape: distinct (doc, shingle) partial agg → gram-keyed df
    * agg → ≤64-row bucket agg; integer log₂ via len(bin(df))−1, the
    * q_degree_dist convention. */
  private val qShingleDfProfile = BoundQuery("q_shingle_df_profile", (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
    val grams = docs.select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 2),
          slice(col("toks"), lit(2), size(col("toks")) - 2),
          slice(col("toks"), lit(3), size(col("toks")) - 2))).as("t"))
      .select(col("doc_id"),
        concat_ws(" ", col("t.0"), col("t.1"), col("t.2")).as("g"))
      .distinct()
    grams.groupBy("g").agg(count(lit(1)).as("df"))
      .groupBy((length(bin(col("df"))) - 1).cast("long").as("log2_df"))
      .agg(count(lit(1)).as("n_shingles"), sum(col("df")).as("doc_mass"))
      .orderBy("log2_df")
  }, Some("""
    WITH docs AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
            FROM docs WHERE len(toks) >= 3)),
    df AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM grams GROUP BY g)
    SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS log2_df,
      CAST(count(*) AS BIGINT) AS n_shingles,
      CAST(sum(df) AS BIGINT) AS doc_mass
    FROM df GROUP BY 1 ORDER BY log2_df
  """))

  /** CCNet-style perplexity bucketing: split each language's docs
    * into head / middle / tail TERCILES of the corpus-LM score (the
    * per-doc bigram logprob of q_bigram_lm) — the curation split that
    * routes "head" text to pretraining and quarantines the tail for
    * inspection. Ordering key is the EXACT truncated milli-score
    * (10⁶·sum_u div n_bigrams, negative-safe: both engines truncate
    * toward zero), tie-broken by doc_id; per-language rank comes from
    * ONE two-phase global row_number over (lang, score, doc) — the
    * scale-safe Ranking.globalRowNumber, never a per-language
    * WindowExec over data-sized partitions — with per-language bases
    * subtracted via a k-row broadcast. bucket = (3·r) div n_lang.
    * Output: per (lang, bucket) doc count and exact score envelope. */
  private val qPplBuckets = BoundQuery("q_ppl_buckets", (s, d) => {
    val scores = TextQueries2.bigramLmTerms(s, d)
      .withColumn("sc", expr("(1000000 * sum_u) div n_bigrams"))
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id")
    val ranked = graft.operators.Ranking.globalRowNumber(scores, "grn",
      col("lang").asc, col("sc").asc, col("doc_id").asc)
    val base = ranked.groupBy(col("lang").as("lg"))
      .agg(min(col("grn")).as("b0"), count(lit(1)).as("nl"))
    ranked.join(broadcast(base), col("lang") === col("lg"))
      .withColumn("bucket", expr("(3 * (grn - b0)) div nl"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("sc")).as("min_score_milli"),
        max(col("sc")).as("max_score_milli"))
      .withColumn("tier", expr(
        "CASE bucket WHEN 0 THEN 'tail' WHEN 1 THEN 'middle' ELSE 'head' END"))
      .select("lang", "bucket", "tier", "n_docs",
        "min_score_milli", "max_score_milli")
      .orderBy("lang", "bucket")
  }, Some(s"""
    WITH ${TextQueries2.bigramLmTermsSql},
    scores AS (
      SELECT l.doc_id, d.lang,
        (1000000 * l.sum_u) // l.n_bigrams AS sc
      FROM lmterms l JOIN documents d ON l.doc_id = d.doc_id),
    ranked AS (
      SELECT lang, sc,
        CAST(row_number() OVER (PARTITION BY lang ORDER BY sc, doc_id)
          AS BIGINT) - 1 AS r,
        CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS nl
      FROM scores)
    SELECT lang, (3 * r) // nl AS bucket,
      CASE (3 * r) // nl WHEN 0 THEN 'tail' WHEN 1 THEN 'middle'
        ELSE 'head' END AS tier,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(min(sc) AS BIGINT) AS min_score_milli,
      CAST(max(sc) AS BIGINT) AS max_score_milli
    FROM ranked GROUP BY 1, 2, 3 ORDER BY lang, bucket
  """))

  /** Water-filling mixture rates: sample HALF the corpus while making
    * the source mixture as uniform as the data allows. The classic
    * cap solve — find c with Σ_s min(n_s, c) = B (B = N div 2):
    * sources below the cap keep everything, sources above keep
    * exactly c each — exact per candidate cut m (sources sorted by
    * size, the m smallest kept whole): c = (B − prefix_m) div (k − m),
    * feasible iff n_m ≤ c < n_{m+1}. All on the k-row source-size
    * table (one partial-agg scan collapses the corpus), the remaining
    * docs-per-source and rate_ppm by single integral divisions.
    * This is the planning complement of q_mixture_sample (which
    * executes a temperature rebalance) — it answers "what per-source
    * rates hit the budget with maximum balance" before any sampling
    * runs. */
  private val qMixtureRates = BoundQuery("q_mixture_rates", (s, d) => {
    val sizes = Tables.documents(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
    val tot = sizes.agg(sum(col("n")).as("nn"), count(lit(1)).as("k"))
    // the source-size table is k rows (the mixture's arity), so the
    // rank window here is bounded-input by construction
    val w = Window.orderBy(col("n"), col("source"))
    val ranked = sizes.crossJoin(broadcast(tot))
      .withColumn("m", row_number().over(w).cast("long") - 1L)
      .withColumn("pref", coalesce(sum(col("n"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("b", expr("nn div 2"))
      .withColumn("cap", expr("(b - pref) div (k - m)"))
    // the unique feasible cut: the m smallest sources fit under the
    // cap their removal implies, the rest sit above it
    val cut = ranked
      .where((col("prev_n").isNull || col("prev_n") <= col("cap")) &&
        col("cap") < col("n"))
      .orderBy("m").limit(1)
      .select(col("m").as("m_cut"), col("cap").as("capv"))
    ranked.crossJoin(broadcast(cut))
      .withColumn("kept",
        when(col("m") < col("m_cut"), col("n")).otherwise(col("capv")))
      .select(col("source"), col("n").as("n_docs"),
        col("kept").as("kept_docs"),
        expr("(1000000 * kept) div n").as("rate_ppm"),
        col("b").as("budget_docs"))
      .orderBy("source")
  }, Some("""
    WITH sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k
            FROM sizes),
    ranked AS (
      SELECT source, n,
        CAST(row_number() OVER w AS BIGINT) - 1 AS m,
        CAST(coalesce(sum(n) OVER (ORDER BY n, source
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS pref,
        lag(n) OVER w AS prev_n,
        nn // 2 AS b, k
      FROM sizes CROSS JOIN tot
      WINDOW w AS (ORDER BY n, source)),
    capped AS (
      SELECT *, (b - pref) // (k - m) AS cap FROM ranked),
    cut AS (
      SELECT m AS m_cut, cap AS capv FROM capped
      WHERE (prev_n IS NULL OR prev_n <= cap) AND cap < n
      ORDER BY m LIMIT 1)
    SELECT source, n AS n_docs,
      CAST(CASE WHEN m < m_cut THEN n ELSE capv END AS BIGINT) AS kept_docs,
      (1000000 * (CASE WHEN m < m_cut THEN n ELSE capv END)) // n AS rate_ppm,
      b AS budget_docs
    FROM capped CROSS JOIN cut ORDER BY source
  """))

  /** Chao1 species-richness estimate of the vocabulary (Chao 1984,
    * bias-corrected form): how many distinct tokens the corpus WOULD
    * contain if sampling continued — V + f1·(f1−1)/(2·(f2+1)) from
    * the observed-once (f1) and observed-twice (f2) counts. The
    * "how much unseen vocabulary is left" telemetry that complements
    * q_heaps_law's growth-curve fit. All-integer: counts are exact,
    * the correction term is one integer division in micro-units.
    * One token explode + two tiny aggs — scan-bound at any scale. */
  private val qChao1 = BoundQuery("q_chao1", (s, d) => {
    val counts = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    counts.agg(
      count(lit(1)).as("v_obs"),
      sum(when(col("n") === 1, 1L).otherwise(0L)).as("f1"),
      sum(when(col("n") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("v_obs"), col("f1"), col("f2"),
        (col("v_obs") * 1000000L +
          expr("(1000000 * f1 * (f1 - 1)) div (2 * (f2 + 1))"))
          .as("chao1_micro"))
  }, Some("""
    WITH counts AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest(list_filter(string_split(text,' '), x -> x <> '')) AS w
        FROM documents) GROUP BY w)
    SELECT CAST(count(*) AS BIGINT) AS v_obs,
      CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
      CAST(count(*) * 1000000
           + (1000000 * sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
              * (sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) - 1))
             // (2 * (sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) + 1))
        AS BIGINT) AS chao1_micro
    FROM counts
  """))

  /** Dictionary / blocklist matching — the scrubber JOIN shape: the
    * corpus's own top-20 4-token spans (count desc, span asc — the
    * q_boilerplate_spans telemetry turned into a dictionary) are
    * broadcast against every document's 4-gram shingles; per flagged
    * doc: total hits, distinct phrases hit. At 100 TB the dictionary
    * side is always broadcast-small (a blocklist is KBs) and the doc
    * side is one explode — no shuffle wider than the per-doc
    * aggregation. The equi-join-on-shingle shape is what replaces a
    * per-doc regex scan over a large phrase set (Aho-Corasick's job)
    * when the phrases are fixed token n-grams. */
  private val qBlocklist = BoundQuery("q_blocklist", (s, d) => {
    val spans = Tables.documents(s, d)
      .select(col("doc_id"), explode(wordShingles(col("text"), 4)).as("span"))
    val dict = spans.groupBy("span").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("span")).limit(20)
      .select(col("span"))
    spans.join(broadcast(dict), "span")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("span")).as("n_phrases"))
      .orderBy("doc_id")
  }, Some("""
    WITH sh AS (
      SELECT doc_id,
        unnest(list_transform(range(1, greatest(len(w) - 2, 1)),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS span
      FROM (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents)
      WHERE len(w) >= 4),
    dict AS (
      SELECT span FROM (
        SELECT span, count(*) AS n FROM sh GROUP BY span
        ORDER BY n DESC, span LIMIT 20)),
    hits AS (SELECT s.doc_id, s.span FROM sh s JOIN dict d ON s.span = d.span)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
      CAST(count(DISTINCT span) AS BIGINT) AS n_phrases
    FROM hits GROUP BY doc_id ORDER BY doc_id
  """))

  /** Effective sample size under length weighting (Kish 1965):
    * when documents are weighted by size (every token-budget mixture
    * does this implicitly), the statistically EFFECTIVE number of
    * documents per source is ESS = (Σw)²/Σw², and the design effect
    * deff = n/ESS says how much a few huge docs dominate. All exact:
    * n_chars longs sum into decimal(38,0)/HUGEINT, ESS and deff are
    * single integer divisions in milli-units. One partial agg. */
  private val qEffectiveN = BoundQuery("q_effective_n", (s, d) => {
    Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).cast("decimal(38,0)").as("sw"),
        sum(col("n_chars") * col("n_chars")).cast("decimal(38,0)").as("sww"))
      .select(col("source"), col("n"),
        expr("CAST((sw * sw * 1000) DIV sww AS BIGINT)").as("ess_milli"),
        expr("CAST((CAST(n AS DECIMAL(38,0)) * sww * 1000) DIV (sw * sw) AS BIGINT)")
          .as("deff_milli"))
      .orderBy("source")
  }, Some("""
    SELECT source, CAST(count(*) AS BIGINT) AS n,
      CAST((CAST(sum(n_chars) AS HUGEINT) * sum(n_chars) * 1000)
           // sum(CAST(n_chars AS HUGEINT) * n_chars) AS BIGINT) AS ess_milli,
      CAST((CAST(count(*) AS HUGEINT)
            * sum(CAST(n_chars AS HUGEINT) * n_chars) * 1000)
           // (CAST(sum(n_chars) AS HUGEINT) * sum(n_chars)) AS BIGINT) AS deff_milli
    FROM documents GROUP BY source ORDER BY source
  """))

  /** Char-trigram cross-entropy between source pairs — the
    * CHARACTER-level companion to q_js_divergence's token-level
    * comparison (char grams catch orthography/style/transliteration
    * drift that token distributions miss): H(a,b) =
    * Σ p_a(g)·ln(1/q_b(g)) with add-one smoothing over the union
    * vocabulary. The µ-nat convention makes the float-log sum exact:
    * each ln((N_b+V)/(c_b+1)) rounds ONCE to micro-nats as a long,
    * the Σ c_a·L term is then exact integer, and one truncating
    * division by N_a emits the entropy — partition-invariant, fully
    * replayable. Work is V·S² on the gram table, never corpus². */
  private val qCharNgramXent = BoundQuery("q_char_ngram_xent", (s, d) => {
    val tri = Tables.documents(s, d)
      .select(col("source"), explode(expr(
        """CASE WHEN length(text) >= 3
           THEN transform(sequence(1, length(text)-2), i -> substring(text, i, 3))
           ELSE CAST(array() AS array<string>) END""")).as("tri"))
    val counts = graft.util.CacheScope.persist(
      tri.groupBy("source", "tri").agg(count(lit(1)).as("c")))
    val totals = counts.groupBy("source").agg(sum("c").as("nn"))
    val vocab = counts.select("tri").distinct()
    val vtot = vocab.agg(count(lit(1)).as("v"))
    val lt = totals.crossJoin(vocab)
      .join(counts, Seq("source", "tri"), "left")
      .crossJoin(broadcast(vtot))
      .select(col("source").as("src_b"), col("tri"),
        round(log((col("nn") + col("v")).cast("double") /
          (coalesce(col("c"), lit(0L)) + 1).cast("double")) * 1e6, 0)
          .cast("long").as("lmicro"))
    counts.select(col("source").as("src_a"), col("tri"), col("c"))
      .join(lt, "tri")
      .where(col("src_a") =!= col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(sum(col("c") * col("lmicro")).as("sm"))
      .join(totals.select(col("source").as("src_a"), col("nn")), "src_a")
      .select(col("src_a"), col("src_b"),
        expr("sm div nn").as("xent_micro"))
      .orderBy("src_a", "src_b")
  }, Some("""
    WITH tri AS (
      SELECT source,
        unnest(list_transform(range(1, greatest(length(text)-1, 1)),
          i -> substring(text, i, 3))) AS tri
      FROM documents WHERE length(text) >= 3),
    counts AS (
      SELECT source, tri, CAST(count(*) AS BIGINT) AS c
      FROM tri GROUP BY 1, 2),
    totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS nn
               FROM counts GROUP BY 1),
    vocab AS (SELECT DISTINCT tri FROM counts),
    vtot AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
    lt AS (
      SELECT t.source AS src_b, vb.tri,
        CAST(round(ln(CAST(t.nn + vt.v AS DOUBLE)
                     / CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)) * 1e6, 0)
          AS BIGINT) AS lmicro
      FROM totals t CROSS JOIN vocab vb CROSS JOIN vtot vt
      LEFT JOIN counts c ON c.source = t.source AND c.tri = vb.tri)
    SELECT a.source AS src_a, lt.src_b,
      CAST(sum(a.c * lt.lmicro) // max(ta.nn) AS BIGINT) AS xent_micro
    FROM counts a
    JOIN lt ON lt.tri = a.tri AND lt.src_b <> a.source
    JOIN totals ta ON ta.source = a.source
    GROUP BY 1, 2 ORDER BY 1, 2
  """))

  /** Context-length truncation waste: for candidate context sizes
    * L ∈ {128, 512, 2048} tokens, how many documents exceed L and
    * what share of the corpus's TOKENS a hard-truncate-at-L policy
    * discards — the capacity-planning table behind every
    * max_seq_len choice (the chunk/pack alternative is priced by
    * q_chunk_docs/q_seq_pack; this prices NOT chunking). FULLY
    * integer: Σmin(n,L) and Σn per L, ppm by truncating division.
    * One token-count scan, three conditional aggregates. */
  private val qTruncationWaste = BoundQuery("q_truncation_waste", (s, d) => {
    val lens = graft.util.CacheScope.persist(
      Tables.documents(s, d)
        .select(size(tokens(col("text"))).cast("long").as("n")))
    val ls = Seq(128L, 512L, 2048L)
    val grid = lens.crossJoin(
      broadcast(s.createDataFrame(ls.map(Tuple1(_))).toDF("l")))
    grid.groupBy("l")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n") > col("l"), 1L).otherwise(0L)).as("docs_truncated"),
        sum(col("n")).as("tokens_total"),
        sum(least(col("n"), col("l"))).as("tokens_kept"))
      .select(col("l").as("context_len"), col("n_docs"),
        col("docs_truncated"), col("tokens_total"),
        expr("""(1000000 * (tokens_total - tokens_kept))
          div tokens_total""").as("lost_ppm"))
      .orderBy("context_len")
  }, Some("""
    WITH lens AS (
      SELECT CAST(len(list_filter(string_split(text,' '), x -> x <> ''))
        AS BIGINT) AS n
      FROM documents),
    grid AS (
      SELECT n, l FROM lens CROSS JOIN
        (SELECT unnest([CAST(128 AS BIGINT), 512, 2048]) AS l))
    SELECT l AS context_len, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN n > l THEN 1 ELSE 0 END) AS BIGINT) AS docs_truncated,
      CAST(sum(n) AS BIGINT) AS tokens_total,
      CAST((1000000 * (sum(n) - sum(least(n, l)))) // sum(n) AS BIGINT)
        AS lost_ppm
    FROM grid GROUP BY l ORDER BY l
  """))

  /** Vocabulary coverage curve: the share of token OCCURRENCES the
    * top-k types cover, k ∈ {100, 1000, 10000} — the vocab-size
    * sizing readout beside q_vocab's frequency table and q_oov's
    * fixed-vocab rate. The rank lives on the TakeOrdered top-10k
    * slice (bounded; whitelisted), never the full vocabulary; the
    * corpus total rides in one broadcast scalar; coverage is exact
    * ppm. */
  private val qVocabCoverage = BoundQuery("q_vocab_coverage", (s, d) => {
    val counts = graft.util.CacheScope.persist(
      Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("n")))
    val tot = counts.agg(sum(col("n")).as("tot"),
      count(lit(1)).as("n_types"))
    val top = counts.orderBy(desc("n"), col("t")).limit(10000)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("n"), col("t"))))
    val ks = Seq(100L, 1000L, 10000L)
    top.crossJoin(
        broadcast(s.createDataFrame(ks.map(Tuple1(_))).toDF("k")))
      .where(col("rnk") <= col("k"))
      .groupBy("k").agg(sum(col("n")).as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("k").as("vocab_k"), col("n_types"),
        expr("(1000000 * covered) div tot").as("covered_ppm"),
        expr("(1000000 * (tot - covered)) div tot").as("oov_ppm"))
      .orderBy("vocab_k")
  }, Some("""
    WITH counts AS (
      SELECT t, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(list_filter(string_split(text,' '), x -> x <> ''))
              AS t FROM documents)
      GROUP BY t),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                   CAST(count(*) AS BIGINT) AS n_types FROM counts),
    top AS (
      SELECT n, CAST(row_number() OVER (ORDER BY n DESC, t) AS BIGINT) AS rnk
      FROM counts ORDER BY n DESC, t LIMIT 10000),
    cov AS (
      SELECT k, CAST(sum(n) AS BIGINT) AS covered
      FROM top CROSS JOIN
        (SELECT unnest([CAST(100 AS BIGINT), 1000, 10000]) AS k)
      WHERE rnk <= k GROUP BY k)
    SELECT k AS vocab_k, n_types,
      (1000000 * covered) // tot AS covered_ppm,
      (1000000 * (tot - covered)) // tot AS oov_ppm
    FROM cov, tot ORDER BY vocab_k
  """))

  val all: Seq[BoundQuery] = Seq(qJsDivergence, qQuantileNorm, qReadability,
    qNgramNovelty, qHeapsLaw, qFertility, qShingleDfProfile, qPplBuckets,
    qMixtureRates, qChao1, qBlocklist, qEffectiveN, qCharNgramXent,
    qTruncationWaste, qVocabCoverage)
}
