package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions.{tokens, wordShingles, qualityScore}
import graft.ml.BpeTrainer
import graft.operators.TopKPerGroup

/** SURVEY §2.4 round-3 corpus-curation ops: stratified sampling,
  * Gopher-style repetition filtering, BPE encoding — the remaining
  * curation steps between "raw filtered corpus" and "training
  * batches" not yet covered by the dedup/quality/packing queries.
  */
object CorpusQueries {

  /** Proportional stratified sample: ~200 docs allocated across
    * language strata by floor-proportional share (min 1 per stratum),
    * members selected per stratum by deterministic hash order
    * (md5(text), doc_id tiebreak — the q_cap_per_source convention,
    * so the kept set is partition- and engine-invariant).
    *
    * Scale shape: the rank window is per-stratum but the literal
    * rn <= 200 pre-filter makes Spark plan a WindowGroupLimit —
    * map-side partial top-k per partition BEFORE the stratum shuffle —
    * so a dominant stratum never funnels its full membership through
    * one task; the dynamic per-stratum cap then cuts 200 down to k. */
  private val qStratifiedSample = BoundQuery("q_stratified_sample", (s, d) => {
    val docs = Tables.documents(s, d)
    val strata = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val tot = docs.agg(count(lit(1)).as("t"))
    val caps = strata.crossJoin(broadcast(tot))
      .select(col("lang"), greatest(lit(1L), expr("(200 * n) div t")).as("k"))
    val w = Window.partitionBy("lang").orderBy(md5(col("text")), col("doc_id"))
    docs.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 200)
      .join(broadcast(caps), "lang")
      .where(col("rn") <= col("k"))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }, Some("""
    WITH strata AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT count(*) AS t FROM documents),
    caps AS (SELECT lang, greatest(1, (200 * n) // t) AS k FROM strata, tot),
    r AS (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY md5(text), doc_id) AS rn
          FROM documents)
    SELECT doc_id, lang FROM r JOIN caps USING (lang)
    WHERE rn <= 200 AND rn <= k ORDER BY doc_id
  """))

  /** Benchmark-contamination detection (the decontam step every
    * training corpus runs before a model sees it): an md5-prefix
    * holdout (~6% of docs, the q_train_split convention) stands in
    * for the benchmark/eval set; every remaining corpus doc reports
    * how many of its distinct 8-word shingles appear anywhere in the
    * benchmark set. 8-gram overlap is the published decontamination
    * rule (GPT-3 appendix C uses 8–13-gram collisions).
    *
    * Scale shape: the benchmark side of the join is the SMALL side by
    * construction (eval sets are tiny vs a training corpus) —
    * distinct benchmark grams broadcast; the corpus side explodes to
    * grams and semi-joins without shuffling document text. At 100 TB
    * the gram strings would be 64-bit hashes (ShingleHash64); the
    * string form here keeps the oracle exact. */
  private val qContamination = BoundQuery("q_contamination", (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), substring(md5(col("text")), 1, 2).as("h"),
        filter(split(col("text"), " "), w => w =!= lit("")).as("w"))
      .withColumn("g", array_distinct(
        when(size(col("w")) >= 8,
          transform(sequence(lit(1), size(col("w")) - lit(7)),
            i => concat_ws(" ", slice(col("w"), i, lit(8)))))
          .otherwise(array().cast("array<string>"))))
    val bench = docs.where(col("h") < "10")
      .select(explode(col("g")).as("s")).distinct()
    val corpus = docs.where(col("h") >= "10")
    val matched = corpus.select(col("doc_id"), explode(col("g")).as("s"))
      .join(broadcast(bench), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_matched"))
    corpus.select(col("doc_id"), size(col("g")).cast("long").as("n_grams"))
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
      .withColumn("contaminated", col("n_matched") > 0)
      .orderBy("doc_id")
  }, Some("""
    WITH docs AS (
      SELECT doc_id, substr(md5(text),1,2) AS h,
        list_distinct(list_transform(range(1, greatest(len(w)-6, 1)),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
               w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS g
      FROM (SELECT doc_id, text,
                   list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents)),
    bench AS (SELECT DISTINCT unnest(g) AS s FROM docs WHERE h < '10'),
    corpus AS (SELECT doc_id, g FROM docs WHERE h >= '10'),
    m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched
          FROM (SELECT doc_id, unnest(g) AS s FROM corpus) cg
          JOIN bench USING (s) GROUP BY 1)
    SELECT c.doc_id, CAST(len(g) AS BIGINT) AS n_grams,
           coalesce(m.n_matched, 0) AS n_matched,
           coalesce(m.n_matched, 0) > 0 AS contaminated
    FROM corpus c LEFT JOIN m ON c.doc_id = m.doc_id
    ORDER BY c.doc_id
  """))

  /** Temperature-rebalanced domain mixture (the LLM data-mixture
    * op, PaLM/DoReMi shape): per-stratum target counts ∝ n^α with
    * α = 0.5, so rare languages are upsampled relative to their raw
    * share and the head (en) is capped — contrast q_stratified_sample,
    * which keeps the raw proportions. All mixture math is exact
    * integers: weight = floor(sqrt(n)) (IEEE sqrt is correctly
    * rounded, so the floor is engine-portable), targets by integer
    * division of a 200-doc budget, membership by the md5-hash-order
    * convention. Same WindowGroupLimit-able rank shape as
    * q_stratified_sample — the literal rn <= 200 pre-filter bounds
    * each stratum's candidates before the dynamic cap applies. */
  private val qMixtureSample = BoundQuery("q_mixture_sample", (s, d) => {
    val docs = Tables.documents(s, d)
    val wts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("w", floor(sqrt(col("n").cast("double"))).cast("long"))
    val sumw = wts.agg(sum(col("w")).as("sw"))
    val targets = wts.crossJoin(broadcast(sumw))
      .select(col("lang"), col("n"), expr("(200 * w) div sw").as("target"))
    val w0 = Window.partitionBy("lang").orderBy(md5(col("text")), col("doc_id"))
    docs.withColumn("rn", row_number().over(w0).cast("long"))
      .where(col("rn") <= 200)
      .join(broadcast(targets), "lang")
      .where(col("rn") <= col("target"))
      .select(col("lang"), col("rn"), col("doc_id"), col("source"))
      .orderBy("lang", "rn")
  }, Some("""
    WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY 1),
    w AS (SELECT lang, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
          FROM n),
    t AS (SELECT lang, (200 * w) // (SELECT CAST(sum(w) AS BIGINT) FROM w)
                   AS target FROM w),
    r AS (SELECT doc_id, lang, source,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY md5(text), doc_id) AS rn
          FROM documents)
    SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id, source
    FROM r JOIN t USING (lang)
    WHERE rn <= 200 AND rn <= target ORDER BY lang, rn
  """))

  /** Gopher-style repetition signals per document (Rae et al. 2021,
    * "Scaling Language Models", table A1 shape): most-frequent-word
    * share, duplicate-word share, most-frequent-bigram share — the
    * signals that catch boilerplate/keyword-stuffed pages that pass
    * length and stopword gates. All shares are exact integer ppm
    * (count·10⁶ div total), so the decision column is
    * engine-portable with no float drift. Two explode+agg passes
    * (words, bigrams), both map-side partial — no windows, no state. */
  private val qRepetitionFilter = BoundQuery("q_repetition_filter", (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 2)
    val words = docs.select(col("doc_id"),
        size(col("toks")).cast("long").as("nw"), explode(col("toks")).as("w"))
    val ws = words.groupBy("doc_id", "nw", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "nw")
      .agg(max(col("c")).as("maxw"), count(lit(1)).as("nd"))
    val bgs = docs.select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("bg"))
      .select(col("doc_id"), concat_ws(" ", col("bg.0"), col("bg.1")).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("maxbg"))
    ws.join(bgs, "doc_id")
      .select(col("doc_id"),
        col("nw").as("n_words"),
        expr("(maxw * 1000000) div nw").as("top_word_ppm"),
        expr("((nw - nd) * 1000000) div nw").as("dup_word_ppm"),
        expr("(maxbg * 1000000) div (nw - 1)").as("top_bigram_ppm"),
        (expr("(maxbg * 1000000) div (nw - 1)") > 180000 ||
         expr("((nw - nd) * 1000000) div nw") > 300000).as("repetitive"))
      .orderBy("doc_id")
  }, Some("""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(text, ' '), x -> x <> '') AS toks
               FROM documents),
    d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS nw
          FROM t WHERE len(toks) >= 2),
    w AS (SELECT doc_id, nw, unnest(toks) AS w FROM d),
    wc AS (SELECT doc_id, nw, w, count(*) AS c FROM w GROUP BY 1, 2, 3),
    ws AS (SELECT doc_id, nw, CAST(max(c) AS BIGINT) AS maxw,
                  CAST(count(*) AS BIGINT) AS nd
           FROM wc GROUP BY 1, 2),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS b
           FROM d),
    bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
    bgs AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS maxbg FROM bgc GROUP BY 1)
    SELECT ws.doc_id, ws.nw AS n_words,
           (maxw * 1000000) // nw AS top_word_ppm,
           ((nw - nd) * 1000000) // nw AS dup_word_ppm,
           (maxbg * 1000000) // (nw - 1) AS top_bigram_ppm,
           ((maxbg * 1000000) // (nw - 1) > 180000
            OR ((nw - nd) * 1000000) // nw > 300000) AS repetitive
    FROM ws JOIN bgs ON ws.doc_id = bgs.doc_id
    ORDER BY ws.doc_id
  """))

  /** BPE ENCODING with the corpus-trained merges (the q_bpe_merges
    * model applied back to the corpus): per-doc word and subword
    * counts. The distinct-word table — vocab-sized, not corpus-sized —
    * is what gets segmented (BpeTrainer.encodeWords); the corpus pays
    * one hash join against it. FULL ORACLE: DuckBpeSql unrolls the
    * same 12-merge training recurrence and applies it to the vocab,
    * so the per-doc subword counts replay end-to-end; BpeSpec
    * additionally pins the segmentation against an independent
    * single-machine reference encoder. */
  private val qBpeEncode = BoundQuery("q_bpe_encode", (s, d) => {
    val docs = Tables.documents(s, d)
    val merges = BpeTrainer.train(docs, col("text"), numMerges = 12)
    val enc = BpeTrainer.encodeWords(docs, col("text"), merges)
    // enc is RDD-backed (stats-unknown) since the LocalRelation fix;
    // it is model-table-sized by the BpeTrainer contract — exactly the
    // bounded side a tokenizer pipeline broadcasts — so hint it rather
    // than let the unknown stats force a corpus-sized shuffle join
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .join(broadcast(enc), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("toks")).cast("long")).as("n_subwords"))
      .orderBy("doc_id")
  }, Some(DuckBpeSql.encodeSql(numMerges = 12)))

  /** Boilerplate span detector: 8-token spans occurring in ≥ 2
    * distinct documents, with document and occurrence counts — the
    * telemetry that SIZES the ngram-join skew caps (Dedup
    * maxShingleDf) and flags template contamination. One explode +
    * one partial-agg groupBy; at web scale the span string would be
    * its ShingleHash64 (the group key is what matters), kept as text
    * here so the table is directly actionable. */
  private val qBoilerplateSpans = BoundQuery("q_boilerplate_spans", (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"), explode(wordShingles(col("text"), 8)).as("span"))
      .groupBy("span")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .where(col("n_docs") >= 2)
      .orderBy(desc("n_docs"), desc("n_occ"), asc("span"))
  }, Some("""
    WITH spans AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
             w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS span
      FROM (SELECT doc_id, w, unnest(range(1, len(w)-6)) AS i
            FROM (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w
                  FROM documents)
            WHERE len(w) >= 8))
    SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occ
    FROM spans GROUP BY span
    HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occ DESC, span
  """))

  /** Cross-source content-overlap matrix: for every source pair, how
    * many distinct 5-gram spans they share, and the overlap
    * coefficient against the smaller side — the "which feeds are
    * recycling each other's content" audit that decides dedup
    * priority between ingestion streams. Span granularity (not doc
    * digests) catches partial recycling that whole-doc hashing
    * misses. Scale shape: the (source, span)-distinct table is the
    * only corpus-sized relation; the pair matrix is |sources|²-
    * bounded. At web scale the span key would be its ShingleHash64. */
  private val qSourceOverlap = BoundQuery("q_source_overlap", (s, d) => {
    val spans = graft.util.CacheScope.persist(
      Tables.documents(s, d)
        .select(col("source"), explode(wordShingles(col("text"), 5)).as("sp"))
        .distinct())
    val sizes = spans.groupBy("source").agg(count(lit(1)).as("n"))
    spans.as("a").join(spans.as("b"),
        col("a.sp") === col("b.sp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared_spans"))
      .join(sizes.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_spans"),
        round(col("shared_spans").cast("double") /
          least(col("na"), col("nb")).cast("double"), 6).as("overlap"))
      .orderBy("src_a", "src_b")
  }, Some("""
    WITH spans AS (
      SELECT DISTINCT source,
        w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS sp
      FROM (SELECT source, w, unnest(range(1, len(w)-3)) AS i
            FROM (SELECT source, list_filter(string_split(text,' '), x -> x <> '') AS w
                  FROM documents)
            WHERE len(w) >= 5)),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM spans GROUP BY 1),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS shared_spans
      FROM spans a JOIN spans b ON a.sp = b.sp AND a.source < b.source
      GROUP BY 1, 2)
    SELECT src_a, src_b, shared_spans,
      round(CAST(shared_spans AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE), 6) AS overlap
    FROM pairs JOIN sizes sa ON src_a = sa.source JOIN sizes sb ON src_b = sb.source
    ORDER BY src_a, src_b
  """))

  /** Token-budget selection: greedily keep the highest-quality
    * documents until a token budget is spent — the curation step that
    * turns "scored corpus" into "training set of size N". Ordering is
    * by micro-rounded quality (exact long compare, engine-invariant)
    * with doc_id tiebreak; the running token total comes from
    * operators.Ranking.globalCumSum — the two-phase range-partitioned
    * cumsum, NOT a single-partition window, so the scan holds at
    * corpus scale. */
  private val qTokenBudget = BoundQuery("q_token_budget", (s, d) => {
    val toks = tokens(col("text"))
    val scored = Tables.documents(s, d)
      .where(size(toks) > 0)
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        round(qualityScore(col("text")) * 1e6, 0).cast("long").as("quality_u"))
    graft.operators.Ranking.globalCumSum(scored, col("n_tokens"), "cum_tokens",
        desc("quality_u"), col("doc_id"))
      .where(col("cum_tokens") <= 10000L)
      .select(col("doc_id"), col("n_tokens"),
        round(col("quality_u").cast("double") / 1e6, 6).as("quality"),
        col("cum_tokens"))
      .orderBy(desc("quality_u"), asc("doc_id"))
      .drop("quality_u")
  }, Some("""
    WITH t AS (
      SELECT doc_id, text, list_filter(string_split(text,' '), x -> x <> '') AS toks
      FROM documents),
    scored AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(round((0.5 * least(CAST(len(toks) AS BIGINT)::DOUBLE / 100.0, 1.0)
          + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT)::DOUBLE
                          / CAST(length(text) AS DOUBLE))
          + 0.2 * least(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS BIGINT)::DOUBLE
                          / CAST(len(toks) AS DOUBLE) * 5.0, 1.0)) * 1e6, 0) AS BIGINT) AS quality_u
      FROM t WHERE len(toks) > 0),
    run AS (
      SELECT doc_id, n_tokens, quality_u,
        sum(n_tokens) OVER (ORDER BY quality_u DESC, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM scored)
    SELECT doc_id, n_tokens, round(CAST(quality_u AS DOUBLE) / 1e6, 6) AS quality,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM run WHERE cum_tokens <= 10000
    ORDER BY quality_u DESC, doc_id
  """))

  /** PMI collocation mining: the strongest two-word collocations in
    * the corpus by pointwise mutual information over adjacent token
    * pairs — ln(c12·N / (c1·c2)) with positional unigram marginals
    * (w1 = first slot, w2 = second slot), the classic collocation
    * statistic (Church & Hanks 1990). Complements q_bigram_lm
    * (transition probability) and q_repetition_filter (share-based
    * boilerplate): PMI surfaces pairs that co-occur far above chance
    * regardless of absolute frequency.
    *
    * Scale shape: one exploded bigram table feeds three partial-agg
    * shuffles (pair, two marginals) and a broadcast-1-row total; the
    * min-count filter prunes the candidate table BEFORE the marginal
    * joins, and the top-50 plans as TakeOrderedAndProject, never a
    * global sort. Determinism: each ln rounds to integer micro-nats,
    * so ordering and output compare as exact longs on any engine;
    * (pmi_u desc, w1, w2) is a total order, making the limit
    * deterministic. */
  private val qPmiCollocations = BoundQuery("q_pmi_collocations", (s, d) => {
    val docs = Tables.documents(s, d)
      .select(tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 2)
    val bigrams = graft.util.CacheScope.persist(docs
      .select(explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("bg"))
      .select(col("bg.0").as("w1"), col("bg.1").as("w2")))
    val c12 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .where(col("c12") >= 5)
    val c1 = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val c2 = bigrams.groupBy("w2").agg(count(lit(1)).as("c2"))
    val n = bigrams.agg(count(lit(1)).as("n"))
    c12.join(c1, "w1").join(c2, "w2").crossJoin(broadcast(n))
      .withColumn("pmi_u",
        round(log(col("c12").cast("double") * col("n").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double"))) * 1e6, 0)
          .cast("long"))
      .orderBy(desc("pmi_u"), asc("w1"), asc("w2"))
      .limit(50)
      .select(col("w1"), col("w2"), col("c12"),
        round(col("pmi_u").cast("double") / 1e6, 6).as("pmi"))
  }, Some("""
    WITH docs AS (
      SELECT list_filter(string_split(text,' '), x -> x <> '') AS toks
      FROM documents),
    bigrams AS (
      SELECT toks[i] AS w1, toks[i+1] AS w2
      FROM (SELECT toks, unnest(range(1, len(toks))) AS i
            FROM docs WHERE len(toks) >= 2)),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM bigrams GROUP BY 1, 2 HAVING count(*) >= 5),
    c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bigrams GROUP BY 1),
    c2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM bigrams GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bigrams),
    scored AS (
      SELECT w1, w2, c12,
        CAST(round(ln(CAST(c12 AS DOUBLE) * CAST(n AS DOUBLE) /
          (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) * 1e6, 0) AS BIGINT) AS pmi_u
      FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n)
    SELECT w1, w2, c12, round(CAST(pmi_u AS DOUBLE) / 1e6, 6) AS pmi
    FROM scored ORDER BY pmi_u DESC, w1, w2 LIMIT 50
  """))

  /** Class-based TF-IDF (the BERTopic c-TF-IDF idea, Grootendorst
    * 2022): treat each SOURCE as one pseudo-document and surface the
    * terms most distinctive of it — term frequency within the source
    * weighted by a BM25-style idf over source-level document
    * frequency. The per-source top-5 is what a corpus card shows as
    * "what does this slice talk about".
    *
    * Exactness: the idf factor is rounded to integer micro-nats per
    * (source, term) row BEFORE ranking, so ordering is exact long
    * compare (engine- and partition-invariant); ties break on term.
    *
    * Shape at 100 TB: one token explode → (source, term) count (map-
    * side partial agg), a source-level df aggregate small enough to
    * broadcast (≤ vocab), and a per-source rank that plans as
    * WindowGroupLimit — no global sort anywhere. */
  private val qCtfidf = BoundQuery("q_ctfidf", (s, d) => {
    val docs = Tables.documents(s, d)
    val tf = docs.select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
      .where(col("tf") >= 5)
    val nSources = docs.agg(countDistinct(col("source")).as("s_tot"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfc), "term").crossJoin(broadcast(nSources))
      .withColumn("score_u", round(
        col("tf").cast("double")
          * log(lit(1.0) + (col("s_tot").cast("double") - col("df").cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5)))
          * 1e6, 0).cast("long"))
    TopKPerGroup.topK(scored, Seq(col("source")),
        Seq(desc("score_u"), col("term")), 5)
      .select(col("source"), col("term"), col("tf"), col("df"),
        round(col("score_u").cast("double") / 1e6, 6).as("ctfidf"), col("rnk"))
      .orderBy("source", "rnk")
  }, Some("""
    WITH tf AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT source,
              unnest(list_filter(string_split(text,' '), x -> x <> '')) AS term
            FROM documents)
      GROUP BY 1, 2 HAVING count(*) >= 5),
    ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS s_tot FROM documents),
    dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT source, term, tf, df,
        CAST(round(CAST(tf AS DOUBLE)
          * ln(1.0 + (CAST(s_tot AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
            / (CAST(df AS DOUBLE) + 0.5)) * 1e6, 0) AS BIGINT) AS score_u
      FROM tf JOIN dfc USING (term) CROSS JOIN ns),
    ranked AS (
      SELECT source, term, tf, df,
             round(CAST(score_u AS DOUBLE) / 1e6, 6) AS ctfidf,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY score_u DESC, term) AS BIGINT) AS rnk
      FROM scored)
    SELECT source, term, tf, df, ctfidf, rnk
    FROM ranked WHERE rnk <= 5 ORDER BY source, rnk
  """))

  /** Dataset card: the per-source + corpus-total summary table a
    * release ships next to the data (docs, corpus share, languages,
    * chars, whitespace tokens, mean and median length). The text is
    * scanned ONCE (token counts per row); per-source medians are
    * TYPE-1 order statistics over source-partitioned windows, and the
    * TOTAL row is derived from the per-source aggregates (sums of
    * exact longs) — deliberately NO global median, because a global
    * rank is a single-task sort at corpus scale; the approx-quantile
    * sketch (q_approx_quantiles) is the scale path for that.
    *
    * share_ppm is integer division over exact longs — no float in
    * any comparison. */
  private val qDatasetCard = BoundQuery("q_dataset_card", (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, d).select(col("source"), col("lang"),
      col("doc_id"), col("n_chars"),
      size(tokens(col("text"))).cast("long").as("tok"))
    val w = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    val part = Window.partitionBy("source")
    val ranked = base
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("p50v",
        max(when(col("rn") === expr("(n + 1) div 2"), col("n_chars"))).over(part))
    val src = ranked.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("n_chars")).as("chars_sum"),
      sum(col("tok")).as("tokens_sum"),
      min(col("p50v")).as("p50_chars"))
    val langs = Tables.documents(s, d).agg(countDistinct(col("lang")).as("nl"))
    val tot = src.agg(
        sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum(col("chars_sum")).as("chars_sum"),
        sum(col("tokens_sum")).as("tokens_sum"))
      .crossJoin(broadcast(langs))
    val totDocs = tot.select(col("n_docs").as("td"))
    val srcRows = src.crossJoin(broadcast(totDocs)).select(
      lit("source").as("section"), col("source").as("name"),
      col("n_docs"), expr("(n_docs * 1000000) div td").as("share_ppm"),
      col("n_langs"), col("chars_sum"), col("tokens_sum"),
      round(col("chars_sum").cast("double") / col("n_docs").cast("double"), 6).as("mean_chars"),
      col("p50_chars"))
    val totRow = tot.select(
      lit("total").as("section"), lit("ALL").as("name"),
      col("n_docs"), lit(1000000L).as("share_ppm"),
      col("nl").as("n_langs"), col("chars_sum"), col("tokens_sum"),
      round(col("chars_sum").cast("double") / col("n_docs").cast("double"), 6).as("mean_chars"),
      lit(null).cast("long").as("p50_chars"))
    srcRows.unionAll(totRow).orderBy("section", "name")
  }, Some("""
    WITH base AS (
      SELECT source, lang, doc_id, n_chars,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS tok
      FROM documents),
    ranked AS (
      SELECT source, lang, n_chars, tok,
        row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        count(*) OVER (PARTITION BY source) AS n
      FROM base),
    fenced AS (
      SELECT source, lang, n_chars, tok,
        max(CASE WHEN rn = (n + 1) // 2 THEN n_chars END)
          OVER (PARTITION BY source) AS p50v
      FROM ranked),
    src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        CAST(sum(n_chars) AS BIGINT) AS chars_sum,
        CAST(sum(tok) AS BIGINT) AS tokens_sum,
        CAST(min(p50v) AS BIGINT) AS p50_chars
      FROM fenced GROUP BY source),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs,
        CAST(sum(chars_sum) AS BIGINT) AS chars_sum,
        CAST(sum(tokens_sum) AS BIGINT) AS tokens_sum
      FROM src),
    nl AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS nl FROM documents)
    SELECT * FROM (
      SELECT 'source' AS section, src.source AS name, src.n_docs,
        CAST((src.n_docs * 1000000) // tot.n_docs AS BIGINT) AS share_ppm,
        src.n_langs, src.chars_sum, src.tokens_sum,
        round(CAST(src.chars_sum AS DOUBLE) / CAST(src.n_docs AS DOUBLE), 6) AS mean_chars,
        src.p50_chars
      FROM src CROSS JOIN tot
      UNION ALL
      SELECT 'total', 'ALL', tot.n_docs, CAST(1000000 AS BIGINT),
        nl.nl, tot.chars_sum, tot.tokens_sum,
        round(CAST(tot.chars_sum AS DOUBLE) / CAST(tot.n_docs AS DOUBLE), 6),
        CAST(NULL AS BIGINT)
      FROM tot CROSS JOIN nl)
    ORDER BY section, name
  """))

  /** Boilerplate-span SCRUB — the transform q_boilerplate_spans only
    * measures: every 8-token span occurring in ≥2 distinct docs marks
    * its token range for removal, overlapping ranges union per doc
    * (the q_interval_coverage gaps-and-islands merge on token
    * positions), and each doc reports how much of it survives. This
    * is the span-level dedup step (Lee et al. 2022 "Deduplicating
    * Training Data...") between doc-level dedup and quality filters.
    *
    * Shape at 100 TB: span blocking is the same shuffle the span
    * mining already pays (grams → groupBy); the interval merge is a
    * doc-partitioned window over span STARTS (≤ tokens per doc);
    * nothing global. All arithmetic on integer token positions. */
  private val qSpanScrub = BoundQuery("q_span_scrub", (s, d) => {
    val docs = graft.util.CacheScope.persist(
      Tables.documents(s, d)
        .select(col("doc_id"),
          filter(split(col("text"), " "), w => w =!= lit("")).as("w"))
        .withColumn("n", size(col("w")).cast("long"))
        .where(col("n") >= 8))
    val grams = graft.util.CacheScope.persist(
      docs.select(col("doc_id"),
          posexplode(transform(sequence(lit(1), (col("n") - 7).cast("int")),
            i => concat_ws(" ", slice(col("w"), i, lit(8))))).as(Seq("p", "g")))
        .select(col("doc_id"), (col("p") + 1).cast("long").as("i"), col("g")))
    val shared = grams.groupBy("g").agg(countDistinct(col("doc_id")).as("dc"))
      .where(col("dc") >= 2).select("g")
    val wDoc = Window.partitionBy("doc_id").orderBy("s")
    val cov = grams.join(shared, "g")
      .select(col("doc_id"), col("i").as("s"), (col("i") + 8).as("e"))
      .withColumn("prev_max_e", max(col("e")).over(
        wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("prev_max_e") < col("s"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min(col("s")).as("is_"), max(col("e")).as("ie"))
      .groupBy("doc_id").agg(sum(col("ie") - col("is_")).as("n_removed"))
    docs.select(col("doc_id"), col("n").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        (col("n_tokens") - coalesce(col("n_removed"), lit(0L))).as("n_kept"))
      .orderBy("doc_id")
  }, Some("""
    WITH docs AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents),
    sized AS (
      SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM docs
      WHERE len(w) >= 8),
    grams AS (
      SELECT doc_id, CAST(i AS BIGINT) AS i,
        w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
        w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS g
      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM sized)),
    shared AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    cov AS (
      SELECT doc_id, i AS s, i + 8 AS e FROM grams JOIN shared USING (g)),
    flagged AS (
      SELECT doc_id, s, e,
        CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) < s
             OR max(e) OVER (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        THEN 1 ELSE 0 END AS new_island
      FROM cov),
    islands AS (
      SELECT doc_id, s, e,
        sum(new_island) OVER (PARTITION BY doc_id ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged),
    merged AS (
      SELECT doc_id, island, min(s) AS is_, max(e) AS ie
      FROM islands GROUP BY 1, 2),
    rem AS (
      SELECT doc_id, CAST(sum(ie - is_) AS BIGINT) AS n_removed
      FROM merged GROUP BY 1)
    SELECT sized.doc_id, n AS n_tokens,
      COALESCE(n_removed, 0) AS n_removed,
      n - COALESCE(n_removed, 0) AS n_kept
    FROM sized LEFT JOIN rem ON sized.doc_id = rem.doc_id
    ORDER BY sized.doc_id
  """))

  /** word2vec-style negative-sampling table (Mikolov 2013): unigram
    * counts tempered to the ¾ power, normalized to sampling
    * probabilities. Each token's c^0.75 rounds ONCE to micro-units
    * (pow is the only float op, identical IEEE on identical doubles);
    * the normalizer is then an exact long sum and every probability
    * one integral division — so the table is partition-invariant and
    * engine-exact despite the fractional power. Top-50 by tempered
    * mass via TakeOrdered; the flattening is visible as
    * prob_ppm < raw share for head tokens. */
  private val qUnigramSampling = BoundQuery("q_unigram_sampling", (s, d) => {
    val counts = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .withColumn("t_u",
        round(pow(col("c").cast("double"), 0.75) * 1e6, 0).cast("long"))
    val tot = counts.agg(sum(col("t_u")).as("tt"), sum(col("c")).as("tc"))
    counts.crossJoin(broadcast(tot))
      .select(col("token"), col("c"),
        expr("(1000000 * t_u) div tt").as("prob_ppm"),
        expr("(1000000 * c) div tc").as("raw_ppm"))
      .orderBy(desc("c"), col("token")).limit(50)
  }, Some("""
    WITH counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c,
        CAST(round(pow(CAST(count(*) AS DOUBLE), 0.75) * 1e6, 0) AS BIGINT)
          AS t_u
      FROM (SELECT unnest(list_filter(string_split(text,' '), x -> x <> ''))
              AS token FROM documents)
      GROUP BY token),
    tot AS (SELECT CAST(sum(t_u) AS BIGINT) AS tt,
                   CAST(sum(c) AS BIGINT) AS tc FROM counts)
    SELECT token, c,
      (1000000 * t_u) // tt AS prob_ppm,
      (1000000 * c) // tc AS raw_ppm
    FROM counts CROSS JOIN tot
    ORDER BY c DESC, token LIMIT 50
  """))

  /** Needle-in-haystack contamination: exact VERBATIM substring
    * search for benchmark "needles" across the whole corpus — the
    * check that catches what q_contamination's 8-gram blocking can
    * miss (a needle straddling tokenization, punctuation-fused
    * grams) and what near-dup never looks for (a single quoted
    * sentence inside an otherwise-novel doc). Needles are 32-char
    * cores of every 97th doc (the stand-in for a held-out benchmark
    * set); the scan is corpus × broadcast(needles) with a
    * codegen'd `contains` — a benchmark needle set is KBs at any
    * corpus scale, so the broadcast side never grows with data.
    * Output: per needle, the count of OTHER docs containing it
    * verbatim (hits > 0 ⇒ leaked). */
  private val qNeedleContamination = BoundQuery("q_needle_contamination", (s, d) => {
    val docs = Tables.documents(s, d)
    val needles = docs.where(col("doc_id") % 97 === 0 && length(col("text")) >= 48)
      .select(col("doc_id").as("needle_doc"),
        substring(col("text"), 9, 32).as("needle"))
    // one corpus scan: aggregate hits per needle (a needle-sized
    // handful), then left-join the needle set to it so zero-hit
    // needles report 0 without re-scanning the corpus
    val hits = docs.crossJoin(broadcast(needles))
      .where(col("doc_id") =!= col("needle_doc") &&
        col("text").contains(col("needle")))
      .groupBy("needle_doc", "needle")
      .agg(count(lit(1)).as("n_hits"))
    needles.join(broadcast(hits), Seq("needle_doc", "needle"), "left")
      .select(col("needle_doc"), col("needle"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .orderBy("needle_doc")
  }, Some("""
    WITH needles AS (
      SELECT doc_id AS needle_doc, substring(text, 9, 32) AS needle
      FROM documents WHERE doc_id % 97 = 0 AND length(text) >= 48),
    hits AS (
      SELECT n.needle_doc, n.needle, CAST(count(*) AS BIGINT) AS n_hits
      FROM documents d CROSS JOIN needles n
      WHERE d.doc_id <> n.needle_doc AND contains(d.text, n.needle)
      GROUP BY 1, 2)
    SELECT needle_doc, needle, n_hits FROM hits
    UNION ALL
    SELECT n.needle_doc, n.needle, CAST(0 AS BIGINT)
    FROM needles n WHERE n.needle_doc NOT IN (SELECT needle_doc FROM hits)
    ORDER BY needle_doc
  """))

  val all: Seq[BoundQuery] =
    Seq(qStratifiedSample, qMixtureSample, qContamination,
      qRepetitionFilter, qBpeEncode, qBoilerplateSpans, qSourceOverlap,
      qTokenBudget, qPmiCollocations, qCtfidf, qDatasetCard, qSpanScrub,
      qUnigramSampling, qNeedleContamination)
}
