package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions.tokens

/** SURVEY §2.4 round-4 document-processing wave 2: unsupervised
  * keyword extraction and RAG-style overlapping chunking — the
  * retrieval-prep transforms between "curated corpus" and "index".
  */
object CorpusQueries2 {

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-delimited token runs; a word scores
    * deg(w)/freq(w) where deg counts phrase-mate co-occurrences
    * (including itself) and freq its appearances; a phrase scores the
    * sum of its member scores. Corpus-level top-50 phrases. Scores
    * stay exact: each word score is ONE integral division to ppm and
    * phrase scores are integer sums of those.
    *
    * Scale shape: phrase segmentation is the gaps-and-islands cumsum
    * partitioned by doc (scales with one doc's length); word stats are
    * a vocabulary-keyed aggregation; scoring joins member rows to the
    * stats table on the word key (equi join, skew bounded by stopword
    * filtering); the final top-50 collapses to TakeOrdered — no
    * global sort, no cartesian, no single-partition window. */
  private val qRake = BoundQuery("q_rake", (s, d) => {
    val stop = Seq("the", "a", "of", "and", "to")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val members = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("stopf", when(col("tok").isin(stop: _*), 1L)
        .otherwise(0L))
      .withColumn("island", sum(col("stopf"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("stopf") === 0)
      .withColumn("plen", count(lit(1))
        .over(Window.partitionBy("doc_id", "island")))
    val wordStats = members.groupBy("tok").agg(
        count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("wscore_ppm", expr("(1000000 * deg) div freq"))
    members.join(wordStats.select("tok", "wscore_ppm"), "tok")
      .groupBy(col("doc_id"), col("island"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("wscore_ppm")).as("score_ppm"))
      .groupBy("phrase")
      .agg(max(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occur"),
        max(col("score_ppm")).as("score_ppm"))
      .select(col("phrase"), col("n_words"), col("n_occur"),
        round(col("score_ppm").cast("double") / 1e6, 6).as("score"))
      .orderBy(desc("score"), col("phrase")).limit(50)
  }, Some("""
    WITH tk AS (
      SELECT doc_id, pos, toks[pos] AS tok
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks)+1)) AS pos
            FROM (SELECT doc_id,
                    list_filter(string_split(text, ' '), x -> x <> '') AS toks
                  FROM documents))),
    fl AS (
      SELECT doc_id, pos, tok,
        CASE WHEN tok IN ('the','a','of','and','to') THEN 1 ELSE 0 END AS stopf
      FROM tk),
    isl AS (
      SELECT * FROM (
        SELECT doc_id, pos, tok, stopf,
          sum(stopf) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM fl)
      WHERE stopf = 0),
    mem AS (
      SELECT doc_id, pos, tok, island,
        CAST(count(*) OVER (PARTITION BY doc_id, island) AS BIGINT) AS plen
      FROM isl),
    ws AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS deg
      FROM mem GROUP BY 1),
    ws2 AS (SELECT tok, (1000000 * deg) // freq AS wscore_ppm FROM ws),
    ph AS (
      SELECT doc_id, island,
        string_agg(tok, ' ' ORDER BY pos) AS phrase,
        CAST(count(*) AS BIGINT) AS n_words,
        CAST(sum(wscore_ppm) AS BIGINT) AS score_ppm
      FROM mem JOIN ws2 USING (tok)
      GROUP BY 1, 2)
    SELECT phrase, max(n_words) AS n_words,
      CAST(count(*) AS BIGINT) AS n_occur,
      round(CAST(max(score_ppm) AS DOUBLE) / 1e6, 6) AS score
    FROM ph GROUP BY 1
    ORDER BY score DESC, phrase LIMIT 50
  """))

  /** RAG-style overlapping chunker: each document's token stream is
    * cut into 128-token windows at a 96-token stride (32-token
    * overlap), the retrieval-index layout that keeps every passage
    * boundary covered by some chunk. Emits exact token spans plus an
    * md5 of each chunk's text — the identity a downstream index or
    * cache would key on.
    *
    * Scale shape: pure per-row arithmetic — chunk indices come from a
    * sequence() explode sized by the doc's own length ((n−1) div 96
    * + 1 chunks), the slice/hash is per-row compute, and no shuffle
    * exists at all beyond the final presentation sort. A doc never
    * amplifies more than ~n/96 rows, so output stays linear in corpus
    * tokens. */
  private val qChunkOverlap = BoundQuery("q_chunk_overlap", (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .where(col("n") > 0)
    docs.select(col("doc_id"), col("n"), col("toks"),
        explode(sequence(lit(0L), expr("(n - 1) div 96"))).as("ci"))
      .withColumn("start_tok", col("ci") * 96)
      .withColumn("len_toks", least(lit(128L), col("n") - col("start_tok")))
      .withColumn("chunk_md5", md5(concat_ws(" ",
        slice(col("toks"), (col("start_tok") + 1).cast("int"),
          col("len_toks").cast("int")))))
      .select(col("doc_id"), col("ci").as("chunk_idx"), col("start_tok"),
        col("len_toks"), col("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }, Some("""
    WITH d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    d2 AS (
      SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
      FROM d WHERE len(toks) > 0),
    c AS (
      SELECT doc_id, n, toks, unnest(range(0, (n-1)//96 + 1)) AS ci
      FROM d2)
    SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
      CAST(ci*96 AS BIGINT) AS start_tok,
      CAST(least(128, n - ci*96) AS BIGINT) AS len_toks,
      md5(array_to_string(
        toks[(ci*96 + 1):(ci*96 + least(128, n - ci*96))], ' ')) AS chunk_md5
    FROM c ORDER BY doc_id, chunk_idx
  """))

  /** Tokenizer-vocabulary coverage: fix the vocabulary to the corpus
    * top-20 tokens (frequency, lexicographic tiebreak) and report each
    * source's out-of-vocabulary token rate in exact ppm — the
    * coverage/OOV audit run before committing to a tokenizer, telling
    * you which source a fixed vocab underserves.
    *
    * Scale shape: vocab selection is a vocabulary-keyed aggregation
    * collapsed by TakeOrdered (top-V, never a global sort); the
    * small vocab broadcasts back over the token stream; per-source
    * rates are one map-side-combined aggregation. At a real 100 TB
    * corpus V grows to ~1e5 — still broadcast-sized. */
  private val qOov = BoundQuery("q_oov", (s, d) => {
    val tf = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val vocab = tf.groupBy("tok").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("tok")).limit(20)
      .select(col("tok"), lit(1L).as("inv"))
    tf.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        expr("(1000000 * n_oov) div n_tokens").as("oov_ppm"))
      .orderBy("source")
  }, Some("""
    WITH tf AS (
      SELECT source,
        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS freq FROM tf GROUP BY 1)
      ORDER BY freq DESC, tok LIMIT 20)
    SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
      CAST(sum(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_oov,
      CAST((1000000 * sum(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END))
           // count(*) AS BIGINT) AS oov_ppm
    FROM tf LEFT JOIN vocab ON tf.tok = vocab.tok
    GROUP BY source ORDER BY source
  """))

  /** Training-order INTERLEAVE AUDIT: after the standard hash shuffle
    * (stream position = md5(doc_id) order), is each window of the
    * training stream actually well-mixed across sources, or do
    * same-source runs survive? Stream windows are HASH-RANGE buckets
    * (the first 3 hex digits of the doc hash, folded to 64 buckets)
    * — exactly how a 1000-executor pipeline would stripe the stream,
    * and crucially NOT a global row_number (no single-partition
    * window anywhere; every window partitions by bucket). Per
    * bucket: source count, source-mix entropy in µ-nats (exact
    * counts; ln rounds once per term, the established µ-nat rule),
    * and the longest same-source run in hash order
    * (gaps-and-islands). Long runs / low entropy flag order-
    * correlated batches before they bias a training job. */
  private val qInterleaveAudit = BoundQuery("q_interleave_audit", (s, d) => {
    val ordered = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("bucket", expr("conv(substring(h, 1, 3), 16, 10) % 64")
        .cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("bucket").orderBy("h", "doc_id")).cast("long"))
    val runs = ordered
      .withColumn("grp", col("rn") - row_number().over(
        Window.partitionBy("bucket", "source").orderBy("rn")))
      .groupBy("bucket", "source", "grp").agg(count(lit(1)).as("runlen"))
    val maxRun = runs.groupBy("bucket").agg(max(col("runlen")).as("max_run"))
    val perSrc = ordered.groupBy("bucket", "source").agg(count(lit(1)).as("c"))
    val ent = perSrc
      .withColumn("n", sum(col("c")).over(Window.partitionBy("bucket")))
      .withColumn("term",
        col("c") * round(log(col("n").cast("double") / col("c").cast("double"))
          * 1e6, 0).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_sources"), max(col("n")).as("n_docs"),
        expr("sum(term) div max(n)").as("entropy_micro"))
    ent.join(maxRun, "bucket")
      .select(col("bucket"), col("n_docs"), col("n_sources"),
        col("entropy_micro"), col("max_run"))
      .orderBy("bucket")
  }, Some("""
    WITH hashed AS (
      SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    bucketed AS (
      SELECT doc_id, source, h,
        CAST(((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substring(h, 3, 1)) - 1)) % 64
          AS BIGINT) AS bucket
      FROM hashed),
    rns AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id)
        AS BIGINT) AS rn
      FROM bucketed),
    runs AS (
      SELECT bucket, CAST(max(runlen) AS BIGINT) AS max_run FROM (
        SELECT bucket, source, grp, count(*) AS runlen FROM (
          SELECT bucket, source, rn,
            rn - row_number() OVER (PARTITION BY bucket, source ORDER BY rn) AS grp
          FROM rns)
        GROUP BY bucket, source, grp)
      GROUP BY bucket),
    persrc AS (
      SELECT bucket, source, CAST(count(*) AS BIGINT) AS c
      FROM bucketed GROUP BY 1, 2),
    ent AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_sources,
        CAST(max(n) AS BIGINT) AS n_docs,
        CAST(sum(term) // max(n) AS BIGINT) AS entropy_micro
      FROM (
        SELECT bucket, source, c,
          sum(c) OVER (PARTITION BY bucket) AS n,
          c * CAST(round(ln(CAST(sum(c) OVER (PARTITION BY bucket) AS DOUBLE)
                           / CAST(c AS DOUBLE)) * 1e6, 0) AS BIGINT) AS term
        FROM persrc)
      GROUP BY bucket)
    SELECT e.bucket, n_docs, n_sources, entropy_micro, max_run
    FROM ent e JOIN runs r ON r.bucket = e.bucket
    ORDER BY e.bucket
  """))

  /** Template-opener dedup: duplicate classes keyed on the first
    * 8 tokens — the "Chapter one." / boilerplate-header detector that
    * exact dedup (whole-text) and shingle near-dup (anywhere in the
    * doc) both miss as a CLASS readout. Prefix classes with ≥2 docs,
    * their sizes, and the share of the corpus opening identically.
    * One prefix-keyed partial agg; at 100 TB the prefix string would
    * be its ShingleHash64, the shape is unchanged. */
  private val qPrefixDedup = BoundQuery("q_prefix_dedup", (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        array_join(slice(tokens(col("text")), 1, 8), " ").as("prefix"))
    val tot = docs.agg(count(lit(1)).as("t"))
    docs.groupBy("prefix").agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= 2)
      .crossJoin(broadcast(tot))
      .select(col("prefix"), col("n_docs"), col("first_doc"),
        expr("(n_docs * 1000000) div t").as("share_ppm"))
      .orderBy(desc("n_docs"), col("prefix"))
      .limit(50)
  }, Some("""
    WITH docs AS (
      SELECT doc_id,
        array_to_string((list_filter(string_split(text,' '), x -> x <> ''))[1:8], ' ')
          AS prefix
      FROM documents),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM docs)
    SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(min(doc_id) AS BIGINT) AS first_doc,
      CAST((count(*) * 1000000) // max(t) AS BIGINT) AS share_ppm
    FROM docs CROSS JOIN tot
    GROUP BY prefix HAVING count(*) >= 2
    ORDER BY n_docs DESC, prefix LIMIT 50
  """))

  /** Distinctive vocabulary per source by smoothed LOG-ODDS RATIO
    * (Monroe, Colaresi & Quinn 2008, the informative-Dirichlet-prior
    * "Fightin' Words" statistic): for each (source, token), the
    * log-odds of the token in that source vs the REST of the corpus,
    * both sides smoothed by the corpus-wide prior, z-scored by the
    * delta's approximate variance (1/(c+αc) + 1/(r+αr)). What TF-IDF
    * is to documents, this is to corpus slices — the principled
    * "what words make this source different" table. Exact counts;
    * each ln/sqrt value derives from integer operands in identical
    * expression trees; top-5 per source by z with token tie-break —
    * a WindowGroupLimit, never a global sort. */
  private val qLogOdds = BoundQuery("q_log_odds", (s, d) => {
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
    val cs = graft.util.CacheScope.persist(
      tok.groupBy("source", "w").agg(count(lit(1)).as("c")))
    val totS = cs.groupBy("source").agg(sum("c").as("ns"))
    val totW = cs.groupBy("w").agg(sum("c").as("cw"))
    val grand = cs.agg(sum("c").as("ng"))
    val j = cs.join(totS, "source").join(totW, "w")
      .crossJoin(broadcast(grand))
      // rest-of-corpus counts and the Dirichlet prior scaled to a=1000
      .withColumn("r", col("cw") - col("c"))
      .withColumn("nr", col("ng") - col("ns"))
      .withColumn("ac", (col("cw").cast("double") * 1000.0) / col("ng").cast("double"))
      .withColumn("delta",
        log((col("c").cast("double") + col("ac")) /
          (col("ns").cast("double") + 1000.0 - col("c").cast("double") - col("ac"))) -
        log((col("r").cast("double") + col("ac")) /
          (col("nr").cast("double") + 1000.0 - col("r").cast("double") - col("ac"))))
      .withColumn("z", col("delta") /
        sqrt(lit(1.0) / (col("c").cast("double") + col("ac")) +
          lit(1.0) / (col("r").cast("double") + col("ac"))))
    graft.operators.TopKPerGroup.topK(
      j.select(col("source"), col("w"), col("c"), round(col("z"), 6).as("z")),
      Seq(col("source")), Seq(desc("z"), col("w")), 5, rankCol = "rnk")
      .orderBy("source", "rnk")
  }, Some("""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS w
      FROM documents),
    cs AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
    tots AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cs GROUP BY 1),
    totw AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM cs GROUP BY 1),
    grand AS (SELECT CAST(sum(c) AS BIGINT) AS ng FROM cs),
    scored AS (
      SELECT cs.source, cs.w, cs.c,
        (ln((CAST(c AS DOUBLE) + ac) /
            (CAST(ns AS DOUBLE) + 1000.0 - CAST(c AS DOUBLE) - ac)) -
         ln((CAST(r AS DOUBLE) + ac) /
            (CAST(nr AS DOUBLE) + 1000.0 - CAST(r AS DOUBLE) - ac)))
        / sqrt(1.0 / (CAST(c AS DOUBLE) + ac) + 1.0 / (CAST(r AS DOUBLE) + ac)) AS z
      FROM (
        SELECT cs.source, cs.w, cs.c, tots.ns, totw.cw, grand.ng,
          totw.cw - cs.c AS r, grand.ng - tots.ns AS nr,
          (CAST(totw.cw AS DOUBLE) * 1000.0) / CAST(grand.ng AS DOUBLE) AS ac
        FROM cs JOIN tots USING (source) JOIN totw USING (w) CROSS JOIN grand
      ) cs)
    SELECT source, w, c, z, rnk FROM (
      SELECT source, w, c, round(z, 6) AS z,
        CAST(row_number() OVER (PARTITION BY source
              ORDER BY round(z, 6) DESC, w) AS BIGINT) AS rnk
      FROM scored) WHERE rnk <= 5
    ORDER BY source, rnk
  """))

  val all: Seq[BoundQuery] = Seq(qRake, qChunkOverlap, qOov, qInterleaveAudit,
    qPrefixDedup, qLogOdds)
}
