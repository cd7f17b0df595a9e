package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions.tokens
import graft.ml.BpeTrainer

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
    * one hash join against it. Rows-only by design (the merge table
    * comes from iterative training); BpeSpec pins the segmentation
    * against an independent single-machine reference encoder. */
  private val qBpeEncode = BoundQuery("q_bpe_encode", (s, d) => {
    val docs = Tables.documents(s, d)
    val merges = BpeTrainer.train(docs, col("text"), numMerges = 12)
    val enc = BpeTrainer.encodeWords(docs, col("text"), merges)
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .join(enc, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("toks")).cast("long")).as("n_subwords"))
      .orderBy("doc_id")
  }, None)

  val all: Seq[BoundQuery] = Seq(qStratifiedSample, qRepetitionFilter, qBpeEncode)
}
