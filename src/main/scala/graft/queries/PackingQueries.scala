package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions.{tokens, rollingFingerprint}
import graft.operators.Ranking

/** SURVEY §2.4 round-4 training-batch assembly and data selection:
  * the last two steps between "curated corpus" and "training run"
  * not yet covered — packing documents into fixed-length training
  * sequences, and DSIR-style importance weighting for domain-matched
  * data selection (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling").
  */
object PackingQueries {

  /** Concat-and-chunk sequence packing — the standard LLM pre-training
    * batch layout: documents are concatenated in a deterministic
    * hash order and the token stream is cut into fixed 512-token
    * sequences; each document reports its global token offset and the
    * range of sequence ids it lands in (a doc may straddle chunk
    * boundaries — that is the point of the layout: zero padding).
    *
    * Scale shape: the only global structure is the running token sum,
    * computed with Ranking.globalCumSum's two-phase decomposition
    * (range-partition local cumsums + per-partition offsets) — no
    * single-partition window anywhere; everything else is per-row
    * arithmetic. The hash order (md5(text), doc_id) is the corpus
    * convention (q_train_split, q_cap_per_source): partition- and
    * engine-invariant, and doubles as the shuffle that de-clusters
    * same-source runs so consecutive training sequences mix sources. */
  private val qSeqPack = BoundQuery("q_seq_pack", (s, d) => {
    val L = 512L
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("h"),
        size(tokens(col("text"))).cast("long").as("n"))
    Ranking.globalCumSum(docs, col("n"), "cum", col("h"), col("doc_id"))
      .withColumn("tok_start", col("cum") - col("n"))
      .withColumn("seq_first", expr(s"tok_start div $L"))
      .withColumn("seq_last",
        when(col("n") > 0, expr(s"(cum - 1) div $L"))
          .otherwise(expr(s"tok_start div $L")))
      .withColumn("n_seqs",
        when(col("n") > 0, col("seq_last") - col("seq_first") + 1)
          .otherwise(lit(0L)))
      .select(col("doc_id"), col("n").as("n_tokens"), col("tok_start"),
        col("seq_first"), col("seq_last"), col("n_seqs"))
      .orderBy("doc_id")
  }, Some("""
    WITH t AS (
      SELECT doc_id, md5(text) AS h,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n
      FROM documents),
    c AS (
      SELECT doc_id, n,
             sum(n) OVER (ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t)
    SELECT doc_id, n AS n_tokens, CAST(cum - n AS BIGINT) AS tok_start,
      CAST((cum - n) // 512 AS BIGINT) AS seq_first,
      CAST(CASE WHEN n > 0 THEN (cum - 1) // 512
           ELSE (cum - n) // 512 END AS BIGINT) AS seq_last,
      CAST(CASE WHEN n > 0 THEN (cum - 1) // 512 - (cum - n) // 512 + 1
           ELSE 0 END AS BIGINT) AS n_seqs
    FROM c ORDER BY doc_id
  """))

  /** DSIR-style importance weight: score every corpus document by how
    * much its hashed-unigram distribution looks like a target domain
    * (here the 'en' stratum) versus the raw corpus —
    * w(doc) = Σ_tokens log(p_target(bucket) / p_raw(bucket)) with
    * Laplace-smoothed 256-bucket hashed counts, the exact estimator
    * DSIR resamples by. The token→bucket hash is the corpus's
    * arithmetic rolling fingerprint mod 256, so the oracle replays
    * bucketing term-for-term; per-bucket log-ratios are rounded to
    * micro-nats ONCE (the q_bm25/q_pmi convention) and every
    * downstream step is exact long arithmetic.
    *
    * Scale shape: the model is a 256-row bucket table (broadcast —
    * at any corpus size); documents explode to (doc, bucket) counts
    * with map-side partial aggregation, join the broadcast model, and
    * reduce per doc — one shuffle on doc_id, no global windows. */
  private val qDsir = BoundQuery("q_dsir", (s, d) => {
    val B = 256L
    // Spread + persist: the per-char rolling hash below is the
    // dominant cost and BOTH branches (bucket model, per-doc counts)
    // read it — without the persist the interpreted fold runs twice,
    // and without Spread it inherits a file-bound single partition
    // (util.Spread doc)
    val toks = graft.util.CacheScope.persist(
      graft.util.Spread(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
        .withColumn("b", pmod(rollingFingerprint(col("tok")), lit(B))))
    val byBucket = toks.groupBy("b").agg(
      count(lit(1)).as("cnt_r"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cnt_t"))
    val totals = byBucket.agg(sum(col("cnt_r")).as("n_r"), sum(col("cnt_t")).as("n_t"))
    val model = byBucket.crossJoin(broadcast(totals))
      .select(col("b"), round(
        log(((col("cnt_t") + lit(1L)) * (col("n_r") + lit(B))).cast("double")
          / ((col("cnt_r") + lit(1L)) * (col("n_t") + lit(B))).cast("double"))
          * 1e6, 0).cast("long").as("lr_mn"))
    toks.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .join(broadcast(model), "b")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_toks"),
        sum(col("c") * col("lr_mn")).as("w_mn"))
      .select(col("doc_id"), col("n_toks"),
        round(col("w_mn").cast("double") / 1e6, 6).as("dsir_weight"))
      .orderBy("doc_id")
  }, Some("""
    WITH tk AS (
      SELECT doc_id, lang,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, len(tok) + 1),
                 i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT))),
               (a, c) -> (a*31 + c) % 1000000007) % 256 AS b
      FROM (SELECT doc_id, lang,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM documents)),
    byb AS (
      SELECT b, CAST(count(*) AS BIGINT) AS cnt_r,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
      FROM tk GROUP BY 1),
    tot AS (SELECT sum(cnt_r) AS n_r, sum(cnt_t) AS n_t FROM byb),
    model AS (
      SELECT b, CAST(round(ln(
          CAST((cnt_t + 1) * (n_r + 256) AS DOUBLE)
          / CAST((cnt_r + 1) * (n_t + 256) AS DOUBLE)) * 1e6, 0) AS BIGINT) AS lr_mn
      FROM byb, tot),
    dc AS (
      SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2)
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
      round(CAST(sum(c * lr_mn) AS DOUBLE) / 1e6, 6) AS dsir_weight
    FROM dc JOIN model USING (b)
    GROUP BY doc_id ORDER BY doc_id
  """))

  val all: Seq[BoundQuery] = Seq(qSeqPack, qDsir)
}
