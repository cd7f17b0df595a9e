package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions.tokens
import graft.operators.DbscanGrid

/** SURVEY §2.6 ML wave 2: density clustering and language-model
  * evaluation — the two remaining canonical model-side tools beside
  * the centroid/regression/classification family.
  */
object MlQueries2 {

  /** DBSCAN over the first two embedding dimensions (ε = 0.015 in
    * embedding units = 15000 micro-units, minPts = 5): dense regions
    * of the embedding projection become arbitrary-shape clusters,
    * sparse points become an explicit NOISE set — the curation signal
    * k-means can't give (it assigns every outlier to SOME centroid).
    *
    * Exactness: coordinates are micro-int quantized ONCE (float →
    * double widening is exact, round once), offset +1e6 so they are
    * non-negative (floor == truncate, both engines agree), then every
    * distance comparison is integer. Cluster id = min core id;
    * borders take the min cluster among in-range cores — fully
    * deterministic, so the DuckDB oracle replays the whole algorithm
    * from brute-force pairs + a recursive-CTE closure (the
    * q_dedup_clusters convention) while Spark runs the grid-blocked
    * linear-scaling shape (operators.DbscanGrid). */
  private val qDbscan = BoundQuery("q_dbscan", (s, d) => {
    val pts = Tables.embeddings(s, d).select(col("vec_id"),
      (round(element_at(col("embedding"), 1).cast("double") * 1e6, 0).cast("long")
        + 1000000L).as("x"),
      (round(element_at(col("embedding"), 2).cast("double") * 1e6, 0).cast("long")
        + 1000000L).as("y"))
    DbscanGrid.cluster(pts, col("vec_id"), col("x"), col("y"),
        epsU = 15000L, minPts = 5)
      .select(col("id").as("vec_id"), col("role"), col("cluster_id"))
      .orderBy("vec_id")
  }, Some("""
    WITH RECURSIVE pts AS (
      SELECT vec_id,
        CAST(round(CAST(embedding[1] AS DOUBLE)*1e6, 0) AS BIGINT) + 1000000 AS x,
        CAST(round(CAST(embedding[2] AS DOUBLE)*1e6, 0) AS BIGINT) + 1000000 AS y
      FROM embeddings),
    cand AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM pts a JOIN pts b ON a.vec_id < b.vec_id
      WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 15000*15000),
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM (
              SELECT ia AS v FROM cand UNION ALL SELECT ib AS v FROM cand) t
            GROUP BY 1),
    core AS (SELECT v FROM deg WHERE c + 1 >= 5),
    ce AS (SELECT ia AS a, ib AS b FROM cand
           WHERE ia IN (SELECT v FROM core) AND ib IN (SELECT v FROM core)),
    edges AS (SELECT a, b FROM ce UNION ALL SELECT b AS a, a AS b FROM ce),
    reach(id, rr) AS (
      SELECT v, v FROM core
      UNION
      SELECT e.b, least(r.rr, e.a) FROM reach r JOIN edges e ON r.id = e.a),
    comp AS (SELECT id, min(rr) AS cl FROM reach GROUP BY id),
    borders AS (
      SELECT j.nc AS id, min(comp.cl) AS cl FROM (
        SELECT ia AS c, ib AS nc FROM cand
          WHERE ia IN (SELECT v FROM core) AND ib NOT IN (SELECT v FROM core)
        UNION ALL
        SELECT ib AS c, ia AS nc FROM cand
          WHERE ib IN (SELECT v FROM core) AND ia NOT IN (SELECT v FROM core)) j
      JOIN comp ON j.c = comp.id GROUP BY 1)
    SELECT p.vec_id,
      CASE WHEN comp.id IS NOT NULL THEN 'core'
           WHEN borders.id IS NOT NULL THEN 'border'
           ELSE 'noise' END AS role,
      coalesce(comp.cl, borders.cl) AS cluster_id
    FROM pts p
    LEFT JOIN comp ON p.vec_id = comp.id
    LEFT JOIN borders ON p.vec_id = borders.id
    ORDER BY p.vec_id
  """))

  /** Held-out perplexity of the corpus bigram LM, per source — the
    * evaluation companion of q_bigram_lm (which scores with counts
    * from the SAME corpus, i.e. training loss). Docs hash-split
    * ~7/8 train : 1/8 test on md5(doc_id) (the engine-replayable
    * q_hash_sample gate); add-one-smoothed bigram probabilities
    * p(w2|w1) = (c12+1)/(c1+V) use TRAIN counts only (absent w1/w2 →
    * 0, the smoothing handles them), V = train bigram-target vocab
    * (the q_bigram_lm convention).
    *
    * Each distinct test bigram TYPE contributes one micro-nat-rounded
    * log term (ratio of exact ints → identical IEEE double → one
    * rounded ln, the q_js_divergence float contract) multiplied by
    * its exact occurrence count; avg NLL is a final integral division
    * to micro-nats. Lower = the LM generalizes to that source.
    *
    * Scale shape: counts are token-type-grain aggregates (partial agg
    * everywhere); the scoring join is bigram-type keyed — types grow
    * sublinearly in corpus size (Heaps' law) and the V scalar is a
    * broadcast. No window, no driver loop. */
  private val qPerplexity = BoundQuery("q_perplexity", (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"),
        (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "2")
          .as("is_test"))
      .where(size(col("toks")) >= 2)
    val bigrams = docs.select(col("doc_id"), col("source"), col("is_test"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("bg"))
      .select(col("source"), col("is_test"),
        col("bg.0").as("w1"), col("bg.1").as("w2"))
    val train = bigrams.where(!col("is_test"))
    val c12 = train.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = train.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = train.agg(countDistinct(col("w2")).as("v"))
    val testTypes = bigrams.where(col("is_test"))
      .groupBy("source", "w1", "w2").agg(count(lit(1)).as("cnt"))
    testTypes
      .join(c12, Seq("w1", "w2"), "left").na.fill(0L, Seq("c12"))
      .join(c1, Seq("w1"), "left").na.fill(0L, Seq("c1"))
      .crossJoin(broadcast(vocab))
      .withColumn("nats_u",
        round(log((col("c12") + 1).cast("double") / (col("c1") + col("v")).cast("double")) * 1e6, 0)
          .cast("long"))
      .groupBy("source")
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(-col("cnt") * col("nats_u")).as("nll_u"))
      .select(col("source"), col("n_bigrams"),
        expr("nll_u div n_bigrams").as("avg_nll_micro"))
      .orderBy("source")
  }, Some("""
    WITH docs AS (
      SELECT doc_id, source,
        list_filter(string_split(text,' '), x -> x <> '') AS toks,
        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '2' AS is_test
      FROM documents),
    bigrams AS (
      SELECT source, is_test, toks[i] AS w1, toks[i+1] AS w2
      FROM (SELECT source, is_test, toks, unnest(range(1, len(toks))) AS i
            FROM docs WHERE len(toks) >= 2)),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM bigrams WHERE NOT is_test GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
           FROM bigrams WHERE NOT is_test GROUP BY 1),
    v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v
          FROM bigrams WHERE NOT is_test),
    tt AS (SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS cnt
           FROM bigrams WHERE is_test GROUP BY 1, 2, 3),
    terms AS (
      SELECT source, cnt,
        CAST(round(ln(CAST(coalesce(c12.c12, 0) + 1 AS DOUBLE)
                      / CAST(coalesce(c1.c1, 0) + v.v AS DOUBLE)) * 1e6, 0) AS BIGINT)
          AS nats_u
      FROM tt
      LEFT JOIN c12 USING (w1, w2)
      LEFT JOIN c1 USING (w1)
      CROSS JOIN v)
    SELECT source, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
      CAST(CAST(sum(-cnt * nats_u) AS BIGINT) // CAST(sum(cnt) AS BIGINT) AS BIGINT)
        AS avg_nll_micro
    FROM terms GROUP BY source ORDER BY source
  """))

  val all: Seq[BoundQuery] = Seq(qDbscan, qPerplexity)
}
