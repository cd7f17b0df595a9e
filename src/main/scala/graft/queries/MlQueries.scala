package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions.tokens
import graft.functions.VectorFunctions.toDouble
import graft.operators.TopKPerGroup

/** SURVEY §2.4 round-4 in-engine ML wave: classifiers and compression
  * whose training AND inference are pure relational algebra over
  * exact integers — so the full DuckDB oracle proves the model, not
  * just the plumbing. Complements the iterative/seeded ML that stays
  * rows-only+spec (KMeansLite, PCA, PQ).
  */
object MlQueries {

  /** Multinomial Naive Bayes language classifier, trained and
    * evaluated IN the engine, reported as a confusion matrix. Train:
    * per-(lang, token) counts with Laplace +1 smoothing over the
    * global vocabulary V; log prior ln(docs_c/docs) and log
    * likelihood ln((tf_ct+1)/(tok_c+V)) rounded to integer micro-nats
    * (q_bigram_lm rule) so document scores are EXACT long sums —
    * Σ tf·lnp_u — and argmax with a lang tie-break is an integer
    * compare, engine- and partition-invariant.
    *
    * Unseen (token, class) pairs take the class smoothing floor
    * ln(1/(tok_c+V)) via coalesce after a left join.
    *
    * Shape at 100 TB: the model is one token-explode + groupBy
    * (map-side partial agg); its size is Σ_c |vocab_c| — broadcast-
    * able for real language sets; scoring co-shuffles doc-term rows
    * with the model on token and reduces per (doc, class); the
    * argmax is a per-doc top-1 (WindowGroupLimit), never global. */
  private val qNaiveBayes = BoundQuery("q_naive_bayes", (s, d) => {
    val docs = Tables.documents(s, d)
    val dt = docs.select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("t"))
      .groupBy("doc_id", "lang", "t").agg(count(lit(1)).as("tf"))
    val classes = docs.groupBy(col("lang").as("c")).agg(count(lit(1)).as("docs_c"))
    val nDocs = docs.agg(count(lit(1)).as("docs"))
    val vocab = dt.agg(countDistinct(col("t")).as("v"))
    val tokc = dt.groupBy(col("lang").as("c")).agg(sum("tf").as("tok_c"))
    val model = dt.groupBy(col("lang").as("c"), col("t"))
      .agg(sum("tf").as("tf_ct"))
      .join(broadcast(tokc), "c").crossJoin(broadcast(vocab))
      .select(col("c"), col("t"), round(
        log((col("tf_ct") + 1).cast("double") / (col("tok_c") + col("v")).cast("double"))
          * 1e6, 0).cast("long").as("lnp_u"))
    val floor = tokc.crossJoin(broadcast(vocab))
      .join(broadcast(classes), "c").crossJoin(broadcast(nDocs))
      .select(col("c"),
        round(log(lit(1.0) / (col("tok_c") + col("v")).cast("double")) * 1e6, 0)
          .cast("long").as("floor_u"),
        round(log(col("docs_c").cast("double") / col("docs").cast("double")) * 1e6, 0)
          .cast("long").as("prior_u"))
    val scored = dt.select(col("doc_id"), col("lang"), col("t"), col("tf"))
      .crossJoin(broadcast(floor))
      .join(model, Seq("c", "t"), "left")
      .groupBy("doc_id", "lang", "c")
      .agg((sum(col("tf") * coalesce(col("lnp_u"), col("floor_u")))
        + first(col("prior_u"))).as("score_u"))
    TopKPerGroup.topK(scored, Seq(col("doc_id")),
        Seq(desc("score_u"), col("c")), 1)
      .groupBy(col("lang").as("actual"), col("c").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("actual", "predicted")
  }, Some("""
    WITH dt AS (
      SELECT doc_id, lang, t, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, lang,
              unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
            FROM documents)
      GROUP BY 1, 2, 3),
    classes AS (SELECT lang AS c, CAST(count(*) AS BIGINT) AS docs_c
                FROM documents GROUP BY 1),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS docs FROM documents),
    vocab AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM dt),
    tokc AS (SELECT lang AS c, CAST(sum(tf) AS BIGINT) AS tok_c
             FROM dt GROUP BY 1),
    model AS (
      SELECT m.lang AS c, m.t,
        CAST(round(ln(CAST(tf_ct + 1 AS DOUBLE) / CAST(tok_c + v AS DOUBLE)) * 1e6, 0)
          AS BIGINT) AS lnp_u
      FROM (SELECT lang, t, CAST(sum(tf) AS BIGINT) AS tf_ct
            FROM dt GROUP BY 1, 2) m
      JOIN tokc ON tokc.c = m.lang CROSS JOIN vocab),
    floor_t AS (
      SELECT tokc.c,
        CAST(round(ln(1.0 / CAST(tok_c + v AS DOUBLE)) * 1e6, 0) AS BIGINT) AS floor_u,
        CAST(round(ln(CAST(docs_c AS DOUBLE) / CAST(docs AS DOUBLE)) * 1e6, 0)
          AS BIGINT) AS prior_u
      FROM tokc CROSS JOIN vocab JOIN classes ON classes.c = tokc.c CROSS JOIN nd),
    scored AS (
      SELECT dt.doc_id, dt.lang, f.c,
        CAST(sum(dt.tf * COALESCE(model.lnp_u, f.floor_u)) + min(f.prior_u)
          AS BIGINT) AS score_u
      FROM dt CROSS JOIN floor_t f
      LEFT JOIN model ON model.c = f.c AND model.t = dt.t
      GROUP BY 1, 2, 3),
    pred AS (
      SELECT doc_id, lang, c,
        row_number() OVER (PARTITION BY doc_id ORDER BY score_u DESC, c) AS rn
      FROM scored)
    SELECT lang AS actual, c AS predicted, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY 1, 2 ORDER BY actual, predicted
  """))

  /** Int8 scalar quantization of the embedding collection with its
    * reconstruction-error report — the cheapest ANN compression step
    * (4× over float32; PQ is the aggressive path, q_pq_topk). Output
    * is per-dimension: the min/max scale, and the mean squared
    * reconstruction error.
    *
    * Exactness: min/max come from exact float->double casts; quant/
    * dequant are per-element double ops on identical operands in both
    * engines; each squared error is rounded to integer PICO-units
    * before summing (errors are ~(range/255)² ≈ 1e-5, so pico keeps
    * 7 significant digits), sums are exact longs, one final division.
    *
    * Shape at 100 TB: posexplode + per-dim groupBy (64 groups,
    * map-side partials), the 64-row scale table broadcast back — two
    * scans of the vector column, no shuffle wider than 64 keys. */
  private val qSq8 = BoundQuery("q_sq8", (s, d) => {
    val dims = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(toDouble(col("embedding"))).as(Seq("pos", "v")))
      .withColumn("dim", (col("pos") + 1).cast("long"))
    val scale = dims.groupBy("dim").agg(min("v").as("lo"), max("v").as("hi"))
    val err = dims.join(broadcast(scale), "dim")
      .withColumn("q", when(col("hi") > col("lo"),
        round((col("v") - col("lo")) * 255.0 / (col("hi") - col("lo")), 0)).otherwise(0.0))
      .withColumn("vq", when(col("hi") > col("lo"),
        col("lo") + col("q") * (col("hi") - col("lo")) / 255.0).otherwise(col("lo")))
      .withColumn("e2_p", round((col("v") - col("vq")) * (col("v") - col("vq")) * 1e12, 0)
        .cast("long"))
    err.groupBy("dim").agg(
        count(lit(1)).as("n"),
        round(min("v"), 6).as("lo"),
        round(max("v"), 6).as("hi"),
        sum("e2_p").as("sse_p"))
      .select(col("dim"), col("n"), col("lo"), col("hi"), col("sse_p"),
        round(col("sse_p").cast("double") / col("n").cast("double") / 1e12, 9).as("mse"))
      .orderBy("dim")
  }, Some("""
    WITH dims AS (
      SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
    scale AS (
      SELECT dim, min(v) AS lo, max(v) AS hi FROM dims GROUP BY 1),
    err AS (
      SELECT dims.dim, v, lo, hi,
        CASE WHEN hi > lo
             THEN lo + round((v - lo) * 255.0 / (hi - lo), 0) * (hi - lo) / 255.0
             ELSE lo END AS vq
      FROM dims JOIN scale USING (dim))
    SELECT dim, CAST(count(*) AS BIGINT) AS n,
      round(min(v), 6) AS lo, round(max(v), 6) AS hi,
      CAST(sum(CAST(round((v - vq) * (v - vq) * 1e12, 0) AS BIGINT)) AS BIGINT) AS sse_p,
      round(CAST(sum(CAST(round((v - vq) * (v - vq) * 1e12, 0) AS BIGINT)) AS DOUBLE)
        / CAST(count(*) AS DOUBLE) / 1e12, 9) AS mse
    FROM err GROUP BY dim ORDER BY dim
  """))

  val all: Seq[BoundQuery] = Seq(qNaiveBayes, qSq8)
}
