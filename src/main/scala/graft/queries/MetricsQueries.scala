package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Similarity}

/** SURVEY §2.6 metrics wave (r5): mean average precision over the
  * retrieval fixture, corpus BLEU-2 over the near-dup pair fixture,
  * the entropy rate of the event-type Markov chain, and
  * Krippendorff's α beside Fleiss' κ — four measurement primitives
  * an eval/curation stack runs daily.
  *
  * House discipline: exact integer counts everywhere; transcendental
  * finishes (log2 / exp / sqrt) only as identical double expression
  * trees over the same exact integers; order-dependent float folds
  * pinned by sort + fold on BOTH engines (the q_ewma convention).
  */
object MetricsQueries {

  /** MAP@10 of the exact-cosine ranking against label relevance —
    * the integral cousin of q_ndcg (position-discounted) and q_mrr
    * (first hit only): AP averages precision at each relevant rank,
    * rewarding rankings that front-load ALL relevant items. Exact
    * convention: P@k in ppm by integral division, AP = Σ P@k(rel) div
    * min(n_rel, 10) — deterministic truncation on both engines.
    * Scale shape: the q_ann_topk broadcast top-k plan; everything
    * after the WindowGroupLimit is 50 rows. */
  private val qMapEval = BoundQuery("q_map_eval", (s, d) => {
    val e = Tables.embeddings(s, d)
    val top = Similarity.bruteForceTopK(
      e, col("vec_id"), col("embedding"),
      e.where(col("vec_id") < 5), col("vec_id"), col("embedding"), k = 10)
    val labels = e.select(col("vec_id").as("id"), col("label"))
    val qlab = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"))
    val rel = top.join(labels, "id").join(broadcast(qlab), "query_id")
      .select(col("query_id"), col("rnk"),
        (col("label") === col("qlabel")).cast("long").as("rel"))
    val w = Window.partitionBy("query_id").orderBy("rnk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nrel = broadcast(qlab).join(labels,
        col("label") === col("qlabel") && col("id") =!= col("query_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    rel.withColumn("cum_rel", sum(col("rel")).over(w))
      .groupBy("query_id")
      .agg(sum(when(col("rel") === 1L,
        expr("(1000000 * cum_rel) div rnk")).otherwise(0L)).as("p_sum"),
        sum(col("rel")).as("hits10"))
      .join(broadcast(nrel), "query_id")
      .select(col("query_id"), col("hits10"),
        least(col("n_rel"), lit(10L)).as("n_rel10"),
        expr("p_sum div greatest(least(n_rel, 10), 1)").as("ap_ppm"))
      .orderBy("query_id")
  }, Some(s"""
    WITH e AS (SELECT vec_id, label, embedding, ${VectorQueries.duckNorm} AS nrm
               FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS qlabel,
             a.vec_id AS id, a.label,
             round(${VectorQueries.duckCosine("a", "q")}, 6) AS cosine
      FROM e a JOIN e q ON q.vec_id < 5 AND a.vec_id <> q.vec_id),
    ranked AS (
      SELECT query_id, qlabel, label,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, id) AS BIGINT) AS rnk
      FROM scored),
    top AS (
      SELECT query_id,
        CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
        rnk,
        CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
          OVER (PARTITION BY query_id ORDER BY rnk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_rel
      FROM ranked WHERE rnk <= 10),
    nr AS (
      SELECT q.vec_id AS query_id, CAST(count(*) AS BIGINT) AS n_rel
      FROM e a JOIN e q
        ON q.vec_id < 5 AND a.label = q.label AND a.vec_id <> q.vec_id
      GROUP BY 1)
    SELECT t.query_id,
      CAST(sum(rel) AS BIGINT) AS hits10,
      least(max(n_rel), 10) AS n_rel10,
      CAST(sum(CASE WHEN rel = 1 THEN (1000000 * cum_rel) // rnk ELSE 0 END)
        AS BIGINT) // greatest(least(max(n_rel), 10), 1) AS ap_ppm
    FROM top t JOIN nr ON t.query_id = nr.query_id
    GROUP BY t.query_id ORDER BY t.query_id
  """))

  /** Corpus BLEU-2 over the q_rouge_pairs near-dup fixture, direction
    * a→b (candidate = a, reference = b): clipped unigram/bigram
    * precisions from exact min-count overlaps, brevity penalty
    * min(1, e^(1 − nb/na)), BLEU = BP·√(p1·p2) — Papineni 2002 with
    * +1 smoothing on the bigram term (Lin & Och 2004) so single-gram
    * pairs don't zero out. The counts are the exact integers; only
    * the closed-form finish runs in doubles, as identical trees.
    * Scale shape: identical to q_rouge_pairs — pair-keyed joins on
    * (doc, gram) count tables, no all-docs gram self-join. */
  private val qBleuPairs = BoundQuery("q_bleu_pairs", (s, d) => {
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, d), col("doc_id"),
        col("text"), shingleSize = 5, minJaccard = 0.3,
        maxShingleDf = Some(1000))
      .select("id_a", "id_b")
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("w"))
    def grams(n: Int) =
      (if (n == 1) docs.select(col("doc_id"), explode(col("w")).as("g"))
       else docs.select(col("doc_id"), explode(
         when(size(col("w")) >= n,
           transform(sequence(lit(1), size(col("w")) - (n - 1)),
             i => concat_ws(" ", element_at(col("w"), i),
               element_at(col("w"), i + 1))))
           .otherwise(array().cast("array<string>"))).as("g")))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    def overlap(n: Int, sfx: String) = {
      val gr = grams(n)
      val sz = gr.groupBy(col("doc_id").as(s"did$sfx"))
        .agg(sum(col("c")).as(s"n$sfx"))
      val ov = pairs
        .join(gr.as("ga"), col("id_a") === col("ga.doc_id"))
        .join(gr.as("gb"),
          col("id_b") === col("gb.doc_id") && col("ga.g") === col("gb.g"))
        .groupBy("id_a", "id_b")
        .agg(sum(least(col("ga.c"), col("gb.c"))).as(s"ov$sfx"))
      pairs.join(ov, Seq("id_a", "id_b"), "left")
        .na.fill(0L, Seq(s"ov$sfx"))
        .join(sz, col("id_a") === col(s"did$sfx")).drop(s"did$sfx")
        .withColumnRenamed(s"n$sfx", s"na$sfx")
        .join(sz.withColumnRenamed(s"n$sfx", s"nb$sfx"),
          col("id_b") === col(s"did$sfx")).drop(s"did$sfx")
    }
    val joined = overlap(1, "1").join(overlap(2, "2"), Seq("id_a", "id_b"))
    val naD = col("na1").cast("double")
    val p1 = col("ov1").cast("double") / naD
    val p2 = (col("ov2").cast("double") + 1.0) /
      (col("na2").cast("double") + 1.0)
    val bp = least(lit(1.0), exp(lit(1.0) - col("nb1").cast("double") / naD))
    joined.select(col("id_a"), col("id_b"), col("ov1"), col("ov2"),
        round(bp, 9).as("bp"),
        round(bp * sqrt(p1 * p2), 9).as("bleu2"))
      .orderBy("id_a", "id_b")
  }, Some("""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w
      FROM documents),
    docs AS (
      SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(w)-3, 1)),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS sh
      FROM toks WHERE len(w) >= 5),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS shared
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM shared
      JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      WHERE CAST(shared AS DOUBLE)/CAST(sa.n + sb.n - shared AS DOUBLE) >= 0.3),
    uni AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(w) AS g FROM toks) GROUP BY 1, 2),
    bi AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id,
              unnest(list_transform(range(1, len(w)),
                i -> w[i] || ' ' || w[i+1])) AS g
            FROM toks) GROUP BY 1, 2),
    usz AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM uni GROUP BY 1),
    bsz AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM bi GROUP BY 1),
    ov1 AS (
      SELECT id_a, id_b, CAST(sum(least(ga.c, gb.c)) AS BIGINT) AS ov1
      FROM pairs JOIN uni ga ON id_a = ga.doc_id
      JOIN uni gb ON id_b = gb.doc_id AND ga.g = gb.g
      GROUP BY 1, 2),
    ov2 AS (
      SELECT id_a, id_b, CAST(sum(least(ga.c, gb.c)) AS BIGINT) AS ov2
      FROM pairs JOIN bi ga ON id_a = ga.doc_id
      JOIN bi gb ON id_b = gb.doc_id AND ga.g = gb.g
      GROUP BY 1, 2),
    j AS (
      SELECT p.id_a, p.id_b,
        coalesce(ov1.ov1, 0) AS ov1, coalesce(ov2.ov2, 0) AS ov2,
        ua.n AS na1, ub.n AS nb1,
        coalesce(ba.n, 0) AS na2
      FROM pairs p
      LEFT JOIN ov1 ON p.id_a = ov1.id_a AND p.id_b = ov1.id_b
      LEFT JOIN ov2 ON p.id_a = ov2.id_a AND p.id_b = ov2.id_b
      JOIN usz ua ON p.id_a = ua.doc_id
      JOIN usz ub ON p.id_b = ub.doc_id
      LEFT JOIN bsz ba ON p.id_a = ba.doc_id)
    SELECT id_a, id_b, ov1, ov2,
      round(least(1.0, exp(1.0 - CAST(nb1 AS DOUBLE)/CAST(na1 AS DOUBLE))), 9)
        AS bp,
      round(least(1.0, exp(1.0 - CAST(nb1 AS DOUBLE)/CAST(na1 AS DOUBLE)))
        * sqrt((CAST(ov1 AS DOUBLE)/CAST(na1 AS DOUBLE))
             * ((CAST(ov2 AS DOUBLE) + 1.0)/(CAST(na2 AS DOUBLE) + 1.0))), 9)
        AS bleu2
    FROM j ORDER BY id_a, id_b
  """))

  /** Entropy rate of the event-type Markov chain — per-state
    * transition entropy H_s = −Σ_t p_st·log2 p_st plus the state's
    * stationary-share readout (empirical out-mass over total), the
    * "how predictable is the next user action from this state"
    * instrument on top of q_transition_matrix's raw probabilities.
    * Transition counts are exact; the per-state entropy fold runs
    * over the state's transition list SORTED BY TARGET on both
    * engines (the q_ewma pinned-fold rule), so the double sum is
    * order-identical. States are few; each fold is K-bounded. */
  private val qEntropyRate = BoundQuery("q_entropy_rate", (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val bigrams = Tables.events(s, d)
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n"))
    val perState = bigrams.groupBy("cur")
      .agg(sum(col("n")).as("out_n"),
        sort_array(collect_list(struct(col("nxt"), col("n")))).as("tr"))
    val total = perState.agg(sum(col("out_n")).as("tot"))
    perState.crossJoin(broadcast(total))
      .select(col("cur"), col("out_n"),
        expr("(1000000 * out_n) div tot").as("pi_ppm"),
        round(aggregate(col("tr"), lit(0.0), (acc, x) =>
          acc - (x("n").cast("double") / col("out_n").cast("double")) *
            log2(x("n").cast("double") / col("out_n").cast("double"))), 9)
          .as("h_bits"))
      .orderBy("cur")
  }, Some("""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS nxt
      FROM events),
    bi AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
    st AS (
      SELECT cur, CAST(sum(n) AS BIGINT) AS out_n,
        list_transform(list_sort(list(struct_pack(nxt := nxt, n := n))),
          x -> x.n) AS tr
      FROM bi GROUP BY 1),
    tot AS (SELECT CAST(sum(out_n) AS BIGINT) AS tot FROM st)
    SELECT cur, out_n,
      (1000000 * out_n) // tot AS pi_ppm,
      round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), tr),
        (acc, n) -> acc - (CAST(n AS DOUBLE)/CAST(out_n AS DOUBLE))
          * log2(CAST(n AS DOUBLE)/CAST(out_n AS DOUBLE))), 9) AS h_bits
    FROM st, tot ORDER BY cur
  """))

  /** Krippendorff's α (nominal) over the q_fleiss_kappa three-rater
    * fixture — the agreement coefficient that generalizes across
    * missing data and metrics; here m = 3 raters per unit, so the
    * fully cleared integer form is
    *   α_ppm = 10⁶·(2·SC − (3N−1)·SU) div (2·SC),
    * with SU = Σ_u Σ_c n_uc·(3 − n_uc) (observed pairwise
    * disagreements ×2) and SC = Σ_c c_c·(3N − c_c) (expected, from
    * pooled category totals). D_o and D_e ride along in exact ppm.
    * One ratings union, two partial aggs, a 1×1 join — q_fleiss's
    * scale shape exactly. */
  private val qKrippendorff = BoundQuery("q_krippendorff", (s, d) => {
    val docs = Tables.documents(s, d)
    val ratings = docs.select(col("doc_id"), col("lang").as("cat"))
      .unionByName(docs.select(col("doc_id"),
        langId(tokens(col("text"))).as("cat")))
      .unionByName(docs.select(col("doc_id"),
        langId(tokens(substring(col("text"), 1, 120))).as("cat")))
    val su = ratings.groupBy("doc_id", "cat").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * (lit(3L) - col("c"))).as("su"),
        countDistinct(col("doc_id")).as("n_docs"))
    val sc = ratings.groupBy("cat").agg(count(lit(1)).as("cj"))
      .agg(sum(expr("CAST(cj AS DECIMAL(38,0)) * cj")).as("c2"),
        count(lit(1)).as("n_cats"))
    su.crossJoin(broadcast(sc))
      .select(col("n_docs"), col("n_cats"), col("su"),
        expr("CAST(9 * CAST(n_docs AS DECIMAL(38,0)) * n_docs - c2 AS BIGINT)")
          .as("sc"),
        expr("(1000000 * su) div (6 * n_docs)").as("d_o_ppm"),
        expr("""CAST((1000000 * (9 * CAST(n_docs AS DECIMAL(38,0)) * n_docs - c2))
                div (3 * CAST(n_docs AS DECIMAL(38,0)) * (3 * n_docs - 1))
                AS BIGINT)""").as("d_e_ppm"),
        expr("""CAST((1000000 * (2 * (9 * CAST(n_docs AS DECIMAL(38,0)) * n_docs - c2)
                            - (3 * CAST(n_docs AS DECIMAL(38,0)) - 1) * su))
                div (2 * (9 * CAST(n_docs AS DECIMAL(38,0)) * n_docs - c2))
                AS BIGINT)""").as("alpha_ppm"))
  }, Some("""
    WITH docs AS (SELECT doc_id, text, lang FROM documents),
    heur AS (
      SELECT doc_id, text,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS c_en,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('el','la','de','los','y'))) AS BIGINT) AS c_es,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS c_de,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('le','les','des','et','une'))) AS BIGINT) AS c_fr
      FROM (SELECT doc_id, text, text AS t FROM docs) x),
    heur120 AS (
      SELECT doc_id,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS c_en,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('el','la','de','los','y'))) AS BIGINT) AS c_es,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS c_de,
        CAST(len(list_filter(list_filter(string_split(t,' '), x -> x <> ''), w -> w IN ('le','les','des','et','une'))) AS BIGINT) AS c_fr
      FROM (SELECT doc_id, substr(text, 1, 120) AS t FROM docs) x),
    pred AS (
      SELECT doc_id,
        CASE WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
             WHEN c_es > 0 AND c_es >= c_de AND c_es >= c_fr THEN 'es'
             WHEN c_de > 0 AND c_de >= c_fr THEN 'de'
             WHEN c_fr > 0 THEN 'fr' ELSE 'und' END AS cat
      FROM heur),
    pred120 AS (
      SELECT doc_id,
        CASE WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
             WHEN c_es > 0 AND c_es >= c_de AND c_es >= c_fr THEN 'es'
             WHEN c_de > 0 AND c_de >= c_fr THEN 'de'
             WHEN c_fr > 0 THEN 'fr' ELSE 'und' END AS cat
      FROM heur120),
    ratings AS (
      SELECT doc_id, lang AS cat FROM docs
      UNION ALL SELECT doc_id, cat FROM pred
      UNION ALL SELECT doc_id, cat FROM pred120),
    su AS (
      SELECT CAST(sum(c * (3 - c)) AS BIGINT) AS su,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM (SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS c
            FROM ratings GROUP BY 1, 2)),
    sc AS (
      SELECT CAST(sum(CAST(cj AS HUGEINT) * cj) AS HUGEINT) AS c2,
        CAST(count(*) AS BIGINT) AS n_cats
      FROM (SELECT cat, CAST(count(*) AS BIGINT) AS cj
            FROM ratings GROUP BY 1))
    SELECT n_docs, n_cats, su,
      CAST(9 * CAST(n_docs AS HUGEINT) * n_docs - c2 AS BIGINT) AS sc,
      (1000000 * su) // (6 * n_docs) AS d_o_ppm,
      CAST((1000000 * (9 * CAST(n_docs AS HUGEINT) * n_docs - c2))
        // (3 * CAST(n_docs AS HUGEINT) * (3 * n_docs - 1)) AS BIGINT) AS d_e_ppm,
      CAST((1000000 * (2 * (9 * CAST(n_docs AS HUGEINT) * n_docs - c2)
                       - (3 * CAST(n_docs AS HUGEINT) - 1) * su))
        // (2 * (9 * CAST(n_docs AS HUGEINT) * n_docs - c2)) AS BIGINT) AS alpha_ppm
    FROM su, sc
  """))

  val all: Seq[BoundQuery] =
    Seq(qMapEval, qBleuPairs, qEntropyRate, qKrippendorff)
}
