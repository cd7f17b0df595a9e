package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2.4 vector wave 2: Johnson–Lindenstrauss random projection
  * with an in-query distortion audit — the dimensionality-reduction
  * step an embedding pipeline runs before clustering/ANN when 64 dims
  * of float are still too wide for the index budget.
  */
object VectorQueries2 {

  /** The arithmetic Rademacher family shared with
    * Similarity.arithLshCosinePairs (Knuth multiplicative constant +
    * affine offset mod the Mersenne prime 2³¹−1): sign(k,j) = +1 iff
    * h(k·64+j) is even. Pure integer arithmetic → both engines replay
    * the EXACT projection, entry for entry. */
  private def signSql(idx: String): String =
    s"(CASE WHEN ((2654435761 * ($idx) + 40503) % 2147483647) % 2 = 0 THEN 1 ELSE -1 END)"

  /** JL projection of the 64-dim embeddings onto m = 8 Rademacher
    * directions, plus the pairwise-distance distortion audit the JL
    * lemma promises: for deterministic partner pairs (i, (i+97) mod n)
    * the ratio ‖Pa−Pb‖² / (m·‖a−b‖²) concentrates around 1.
    *
    * Vectors quantize once to exact micro-ints (the arith-LSH
    * convention), after which projections, squared distances and the
    * ppm ratio are integer arithmetic end-to-end — the only wide
    * intermediate (10⁶·dp2 ≈ 10²³) runs in decimal(38,0)/HUGEINT.
    *
    * Scale shape: the projection is one narrow map over each vector
    * (64·8 multiply-adds, no shuffle); the audit joins each vector to
    * ONE partner by an equi-key derived from its id — n pair rows
    * total, never n². The n-row count arrives by broadcast. */
  private val qJlProjection = BoundQuery("q_jl_projection", (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT))")
        .as("vu"))
    val proj = e.withColumn("pv", expr(
      """transform(sequence(0, 7), k ->
           aggregate(sequence(0, 63), 0L, (acc, j) ->
             acc + """ + signSql("k * 64 + j") + """ * element_at(vu, j + 1)))"""))
    val n = e.agg(count(lit(1)).as("n_vec"))
    val pairs = proj.crossJoin(broadcast(n))
      .withColumn("partner", expr("(vec_id + 97) % n_vec"))
      .where(col("partner") =!= col("vec_id"))
    pairs.as("a")
      .join(proj.as("b"), col("a.partner") === col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        expr("""aggregate(sequence(1, 64), 0L, (acc, i) ->
                  acc + (element_at(a.vu, i) - element_at(b.vu, i))
                      * (element_at(a.vu, i) - element_at(b.vu, i)))""")
          .as("do2"),
        expr("""aggregate(sequence(1, 8), 0L, (acc, k) ->
                  acc + (element_at(a.pv, k) - element_at(b.pv, k))
                      * (element_at(a.pv, k) - element_at(b.pv, k)))""")
          .as("dp2"))
      .withColumn("ratio_ppm",
        expr("CAST((CAST(dp2 AS DECIMAL(38,0)) * 1000000) div (8 * do2) AS BIGINT)"))
      .orderBy("id_a")
  }, Some(s"""
    WITH e AS (
      SELECT vec_id,
        list_transform(embedding,
          x -> CAST(round(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT)) AS vu
      FROM embeddings),
    proj AS (
      SELECT vec_id, vu,
        list_transform(range(0, 8), k ->
          list_sum(list_transform(range(0, 64), j ->
            ${signSql("k * 64 + j")} * vu[j + 1]))) AS pv
      FROM e),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_vec FROM e),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        CAST(list_sum(list_transform(range(1, 65),
          i -> (a.vu[i] - b.vu[i]) * (a.vu[i] - b.vu[i]))) AS BIGINT) AS do2,
        CAST(list_sum(list_transform(range(1, 9),
          k -> (a.pv[k] - b.pv[k]) * (a.pv[k] - b.pv[k]))) AS BIGINT) AS dp2
      FROM proj a CROSS JOIN n JOIN proj b
        ON b.vec_id = (a.vec_id + 97) % n.n_vec
      WHERE (a.vec_id + 97) % n.n_vec <> a.vec_id)
    SELECT id_a, id_b, do2, dp2,
      CAST((CAST(dp2 AS HUGEINT) * 1000000) // (8 * do2) AS BIGINT) AS ratio_ppm
    FROM pairs ORDER BY id_a
  """))

  /** Binary-quantization ANN — the 32×-compression tier beside PQ's
    * 64× (q_pq_topk): each vector collapses to a 63-bit SIGN
    * SIGNATURE (one long; bit 63 stays clear because a signed-64
    * 1<<63 overflows DuckDB — one dim of signature is noise-level
    * for recall and keeps both engines in exact parity), candidates
    * rank by XOR-popcount Hamming distance — pure codegen'd integer
    * ops over 8 resident bytes per vector — and the top-50 per query
    * rerank by exact cosine. The serving shape when even PQ codes
    * are too wide: a billion vectors fit in 8 GB of signatures.
    * FULL ORACLE: quantization, signatures, Hamming ranking (id
    * tie-breaks) and the rounded-cosine rerank replay term-for-term;
    * recall vs the exact top-k is pinned in VectorSpec's family
    * audits via q_ann_topk's truth. */
  private val qBqTopk = BoundQuery("q_bq_topk", (s, d) => {
    // Round-8 scale fix (r7 verdict item 2), second iteration. The
    // Hamming ranking pass runs on a SLIM (vec_id, sig) projection —
    // 16 bytes/row through the |queries|× fan-out and the TopK — and
    // the 64-double vectors and norms are computed ONLY for the
    // ≤ 50×|queries| rerank candidates, ABOVE the candidate join (both
    // rerank joins broadcast: candidate keys and query vectors are
    // k-row by construction).
    //
    // The signature is a NATIVE codegen'd expression over the raw
    // embedding array (expressions/SignSig.scala — same per-element
    // round(x·1e6)>0 quantization, one primitive loop, zero allocs):
    // the first slim attempt kept the quantized `vu` transform as an
    // intermediate referenced only by `sig`, and CollapseProject
    // INLINED the 64-element transform inside the 63-iteration
    // aggregate lambda — rebuilding the whole array per bit, ~4k
    // interpreted expression evals + 63 array allocs per row (HOFs
    // don't codegen), 18× the whole query's old wall at sf1. The
    // oracle replays the recurrence in SQL and hash-matches.
    val sigE = graft.expressions.SignSig63.signSig63(s, col("embedding"))
    val vdE = expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    val raw = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val slim = raw.select(col("vec_id"), sigE.as("sig"))
    val q = raw.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), sigE.as("qsig"), vdE.as("qvd"))
      .withColumn("qnrm", expr(
        "sqrt(aggregate(zip_with(qvd, qvd, (x, y) -> x * y), 0.0D, (a, z) -> a + z))"))
    val scored = slim
      .join(broadcast(q.select(col("query_id"), col("qsig"))),
        col("vec_id") =!= col("query_id"))
      .withColumn("hamming", expr("bit_count(sig ^ qsig)").cast("long"))
    val cand = graft.operators.TopKPerGroup.topK(scored,
      Seq(col("query_id")), Seq(col("hamming"), col("vec_id")), 50,
      rankCol = "crnk")
      .select(col("query_id"), col("vec_id"), col("hamming"))
    // vd/nrm materialize AFTER the ≤250-row candidate join — the big
    // relation's rerank pass reads 8 raw bytes… nothing at all beyond
    // the embedding bytes the join itself ships for survivors
    val reranked = raw.join(broadcast(cand), Seq("vec_id"))
      .withColumn("vd", vdE)
      .withColumn("nrm", expr(
        "sqrt(aggregate(zip_with(vd, vd, (x, y) -> x * y), 0.0D, (a, z) -> a + z))"))
      .join(broadcast(q.select(col("query_id"), col("qvd"), col("qnrm"))),
        Seq("query_id"))
      .withColumn("cosine", round(expr(
      "aggregate(zip_with(vd, qvd, (x, y) -> (x / nrm) * (y / qnrm)), 0.0D, (a, z) -> a + z)"),
      6))
    graft.operators.TopKPerGroup.topK(reranked, Seq(col("query_id")),
      Seq(desc("cosine"), col("vec_id")), 10, rankCol = "rnk")
      .select(col("query_id"), col("vec_id").as("id"), col("hamming"),
        col("cosine"), col("rnk"))
      .orderBy("query_id", "rnk")
  }, Some(s"""
    WITH e AS (
      SELECT vec_id,
        list_transform(embedding,
          x -> CAST(round(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT)) AS vu,
        embedding, ${VectorQueries.duckNorm} AS nrm
      FROM embeddings),
    sigs AS (
      SELECT vec_id, embedding, nrm,
        list_reduce(list_transform(range(1, 64),
          i -> CASE WHEN vu[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 1))
                    ELSE CAST(0 AS BIGINT) END),
          (x, y) -> x + y) AS sig
      FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, a.vec_id, a.embedding, a.nrm,
        q.embedding AS qemb, q.nrm AS qnrm,
        CAST(bit_count(xor(a.sig, q.sig)) AS BIGINT) AS hamming
      FROM sigs a JOIN sigs q
        ON q.vec_id < 5 AND a.vec_id <> q.vec_id),
    cand AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY hamming, vec_id) AS crnk
        FROM scored) WHERE crnk <= 50),
    rer AS (
      SELECT query_id, vec_id AS id, hamming,
        round(list_reduce(list_transform(range(1, 65),
          i -> (CAST(embedding[i] AS DOUBLE)/nrm)
             * (CAST(qemb[i] AS DOUBLE)/qnrm)), (x, y) -> x + y), 6) AS cosine
      FROM cand)
    SELECT query_id, id, hamming, cosine, rnk FROM (
      SELECT query_id, id, hamming, cosine,
        CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, id) AS BIGINT) AS rnk
      FROM rer) WHERE rnk <= 10
    ORDER BY query_id, rnk
  """))

  val all: Seq[BoundQuery] = Seq(qJlProjection, qBqTopk)
}
