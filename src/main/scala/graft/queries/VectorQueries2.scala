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

  val all: Seq[BoundQuery] = Seq(qJlProjection)
}
