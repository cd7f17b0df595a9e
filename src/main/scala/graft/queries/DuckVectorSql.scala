package graft.queries

/** DuckDB replay builders for the KMeansLite-trained ANN family —
  * the oracles of q_ann_ivf_trained / q_pq_topk / q_ivf_pq.
  *
  * Every numeric step of those pipelines is deterministic by
  * construction (KMeansLite's lowest-id init + round-9 means +
  * lowest-cluster tie-breaks; sequential-fold dot products; rounded
  * readouts with id tie-breaks), so the full train→assign→probe→rank
  * pipelines replay term-for-term in SQL — the q_kmeans technique,
  * generalized to parameterized CTE chains so one builder serves the
  * coarse quantizer and all m per-subspace codebooks. Each generated
  * SQL was verified bit-exact against the Spark result before being
  * wired as an oracle.
  */
private[queries] object DuckVectorSql {

  /** CTE chain replaying KMeansLite.fit: `src` must expose
    * (vec_id, v DOUBLE-list of `dim`). Emits `${p}c$iters`
    * (cluster, cv) — final centroids — and `${p}a$iters`
    * (vec_id, v, cluster) — final assignments. Clusters that lose all
    * members keep their previous centroid (KMeansLite only overwrites
    * clusters present in the means pass). */
  def kmeansChain(p: String, src: String, dim: Int, k: Int, iters: Int): String = {
    val up = dim + 1
    def assign(t: Int) = s"""
    ${p}a$t AS MATERIALIZED (SELECT vec_id, v, cluster FROM (
      SELECT s.vec_id, s.v, c.cluster,
        row_number() OVER (PARTITION BY s.vec_id ORDER BY
          list_reduce(list_transform(range(1, $up),
            i -> (s.v[i]-c.cv[i])*(s.v[i]-c.cv[i])), (x, y) -> x + y) ASC,
          c.cluster ASC) AS rn
      FROM $src s CROSS JOIN ${p}c$t c) WHERE rn = 1)"""
    def update(t: Int) = s"""
    ${p}u${t + 1} AS (SELECT cluster, list(m ORDER BY pos) AS cv FROM (
      SELECT cluster, i AS pos, round(avg(v[i]), 9) AS m
      FROM ${p}a$t, range(1, $up) r(i) GROUP BY cluster, i) GROUP BY cluster),
    ${p}c${t + 1} AS MATERIALIZED (
      SELECT cluster, cv FROM ${p}u${t + 1}
      UNION ALL
      SELECT c.cluster, c.cv FROM ${p}c$t c
      WHERE c.cluster NOT IN (SELECT cluster FROM ${p}u${t + 1}))"""
    val init = s"""
    ${p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cluster,
                      v AS cv
               FROM (SELECT * FROM $src ORDER BY vec_id LIMIT $k))"""
    init + "," +
      (0 until iters).map(t => assign(t) + "," + update(t)).mkString(",") +
      "," + assign(iters)
  }

  private def dotVn(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $a[i]*$b[i]), (x, y) -> x + y)"

  /** ADC term rows for PQ codebooks pq0..pq{m-1}: per (candidate,
    * query, subspace) the lookup-table distance between the
    * candidate's code centroid and the query's subvector. `q` must
    * expose (query_id, qv full-dim DOUBLE list). */
  private def adcTerms(m: Int, sub: Int, iters: Int): String =
    (0 until m).map { j => s"""
  SELECT x.vec_id AS id, q.query_id, $j AS j,
    list_reduce(list_transform(range(1, ${sub + 1}),
      i -> (c.cv[i]-q.qv[${j * sub}+i])*(c.cv[i]-q.qv[${j * sub}+i])), (x, y) -> x + y) AS term
  FROM pq${j}a$iters x JOIN pq${j}c$iters c ON c.cluster = x.cluster
  CROSS JOIN q"""
    }.mkString("\n  UNION ALL\n  ")

  /** Oracle for q_ann_ivf_trained (Similarity.ivfTopKTrained over the
    * embeddings table, queries = vec_id < 5). */
  def annIvfTrainedSql(dim: Int, nCells: Int, nProbe: Int, iters: Int,
                       k: Int): String = s"""
    WITH e AS (SELECT vec_id, embedding, ${VectorQueries.duckNorm} AS nrm
               FROM embeddings),
    n AS MATERIALIZED (SELECT vec_id,
          list_transform(range(1, ${dim + 1}), i -> CAST(embedding[i] AS DOUBLE)/nrm) AS vn
        FROM e),
    src AS (SELECT vec_id, vn AS v FROM n),
    ${kmeansChain("km", "src", dim, nCells, iters)},
    assigned AS (SELECT vec_id, cluster AS cell FROM kma$iters),
    c2 AS (SELECT cluster, list_reduce(list_transform(cv, x -> x*x), (x, y) -> x + y) AS c2
           FROM kmc$iters),
    qsc AS (
      SELECT s.vec_id AS query_id, c.cluster AS cell,
        round(1.0 + c2.c2 - 2.0 * ${dotVn("s.v", "c.cv", dim)}, 9) AS dd
      FROM src s CROSS JOIN kmc$iters c JOIN c2 ON c2.cluster = c.cluster
      WHERE s.vec_id < 5),
    probes AS (SELECT query_id, cell FROM (
        SELECT query_id, cell,
          row_number() OVER (PARTITION BY query_id ORDER BY dd ASC, cell ASC) AS rn
        FROM qsc) WHERE rn <= $nProbe),
    scored AS (
      SELECT p.query_id, a.vec_id AS id,
        round(${dotVn("na.vn", "nq.vn", dim)}, 6) AS cosine
      FROM assigned a
      JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.query_id
      JOIN n na ON na.vec_id = a.vec_id
      JOIN n nq ON nq.vec_id = p.query_id)
    SELECT query_id, id, cosine, rnk FROM (
      SELECT query_id, id, cosine,
        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS BIGINT) AS rnk
      FROM scored) WHERE rnk <= $k
    ORDER BY query_id, rnk
  """

  /** Oracle for q_pq_topk (ProductQuantizer train/encode/adcTopK over
    * RAW double embeddings, queries = vec_id < 5). */
  def pqTopkSql(dim: Int, m: Int, kCodes: Int, iters: Int, k: Int): String = {
    val sub = dim / m
    val subs = (0 until m).map(j =>
      s"sub$j AS (SELECT vec_id, vd[${j * sub + 1}:${j * sub + sub}] AS v FROM e)")
      .mkString(",\n    ")
    val chains = (0 until m)
      .map(j => kmeansChain(s"pq$j", s"sub$j", sub, kCodes, iters)).mkString(",")
    s"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
               FROM embeddings),
    $subs,
    $chains,
    q AS (SELECT vec_id AS query_id, vd AS qv FROM e WHERE vec_id < 5),
    terms AS (${adcTerms(m, sub, iters)}),
    adist AS (
      SELECT query_id, id,
        round(list_reduce(list(term ORDER BY j), (x, y) -> x + y), 9) AS adist
      FROM terms WHERE id <> query_id GROUP BY query_id, id)
    SELECT query_id, id, adist, rnk FROM (
      SELECT query_id, id, adist,
        CAST(row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, id) AS BIGINT) AS rnk
      FROM adist) WHERE rnk <= $k
    ORDER BY query_id, rnk
  """
  }

  /** Shared CTE chain replaying Similarity.lshCosinePairsAutoIH over
    * the embeddings table, ending in CTE `pairs` (id_a, id_b,
    * cosine). The auto-sizing replays EXACTLY: planes by the integer
    * comparison 100·2^q < n (Similarity.planesFor), tables by a
    * planes→tables CASE generated from Similarity.tablesFor — the
    * one transcendental step runs once, in Scala, at SQL-generation
    * time, so libm differences cannot flip the sizing. Irwin–Hall
    * coefficients, micro-int sign sums, the maxBucket window and the
    * rounded-cosine verify are all exact-replay arithmetic. */
  private def ihPairsCtes(tau: Double, dim: Int, targetRecall: Double,
                          targetBucket: Int, maxTables: Int,
                          maxBucket: Int): String = {
    val tableCase = (1 to 24).map(pl =>
      s"WHEN $pl THEN ${graft.operators.Similarity.tablesFor(pl, tau, targetRecall, maxTables)}")
      .mkString(" ")
    def u(k: Int) =
      s"((2654435761 * ((p.p*$dim + (i-1))*4 + $k) + 40503*(p.p+1)) % 2147483647) % 1000"
    s"""e AS (
      SELECT vec_id, embedding, ${VectorQueries.duckNorm} AS nrm,
        list_transform(embedding,
          x -> CAST(round(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT)) AS vu
      FROM embeddings),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
    par AS (
      SELECT least(24, greatest(1,
        (SELECT CAST(count(*) AS BIGINT) FROM range(0, 24) t(q), nn
         WHERE ($targetBucket * (CAST(1 AS BIGINT) << q)) < n))) AS planes),
    par2 AS (SELECT planes,
      CAST(CASE planes $tableCase END AS BIGINT) AS tables FROM par),
    idx AS (SELECT unnest(range(0, (SELECT planes * tables FROM par2))) AS p),
    sigs AS (
      SELECT vec_id,
        CAST(p // (SELECT planes FROM par2) AS BIGINT) AS tbl,
        CAST(sum(CASE WHEN bitsum > 0 THEN 1 ELSE 0 END
             * (CAST(1 AS BIGINT) << CAST(p % (SELECT planes FROM par2) AS INTEGER)))
          AS BIGINT) AS sig
      FROM (
        SELECT e.vec_id, p.p,
          list_sum(list_transform(range(1, ${dim + 1}), i ->
            (${u(1)} + ${u(2)} + ${u(3)} + ${u(4)} - 1998) * vu[i])) AS bitsum
        FROM e CROSS JOIN idx p)
      GROUP BY vec_id, tbl),
    capped AS (
      SELECT vec_id, tbl, sig FROM (
        SELECT vec_id, tbl, sig,
          count(*) OVER (PARTITION BY tbl, sig) AS bn FROM sigs)
      WHERE bn <= $maxBucket),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM capped a JOIN capped b
        ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id),
    pairs AS (
      SELECT id_a, id_b, round(${VectorQueries.duckCosine("a", "b")}, 6) AS cosine
      FROM cand JOIN e a ON a.vec_id = id_a JOIN e b ON b.vec_id = id_b
      WHERE round(${VectorQueries.duckCosine("a", "b")}, 6) >= $tau)"""
  }

  /** Oracle for q_lsh_cosine_pairs (auto-sized Irwin–Hall LSH). */
  def ihLshPairsSql(tau: Double, dim: Int, targetRecall: Double = 0.8,
                    targetBucket: Int = 100, maxTables: Int = 64,
                    maxBucket: Int = 100000): String = s"""
    WITH ${ihPairsCtes(tau, dim, targetRecall, targetBucket, maxTables, maxBucket)}
    SELECT id_a, id_b, cosine FROM pairs ORDER BY id_a, id_b
  """

  /** Oracle for q_knn_graph_lsh (Similarity.knnGraphLshIH): the same
    * pair chain, symmetrized and ranked per node. */
  def ihKnnGraphSql(k: Int, tau: Double, dim: Int,
                    targetRecall: Double = 0.9,
                    targetBucket: Int = 100, maxTables: Int = 64,
                    maxBucket: Int = 100000): String = s"""
    WITH ${ihPairsCtes(tau, dim, targetRecall, targetBucket, maxTables, maxBucket)},
    sym AS (
      SELECT id_a AS query_id, id_b AS id, cosine FROM pairs
      UNION ALL
      SELECT id_b, id_a, cosine FROM pairs)
    SELECT query_id, id, cosine, rnk FROM (
      SELECT query_id, id, cosine,
        CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, id) AS BIGINT) AS rnk
      FROM sym) WHERE rnk <= $k
    ORDER BY query_id, rnk
  """

  /** Oracle for q_ivf_pq (Similarity.ivfPqTopK: coarse KMeansLite
    * cells + PQ codebooks, both over NORMALIZED vectors; driver-side
    * probe selection replayed as the same rounded distance ranking). */
  def ivfPqSql(dim: Int, nCells: Int, nProbe: Int, m: Int, kCodes: Int,
               iters: Int, k: Int): String = {
    val sub = dim / m
    val subs = (0 until m).map(j =>
      s"sub$j AS (SELECT vec_id, v[${j * sub + 1}:${j * sub + sub}] AS v FROM src)")
      .mkString(",\n    ")
    val chains = kmeansChain("cq", "src", dim, nCells, iters) + "," +
      (0 until m).map(j => kmeansChain(s"pq$j", s"sub$j", sub, kCodes, iters))
        .mkString(",")
    s"""
    WITH e AS (SELECT vec_id, embedding, ${VectorQueries.duckNorm} AS nrm
               FROM embeddings),
    src AS MATERIALIZED (SELECT vec_id,
          list_transform(range(1, ${dim + 1}), i -> CAST(embedding[i] AS DOUBLE)/nrm) AS v
        FROM e),
    $subs,
    $chains,
    assigned AS (SELECT vec_id, cluster AS cell FROM cqa$iters),
    q AS (SELECT vec_id AS query_id, v AS qv FROM src WHERE vec_id < 5),
    qsc AS (
      SELECT q.query_id, c.cluster AS cell,
        round(list_reduce(list_transform(range(1, ${dim + 1}),
          i -> (c.cv[i]-q.qv[i])*(c.cv[i]-q.qv[i])), (x, y) -> x + y), 9) AS dd
      FROM q CROSS JOIN cqc$iters c),
    probes AS (SELECT query_id, cell FROM (
        SELECT query_id, cell,
          row_number() OVER (PARTITION BY query_id ORDER BY dd ASC, cell ASC) AS rn
        FROM qsc) WHERE rn <= $nProbe),
    terms AS (${adcTerms(m, sub, iters)}),
    adist AS (
      SELECT t.query_id, t.id,
        round(list_reduce(list(t.term ORDER BY t.j), (x, y) -> x + y), 9) AS adist
      FROM terms t
      JOIN assigned a ON a.vec_id = t.id
      JOIN probes p ON p.query_id = t.query_id AND p.cell = a.cell
      WHERE t.id <> t.query_id GROUP BY t.query_id, t.id)
    SELECT query_id, id, adist, rnk FROM (
      SELECT query_id, id, adist,
        CAST(row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, id) AS BIGINT) AS rnk
      FROM adist) WHERE rnk <= $k
    ORDER BY query_id, rnk
  """
  }
}
