package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.toDouble

/** Top-k spectrum of the scatter matrix via INTEGER power iteration
  * with deflation — the engine-proven widening of q_pca_power's
  * single-eigenvalue recurrence to a full PCA energy readout
  * (reference analogue: mlqueries.py's dimensionality work).
  *
  * Everything is exact integer arithmetic, so the whole k-eigenvalue
  * pipeline is partition-order invariant AND replayable term-for-term
  * by DuckDB (`oracleSql` generates the same recurrence as unrolled
  * CTEs — the q_kmeans/q_pagerank technique):
  *
  *  - embeddings quantize to milli-unit longs; the scatter matrix
  *    S = n·ΣxxT − (Σx)(Σx)T is exact (the n²-scaled covariance
  *    identity — no float mean-centering);
  *  - each level runs `iters` power steps v ← (T·v)·1000 div max|T·v|
  *    in decimal(38,0)/HUGEINT, yielding a milli-normalized direction;
  *  - the level's eigenvalue is the Rayleigh quotient vᵀS₀v div vᵀv
  *    against the ORIGINAL scatter (so all levels report in one
  *    scale: λ_report = n²·10⁶·λ_cov), and ratio_ppm divides by the
  *    exact integer trace (= Σλ of S₀);
  *  - deflation is the integer projector subtraction
  *    U = T·(vᵀv)² − (vᵀTv)·vvᵀ, rescaled to max|·| ≈ 10¹² by ONE
  *    integer division (divisor max|U| div 10¹², floored at 1) so
  *    five levels stay inside decimal(38)/HUGEINT: |U| ≤
  *    max|T|·(64·10⁶)² ≤ 4·10³² for scatter entries up to 10¹⁷
  *    (≈ 2.5·10⁵ rows); beyond that, pre-scale the scatter.
  *
  * Convergence note: with `iters` power steps the directions are
  * approximations — the OUTPUT is defined by the recurrence, which
  * both engines replay identically; PcaSpec separately checks the
  * reported spectrum tracks breeze's exact eigSym within a few
  * percent on the test data.
  */
object ScatterPower {

  /** (rank, lambda_u, ratio_ppm) for the top `k` scatter eigenvalues.
    * lambda_u is in n²·10⁶-scaled covariance units; ratio_ppm is the
    * variance-explained share ·10⁶ (exact integer division).
    *
    * The DISTRIBUTED part is the scatter moment pass (the only part
    * that touches data); the d² = 4096 exact integer cells then come
    * to the driver (the same documented d²-cells contract as ml.Pca)
    * and the whole power/deflation recurrence runs in Scala BigInt —
    * running it as ~150 chained tiny Spark jobs would explode the
    * Catalyst plan tree (each level's matrix lineage re-embeds every
    * earlier level's), for math that is 64×64. BigInt `/` and DuckDB
    * `//` both truncate toward zero, so the replay is exact. */
  def spectrum(df: DataFrame, idCol: Column, vecCol: Column,
               dim: Int, k: Int, iters: Int): DataFrame = {
    val sess = df.sparkSession
    // ONE partial-aggregable pass over the data: each partition folds
    // its rows into a d(d+1)/2-cell exact-integer Gram buffer
    // (expressions.GramAggLong) and only those buffers shuffle — no
    // n·d² posexplode/self-join row inflation. Integer sums commute,
    // so the result is bit-identical to the oracle's sum(a.xm*b.xm)
    // under any partitioning.
    val xm = transform(toDouble(vecCol), x => round(x * 1000, 0).cast("long"))
    val g = df
      .select(graft.expressions.Gram.gramAggLong(sess, xm, dim).as("g"))
      .head().getStruct(0)
    val n = BigInt(g.getLong(0))
    val sumsArr = g.getSeq[java.math.BigDecimal](1)
      .map(x => BigInt(x.toBigInteger)).toArray
    val gramArr = g.getSeq[java.math.BigDecimal](2)
      .map(x => BigInt(x.toBigInteger)).toArray
    val s0 = Array.tabulate(dim, dim)((i, j) =>
      n * gramArr(graft.expressions.GramFns.triIndex(dim, math.min(i, j), math.max(i, j))) -
        sumsArr(i) * sumsArr(j))
    val trace = (0 until dim).map(i => s0(i)(i)).sum
    val big1e12 = BigInt("1000000000000")

    var t = s0.map(_.clone())
    val rows = (1 to k).map { rank =>
      var v = Array.fill(dim)(BigInt(1000))
      for (_ <- 1 to iters) {
        val w = Array.tabulate(dim)(i =>
          (0 until dim).map(j => t(i)(j) * v(j)).sum)
        val sc = w.map(_.abs).max.max(BigInt(1))
        v = w.map(x => (x * 1000) / sc)
      }
      def quad(mat: Array[Array[BigInt]]): BigInt =
        (0 until dim).map(i =>
          (0 until dim).map(j => mat(i)(j) * v(i) * v(j)).sum).sum
      val vv = v.map(x => x * x).sum
      val lambda = quad(s0) / vv
      if (rank < k) {
        // deflate: U = T·(vv)² − (vᵀTv)·v vᵀ, rescaled to ~10¹² max
        val tvt = quad(t)
        val vvsq = vv * vv
        val u = Array.tabulate(dim, dim)((i, j) =>
          t(i)(j) * vvsq - tvt * v(i) * v(j))
        val dv = (u.flatten.map(_.abs).max / big1e12).max(BigInt(1))
        t = u.map(_.map(_ / dv))
      }
      (rank.toLong, lambda.toLong, ((lambda * 1000000) / trace).toLong)
    }
    import sess.implicits._
    rows.toDF("rank", "lambda_u", "ratio_ppm")
  }

  /** DuckDB replay of `spectrum` for the `embeddings` table
    * (vec_id, embedding float-array of `dim`): identical recurrence,
    * unrolled as MATERIALIZED CTEs (q_pca_power's exponential-inline
    * guard applies — every reused intermediate is MATERIALIZED). */
  def oracleSql(dim: Int, k: Int, iters: Int): String = {
    val up = dim + 1
    def steps(l: Int) = (1 to iters).map { s => s"""
    w${l}_$s AS MATERIALIZED (
      SELECT t.i, sum(t.sval * v.x) AS w
      FROM t$l t JOIN v${l}_${s - 1} v ON t.j = v.j GROUP BY t.i),
    s${l}_$s AS MATERIALIZED (
      SELECT greatest(max(abs(w)), 1) AS sc FROM w${l}_$s),
    v${l}_$s AS MATERIALIZED (
      SELECT i AS j, (w * 1000) // sc AS x FROM w${l}_$s, s${l}_$s)"""
    }.mkString(",")
    def level(l: Int): String = {
      val vf = s"v${l}_$iters"
      val readout = s"""
    ray$l AS (
      SELECT sum(t1.sval * va.x * vb.x) AS vsv
      FROM t1 JOIN $vf va ON va.j = t1.i JOIN $vf vb ON vb.j = t1.j),
    nrm$l AS (SELECT sum(x*x) AS vv FROM $vf),
    lam$l AS (SELECT CAST(vsv // vv AS BIGINT) AS lambda_u FROM ray$l, nrm$l)"""
      val deflate = if (l == k) "" else s""",
    tvt$l AS (
      SELECT sum(t.sval * va.x * vb.x) AS tvt
      FROM t$l t JOIN $vf va ON va.j = t.i JOIN $vf vb ON vb.j = t.j),
    u$l AS MATERIALIZED (
      SELECT t.i, t.j,
        t.sval * (SELECT vv*vv FROM nrm$l) -
          (SELECT tvt FROM tvt$l) * va.x * vb.x AS uval
      FROM t$l t JOIN $vf va ON va.j = t.i JOIN $vf vb ON vb.j = t.j),
    mu$l AS (
      SELECT greatest(max(abs(uval)) // 1000000000000, 1) AS dv FROM u$l),
    t${l + 1} AS MATERIALIZED (
      SELECT i, j, uval // dv AS sval FROM u$l, mu$l)"""
      s"""
    v${l}_0 AS (SELECT CAST(i AS BIGINT) AS j, CAST(1000 AS HUGEINT) AS x
           FROM unnest(range(1, $up)) AS t(i)),
    ${steps(l)},
    $readout$deflate"""
    }
    val selects = (1 to k).map { l =>
      s"""SELECT CAST($l AS BIGINT) AS rank, lambda_u,
      CAST((CAST(lambda_u AS HUGEINT) * 1000000) // tr AS BIGINT) AS ratio_ppm
    FROM lam$l, tr"""
    }.mkString("\n    UNION ALL\n    ")
    s"""
    WITH dm AS MATERIALIZED (
      SELECT vec_id, i,
        CAST(round(CAST(embedding[i] AS DOUBLE)*1000, 0) AS BIGINT) AS xm
      FROM embeddings, unnest(range(1, $up)) AS t(i)),
    nn AS (SELECT CAST(count(DISTINCT vec_id) AS HUGEINT) AS n FROM dm),
    m AS (
      SELECT a.i AS i, b.i AS j, CAST(sum(a.xm * b.xm) AS HUGEINT) AS mij
      FROM dm a JOIN dm b ON a.vec_id = b.vec_id GROUP BY 1, 2),
    sv AS (SELECT i, CAST(sum(xm) AS HUGEINT) AS si FROM dm GROUP BY 1),
    t1 AS MATERIALIZED (
      SELECT m.i, m.j, n*mij - sa.si*sb.si AS sval
      FROM m JOIN sv sa ON sa.i = m.i JOIN sv sb ON sb.i = m.j, nn),
    tr AS (SELECT sum(sval) AS tr FROM t1 WHERE i = j),
    ${(1 to k).map(level).mkString(",")}
    $selects
    ORDER BY rank
  """
  }
}
