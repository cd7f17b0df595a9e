package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.toDouble

/** Product quantization for memory-bounded ANN — the standard scale
  * path when raw vectors stop fitting in executor memory (Jégou et
  * al., "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011). The d-dim space is split into m subspaces; each gets a
  * k-centroid codebook (deterministic KMeansLite per subspace); a
  * vector compresses to m small codes (64 floats -> 4 bytes here,
  * 64x). Queries score candidates with asymmetric distance (ADC):
  * per-subspace lookup tables of query-to-centroid distances, summed
  * by code — a handful of array lookups per candidate instead of a
  * d-dim dot product, all codegen'd column expressions.
  *
  * Codebooks are tiny (m*k*subDim doubles) and inlined as literals —
  * the same broadcast-free pattern as KMeansLite's assignment.
  */
object ProductQuantizer {

  /** codebooks(j)(c) = centroid c of subspace j. */
  final case class Codebooks(m: Int, subDim: Int, cents: Array[Array[Array[Double]]])

  private def sqDistTo(sub: Column, cent: Array[Double]): Column =
    aggregate(zip_with(sub, array(cent.map(lit): _*), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, z) => acc + z)

  /** Train one codebook per subspace with deterministic k-means. */
  def train(df: DataFrame, idCol: Column, vecCol: Column,
            m: Int, k: Int, iters: Int): Codebooks = {
    val dim = df.select(size(toDouble(vecCol))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val cents = (0 until m).map { j =>
      val sub = df.select(idCol.as("id"),
        slice(toDouble(vecCol), j * subDim + 1, subDim).as("v"))
      KMeansLite.fit(sub, col("id"), col("v"), k, iters).centroids
    }.toArray
    Codebooks(m, subDim, cents)
  }

  /** Compress every vector to its m nearest-centroid codes. The
    * input is Spread first: the m·k·subDim argmin expression is the
    * dominant cost and must not inherit a file-bound single
    * partition (util.Spread doc). */
  def encode(df0: DataFrame, idCol: Column, vecCol: Column, cb: Codebooks): DataFrame = {
    val df = graft.util.Spread(df0)
    val codeCols = (0 until cb.m).map { j =>
      val sub = slice(toDouble(vecCol), j * cb.subDim + 1, cb.subDim)
      val dists = array(cb.cents(j).zipWithIndex.map { case (c, i) =>
        struct(sqDistTo(sub, c).as("d"), lit(i).as("c"))
      }: _*)
      sort_array(dists)(0)("c")
    }
    df.select(idCol.as("id"), array(codeCols: _*).as("codes"))
  }

  /** ADC top-k: for each (queryId, vector), rank the encoded
    * collection by summed lookup-table distance. The per-query tables
    * are literal arrays in the plan — queries are a serving-side
    * handful; the collection side only ever reads its codes. */
  def adcTopK(encoded: DataFrame, queries: Seq[(Long, Array[Double])],
              cb: Codebooks, kTop: Int): DataFrame = {
    val scored = queries.map { case (qid, qv) =>
      val approx = (0 until cb.m).map { j =>
        val table = array(cb.cents(j).map { c =>
          lit(c.zip(qv.slice(j * cb.subDim, (j + 1) * cb.subDim))
            .map { case (ci, qi) => (ci - qi) * (ci - qi) }.sum)
        }: _*)
        element_at(table, element_at(col("codes"), j + 1) + 1)
      }.reduce(_ + _)
      struct(lit(qid).as("query_id"), round(approx, 9).as("adist"))
    }
    val exploded = encoded
      .select(col("id"), explode(array(scored: _*)).as("q"))
      .where(col("q.query_id") =!= col("id"))
      .select(col("q.query_id").as("query_id"), col("id"), col("q.adist").as("adist"))
    graft.operators.TopKPerGroup.topK(exploded, Seq(col("query_id")),
      Seq(asc("adist"), col("id")), kTop, rankCol = "rnk")
      .select("query_id", "id", "adist", "rnk")
  }
}
