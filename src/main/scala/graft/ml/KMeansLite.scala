package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.VectorFunctions.toDouble

/** Deterministic Lloyd's k-means over an array<float|double> column,
  * expressed as DataFrame aggregations (reference: mlqueries.py:14
  * run_kmeans_clustering, which used spark.ml KMeans on 2-D points).
  *
  * Spark-first shape: per iteration one codegen'd projection computes
  * the argmin-distance assignment (centroids inlined as literals — k*d
  * doubles in the plan, broadcast-free), then one posexplode+groupBy
  * recomputes means. Only k*d values ever hit the driver per
  * iteration. Init = the k lowest-id vectors (not kmeans||) so runs
  * are reproducible across partitionings — at 100 TB swap init for a
  * sampled sketch, the iteration shape is unchanged.
  */
object KMeansLite {

  final case class Model(centroids: Array[Array[Double]], assignments: DataFrame)

  /** The deterministic argmin-distance assignment expression over a
    * literal centroid table: min squared distance, ties → lowest
    * cluster id. Exposed so fused trainers (ProductQuantizer
    * .trainWithCoarse) assign with EXACTLY the expression fit() uses
    * — numeric identity is what keeps the unrolled DuckDB oracles
    * valid for any composition of these models. */
  def assignExpr(cents: Array[Array[Double]], v: Column): Column = {
    // native codegen'd Σ(x−y)² (expressions/SqDist.scala — bit-identical
    // left-to-right fold, so the unrolled oracles are unchanged): the
    // HOF form ran interpreted k times per row per iteration
    val dists = array(cents.zipWithIndex.map { case (c, i) =>
      struct(
        graft.expressions.SqDist.sqDist(v, array(c.map(lit): _*)).as("d"),
        lit(i).as("cluster"))
    }: _*)
    sort_array(dists)(0)("cluster") // min distance, ties -> lowest cluster id
  }

  def fit(df: DataFrame, idCol: Column, vecCol: Column, k: Int, iters: Int): Model = {
    // Spread before persisting: every iteration replays the k·d-term
    // assignment expression over this cache, so a file-bound single
    // partition would serialize the whole training loop through one
    // core (util.Spread doc — measured 1-core starvation at sf10)
    val data = graft.util.CacheScope.persist(graft.util.Spread(
      df.select(idCol.as("id"), toDouble(vecCol).as("v"))))

    var cents: Array[Array[Double]] = data.orderBy("id").limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(cents.nonEmpty, "k-means needs a non-empty collection")

    def assignCol: Column = assignExpr(cents, col("v"))

    var it = 0
    while (it < iters) {
      // means round to 9 decimals: the cross-engine (and cross-
      // partitioning) parity anchor — a raw double avg is summed in
      // partition order, so its last ulps are engine-dependent and
      // would propagate into the next iteration's assignments; at 1e-9
      // the rounding is far below inter-centroid distances and far
      // above ulp noise
      val means = data.withColumn("cluster", assignCol)
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos").agg(round(avg("x"), 9).as("m"))
        .groupBy("cluster").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("mv"))
        .select(col("cluster"), transform(col("mv"), s => s("m")).as("mean"))
        .collect()
      val next = cents.clone()
      means.foreach(r => next(r.getInt(0)) = r.getSeq[Double](1).toArray)
      cents = next
      it += 1
    }
    Model(cents, data.withColumn("cluster", assignCol).select("id", "cluster"))
  }
}
