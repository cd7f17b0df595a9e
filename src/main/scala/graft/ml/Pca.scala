package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.toDouble

/** PCA energy spectrum of an embedding column, the Spark-first way:
  * the d x d covariance matrix is assembled from ONE distributed pass
  * of moment sums (sum of outer products + mean, via the
  * expressions.GramAggDouble per-partition Gram partials — one
  * d(d+1)/2-cell buffer per partition over the shuffle, no row
  * inflation), then the tiny d x d eigenproblem is solved on the
  * driver with breeze (shipped with spark-mllib). Distributed where
  * the data is big, local where the math is small.
  *
  * Reference analogue: mlqueries.py's dimensionality work stops at
  * KMeans on 2-D points; at 100 TB of embeddings the covariance pass
  * is the only part that touches the data and it scales like any
  * other aggregation.
  */
object Pca {

  /** Top-k eigenvalues of the covariance matrix (descending), plus the
    * total variance — enough for energy/variance-explained analyses.
    * Eigenvalues are basis-free, so no sign/rotation ambiguity. */
  def covarianceSpectrum(df: DataFrame, vecCol: Column, k: Int): (Array[Double], Double) = {
    val sess = df.sparkSession
    // probe the dimension from one row, then ONE partial-aggregable
    // Gram pass (expressions.GramAggDouble): O(d²) state per
    // partition, one buffer per partition over the shuffle — no n·d²
    // posexplode² row inflation
    val d = df.select(size(vecCol)).head().getInt(0)
    val g = df
      .select(graft.expressions.Gram.gramAggDouble(sess, toDouble(vecCol), d).as("g"))
      .head().getStruct(0)
    val n = g.getLong(0).toDouble
    val sums = g.getSeq[Double](1).toArray
    val gram = g.getSeq[Double](2).toArray
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val c = gram(graft.expressions.GramFns.triIndex(d, i, j)) / n -
        (sums(i) / n) * (sums(j) / n)
      cov(i, j) = c; cov(j, i) = c
    }
    val eig = breeze.linalg.eigSym(cov)
    val vals = eig.eigenvalues.toArray.sorted(Ordering[Double].reverse)
    (vals.take(k), vals.sum)
  }
}
