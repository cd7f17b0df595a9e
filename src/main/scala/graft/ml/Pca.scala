package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.toDouble

/** PCA energy spectrum of an embedding column, the Spark-first way:
  * the d x d covariance matrix is assembled from ONE distributed pass
  * of exact moment sums (sum of outer products + mean, via a
  * posexplode double-index aggregation — partial-aggregable, no
  * driver-side vectors), then the tiny d x d eigenproblem is solved on
  * the driver with breeze (shipped with spark-mllib). Distributed
  * where the data is big, local where the math is small.
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
    val pairs = df.select(toDouble(vecCol).as("v"))
      .select(posexplode(col("v")).as(Seq("i", "x")), col("v"))
      .select(col("i"), col("x"), posexplode(col("v")).as(Seq("j", "y")))
      .where(col("j") >= col("i")) // symmetric: upper triangle only
      .groupBy("i", "j")
      .agg(sum(col("x") * col("y")).as("sxy"), count(lit(1)).as("n"))
    val means = df.select(posexplode(toDouble(vecCol)).as(Seq("i", "x")))
      .groupBy("i").agg(sum("x").as("sx"), count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val d = means.size
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    pairs.collect().foreach { r =>
      val (i, j, sxy, n) = (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3))
      val mi = means(i)._1 / n; val mj = means(j)._1 / n
      val c = sxy / n - mi * mj
      cov(i, j) = c; cov(j, i) = c
    }
    val eig = breeze.linalg.eigSym(cov)
    val vals = eig.eigenvalues.toArray.sorted(Ordering[Double].reverse)
    (vals.take(k), vals.sum)
  }
}
