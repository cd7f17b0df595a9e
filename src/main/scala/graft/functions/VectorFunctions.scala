package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over array<float|double> columns via higher-order
  * functions — stays inside Catalyst (no UDF / no MLlib Vector
  * boxing). Floats are cast to double per element BEFORE arithmetic:
  * float*float in double is exact, so the only rounding is the
  * sequential sum — identical fold order in Spark's `aggregate` and
  * the DuckDB oracle's `list_sum(list_transform(...))`.
  */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product; inputs must be same length. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalized double copy — precompute once per row so pairwise
    * similarity later costs exactly one dot product. */
  def normalize(v: Column): Column = {
    val d = toDouble(v)
    transform(d, x => x / sqrt(aggregate(zip_with(d, d, (p, q) => p * q),
      lit(0.0), (acc, y) => acc + y)))
  }
}
