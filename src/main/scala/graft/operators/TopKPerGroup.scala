package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group via a rank window.
  *
  * Reference: queries.py:470 (`top_brands_with_models`) and
  * queries.py:508 (`top_models_per_year`) both use
  * `row_number().over(Window.partitionBy(...).orderBy(desc(...)))`.
  *
  * Scale notes: the window shuffles once on the partition keys and
  * ranks within each partition — no global ordering. Catalyst inserts
  * a rank-limit (WindowGroupLimit) pushdown for `row_number <= k`
  * filters in Spark 3.5+, so each partition only keeps k rows before
  * the final filter. Callers must include a unique tie-break column in
  * `orderBy` for deterministic output.
  */
object TopKPerGroup {
  def topK(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column], k: Int,
           rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .where(col(rankCol) <= k)
  }

  /** Global top-k with deterministic tie-break: distributed TakeOrdered,
    * no single-reducer sort. */
  def topKGlobal(df: DataFrame, orderBy: Seq[Column], k: Int): DataFrame =
    df.orderBy(orderBy: _*).limit(k)
}
