package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pagination over an ordered result.
  *
  * Reference: queries.py:10 `paginate_dataframe_sql` — a row_number
  * over a global ORDER BY. A partition-less window funnels the whole
  * dataset through one task, so `page` is kept only for semantic
  * parity with the reference (driver-facing pages over small,
  * already-aggregated results). For paging a 100 TB fact table use
  * `keysetPage`: the `key > lastSeen` predicate pushes down to the
  * scan and `orderBy(key).limit(n)` is executed as a distributed
  * TakeOrdered — no global shuffle, no single reducer.
  */
object Pagination {
  def page(df: DataFrame, order: Seq[Column], pageNo: Int, pageSize: Int): DataFrame = {
    require(pageNo >= 1 && pageSize >= 1, "pageNo and pageSize are 1-based/positive")
    val w = Window.orderBy(order: _*)
    val lo = (pageNo - 1L) * pageSize
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") > lo && col("__rn") <= lo + pageSize)
      .drop("__rn")
  }

  /** Scale path: seek-based pagination on a unique orderable key. */
  def keysetPage(df: DataFrame, key: Column, lastSeen: Option[Column], pageSize: Int): DataFrame = {
    val base = lastSeen.map(v => df.where(key > v)).getOrElse(df)
    base.orderBy(key).limit(pageSize)
  }
}
