package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column null counts, distinct counts, min/max —
  * the ingest-time quality gate of a data pipeline (a 100 TB load is
  * validated from ONE profile pass, not per-column queries).
  *
  * Scale shape: every statistic for every column is computed in a
  * single aggregate over one scan (all partial-aggregable, map-side
  * combined); the per-column rows are then unpivoted from the single
  * result row with a driver-free explode. N columns cost one pass,
  * not N.
  */
object Profiling {

  /** Profile `cols` of `df` → rows (column, n_rows, n_null,
    * n_distinct, min_val, max_val) with min/max rendered as strings
    * (engine-portable across column types). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col("__rows").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
