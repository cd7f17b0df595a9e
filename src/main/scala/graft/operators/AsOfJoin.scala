package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for every left row, the most recent
  * right row of the same key with rightTime <= leftTime — the
  * feature-store / market-data join Spark has no native operator for.
  *
  * Custom-operator ladder check (SURVEY §4): a composition beats a
  * custom SparkPlan here. Union-tag both sides, one shuffle on the
  * key, one per-partition sort on (time, side), and
  * `last_value(ignoreNulls)` carries the latest right payload forward
  * into each left row. That is exactly the merge a hand-written
  * sort-merge as-of exec would do, but it reuses Spark's exchange,
  * spill, AQE and codegen for free — so the custom (c)-tier
  * LogicalPlan/Strategy route is not warranted.
  *
  * Right rows sort BEFORE left rows at equal timestamps, giving the
  * conventional inclusive (>=) as-of semantics, same as DuckDB's
  * native ASOF JOIN (the oracle for q_asof_join).
  */
object AsOfJoin {

  /** @param payload single right-side column carried to the left rows
    * @return left rows + `asof_<payloadName>` (null when no right row
    *         at or before the left time) */
  def lastAtOrBefore(left: DataFrame, right: DataFrame,
                     key: Column, time: Column, payload: Column,
                     payloadName: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__k", key).withColumn("__t", time)
      .withColumn("__side", lit(1)).withColumn("__p", lit(null).cast("long"))
    val r = right.select(key.as("__k"), time.as("__t"), payload.cast("long").as("__p"))
      .withColumn("__side", lit(0))
      .withColumns(leftCols.map(c => c -> lit(null).cast(l.schema(c).dataType)).toMap)
    val unioned = l.unionByName(r)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(s"asof_$payloadName", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__k", "__t", "__side", "__p")
  }
}
