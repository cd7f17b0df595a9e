package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (SURVEY §5).
  *
  * `saltedAggregate` is the classic two-phase rollup for hot keys: a
  * deterministic salt spreads each group over `saltFactor` reducers
  * for the wide partial phase, then a second (tiny) exchange merges
  * partials. The result is bit-identical to the direct groupBy when
  * the partial aggregates are exact integers (Num cents rules), so the
  * pattern is oracle-checkable — q_salted_agg proves the rewrite
  * changes the shuffle, not the answer.
  *
  * Spark's AQE skew-join handling covers the join case at runtime;
  * salting remains the tool for skewed AGGREGATION keys, which AQE
  * does not rebalance (partial agg already bounds them — this is for
  * the residual hot-key cases like count-distinct rollups).
  */
object SkewTools {

  /** Two-phase salted sum/count: groupBy(keys+salt) partials, then
    * groupBy(keys) merge. `saltSource` must be a deterministic
    * per-row column (an id), NOT rand() — reruns and retried tasks
    * must salt identically or exactly-once semantics break. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltSource: Column,
                      sums: Map[String, Column], saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltFactor)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"),
        sums.map { case (n, c) => sum(c).as(s"__s_$n") }.toSeq: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"),
        sums.keys.map(n => sum(col(s"__s_$n")).as(n)).toSeq: _*)
  }
}
