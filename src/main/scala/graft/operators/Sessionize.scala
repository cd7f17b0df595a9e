package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: a new session starts
  * when the gap to the previous event of the same key exceeds
  * `gapNanos`. One shuffle on the key, lag + running-sum windows
  * within partitions — the standard scalable shape (every key's
  * events sort within its partition; no global ordering). */
object Sessionize {
  def sessionIds(df: DataFrame, keyCol: Column, tsNanosCol: Column,
                 gapNanos: Long, sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsNanosCol)
    val prev = lag(tsNanosCol, 1).over(w)
    val isNew = when(prev.isNull || (tsNanosCol - prev) > gapNanos, 1L).otherwise(0L)
    df.withColumn(sessionCol,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-key session stats: session count, event count, mean session
    * length in events (exact-int ratio). */
  def sessionStats(df: DataFrame, keyCol: Column, tsNanosCol: Column,
                   gapNanos: Long): DataFrame =
    sessionIds(df, keyCol, tsNanosCol, gapNanos)
      .groupBy(keyCol.as("key"))
      .agg(max(col("session_id")).as("n_sessions"),
           count(lit(1)).as("n_events"))
      .withColumn("events_per_session",
        col("n_events").cast("double") / col("n_sessions").cast("double"))
}
