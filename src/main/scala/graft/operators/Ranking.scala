package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking. A bare `row_number() OVER (ORDER BY …)`
  * has no PARTITION BY, so Spark plans a single-partition WindowExec —
  * every row funnels through one task, the classic scale-killer for
  * "assign contiguous ids by rank" (vocabulary induction, leaderboard
  * materialization). This is the two-phase form:
  *
  *   1. range-repartition on the sort key (a sampled RangePartitioner
  *      gives contiguous, ordered key ranges per partition id),
  *   2. row_number WITHIN each partition (parallel),
  *   3. add each partition's start offset = sum of earlier partition
  *      counts (one tiny P-row aggregate, P = shuffle partitions).
  *
  * Output is bit-identical to the single-partition window as long as
  * the sort is total (pass a tiebreak column); no task ever sees more
  * than ~n/P rows. Same decomposition Spark's own `zipWithIndex` uses,
  * expressed in DataFrame ops so Catalyst keeps optimizing around it.
  */
object Ranking {

  /** `df` + `outCol` = INCLUSIVE global running sum of `valueCol` in
    * `sortCols` order (total order required) — same two-phase
    * decomposition as globalRowNumber: local cumsum within range
    * partitions + per-partition prefix offsets. The scale-safe form
    * of `sum().over(Window.orderBy(...))`, which plans a
    * single-partition WindowExec.
    *
    * INTEGER-ONLY contract: the running sum accumulates as long (the
    * only type whose partial sums are partition-order-invariant — a
    * double cumsum would drift by summation order). Non-integral
    * inputs are rejected rather than silently truncated; scale a
    * decimal into integral units (cents, micros) first. */
  def globalCumSum(df: DataFrame, valueCol: Column, outCol: String,
                   sortCols: Column*): DataFrame = {
    val vt = df.select(valueCol).schema.head.dataType
    require(Seq("byte", "short", "integer", "long").contains(vt.typeName),
      s"globalCumSum accumulates exact longs; got $vt — cast to an " +
        "integral unit (e.g. cents) explicitly at the call site")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    // pin the partitioning: the plan forks below (offsets + join), and
    // an unpersisted repartitionByRange RESAMPLES its boundaries per
    // branch — the branches can then disagree on __pid and corrupt
    // the offsets (observed: a 4000-row spec diff at a boundary)
    val local = graft.util.CacheScope.persist(parted.withColumn("__lcs",
      sum(col("__v")).over(Window.partitionBy("__pid").orderBy(sortCols: _*))))
    val sums = local.groupBy("__pid").agg(sum(col("__v")).as("__psum"))
    val offsets = sums.as("x")
      .join(sums.as("y"), col("y.__pid") < col("x.__pid"), "left")
      .groupBy(col("x.__pid").as("__pid"))
      .agg(coalesce(sum(col("y.__psum")), lit(0L)).as("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + col("__lcs"))
      .drop("__pid", "__v", "__lcs", "__off")
  }

  /** `df` + `outCol` = 0-based dense global row number by `sortCols`
    * (must define a total order for a deterministic result). */
  def globalRowNumber(df: DataFrame, outCol: String, sortCols: Column*): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    // persist pins the sampled range boundaries across the fork below
    // (see globalCumSum — an unpinned fork can re-sample per branch)
    val local = graft.util.CacheScope.persist(parted.withColumn("__lrn",
      row_number().over(Window.partitionBy("__pid").orderBy(sortCols: _*)).cast("long")))
    // Prefix sums over the P per-partition counts via a P×P self-join
    // (P = shuffle partitions, so ~32² rows) — NOT an unpartitioned
    // window, which would plan the very single-partition WindowExec
    // this operator exists to avoid.
    val cnts = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offsets = cnts.as("x")
      .join(cnts.as("y"), col("y.__pid") < col("x.__pid"), "left")
      .groupBy(col("x.__pid").as("__pid"))
      .agg(coalesce(sum(col("y.__cnt")), lit(0L)).as("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + col("__lrn") - 1)
      .drop("__pid", "__lrn", "__off")
  }
}
