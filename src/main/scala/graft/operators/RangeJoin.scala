package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match points to [lo, hi] intervals without
  * the O(points x ranges) cross product a naive BETWEEN predicate
  * degenerates to (Spark plans a non-equi join as BroadcastNestedLoop
  * — every point tested against every range).
  *
  * Scale shape: quantize the domain into fixed-width buckets. Each
  * interval is exploded to the buckets it covers, each point hashes to
  * exactly one bucket, and the join becomes an EQUI join on bucket id
  * (shuffle- or broadcast-hash, AQE-eligible) followed by the exact
  * residual BETWEEN filter. Cost is O(points + ranges x spans) where
  * spans = avg interval width / bucketWidth — pick bucketWidth near
  * the median interval width so spans stays a small constant.
  */
object RangeJoin {

  /** Join `points` to `ranges` where pointCol ∈ [loCol, hiCol]
    * (inclusive both ends). Keeps all columns of both sides. */
  def bucketed(points: DataFrame, pointCol: Column,
               ranges: DataFrame, loCol: Column, hiCol: Column,
               bucketWidth: Double): DataFrame = {
    val w = lit(bucketWidth)
    // guard inverted/empty intervals: sequence(start, stop) THROWS when
    // start > stop with a positive step; a malformed range row must
    // yield zero matches (like the naive BETWEEN), not kill the job
    val lob = floor(loCol / w).cast("long")
    val hib = floor(hiCol / w).cast("long")
    val buckets = when(lob <= hib, sequence(lob, hib))
      .otherwise(array().cast("array<long>"))
    val r = ranges.withColumn("__bkt", explode(buckets))
    val p = points.withColumn("__bkt", floor(pointCol / w).cast("long"))
    p.join(r, Seq("__bkt"))
      .where(pointCol >= loCol && pointCol <= hiCol)
      .drop("__bkt")
  }
}
