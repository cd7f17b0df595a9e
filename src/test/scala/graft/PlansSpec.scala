package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark._

class PlansSpec extends AnyFunSuite {

  private def points = graft.sources.Tables.orders(spark, sfTiny)
    .select("o_orderkey", "o_totalprice")
  private def bands = spark.range(0, 30).select(
    col("id").as("band_id"),
    (col("id") * 15000.0).as("lo"),
    (col("id") * 15000.0 + 40000.0).as("hi"))
  private def betweenCond =
    col("o_totalprice") >= col("lo") && col("o_totalprice") <= col("hi")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("o_orderkey"), col("band_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def withRule[A](body: => A): A = {
    val old = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = old :+ graft.plans.RangeJoinRewrite
    try body finally spark.experimental.extraOptimizations = old
  }

  test("RangeJoinRewrite: BETWEEN join becomes a hash join, identical results") {
    val naive = points.join(bands, betweenCond)
    assert(naive.queryExecution.executedPlan.toString.contains("NestedLoop"))
    val expected = pairs(naive)
    withRule {
      val rewritten = points.join(bands, betweenCond)
      val plan = rewritten.queryExecution.executedPlan.toString
      // the bucketed equi branch carries the data; the NestedLoop that
      // remains is the (empty here) oversized-span fallback branch
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
      assert(pairs(rewritten) == expected && expected.nonEmpty)
    }
  }

  test("RangeJoinRewrite handles the ranges-on-the-left orientation") {
    val expected = pairs(bands.join(points, betweenCond))
    withRule {
      val rewritten = bands.join(points, betweenCond)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
      assert(pairs(rewritten) == expected)
    }
  }

  test("RangeJoinRewrite: oversized-span rows fall back losslessly instead of exploding") {
    // one band spans 1e9 price units = 1e5 buckets at width 10000 —
    // above maxBucketsPerRow (10000), so it must take the fallback
    // branch; without the guard this row alone would sequence() 100k
    // elements per row (and OOM/abort at wider spans).
    val wild = bands.union(
      spark.range(1).select(lit(999L).as("band_id"),
        lit(0.0).as("lo"), lit(1.0e9).as("hi")))
    val expected = pairs(points.join(wild, betweenCond))
    withRule {
      val rewritten = points.join(wild, betweenCond)
      assert(pairs(rewritten) == expected)
      // every point falls inside the wild band
      assert(pairs(rewritten).count(_._2 == 999L) == points.count())
    }
  }

  test("RangeJoinRewrite maxBucketsPerRow=0 sends everything to the fallback, still correct") {
    val expected = pairs(points.join(bands, betweenCond))
    withRule {
      spark.conf.set("spark.graft.rangeJoin.maxBucketsPerRow", "0")
      try {
        val rewritten = points.join(bands, betweenCond)
        assert(pairs(rewritten) == expected)
      } finally spark.conf.unset("spark.graft.rangeJoin.maxBucketsPerRow")
    }
  }

  test("RangeJoinRewrite leaves equi joins and non-interval conditions alone") {
    withRule {
      val equi = points.join(bands, col("o_orderkey") === col("band_id"))
      assert(equi.queryExecution.executedPlan.toString.contains("HashJoin"))
      // one-sided inequality: not an interval, stays a nested loop
      val half = points.join(bands, col("o_totalprice") >= col("lo"))
      assert(half.queryExecution.executedPlan.toString.contains("NestedLoop"))
    }
  }

  test("RangeJoinRewrite respects the enabled flag") {
    withRule {
      spark.conf.set("spark.graft.rangeJoin.enabled", "false")
      try {
        val q = points.join(bands, betweenCond)
        assert(q.queryExecution.executedPlan.toString.contains("NestedLoop"))
      } finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
    }
  }
}
