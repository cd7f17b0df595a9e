package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark._

class SkylineSpec extends AnyFunSuite {

  private def naive(pts: Seq[(Long, Int, Double)]): Set[Long] =
    pts.filter { case (_, sz, pr) =>
      !pts.exists { case (_, sz2, pr2) =>
        sz2 >= sz && pr2 <= pr && (sz2 > sz || pr2 < pr)
      }
    }.map(_._1).toSet

  test("two-phase skyline equals the naive quadratic frontier") {
    import spark.implicits._
    // deterministic pseudo-random points with real tradeoffs
    val pts = (1L to 400L).map { i =>
      val sz = ((i * 2654435761L) % 97).toInt
      val pr = ((i * 40503L) % 89).toDouble + sz * 0.5 // correlated + noise
      (i, sz, pr)
    }
    val df = pts.toDF("id", "sz", "pr")
    val got = Skyline.skyline(df, Seq((col("sz"), true), (col("pr"), false)))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == naive(pts), s"got $got want ${naive(pts)}")
  }

  test("duplicates of a frontier point are all kept; buckets don't matter") {
    import spark.implicits._
    val pts = Seq((1L, 10, 1.0), (2L, 10, 1.0), (3L, 5, 2.0), (4L, 10, 2.0))
    val df = pts.toDF("id", "sz", "pr")
    for (b <- Seq(1, 2, 7)) {
      val got = Skyline.skyline(df, Seq((col("sz"), true), (col("pr"), false)),
        buckets = b).collect().map(_.getAs[Long]("id")).toSet
      // 1 and 2 tie on the frontier; 3 is dominated by nothing on price?
      // (3) sz=5 pr=2.0 is dominated by (1): sz 10>=5, pr 1.0<=2.0, strict
      // (4) sz=10 pr=2.0 is dominated by (1): same sz, lower price
      assert(got == Set(1L, 2L), s"buckets=$b: $got")
    }
  }

  test("a single criterion degenerates to max/min") {
    import spark.implicits._
    val df = Seq((1L, 5), (2L, 9), (3L, 9), (4L, 1)).toDF("id", "v")
    val mx = Skyline.skyline(df, Seq((col("v"), true)))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(mx == Set(2L, 3L))
    val mn = Skyline.skyline(df, Seq((col("v"), false)))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(mn == Set(4L))
  }
}
