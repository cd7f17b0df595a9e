package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{Gram, GramFns}

/** expressions.GramAgg — the one-pass per-partition Gram/moment
  * aggregate behind ml.Pca and ml.ScatterPower. Pins: (1) exact
  * agreement with the naive explode/self-join moment formulation,
  * (2) partition-order invariance of the integer lane, (3) the
  * Long→BigInt overflow spill produces exact sums past Long range,
  * (4) serialize/deserialize round-trips the spill lane.
  */
class GramSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def triIdx(d: Int, i: Int, j: Int) = GramFns.triIndex(d, i, j)

  test("gram_agg_long matches the naive moment sums exactly, any partitioning") {
    val d = 5
    val rng = new scala.util.Random(7)
    val data = Seq.fill(200)(Array.fill(d)(rng.nextInt(4001).toLong - 2000L))
    val expectedSum = Array.tabulate(d)(i => data.map(_(i)).sum)
    val expectedGram = Array.fill(d * (d + 1) / 2)(0L)
    for (xs <- data; i <- 0 until d; j <- i until d)
      expectedGram(triIdx(d, i, j)) += xs(i) * xs(j)

    for (parts <- Seq(1, 3, 13)) {
      val df = spark.createDataset(data.map(_.toSeq)).repartition(parts).toDF("v")
      val g = df.select(Gram.gramAggLong(spark, col("v"), d)).head().getStruct(0)
      assert(g.getLong(0) == 200L)
      val s = g.getSeq[java.math.BigDecimal](1).map(_.longValueExact())
      val gr = g.getSeq[java.math.BigDecimal](2).map(_.longValueExact())
      assert(s == expectedSum.toSeq, s"sums differ at $parts partitions")
      assert(gr == expectedGram.toSeq, s"gram differs at $parts partitions")
    }
  }

  test("gram_agg_long spills to BigInt and stays exact past Long range") {
    // x = 3e9 ⇒ x² = 9e18 ≈ Long.Max (9.22e18): two rows overflow the
    // fast lane, forcing the spill path; 40 rows ⇒ 3.6e20
    val x = 3000000000L
    val rows = 40
    val df = spark.createDataset(Seq.fill(rows)(Seq(x))).repartition(5).toDF("v")
    val g = df.select(Gram.gramAggLong(spark, col("v"), 1)).head().getStruct(0)
    assert(g.getLong(0) == rows.toLong)
    val wantSum = BigInt(x) * rows
    val wantGram = BigInt(x) * BigInt(x) * rows
    assert(wantGram > BigInt(Long.MaxValue), "test must actually exceed Long range")
    assert(BigInt(g.getSeq[java.math.BigDecimal](1).head.toBigInteger) == wantSum)
    assert(BigInt(g.getSeq[java.math.BigDecimal](2).head.toBigInteger) == wantGram)
  }

  test("LongBuf serialize/deserialize round-trips the spill lane") {
    val buf = new GramFns.LongBuf(2)
    for (_ <- 1 to 5) buf.update(Array(3000000000L, -7L))
    val back = GramFns.longFromBytes(buf.toBytes)
    assert(back.n == 5)
    for (k <- 0 until 2) assert(back.sumAt(k) == buf.sumAt(k))
    for (k <- 0 until 3) assert(back.gramAt(k) == buf.gramAt(k))
    assert(back.gramAt(0) == BigInt(3000000000L) * BigInt(3000000000L) * 5)
    // merging a deserialized buffer keeps exactness
    val merged = new GramFns.LongBuf(2)
    merged.merge(back); merged.merge(back)
    assert(merged.gramAt(0) == BigInt(3000000000L) * BigInt(3000000000L) * 10)
    assert(merged.n == 10)
  }

  test("gram_agg_double matches naive double moments within fp tolerance") {
    val d = 3
    val rng = new scala.util.Random(11)
    val data = Seq.fill(300)(Array.fill(d)(rng.nextDouble() * 2 - 1))
    val df = spark.createDataset(data.map(_.toSeq)).repartition(7).toDF("v")
    val g = df.select(Gram.gramAggDouble(spark, col("v"), d)).head().getStruct(0)
    assert(g.getLong(0) == 300L)
    val s = g.getSeq[Double](1)
    val gr = g.getSeq[Double](2)
    for (i <- 0 until d)
      assert(math.abs(s(i) - data.map(_(i)).sum) < 1e-9)
    for (i <- 0 until d; j <- i until d) {
      val want = data.map(xs => xs(i) * xs(j)).sum
      assert(math.abs(gr(triIdx(d, i, j)) - want) < 1e-9)
    }
  }

  test("gram_agg_long rejects a wrong-width vector loudly") {
    val df = Seq(Seq(1L, 2L), Seq(3L)).toDF("v")
    val ex = intercept[Exception] {
      df.select(Gram.gramAggLong(spark, col("v"), 2)).head()
    }
    assert(ex.getMessage != null)
  }
}
