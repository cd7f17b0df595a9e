package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Behavior specs for the temporal surface (q_scd2, q_seasonal) and
  * the mixture sampler (q_mixture_sample) beyond the oracle gate.
  */
class TemporalSpec extends AnyFunSuite {
  import TestSpark._

  test("scd2 intervals tile each user's timeline exactly") {
    val iv = Registry.queries("q_scd2")(spark, sfTiny).cache()
    try {
      // exactly one open (current) interval per user
      val users = iv.select("user_id").distinct().count()
      assert(iv.where(col("is_current")).count() == users)
      // intervals are disjoint and contiguous: valid_to of row k equals
      // valid_from of row k+1 (lead-derived), and from < to when closed
      assert(iv.where(col("valid_to_us").isNotNull &&
        col("valid_from_us") >= col("valid_to_us")).count() == 0)
      // adjacent runs always change state (maximal runs)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("valid_from_us")
      val adj = iv.withColumn("prev_state", lag(col("state"), 1).over(w))
      assert(adj.where(col("prev_state") === col("state")).count() == 0)
      // run sizes account for every event
      val total = iv.agg(sum("n_events")).head().getLong(0)
      assert(total == graft.sources.Tables.events(spark, sfTiny).count())
    } finally iv.unpersist()
  }

  test("seasonal indexes are positive and n-weighted-average to ~1 per type") {
    val df = Registry.queries("q_seasonal")(spark, sfTiny).cache()
    try {
      assert(df.where(col("seasonal_index") <= 0).count() == 0)
      // sum(index * n) / tn == 1 up to rounding: the cell means are a
      // decomposition of the type mean
      val byType = df.groupBy("event_type")
        .agg((sum(col("seasonal_index") * col("n")) / sum(col("n"))).as("m"))
        .collect()
      byType.foreach(r =>
        assert(math.abs(r.getAs[Double]("m") - 1.0) < 1e-4, r.toString))
      // at most 7 weekday cells per type, labels in [0, 6]
      assert(df.where(col("dow") < 0 || col("dow") > 6).count() == 0)
    } finally df.unpersist()
  }

  test("transition matrix rows are probability distributions") {
    val df = Registry.queries("q_transition_matrix")(spark, sfTiny)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("p") > 0 && r.getAs[Double]("p") <= 1))
    rows.groupBy(_.getAs[String]("cur")).values.foreach { g =>
      val total = g.map(_.getAs[Double]("p")).sum
      assert(math.abs(total - 1.0) < 1e-4, s"row sums to $total")
    }
  }

  test("trending emits one row per type with positive lift when history is full") {
    val df = Registry.queries("q_trending")(spark, sfTiny)
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("lift") > 0)
      assert(r.getAs[Long]("n") > 0)
    }
    // at most one row per type by construction (rn = 1)
    assert(rows.map(_.getAs[String]("event_type")).distinct.length == rows.length)
  }

  test("mixture sampling rebalances the head language toward sqrt share") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
    val n = docs.count().toDouble
    val raw = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val head = raw.maxBy(_._2)._1
    val samp = Registry.queries("q_mixture_sample")(spark, sfTiny)
    val got = samp.groupBy("lang").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = got.values.sum.toDouble
    // the head language's share of the sample is strictly below its raw
    // share (α = 0.5 compresses the head)...
    assert(got(head) / budget < raw(head) / n)
    // ...and every stratum with docs is represented
    assert(got.keySet == raw.keySet)
    // deterministic: same rows on a second run
    val again = Registry.queries("q_mixture_sample")(spark, sfTiny)
    assert(samp.collect().toSeq == again.collect().toSeq)
  }

  test("acf is a lawful correlation: |acf| <= 1, lag-0 identity holds locally") {
    val rows = Registry.queries("q_acf")(spark, sfTiny).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (1L to 14L))
    rows.foreach { r =>
      // ppm ratio of Σy_t·y_{t+k} to Σy_t² — Cauchy-Schwarz bounds it
      assert(math.abs(r.getAs[Long]("acf_ppm")) <= 1000000L)
      assert(r.getAs[Long]("n_pairs") > 0L)
    }
    // local exact replay with BigInt arithmetic over the same series
    val ser = graft.sources.Tables.orders(spark, sfTiny)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(graft.functions.Num.cents(col("o_totalprice"))).as("x"))
      .collect().map(r => r.getDate(0).toLocalDate.toEpochDay -> BigInt(r.getLong(1)))
      .sortBy(_._1)
    val n = BigInt(ser.length); val s = ser.map(_._2).sum
    val y = ser.map { case (d0, x) => d0 -> (n * x - s) }.toMap
    val den = y.values.map(v => v * v).sum / 1000000
    val expect = (1 to 14).map { k =>
      val num = y.toSeq.flatMap { case (d0, v) =>
        y.get(d0 + k).map(v * _) }.sum
      num / den
    }
    assert(rows.sortBy(_.getAs[Long]("lag"))
      .map(r => BigInt(r.getAs[Long]("acf_ppm"))).toSeq == expect)
  }

  test("mann-kendall S is bounded by the pair count and z2 is consistent") {
    val rows = Registry.queries("q_mann_kendall")(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_days"); val sS = r.getAs[Long]("s_stat")
      val pairs = nd * (nd - 1) / 2
      assert(math.abs(sS) <= pairs)
      assert(r.getAs[Long]("var18") >= 0L)
      val trend = r.getAs[String]("trend")
      assert(if (sS > 0) trend == "inc"
             else if (sS < 0) trend == "dec" else trend == "none")
      if (r.getAs[Long]("var18") > 0L) {
        val sAdj = BigInt(math.max(math.abs(sS) - 1, 0L))
        assert(BigInt(r.getAs[Long]("z2_ppm")) ==
          sAdj * sAdj * 18000000 / BigInt(r.getAs[Long]("var18")))
      } else assert(r.getAs[Long]("z2_ppm") == 0L)
    }
  }
}
