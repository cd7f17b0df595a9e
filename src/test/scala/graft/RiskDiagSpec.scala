package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for the risk/diagnostics wave (q_maxdrawdown +
  * q_theil_index in queries.EconQueries; q_bartlett +
  * q_cooks_distance in queries.DiagnosticsQueries): exact local
  * replays so a formula regression fails even if both engines
  * regress together, plus the structural identities each statistic
  * must satisfy (drawdown bounds, Theil decomposition, hat-value
  * mass Σh_i = p).
  */
class RiskDiagSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  private lazy val dailyByType: Map[String, Seq[(Long, BigInt)]] =
    graft.sources.Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        BigInt(r.getAs[Long]("y"))))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap

  test("maxdrawdown: exact cumsum/peak replay incl. the tie convention") {
    val rows = run("q_maxdrawdown")
    assert(rows.length == dailyByType.size)
    for (r <- rows) {
      val ser = dailyByType(r.getString(0))
      var cum = BigInt(0); var peak = BigInt(0)
      // deepest drawdown, tie -> LATEST day (the pinned argmax key)
      var best = (BigInt(-1), -1L, BigInt(0)) // (dd, day, peakAt)
      for ((day, y) <- ser) {
        cum += y; if (cum > peak) peak = cum
        val dd = peak - cum
        if (dd > best._1 || (dd == best._1 && day > best._2))
          best = (dd, day, peak)
      }
      assert(BigInt(r.getAs[Long]("max_dd_cents")) == best._1, r.getString(0))
      assert(r.getAs[java.sql.Date]("trough_day").toLocalDate.toEpochDay
        == best._2, r.getString(0))
      assert(BigInt(r.getAs[Long]("peak_cents")) == best._3, r.getString(0))
      // a drawdown can never exceed the peak it fell from
      assert(r.getAs[Long]("dd_ppm") >= 0L && r.getAs[Long]("dd_ppm") <= 1000000L)
    }
  }

  private lazy val custRev: Seq[(Int, BigInt)] = {
    val rev = graft.sources.Tables.orders(spark, sfTiny)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("x"))
    rev.join(graft.sources.Tables.customer(spark, sfTiny),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("x"))
      .collect().map(r => (r.getInt(0), BigInt(r.getAs[Long]("x")))).toSeq
  }

  test("theil_index: micro-nat replay + the within/between decomposition") {
    val n = custRev.size
    val x = custRev.map(_._2).sum
    def lmicro(num: Double, den: Double): BigInt =
      BigInt(math.round(math.log(num / den) * 1e6))
    val w = custRev.map { case (_, xi) =>
      xi * lmicro(xi.toDouble * n, x.toDouble) }.sum
    val groups = custRev.groupBy(_._1).view.mapValues { rs =>
      (BigInt(rs.size), rs.map(_._2).sum) }.toMap
    val b = groups.values.map { case (ng, xg) =>
      xg * lmicro(xg.toDouble * n, x.toDouble * ng.toDouble) }.sum
    val r = run("q_theil_index").head
    assert(r.getAs[Long]("n_cust") == n.toLong)
    assert(r.getAs[Long]("n_nations") == groups.size.toLong)
    val total = w.toDouble / (x.toDouble * 1e6)
    val between = b.toDouble / (x.toDouble * 1e6)
    assert(math.abs(r.getAs[Double]("theil_total") - total) < 1e-8)
    assert(math.abs(r.getAs[Double]("theil_between") - between) < 1e-8)
    // decomposition identity is exact at the integer grain: within = (W-B)/X
    assert(math.abs(r.getAs[Double]("theil_within")
      - (total - between)) < 1e-8)
    // Jensen: both components are non-negative up to micro-nat rounding
    assert(r.getAs[Double]("theil_total") > -1e-6)
    assert(r.getAs[Double]("theil_between") > -1e-6)
  }

  private lazy val priceByPriority: Map[String, Seq[BigInt]] =
    graft.sources.Tables.orders(spark, sfTiny)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => (r.getString(0), BigInt(r.getAs[Long]("c"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("bartlett: pinned-fold double replay over the sorted group moments") {
    val gs = priceByPriority.toSeq.sortBy(_._1).map { case (_, cs) =>
      (BigInt(cs.size), cs.sum, cs.map(c => c * c).sum) }
    val k = gs.size
    val nTot = gs.map(_._1).sum
    def s2(g: (BigInt, BigInt, BigInt)): Double =
      (g._1.toDouble * g._3.toDouble - g._2.toDouble * g._2.toDouble) /
        (g._1.toDouble * (g._1.toDouble - 1.0))
    val pooledNum = gs.foldLeft(0.0)((a, g) => a + (g._1.toDouble - 1.0) * s2(g))
    val sumLn = gs.foldLeft(0.0)((a, g) =>
      a + (g._1.toDouble - 1.0) * math.log(s2(g)))
    val sumInv = gs.foldLeft(0.0)((a, g) => a + 1.0 / (g._1.toDouble - 1.0))
    val nk = nTot.toDouble - k.toDouble
    val t = (nk * math.log(pooledNum / nk) - sumLn) /
      (1.0 + (sumInv - 1.0 / nk) / (3.0 * (k - 1.0)))
    val r = run("q_bartlett").head
    assert(r.getAs[Long]("k") == k.toLong)
    assert(r.getAs[Long]("n_total") == nTot.toLong)
    assert(math.abs(r.getAs[Double]("bartlett_t") - t) < 1e-5)
  }

  private lazy val dailyRevenue: Seq[(Long, BigInt)] =
    graft.sources.Tables.orders(spark, sfTiny)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("y"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        BigInt(r.getAs[Long]("y"))))
      .sortBy(_._1).toSeq

  test("cooks_distance: cleared-integer residual/leverage replay + Σh = p") {
    val d0 = dailyRevenue.head._1
    val xy = dailyRevenue.map { case (day, y) => (BigInt(day - d0), y) }
    val n = BigInt(xy.size)
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(t => t._1 * t._1).sum
    val sxy = xy.map(t => t._1 * t._2).sum
    val dd = n * sxx - sx * sx
    val nb = n * sxy - sx * sy
    def tdiv(a: BigInt, b: BigInt): BigInt = a / b // BigInt / truncates toward zero
    val expect = xy.map { case (x, y) =>
      val e = tdiv(n * dd * y - dd * sy + nb * sx - n * nb * x, n * dd)
      val h = tdiv(BigInt(1000000) * (dd + (n * x - sx) * (n * x - sx)), n * dd)
      (x, e, h)
    }
    val rows = run("q_cooks_distance")
    assert(rows.length == xy.size)
    var levSum = BigInt(0)
    for ((r, (_, e, h)) <- rows.zip(expect)) {
      assert(BigInt(r.getAs[Long]("e_cents")) == e)
      assert(BigInt(r.getAs[Long]("lev_ppm")) == h)
      levSum += h
    }
    // hat-matrix trace: Σh_i = p = 2 -> Σlev_ppm ≈ 2e6 (truncation ≤ 1/row)
    assert((levSum - BigInt(2000000)).abs <= BigInt(xy.size))
    // residuals of an OLS fit sum to ~0 (cleared-integer truncation ≤ 1/row)
    val eSum = expect.map(_._2).sum
    assert(eSum.abs <= BigInt(xy.size))
  }
}
