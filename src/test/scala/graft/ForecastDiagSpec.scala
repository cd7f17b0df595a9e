package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for the wave-11 diagnostics (q_smape + q_breusch_pagan
  * in queries.DiagnosticsQueries; q_gpd_tail in queries.EconQueries;
  * q_cronbach_alpha in queries.AgreementQueries): exact local replays
  * so a formula regression fails even if both engines regress
  * together, plus each statistic's structural bounds (sMAPE ≤ 2·10⁶
  * ppm, GPD σ > 0, α ≤ 1, BP LM ≥ 0).
  */
class ForecastDiagSpec extends AnyFunSuite {

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

  test("smape: fully-integer ppm replay of the lag-7 naive errors") {
    val rows = run("q_smape")
    for (r <- rows) {
      val ser = dailyByType(r.getString(0))
      val byDay = ser.toMap
      // lag-7 in ROW order within the type (the window's lag(7)),
      // matching the query's type-partitioned day-ordered window
      val days = ser.map(_._1)
      val terms = days.zipWithIndex.drop(7).flatMap { case (day, i) =>
        val y = byDay(day); val f = ser(i - 7)._2
        val den = y.abs + f.abs
        if (den > 0) Some(((BigInt(2000000) * (y - f).abs) / den,
          (y - f).abs, y.abs))
        else None
      }
      assert(r.getAs[Long]("n_days") == terms.length.toLong, r.getString(0))
      val smape = terms.map(_._1).sum / terms.length
      val wape = (BigInt(1000000) * terms.map(_._2).sum) / terms.map(_._3).sum
      assert(BigInt(r.getAs[Long]("smape_ppm")) == smape, r.getString(0))
      assert(BigInt(r.getAs[Long]("wape_ppm")) == wape, r.getString(0))
      assert(r.getAs[Long]("smape_ppm") <= 2000000L)
    }
  }

  test("gpd_tail: moment-estimator replay over the exact excesses") {
    val vals = graft.sources.Tables.orders(spark, sfTiny)
      .select(round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => BigInt(r.getLong(0))).toSeq
    val thr = (BigInt(3) * vals.sum) / (BigInt(2) * vals.length)
    val z = vals.filter(_ > thr).map(_ - thr)
    val (nz, sz, szz) = (BigInt(z.length), z.sum, z.map(x => x * x).sum)
    val ratio = (sz * sz).toDouble / (nz * szz - sz * sz).toDouble
    val r = run("q_gpd_tail").head
    assert(r.getAs[Long]("thr_cents") == thr.toLong)
    assert(r.getAs[Long]("n_exceed") == nz.toLong)
    val xi = BigDecimal(0.5 * (1.0 - ratio))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("xi") - xi) < 1e-9)
    assert(r.getAs[Double]("sigma_cents") > 0.0)
  }

  test("cronbach_alpha: exact integer variance-numerator replay") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val byDay = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .collect()
      .groupBy(_.getAs[java.sql.Date]("day").toString).view
      .mapValues(_.map(r => r.getString(1) -> BigInt(r.getAs[Long]("y"))).toMap)
      .toMap
    val n = BigInt(byDay.size)
    val items = types.map(t => byDay.values.map(_.getOrElse(t, BigInt(0))).toSeq)
    val tot = byDay.values.map(_.values.sum).toSeq
    def varNum(xs: Seq[BigInt]) = n * xs.map(x => x * x).sum - xs.sum * xs.sum
    val alpha = (5.0 / 4.0) *
      (1.0 - items.map(varNum).sum.toDouble / varNum(tot).toDouble)
    val r = run("q_cronbach_alpha").head
    assert(r.getAs[Long]("k") == 5L && r.getAs[Long]("n_days") == n.toLong)
    val want = BigDecimal(alpha)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("alpha") - want) < 1e-9)
    assert(r.getAs[Double]("alpha") <= 1.0)
  }

  test("breusch_pagan: LM is non-negative and day count matches the series") {
    val nDays = graft.sources.Tables.orders(spark, sfTiny)
      .select(to_date(col("o_orderdate"))).distinct().count()
    val r = run("q_breusch_pagan").head
    assert(r.getAs[Long]("n_days") == nDays)
    val lm = r.getAs[Double]("bp_lm")
    // LM = n·R² with R² ∈ [0,1]
    assert(lm >= 0.0 && lm <= nDays.toDouble)
  }

  test("welch_anova: F and df2 replay from exact group moments") {
    val g = graft.sources.Tables.orders(spark, sfTiny)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("sx"),
        sum(expr("CAST(round(o_totalprice*100,0) AS LONG) * CAST(round(o_totalprice*100,0) AS LONG)")).as("qx"))
      .collect().map(r => (r.getString(0), BigInt(r.getAs[Long]("n")),
        BigInt(r.getAs[Long]("sx")), BigInt(r.getAs[Long]("qx"))))
      .sortBy(_._1)
    val k = g.length
    def wof(t: (String, BigInt, BigInt, BigInt)) =
      t._2.toDouble * t._2.toDouble * (t._2.toDouble - 1.0) /
        (t._2 * t._4 - t._3 * t._3).toDouble
    val ww = g.map(wof).sum
    val mw = g.map(t => wof(t) * (t._3.toDouble / t._2.toDouble)).sum / ww
    val num = g.map(t => wof(t) * math.pow(t._3.toDouble / t._2.toDouble - mw, 2)).sum / (k - 1)
    val lam = g.map(t => math.pow(1.0 - wof(t) / ww, 2) / (t._2.toDouble - 1.0)).sum
    val f = num / (1.0 + 2.0 * (k - 2.0) / (k.toDouble * k - 1.0) * lam)
    val df2 = (k.toDouble * k - 1.0) / (3.0 * lam)
    val r = run("q_welch_anova").head
    assert(r.getAs[Long]("k") == k.toLong)
    assert(math.abs(r.getAs[Double]("welch_f") - f) < 1e-4)
    assert(math.abs(r.getAs[Double]("df2") - df2) < 1e-2)
    assert(r.getAs[Double]("welch_f") >= 0.0)
  }
}
