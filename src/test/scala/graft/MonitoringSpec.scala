package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for the monitoring / cointegration wave
  * (queries.MonitoringQueries): exact local replays of every
  * statistic plus the structural laws (run-rule islands, Page–Hinkley
  * extrema ordering, DF sign behavior). */
class MonitoringSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  private lazy val daily: Map[String, Seq[(Long, BigInt)]] =
    graft.sources.Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        BigInt(r.getAs[Long]("y"))))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq)
      .toMap

  test("control_chart: z² replay, 3σ rule, run-rule islands") {
    val rows = run("q_control_chart")
    for ((t, series) <- daily) {
      val n = BigInt(series.size)
      val sy = series.map(_._2).sum
      val qy = series.map(x => x._2 * x._2).sum
      val mine = rows.filter(_.getString(0) == t).sortBy(
        _.getAs[java.sql.Date]("day").toLocalDate.toEpochDay)
      assert(mine.length == series.size)
      val sides = series.map { case (_, y) => (n * y).compare(sy) }
      for ((r, i) <- mine.zipWithIndex) {
        val y = series(i)._2
        val z2 = BigInt(1000) * (n * y - sy) * (n * y - sy) * (n - 1) /
          (n * (n * qy - sy * sy))
        assert(BigInt(r.getAs[Long]("z2_milli")) == z2)
        assert(r.getAs[Boolean]("ooc_3sigma") == (z2 > 9000))
        assert(r.getAs[Long]("side") == sides(i))
        // island length replay for the run rule
        val runLen = {
          var lo = i; while (lo > 0 && sides(lo - 1) == sides(i)) lo -= 1
          var hi = i; while (hi < sides.size - 1 && sides(hi + 1) == sides(i)) hi += 1
          hi - lo + 1
        }
        assert(r.getAs[Boolean]("ooc_run8") == (runLen >= 8 && sides(i) != 0),
          s"$t day $i runLen=$runLen")
      }
    }
  }

  test("page_hinkley: pinned-double fold replay, extrema bracket m") {
    val rows = run("q_page_hinkley").map(r => r.getString(0) -> r).toMap
    for ((t, series) <- daily) {
      val xs = series.map(_._2.toDouble / 100.0)
      var sum = 0.0; var m = 0.0; var mn = 0.0; var mx = 0.0; var i = 0L
      for (x <- xs) {
        sum += x
        m = m + (x - sum / (i + 1.0))
        mn = math.min(mn, m); mx = math.max(mx, m); i += 1
      }
      def rd(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val r = rows(t)
      assert(r.getAs[Double]("m_final") == rd(m), s"m $t")
      assert(r.getAs[Double]("ph_inc") == rd(m - mn), s"inc $t")
      assert(r.getAs[Double]("ph_dec") == rd(mx - m), s"dec $t")
      assert(r.getAs[Double]("ph_inc") >= 0 && r.getAs[Double]("ph_dec") >= 0)
    }
  }

  test("engle_granger: exact reduced-residual DF replay") {
    val click = daily("click").toMap; val purch = daily("purchase").toMap
    val days = click.keySet.intersect(purch.keySet).toSeq.sorted
    val xs = days.map(click); val ys = days.map(purch)
    val n = BigInt(days.size)
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val bden = n * sxx - sx * sx
    val bnum = n * sxy - sx * sy
    val r = xs.zip(ys).map { case (x, y) =>
      (bden * (n * y - sy) - bnum * (n * x - sx)) / bden }
    val pairs = r.zip(r.tail)
    val num = pairs.map { case (rl, rc) => rl * (rc - rl) }.sum
    val den = pairs.map { case (rl, _) => rl * rl }.sum
    val expect = BigInt(1000) * pairs.size.+(1) * num / den
    val row = run("q_engle_granger").head
    assert(row.getAs[Long]("n_diff") == pairs.size)
    assert(BigInt(row.getAs[Long]("df_z_milli")) == expect)
  }

  test("seasonal_esd: exact nearest-rank replay of medians, MAD, flags") {
    val rows = run("q_seasonal_esd")
    assert(rows.nonEmpty)
    for ((t, series) <- daily) {
      // dow medians via the same (y, day)-ordered nearest-rank
      val withDow = series.map { case (day, y) =>
        (day, y, java.time.LocalDate.ofEpochDay(day).getDayOfWeek.getValue % 7 + 1)
      }
      val med = withDow.groupBy(_._3).view.mapValues { g =>
        val sorted = g.sortBy(x => (x._2, x._1))
        sorted((g.size + 1) / 2 - 1)._2
      }.toMap
      val resid = withDow.map { case (day, y, dw) => (day, y, y - med(dw)) }
      val sortedAbs = resid.sortBy(x => (x._3.abs, x._1))
      val mad = sortedAbs((resid.size + 1) / 2 - 1)._3.abs
      val mine = rows.filter(_.getString(0) == t).map(r =>
        (r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay, r)).toMap
      assert(mine.size == series.size)
      for ((day, y, rr) <- resid) {
        val row = mine(day)
        assert(BigInt(row.getAs[Long]("r")) == rr, s"$t $day")
        assert(BigInt(row.getAs[Long]("mad")) == mad)
        assert(row.getAs[Boolean]("outlier") ==
          (rr.abs * 10000 > mad * 44478), s"$t $day flag")
      }
    }
  }

  test("theil_u: exact error-ratio replay per type") {
    val rows = run("q_theil_u").map(r => r.getString(0) -> r).toMap
    for ((t, series) <- daily) {
      val ys = series.map(_._2)
      val scored = (7 until ys.size).map(i => (ys(i - 7), ys(i - 1), ys(i)))
      val num = scored.map { case (f, _, y) => (f - y) * (f - y) }.sum
      val den = scored.map { case (_, nv, y) => (nv - y) * (nv - y) }.sum
      val r = rows(t)
      assert(r.getAs[Long]("n_scored") == scored.size)
      assert(BigInt(r.getAs[Long]("u2_sq_milli")) == BigInt(1000) * num / den)
    }
  }
}
