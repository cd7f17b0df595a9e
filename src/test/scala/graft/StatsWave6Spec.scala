package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for the post-hoc / seasonal-smoothing wave (Tukey–
  * Kramer, Cochran's Q, power analysis in queries.StatsQueries4;
  * Holt–Winters in queries.TemporalQueries): exact local replays so a
  * formula regression fails even if both engines regress together. */
class StatsWave6Spec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  private lazy val daily: Seq[(String, Long, BigInt)] =
    graft.sources.Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        BigInt(r.getAs[Long]("y")))).toSeq

  test("tukey_hsd: exact BigInt Tukey–Kramer replay for every pair") {
    val g = daily.groupBy(_._1).view.mapValues { rs =>
      val ys = rs.map(_._3)
      (BigInt(ys.size), ys.sum, ys.map(y => y * y).sum)
    }.toMap
    val n = g.values.map(_._1).sum
    val k = BigInt(g.size)
    val ssw = g.values.map { case (ng, sg, qg) => (ng * qg - sg * sg) / ng }.sum
    val rows = run("q_tukey_hsd")
    assert(rows.length == g.size * (g.size - 1) / 2)
    for (r <- rows) {
      val (na, sa, _) = g(r.getString(0)); val (nb, sb, _) = g(r.getString(1))
      val diff = sa * nb - sb * na
      val q2 = BigInt(2000) * diff * diff * (n - k) / (na * nb * (na + nb) * ssw)
      assert(BigInt(r.getAs[Long]("q2_milli")) == q2, s"${r.getString(0)}")
      assert(BigInt(r.getAs[Long]("mean_diff_c")) == diff / (na * nb))
      assert(r.getAs[Boolean]("significant") == (q2 >= 14884))
    }
  }

  test("cochran_q: replay + level-shift invariance of the dichotomy") {
    val byDay = daily.groupBy(_._2)
    def qOf(shift: Map[Long, BigInt]): BigInt = {
      val marks = byDay.toSeq.flatMap { case (day, rs) =>
        val kd = BigInt(rs.size)
        val sd = rs.map(_._3 + shift.getOrElse(day, BigInt(0))).sum
        rs.map(t => (t._1, day,
          if (kd * (t._3 + shift.getOrElse(day, BigInt(0))) > sd) BigInt(1)
          else BigInt(0)))
      }
      val cj = marks.groupBy(_._1).values.map(_.map(_._3).sum).toSeq
      val rd = marks.groupBy(_._2).values.map(_.map(_._3).sum).toSeq
      val k = BigInt(marks.groupBy(_._1).size)
      val nn = cj.sum
      val den = k * (k * rd.sum - rd.map(r => r * r).sum)
      if (den == 0) BigInt(0)
      else BigInt(1000) * (k - 1) * (k * cj.map(c => c * c).sum - nn * nn) / den
    }
    val row = run("q_cochran_q").head
    assert(BigInt(row.getAs[Long]("q_milli")) == qOf(Map.empty))
    // shifting an entire day shifts its mean equally: Q is invariant
    val someDay = daily.head._2
    assert(qOf(Map(someDay -> BigInt(987654321))) == qOf(Map.empty))
  }

  test("power_analysis: exact replay, ceiling law, monotone in the lift") {
    val rows = run("q_power_analysis").sortBy(_.getAs[Long]("lift_milli"))
    assert(rows.map(_.getAs[Long]("lift_milli")).toSeq ==
      Seq(10L, 20L, 50L, 100L))
    val z2 = BigInt(2801585) * 2801585
    for (r <- rows) {
      val p1 = BigInt(r.getAs[Long]("p1_ppm")); val p2 = BigInt(r.getAs[Long]("p2_ppm"))
      assert(p2 == p1 + p1 * r.getAs[Long]("lift_milli") / 1000)
      val num = z2 * (p1 * (BigInt(1000000) - p1) + p2 * (BigInt(1000000) - p2))
      val den = BigInt("1000000000000") * (p2 - p1) * (p2 - p1)
      assert(BigInt(r.getAs[Long]("n_per_arm")) == (num + den - 1) / den)
    }
    val ns = rows.map(_.getAs[Long]("n_per_arm"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a > b },
      "bigger detectable lift needs fewer samples")
  }

  test("holt_winters: pinned-double fold replay incl. period-mean init") {
    val counts = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).cast("double").as("x")).collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        r.getAs[Double]("x")))
    val rows = run("q_holt_winters").map(r => r.getString(0) -> r).toMap
    for ((t, rs) <- counts.groupBy(_._1)) {
      val xs = rs.sortBy(_._2).map(_._3).toSeq
      var l = 0.0; var b = 0.0; val sl = Array.fill(7)(0.0)
      for ((x, i) <- xs.zipWithIndex) {
        if (i < 6) { l = l + x; sl(i) = x }
        else if (i == 6) {
          val lInit = (l + x) / 7.0
          sl(6) = x
          for (j <- 0 until 7) sl(j) = sl(j) - lInit
          l = lInit; b = 0.0
        } else {
          val j = i % 7
          val l1 = 0.3 * (x - sl(j)) + 0.7 * (l + b)
          val b1 = 0.2 * (l1 - l) + 0.8 * b
          sl(j) = 0.2 * (x - l1) + 0.8 * sl(j)
          l = l1; b = b1
        }
      }
      val n = xs.size
      def rd(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val row = rows(t)
      assert(row.getAs[Long]("n_days") == n)
      assert(row.getAs[Double]("level") == rd(l), s"level $t")
      assert(row.getAs[Double]("trend") == rd(b), s"trend $t")
      assert(row.getAs[Double]("forecast_1d") == rd(l + b + sl(n % 7)), s"f1 $t")
      assert(row.getAs[Double]("forecast_7d") ==
        rd(l + 7.0 * b + sl((n + 6) % 7)), s"f7 $t")
    }
  }
}
