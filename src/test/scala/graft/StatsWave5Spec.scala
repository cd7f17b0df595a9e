package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for classical-stats wave 5 (queries.StatsQueries4). The
  * DuckDB oracle proves engine equality; these pin the MATH with
  * exact BigInt local replays and known-answer fixtures, so a formula
  * regression fails even if both engines regress together. */
class StatsWave5Spec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  /** (type, epochDay, cents) daily revenue — the wave's shared input,
    * replayed locally. */
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

  test("jarque_bera: pinned-double replay from exact BigInt moments") {
    val rows = run("q_jarque_bera").map(r => r.getString(0) -> r).toMap
    assert(rows.size == daily.size)
    for ((t, ys) <- daily) {
      val xs = ys.map(_._2 / 100) // whole dollars, truncating like div
      val n = BigInt(xs.size)
      val s = xs.sum; val q = xs.map(x => x * x).sum
      val c = xs.map(x => x * x * x).sum; val f = xs.map(x => x * x * x * x).sum
      val a = n * n * c - 3 * n * q * s + 2 * s * s * s
      val b = n * q - s * s
      val dd = n * n * n * f - 4 * n * n * c * s + 6 * n * q * s * s - 3 * s * s * s * s
      val (adb, bdb, ddb) = (a.toDouble, b.toDouble, dd.toDouble)
      val skew2 = adb * adb / (bdb * bdb * bdb)
      val kurt = ddb / (bdb * bdb)
      val jb = n.toDouble * (skew2 / 6.0 + (kurt - 3.0) * (kurt - 3.0) / 24.0)
      val row = rows(t)
      assert(row.getAs[Long]("n_days") == xs.size)
      assert(row.getAs[Double]("skew2") == skew2, s"skew2 $t")
      assert(row.getAs[Double]("kurt") == kurt, s"kurt $t")
      assert(row.getAs[Double]("jb") == jb, s"jb $t")
    }
  }

  test("runs_test: replay + the two-runs/max-runs boundary law") {
    val rows = run("q_runs_test").map(r => r.getString(0) -> r).toMap
    for ((t, ys) <- daily) {
      val n = BigInt(ys.size); val sy = ys.map(_._2).sum
      val labs = ys.map { case (_, y) =>
        (n * y).compare(sy)
      }.filter(_ != 0)
      val runs = if (labs.isEmpty) 0
        else 1 + labs.sliding(2).count { case Seq(x, y) => x != y; case _ => false }
      val row = rows(t)
      val (n1, n2) = (row.getAs[Long]("n_above"), row.getAs[Long]("n_below"))
      assert(n1 == labs.count(_ > 0) && n2 == labs.count(_ < 0))
      assert(row.getAs[Long]("runs") == runs)
      // structural bounds: 2 <= R <= N when both labels occur
      if (n1 > 0 && n2 > 0)
        assert(runs >= 2 && runs <= n1 + n2)
      val z2 = BigInt(row.getAs[Long]("z2_milli"))
      val nn = BigInt(n1 + n2)
      if (2 * n1 * n2 > n1 + n2) {
        val num = BigInt(1000) * (runs * nn - nn - 2 * n1 * n2).pow(2) * (nn - 1)
        val den = nn * 2 * n1 * n2 * (2 * BigInt(n1) * n2 - nn)
        assert(z2 == num / den, s"z2 $t")
      }
    }
  }

  test("durbin_watson: scale-invariant residual replay, dw in (0,4)") {
    val rows = run("q_durbin_watson").map(r => r.getString(0) -> r).toMap
    for ((t, ys) <- daily) {
      val n = BigInt(ys.size)
      val ts = ys.indices.map(BigInt(_))
      val yv = ys.map(_._2)
      val sy = yv.sum; val st = ts.sum
      val stt = ts.map(x => x * x).sum
      val sty = ts.zip(yv).map { case (a, b) => a * b }.sum
      val bden = n * stt - st * st
      val bnum = n * sty - st * sy
      val r = ts.zip(yv).map { case (ti, yi) =>
        bden * (n * yi - sy) - bnum * (n * ti - st) }
      val num = r.sliding(2).map { case Seq(x, y) => (y - x).pow(2) }.sum
      val den = r.map(x => x * x).sum
      val dw = BigInt(1000) * num / den
      assert(BigInt(rows(t).getAs[Long]("dw_milli")) == dw, s"dw $t")
      assert(dw >= 0 && dw <= 4000)
    }
  }

  test("changepoint: argmax replay + a planted shift is found exactly") {
    val rows = run("q_changepoint").map(r => r.getString(0) -> r).toMap
    for ((t, ys) <- daily) {
      val n = BigInt(ys.size); val sy = ys.map(_._2).sum
      var s1 = BigInt(0)
      val scored = ys.zipWithIndex.init.map { case ((day, y), idx) =>
        s1 += y
        val i = BigInt(idx + 1)
        val diff = s1 * (n - i) - (sy - s1) * i
        (day, diff * diff / (i * (n - i) * 10000))
      }
      val best = scored.maxBy { case (day, sc) => (sc, -day) }
      val row = rows(t)
      assert(row.getAs[java.sql.Date]("split_day").toLocalDate.toEpochDay
        == best._1, s"split $t")
      assert(BigInt(row.getAs[Long]("bss_d2")) == best._2, s"score $t")
    }
    // planted shift: 10 days at 100 then 10 days at 10000 → split at day 10
    val n = 20L; val sy = 10 * 100L + 10 * 10000L
    val scores = (1 until 20).map { i =>
      val s1 = if (i <= 10) 100L * i else 100L * 10 + 10000L * (i - 10)
      val diff = BigInt(s1) * (n - i) - BigInt(sy - s1) * i
      (i, diff * diff / (BigInt(i) * (n - i) * 10000))
    }
    assert(scores.maxBy(_._2)._1 == 10, "planted shift must split at the jump")
  }

  test("cohens_d: exact BigInt replay and sign flips with the gap") {
    val rows = run("q_cohens_d")
    assert(rows.length == 1)
    def agg(t: String) = {
      val ys = daily(t).map(_._2)
      (BigInt(ys.size), ys.sum, ys.map(x => x * x).sum)
    }
    val (n1, s1, q1) = agg("click"); val (n2, s2, q2) = agg("view")
    val gap = s1 * n2 - s2 * n1
    val num = BigInt(1000000) * gap * gap * (n1 + n2 - 2)
    val den = n1 * n2 * (n2 * (n1 * q1 - s1 * s1) + n1 * (n2 * q2 - s2 * s2))
    val expected = (if (gap < 0) -1 else 1) * (num / den)
    val row = rows.head
    assert(BigInt(row.getAs[Long]("d2_ppm_signed")) == expected)
    assert(BigInt(row.getAs[Long]("mean_diff_c")) == gap / (n1 * n2))
  }

  test("mcc: perfect/constant classifier fixtures and cell consistency") {
    // cell identity on the bound query: tp+fp+fn+tn == total for every class
    val rows = run("q_mcc")
    val total = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).sum
    for (r <- rows) {
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") +
        r.getAs[Long]("fn") + r.getAs[Long]("tn") == total)
      val m = r.getAs[Long]("mcc2_ppm_signed")
      assert(m >= -1000000 && m <= 1000000)
    }
    // known answers: perfect diagonal → +1e6; all-one-class → 0
    def mcc(tp: BigInt, fp: BigInt, fn: BigInt, tn: BigInt): BigInt = {
      val den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
      if (den == 0) BigInt(0)
      else {
        val num = tp * tn - fp * fn
        (if (num < 0) BigInt(-1) else BigInt(1)) *
          (BigInt(1000000) * num * num / den)
      }
    }
    assert(mcc(50, 0, 0, 50) == BigInt(1000000))
    assert(mcc(100, 0, 0, 0) == BigInt(0))     // constant predictor
    assert(mcc(25, 25, 25, 25) == BigInt(0))   // chance
  }
}
