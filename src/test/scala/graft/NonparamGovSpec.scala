package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for the nonparametric-testing wave
  * (queries.StatsQueries3) and governance wave 2
  * (queries.GovernanceQueries). The DuckDB oracle proves engine
  * equality; these pin the MATH with exact BigInt local replays, so a
  * formula regression fails even if both engines regress together. */
class NonparamGovSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  /** (type, day, cents) daily revenue — the shared input of the rank
    * tests, replayed locally. */
  private lazy val daily: Seq[(String, Long, BigInt)] =
    graft.sources.Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        BigInt(r.getAs[Long]("y")))).toSeq

  /** Doubled average ranks (2·avgrank = 2·minrank + ties − 1). */
  private def doubledRanks(ys: Seq[BigInt]): Seq[BigInt] = {
    val sorted = ys.sorted
    ys.map { y =>
      val minRank = sorted.indexWhere(_ == y) + 1
      val t = sorted.count(_ == y)
      BigInt(2 * minRank + t - 1)
    }
  }

  test("kruskal_wallis: exact BigInt local replay of H and H_tie") {
    val rows = run("q_kruskal_wallis")
    assert(rows.length == 1)
    val r2 = doubledRanks(daily.map(_._3))
    val byType = daily.zip(r2).groupBy(_._1._1)
    val n = BigInt(daily.size)
    val b = byType.values.map { g =>
      val rg2 = g.map(_._2).sum
      rg2 * rg2 / g.size
    }.sum
    val tie3 = daily.groupBy(_._3).values
      .map(g => BigInt(g.size).pow(3) - g.size).sum
    val hPpm = (BigInt(3000000) * (b - n * (n + 1) * (n + 1))) / (n * (n + 1))
    val hTiePpm = (BigInt(3000000) * (b - n * (n + 1) * (n + 1)) * (n.pow(3) - n)) /
      (n * (n + 1) * (n.pow(3) - n - tie3))
    val row = rows.head
    assert(row.getAs[Long]("n_obs") == daily.size)
    assert(row.getAs[Long]("tie3") == tie3)
    assert(BigInt(row.getAs[Long]("h_ppm")) == hPpm)
    assert(BigInt(row.getAs[Long]("h_tie_ppm")) == hTiePpm)
  }

  test("friedman: exact BigInt local replay (fully integer, no div)") {
    val rows = run("q_friedman")
    assert(rows.length == 1)
    val byDay = daily.groupBy(_._2)
    val k = byDay.values.map(_.size).max
    val complete = byDay.filter(_._2.size == k)
    val n = BigInt(complete.size)
    val kB = BigInt(k)
    // within-day doubled ranks summed per type
    val rj2 = complete.values.flatMap { block =>
      val ranks = doubledRanks(block.map(_._3))
      block.map(_._1).zip(ranks)
    }.groupBy(_._1).map { case (_, xs) => xs.map(_._2).sum }
    val s2 = rj2.map(r => r * r).sum
    val tie3 = complete.values.flatMap(b => b.groupBy(_._3).values)
      .map(g => BigInt(g.size).pow(3) - g.size).sum
    val chi2 = (BigInt(3000000) * (s2 - n * n * kB * (kB + 1) * (kB + 1))) /
      (n * kB * (kB + 1))
    val chi2Tie = (BigInt(3000000) * (s2 - n * n * kB * (kB + 1) * (kB + 1)) * (kB - 1)) /
      (n * kB * (kB * kB - 1) - tie3)
    val row = rows.head
    assert(row.getAs[Long]("n_blocks") == complete.size)
    assert(row.getAs[Long]("k") == k)
    assert(BigInt(row.getAs[Long]("chi2_ppm")) == chi2)
    assert(BigInt(row.getAs[Long]("chi2_tie_ppm")) == chi2Tie)
  }

  /** (priority, whole-dollar value) rows of orders — shared input of
    * the median tests. */
  private lazy val vals: Seq[(String, Long)] =
    graft.sources.Tables.orders(spark, sfTiny)
      .select(col("o_orderpriority"),
        round(col("o_totalprice"), 0).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  private def lowerMedian(xs: Seq[Long]): Long = {
    val sorted = xs.sorted
    sorted((xs.size + 1) / 2 - 1) // ceil(n/2)-th smallest, 1-indexed
  }

  test("brown_forsythe: group medians and F replay exactly") {
    val rows = run("q_brown_forsythe")
    val byG = vals.groupBy(_._1)
    assert(rows.length == byG.size)
    val meds = byG.map { case (g, xs) => g -> lowerMedian(xs.map(_._2)) }
    rows.foreach { r =>
      val g = r.getAs[String]("o_orderpriority")
      assert(r.getAs[Long]("med_usd") == meds(g), s"median mismatch for $g")
      val z = byG(g).map(x => math.abs(x._2 - meds(g)))
      assert(r.getAs[Long]("ng") == z.size)
      assert(r.getAs[Long]("sum_absdev_usd") == z.sum)
    }
    // F replay
    val moments = byG.map { case (g, xs) =>
      val z = xs.map(x => BigInt(math.abs(x._2 - meds(g))))
      (BigInt(z.size), z.sum, z.map(x => x * x).sum)
    }
    val k = BigInt(moments.size)
    val n = moments.map(_._1).sum
    val s = moments.map(_._2).sum
    val q = moments.map(_._3).sum
    val bsum = moments.map { case (ng, sg, _) => sg * sg / ng }.sum
    val f = (BigInt(1000000) * (bsum - s * s / n) * (n - k)) /
      ((q - bsum) * (k - 1))
    rows.foreach(r => assert(BigInt(r.getAs[Long]("f_ppm")) == f))
  }

  test("moods_median: grand median, cell counts and chi2 replay exactly") {
    val rows = run("q_moods_median")
    val gmed = lowerMedian(vals.map(_._2))
    val byG = vals.groupBy(_._1)
    val n = BigInt(vals.size)
    val a = BigInt(vals.count(_._2 > gmed))
    var chi2 = BigInt(0)
    rows.foreach { r =>
      val g = r.getAs[String]("o_orderpriority")
      assert(r.getAs[Long]("grand_med_usd") == gmed)
      val ng = BigInt(byG(g).size)
      val og = BigInt(byG(g).count(_._2 > gmed))
      assert(BigInt(r.getAs[Long]("ng")) == ng)
      assert(BigInt(r.getAs[Long]("n_above")) == og)
      val term = (BigInt(1000) * (n * og - ng * a) * (n * og - ng * a)) /
        (n * ng * a) +
        (BigInt(1000) * (n * (ng - og) - ng * (n - a)) * (n * (ng - og) - ng * (n - a))) /
          (n * ng * (n - a))
      assert(BigInt(r.getAs[Long]("term_milli")) == term, s"term mismatch for $g")
      chi2 += term
    }
    rows.foreach(r => assert(BigInt(r.getAs[Long]("chi2_milli")) == chi2))
  }

  test("t_closeness: TV distance replays exactly; thresholds monotone") {
    val rows = run("q_t_closeness")
    assert(rows.length == 3)
    // monotone: higher threshold -> fewer classes above, fewer rows at risk
    val sorted = rows.sortBy(_.getAs[Long]("t_thresh_ppm"))
    sorted.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("classes_above") >= hi.getAs[Long]("classes_above"))
      assert(lo.getAs[Long]("rows_at_risk") >= hi.getAs[Long]("rows_at_risk"))
    }
    // local replay of per-class TV and the 10% threshold row
    val cust = graft.sources.Tables.customer(spark, sfTiny)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long"),
        col("c_mktsegment"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getString(2))).toSeq
    val nTot = BigInt(cust.size)
    val segTot = cust.groupBy(_._2).map { case (s0, xs) => s0 -> BigInt(xs.size) }
    val byClass = cust.groupBy(_._1)
    val tOf = byClass.values.toSeq.map { xs =>
      val nc = BigInt(xs.size)
      val inCls = xs.groupBy(_._2).map { case (s0, ys) => s0 -> BigInt(ys.size) }
      val sumAbs = segTot.map { case (s0, ns) =>
        (nTot * inCls.getOrElse(s0, BigInt(0)) - nc * ns).abs
      }.sum
      (nc, (BigInt(1000000) * sumAbs) / (2 * nc * nTot))
    }
    val lo = sorted.head
    assert(lo.getAs[Long]("n_classes") == byClass.size)
    assert(lo.getAs[Long]("classes_above") == tOf.count(_._2 > 100000))
    assert(BigInt(lo.getAs[Long]("rows_at_risk")) ==
      tOf.filter(_._2 > 100000).map(_._1).sum)
  }

  test("fairness: confusion identities and exact global-gap recomposition") {
    val rows = run("q_fairness")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("ppos_ppm", "tpr_ppm", "fpr_ppm").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0 && v <= 1000000L, s"$c = $v out of range")
      }
      // the three gap columns are consistent: gap_g - gap_h == rate_g - rate_h
      // (all share one global offset)
    }
    val g0 = rows.head
    rows.tail.foreach { r =>
      assert(r.getAs[Long]("dp_gap_ppm") - g0.getAs[Long]("dp_gap_ppm") ==
        r.getAs[Long]("ppos_ppm") - g0.getAs[Long]("ppos_ppm"))
      assert(r.getAs[Long]("tpr_gap_ppm") - g0.getAs[Long]("tpr_gap_ppm") ==
        r.getAs[Long]("tpr_ppm") - g0.getAs[Long]("tpr_ppm"))
    }
  }

  test("hhi: bounds 1e6/n <= hhi <= 1e6 and exact replay per nation") {
    val rows = run("q_hhi")
    assert(rows.nonEmpty)
    val rev = graft.sources.Tables.orders(spark, sfTiny)
      .join(graft.sources.Tables.customer(spark, sfTiny),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("r"))
      .collect().map(r => (r.getInt(0), BigInt(r.getAs[Long]("r"))))
      .groupBy(_._1)
    rows.foreach { r =>
      val nk = r.getAs[Int]("c_nationkey")
      val hhi = r.getAs[Long]("hhi_ppm")
      val nc = r.getAs[Long]("n_customers")
      assert(hhi <= 1000000L)
      assert(hhi >= 1000000L / nc - 1, "HHI below the equal-share floor")
      val rs = rev(nk).map(_._2)
      val expect = (BigInt(1000000) * rs.map(x => x * x).sum) /
        (rs.sum * rs.sum)
      assert(BigInt(hhi) == expect, s"nation $nk")
    }
  }
}
