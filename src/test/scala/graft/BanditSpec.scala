package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for q_ucb_backtest: an exact pinned-double local replay
  * of the UCB1 trajectory plus the structural bandit laws. */
class BanditSpec extends AnyFunSuite {

  private val arms = Seq("click", "error", "purchase", "signup", "view")

  test("ucb_backtest: exact trajectory replay, plays partition the days") {
    val daily = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", arms)
      .agg(sum(round(col("value") * 100, 0).cast("long")))
      .na.fill(0L, arms)
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        arms.map(a => r.getAs[Long](a))))
      .sortBy(_._1)
    val rs = daily.map(_._2.map(_.toDouble / 100.0))
    val n = Array.fill(5)(0.0); val s = Array.fill(5)(0.0)
    var tot = 0.0
    for ((day, t0) <- rs.zipWithIndex) {
      val t = t0 + 1
      val pick =
        if (t <= 5) t - 1
        else {
          val ucb = (0 until 5).map(i =>
            s(i) / n(i) + math.sqrt(2.0 * math.log(t.toDouble) / n(i)))
          (0 until 5).find(i =>
            (i + 1 until 5).forall(j => ucb(i) >= ucb(j)) &&
              (0 until i).forall(j => ucb(i) > ucb(j))).get
        }
      n(pick) += 1.0; s(pick) += day(pick); tot += day(pick)
    }
    val bestFixed = (0 until 5).map(i =>
      daily.map(_._2(i)).sum.toDouble / 100.0).max
    def rd(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.queries.Registry.queries("q_ucb_backtest")(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.size == 5)
    for ((a, i) <- arms.zipWithIndex) {
      val r = got(a)
      assert(r.getAs[Long]("n_played") == n(i).toLong, s"n $a")
      assert(r.getAs[Double]("arm_reward") == rd(s(i)), s"reward $a")
      assert(r.getAs[Double]("collected") == rd(tot))
      assert(r.getAs[Double]("best_fixed") == rd(bestFixed))
      assert(r.getAs[Double]("regret") == rd(bestFixed - tot))
    }
    // plays partition the day sequence
    assert(got.values.map(_.getAs[Long]("n_played")).sum == rs.length)
    // every arm got its init play
    assert(got.values.forall(_.getAs[Long]("n_played") >= 1))
  }
}
