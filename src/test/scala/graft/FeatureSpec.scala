package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for the feature-engineering wave (queries.FeatureQueries). */
class FeatureSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("lag_features: every feature replays from the daily series") {
    val daily = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        r.getAs[Long]("y")))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq)
      .toMap
    val rows = run("q_lag_features")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val t = r.getString(0)
      val day = r.getAs[java.sql.Date]("day").toLocalDate
      val series = daily(t)
      val i = series.indexWhere(_._1 == day.toEpochDay)
      assert(i >= 7 && i < series.size - 1)
      assert(r.getAs[Long]("y") == series(i)._2)
      assert(r.getAs[Long]("lag1") == series(i - 1)._2)
      assert(r.getAs[Long]("lag7") == series(i - 7)._2)
      assert(r.getAs[Long]("ma7") ==
        series.slice(i - 6, i + 1).map(_._2).sum / 7)
      assert(r.getAs[Long]("target_next") == series(i + 1)._2)
      assert(r.getAs[Long]("dow") == day.getDayOfWeek.getValue % 7 + 1)
    }
  }

  test("target_encoding: shrinkage sits between raw and global means") {
    val rows = run("q_target_encoding")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val raw = r.getAs[Long]("raw_mean_c")
      val enc = r.getAs[Long]("enc_c")
      val glob = r.getAs[Long]("global_mean_c")
      // enc is a convex-ish combination of raw and global (within the
      // 1-cent truncation slack of the two integral divisions)
      assert(enc >= math.min(raw, glob) - 1 && enc <= math.max(raw, glob) + 1,
        s"${r.getString(0)}: raw=$raw enc=$enc glob=$glob")
      // m=100 pulls small-n categories harder: |enc-raw| grows as n shrinks
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("woe_iv: shares sum to one, total row sums contributions, iv >= 0") {
    val rows = run("q_woe_iv")
    val (tot, per) = rows.partition(_.getString(0) == "TOTAL")
    assert(tot.length == 1 && per.nonEmpty)
    // per-category gshares/bshares each sum to ~1e6 (truncation slack < k)
    val k = per.length
    val gs = per.map(_.getAs[Long]("gshare_ppm")).sum
    val bs = per.map(_.getAs[Long]("bshare_ppm")).sum
    assert(gs > 1000000L - k && gs <= 1000000L)
    assert(bs > 1000000L - k && bs <= 1000000L)
    // WoE sign agrees with the share comparison; IV contribution >= 0
    for (r <- per) {
      val d = r.getAs[Long]("gshare_ppm") - r.getAs[Long]("bshare_ppm")
      val w = r.getAs[Long]("woe_u")
      assert(d == 0 || math.signum(d.toDouble) == math.signum(w.toDouble) ||
        w == 0, r.getString(0))
      assert(r.getAs[Long]("iv_u") >= 0, s"${r.getString(0)} iv negative")
    }
    assert(tot.head.getAs[Long]("iv_u") == per.map(_.getAs[Long]("iv_u")).sum)
  }
}
