package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Error-envelope + consistency spec for the HLL sketch telemetry
  * (q_hll_union) — the rows-only sketch query's correctness story.
  */
class QualitySpec extends AnyFunSuite {
  import TestSpark._

  test("hll estimates stay inside the envelope and the ALL row is a true union") {
    val df = Registry.queries("q_hll_union")(spark, sfTiny)
    val rows = df.collect().map(r => r.getAs[String]("event_type") ->
      (r.getAs[Long]("n_events"), r.getAs[Long]("approx_users"))).toMap
    val ev = graft.sources.Tables.events(spark, sfTiny)
    val exactByType = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    // lgConfigK=12 ⇒ relative error ~1.04/sqrt(2^12) ≈ 1.6%; allow 5%
    exactByType.foreach { case (t, exact) =>
      val est = rows(t)._2.toDouble
      assert(math.abs(est - exact) / exact <= 0.05, s"$t: $est vs $exact")
    }
    val estAll = rows("ALL")._2.toDouble
    assert(math.abs(estAll - exactAll) / exactAll <= 0.05, s"ALL: $estAll vs $exactAll")
    // the merged estimate can never undercut the largest single type
    assert(rows("ALL")._2 >= exactByType.keys.map(t => rows(t)._2).max * 95 / 100)
    // event totals are exact and the ALL row sums them
    assert(rows("ALL")._1 == exactByType.keys.map(t => rows(t)._1).sum)
  }
}
