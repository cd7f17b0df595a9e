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
      (r.getAs[Long]("n_events"), r.getAs[Long]("exact_users"),
        r.getAs[Boolean]("in_envelope"))).toMap
    val ev = graft.sources.Tables.events(spark, sfTiny)
    val exactByType = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    // the gate's exact counts really are exact
    exactByType.foreach { case (t, exact) => assert(rows(t)._2 == exact, t) }
    assert(rows("ALL")._2 == exactAll)
    // every estimate (incl. the union row) landed inside the 5% gate
    rows.foreach { case (t, (_, _, ok)) => assert(ok, s"$t escaped envelope") }
    // union consistency, on raw sketches: the merged estimate can
    // never undercut the largest single type
    val perType = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val ests = perType.select(hll_sketch_estimate(col("sk")))
      .collect().map(_.getLong(0).toDouble)
    val estAll = perType.agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0).toDouble
    assert(estAll >= ests.max * 0.95)
    // event totals are exact and the ALL row sums them
    assert(rows("ALL")._1 ==
      exactByType.keys.map(t => rows(t)._1).sum)
  }

  test("kmv jaccard equals exact jaccard when sets fit the sketch, tracks it otherwise") {
    val got = Registry.queries("q_kmv_jaccard")(spark, sfTiny).collect()
      .map(r => (r.getAs[String]("ta"), r.getAs[String]("tb"))
        -> r.getAs[Long]("jaccard_est_ppm")).toMap
    assert(got.nonEmpty)
    // exact per-type (user, day) sets, computed in Scala at tiny sf
    val raw = graft.sources.Tables.events(spark, sfTiny)
      .select(col("event_type"),
        concat_ws("-", col("user_id").cast("string"),
          col("ts").cast("date").cast("string")).as("ud"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    val sets = raw.groupBy(_._1).map { case (t, v) => t -> v.map(_._2).toSet }
    for (((ta, tb), estPpm) <- got) {
      val (a, b) = (sets(ta), sets(tb))
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      val k = 256
      if (a.union(b).size <= k) {
        // the union sketch holds the whole union, so both_in_topk is
        // the true intersection size and the estimate is the exact
        // formula value |A∩B|·10⁶ div k
        assert(estPpm == (a.intersect(b).size.toLong * 1000000L) / k, s"($ta,$tb)")
      } else {
        assert(math.abs(estPpm / 1e6 - exact) <= 0.12,
          s"($ta,$tb): est ${estPpm / 1e6} vs exact $exact")
      }
    }
  }

  test("sliding hll estimates track exact trailing distincts") {
    val got = Registry.queries("q_hll_sliding")(spark, sfTiny).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"))
        -> (r.getAs[Long]("n_days"), r.getAs[Long]("exact_users_7d"),
          r.getAs[Boolean]("in_envelope"))).toMap
    // exact trailing distinct over the same ROWS window, in Scala
    val raw = graft.sources.Tables.events(spark, sfTiny)
      .select(col("event_type"), col("ts").cast("date").cast("string").as("day"),
        col("user_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byTypeDay = raw.groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> v.map(_._3).toSet }
    val days = byTypeDay.keys.groupBy(_._1)
      .map { case (t, ks) => t -> ks.map(_._2).toSeq.sorted }
    for ((t, ds) <- days; (d, i) <- ds.zipWithIndex) {
      val window = ds.slice(math.max(0, i - 6), i + 1)
      val exact = window.flatMap(w => byTypeDay((t, w))).toSet.size
      val (nDays, gotExact, ok) = got((t, d))
      assert(nDays == window.size)
      assert(gotExact == exact.toLong, s"($t,$d): $gotExact vs $exact")
      assert(ok, s"($t,$d): estimate escaped the 5% envelope")
    }
  }
}
