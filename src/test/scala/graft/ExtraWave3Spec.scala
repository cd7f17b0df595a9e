package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for analytic-surface wave 3 (queries.ExtraQueries3) and
  * the perplexity bucketing (queries.CorpusQueries3.q_ppl_buckets). */
class ExtraWave3Spec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("rolling_slope: exact BigInt frame replay") {
    val daily = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        BigInt(r.getAs[Long]("y"))))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq)
      .toMap
    val rows = run("q_rolling_slope")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val t = r.getString(0)
      val day = r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay
      val series = daily(t)
      val idx = series.indexWhere(_._1 == day)
      assert(idx >= 6)
      val fr = series.slice(idx - 6, idx + 1)
      val n = BigInt(7)
      val st = fr.map(x => BigInt(x._1)).sum
      val sy = fr.map(_._2).sum
      val stt = fr.map(x => BigInt(x._1) * x._1).sum
      val sty = fr.map(x => BigInt(x._1) * x._2).sum
      val slope = BigInt(1000) * (n * sty - st * sy) / (n * stt - st * st)
      assert(BigInt(r.getAs[Long]("slope_milli_c_per_day")) == slope,
        s"$t $day")
      assert(BigInt(r.getAs[Long]("avg7_c")) == sy / n)
    }
  }

  test("interval_join binding: every pair truly overlaps; brute-force complete") {
    val spans = graft.sources.Tables.events(spark, sfTiny)
      .where(col("event_type").isin("click", "error"))
      .groupBy(col("user_id"), col("event_type"),
        expr("unix_date(CAST(ts AS DATE))").as("dd"))
      .agg(min(unix_micros(col("ts"))).as("s"), max(unix_micros(col("ts"))).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("s"), r.getAs[Long]("e")))
    val clicks = spans.filter(_._2 == "click")
    val errs = spans.filter(_._2 == "error")
    val want = (for {
      (u, _, sa, ea) <- clicks
      (v, _, sb, eb) <- errs
      if u == v && sa <= eb && sb <= ea
    } yield (u, sa, ea, sb, eb,
      math.min(ea, eb) - math.max(sa, sb))).toSet
    val got = run("q_interval_join").map(r =>
      (r.getAs[Long]("user_id"),
        r.getAs[Long]("click_start_us"), r.getAs[Long]("click_end_us"),
        r.getAs[Long]("error_start_us"), r.getAs[Long]("error_end_us"),
        r.getAs[Long]("overlap_us"))).toSet
    assert(got == want)
    assert(got.forall(_._6 >= 0))
  }

  test("ppl_buckets: balanced terciles with ordered score envelopes") {
    val rows = run("q_ppl_buckets")
    assert(rows.nonEmpty)
    for ((lang, rs0) <- rows.groupBy(_.getString(0))) {
      val rs = rs0.sortBy(_.getAs[Long]("bucket"))
      assert(rs.map(_.getAs[Long]("bucket")).toSeq == (0L until rs.length))
      val sizes = rs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$lang unbalanced: $sizes")
      // tercile envelopes must not interleave (rank-ordered buckets)
      for (Seq(lo, hi) <- rs.sliding(2).map(_.toSeq).toSeq if hi != null)
        assert(lo.getAs[Long]("max_score_milli") <=
          hi.getAs[Long]("min_score_milli"), s"$lang envelope overlap")
      val tiers = rs.map(_.getAs[String]("tier"))
      assert(tiers.toSeq == Seq("tail", "middle", "head").take(rs.length))
    }
  }
}
