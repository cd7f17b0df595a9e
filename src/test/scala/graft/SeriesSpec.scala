package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._

/** Invariants for the series-indexing / marketing wave
  * (queries.SeriesQueries). The DuckDB oracle proves engine equality;
  * these pin the math and the cross-query consistency with
  * q_absorption. */
class SeriesSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("sax: word length = n_weeks, alphabet a-d, equi-depth symbols") {
    val rows = run("q_sax")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val word = r.getAs[String]("sax_word")
      assert(word.length == r.getAs[Long]("n_weeks"))
      assert(word.forall(c => c >= 'a' && c <= 'd'), s"alphabet leak: $word")
      // ntile(4) equi-depth: symbol counts differ by at most 1
      val counts = word.groupBy(identity).values.map(_.size)
      assert(counts.max - counts.min <= 1, s"not equi-depth: $word")
      // the motif really is the modal length-3 substring (overlapping)
      val motif = r.getAs[String]("top_motif")
      val n = r.getAs[Long]("motif_n")
      val tris = word.sliding(3).filter(_.length == 3).toSeq
      val byTri = tris.groupBy(identity).view.mapValues(_.size)
      assert(byTri(motif) == n, s"motif count mismatch for $motif")
      assert(byTri.values.max == n, "motif is not modal")
      // deterministic tie-break: lexicographically smallest among modal
      assert(byTri.filter(_._2 == n).keys.min == motif)
    }
  }

  test("markov_attribution: ablation is monotone and shares recompose") {
    val rows = run("q_markov_attribution")
    assert(rows.nonEmpty)
    val sumRem = rows.map(_.getAs[Long]("removal_ppm")).sum
    rows.foreach { r =>
      val (full, removed) = (r.getAs[Long]("conv_full_ppm"),
        r.getAs[Long]("conv_removed_ppm"))
      val rem = r.getAs[Long]("removal_ppm")
      // deleting a channel can only lose conversion paths
      assert(removed <= full, s"${r.getAs[String]("channel")}: ablation gained")
      assert(rem >= 0 && rem <= 1000000L)
      assert(rem == 1000000L - 1000000L * removed / full)
      assert(r.getAs[Long]("share_ppm") == 1000000L * rem / sumRem)
    }
    // shares cover the unit up to one truncation per channel
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares <= 1000000L && shares >= 1000000L - rows.length)
  }

  test("markov_attribution baseline equals q_absorption's k=6 chain") {
    import org.apache.spark.sql.functions._
    val conv = run("q_markov_attribution").head.getAs[Long]("conv_full_ppm")
    // replay: start-state distribution x q_absorption's hit_ppm at k=6
    val h6 = graft.queries.Registry.queries("q_absorption")(spark, sfTiny)
      .where(col("k") === 6).collect()
      .map(r => r.getAs[String]("state") -> BigInt(r.getAs[Long]("hit_ppm")))
      .toMap
    val firsts = graft.sources.Tables.events(spark, sfTiny)
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(min(struct(col("ts_us"), col("event_id"), col("event_type"))).as("f"))
      .select(col("f.event_type")).collect().map(_.getString(0))
      .filter(_ != "purchase")
    val tot = BigInt(firsts.length)
    val p0 = firsts.groupBy(identity).view
      .mapValues(xs => BigInt(1000000) * xs.size / tot)
    val expect = p0.map { case (s0, p) => p * h6.getOrElse(s0, BigInt(0)) }
      .sum / 1000000
    assert(BigInt(conv) == expect,
      s"baseline $conv != absorption replay $expect")
  }

  test("granger: exact-moment pinned-double replay, nested-model laws") {
    import org.apache.spark.sql.functions._
    val daily = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        BigInt(r.getAs[Long]("y"))))
    val byType = daily.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val types = byType.keys.toSeq.sorted
    val rows = run("q_granger")
    assert(rows.length == types.size * (types.size - 1))
    for (r <- rows) {
      val (cause, effect) = (r.getString(0), r.getString(1))
      val (ce, cc) = (byType(effect), byType(cause))
      val triples = ce.keys.filter(dd =>
        ce.contains(dd - 1) && cc.contains(dd - 1)).toSeq.sorted
        .map(dd => (ce(dd), ce(dd - 1), cc(dd - 1))) // (w, u, v)
      val n = BigInt(triples.size)
      assert(r.getAs[Long]("n_obs") == triples.size)
      def s(f: ((BigInt, BigInt, BigInt)) => BigInt) = triples.map(f).sum
      val (su, sv, sw) = (s(_._2), s(_._3), s(_._1))
      val cuu = (n * s(t => t._2 * t._2) - su * su).toDouble
      val cvv = (n * s(t => t._3 * t._3) - sv * sv).toDouble
      val cww = (n * s(t => t._1 * t._1) - sw * sw).toDouble
      val cuv = (n * s(t => t._2 * t._3) - su * sv).toDouble
      val cuw = (n * s(t => t._2 * t._1) - su * sw).toDouble
      val cvw = (n * s(t => t._3 * t._1) - sv * sw).toDouble
      val rssr = cww - cuw * cuw / cuu
      val rssu = cww - ((cvv * cuw - cuv * cvw) * cuw +
        (cuu * cvw - cuv * cuw) * cvw) / (cuu * cvv - cuv * cuv)
      val f = (rssr - rssu) * (n.toDouble - 3.0) / rssu
      assert(r.getAs[Double]("f_stat") == f, s"f $cause->$effect")
      assert(r.getAs[Double]("r2_gain") == (rssr - rssu) / cww)
      // nested models: the extra regressor can only reduce RSS
      assert(rssu <= rssr + math.abs(rssr) * 1e-12)
      assert(r.getAs[Double]("r2_gain") >= -1e-12 &&
        r.getAs[Double]("r2_gain") <= 1.0)
    }
  }
}
