package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._

/** Invariants for the recommender wave (queries.RecsysQueries) and
  * classical-stats wave 4 (queries.StatsQueries2). The DuckDB oracle
  * proves engine equality; these pin the MATH with exact local
  * identities that hold for any data, so a formula regression fails
  * even if both engines regress together. */
class RecsysStatsSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("item_cf: cos² in [0, 1e6] and cooc bounded by both degrees") {
    val rows = run("q_item_cf")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cooc, da, db, c2) = (r.getAs[Long]("cooc"), r.getAs[Long]("deg_a"),
        r.getAs[Long]("deg_b"), r.getAs[Long]("cos2_ppm"))
      assert(c2 >= 0 && c2 <= 1000000L, s"cos² ppm $c2 out of range")
      assert(cooc <= math.min(da, db),
        s"cooc $cooc exceeds a degree ($da, $db) — incidence math broken")
      assert(c2 == 1000000L * cooc * cooc / (da * db))
    }
  }

  test("assoc rules: confidence ≤ 1e6, support laws, lift identity") {
    val rows = run("q_assoc_rules_exact")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sab, sa, sc) = (r.getAs[Long]("sup_ab"), r.getAs[Long]("sup_a"),
        r.getAs[Long]("sup_c"))
      val (conf, lift) = (r.getAs[Long]("conf_ppm"), r.getAs[Long]("lift_ppm"))
      assert(sab <= math.min(sa, sc), "pair support exceeds item support")
      assert(conf == 1000000L * sab / sa && conf <= 1000000L)
      assert(lift >= 0)
    }
    // both directions of every undirected pair are present
    val dirs = rows.map(r => (r.getAs[Long]("ante"), r.getAs[Long]("cons"))).toSet
    assert(rows.length == 50)
    assert(dirs.size == 50)
  }

  test("ar1: slope/intercept replay locally in BigInt for every type") {
    val rows = run("q_ar1")
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val daily = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toLocalDate, r.getAs[Long]("y")))
      .groupBy(_._1)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val series = daily(t).sortBy(_._2.toEpochDay).map(x => (x._2.toEpochDay, BigInt(x._3)))
      val pairs = series.zip(series.tail)
        .filter { case ((d0, _), (d1, _)) => d1 - d0 == 1 }
        .map { case ((_, x), (_, y)) => (x, y) }
      val n = BigInt(pairs.length)
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val den = n * sxx - sx * sx
      assert(r.getAs[Long]("n_pairs") == pairs.length)
      if (den != 0) {
        val slope = (BigInt(1000000) * (n * sxy - sx * sy)) / den
        val icept = (BigInt(1000000) * sy - slope * sx) / (n * BigInt(1000000))
        assert(BigInt(r.getAs[Long]("slope_ppm")) == slope, s"slope mismatch for $t")
        assert(BigInt(r.getAs[Long]("intercept_cents")) == icept, s"intercept mismatch for $t")
      }
    }
  }

  test("wilcoxon: doubled rank sums partition n(n+1) exactly") {
    val rows = run("q_wilcoxon")
    assert(rows.length == 1)
    val r = rows.head
    val n = r.getAs[Long]("n_pairs")
    val (wp, wm) = (r.getAs[Long]("w2_plus"), r.getAs[Long]("w2_minus"))
    assert(n > 0)
    // Σ over all nonzero diffs of the doubled averaged rank is exactly
    // 2·(1+2+…+n) = n(n+1); any tie-handling bug breaks this identity.
    assert(wp + wm == n * (n + 1),
      s"doubled-rank mass $wp+$wm != n(n+1)=${n * (n + 1)}")
    val z2 = r.getAs[Long]("z2s_ppm")
    assert(math.abs(z2) < 100L * 1000000L, "z² implausibly large on null-ish data")
  }

  test("aqp: estimate identity, sample containment, sane error") {
    val rows = run("q_aqp_estimate")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nr, ns) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_sampled"))
      val (tc, ec, err) = (r.getAs[Long]("true_cents"), r.getAs[Long]("est_cents"),
        r.getAs[Long]("err_ppm"))
      assert(ns <= nr && ns > 0, "hash sample empty or oversized")
      assert(err == 1000000L * math.abs(ec - tc) / tc)
      // 10% uniform sample of thousands of orders: estimate within 30%
      assert(err < 300000L, s"AQP error $err ppm — sampling gate broken?")
    }
  }

  test("logrank: counts positive, variance positive, z² sane") {
    val rows = run("q_logrank")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n1") > 0 && r.getAs[Long]("n2") > 0)
    assert(r.getAs[Long]("events1") > 0 && r.getAs[Long]("events2") > 0)
    assert(r.getAs[Long]("var_ppm") > 0)
    // the two cohorts are a random hash of customers — the null holds,
    // so z² should be far from astronomically significant
    assert(math.abs(r.getAs[Long]("z2s_ppm")) < 1000L * 1000000L)
  }

  test("pr_curve: recall monotone, containment laws, F1 recomposes") {
    val rows = run("q_pr_curve")
    assert(rows.nonEmpty)
    var lastRec = -1L
    rows.foreach { r => // rows arrive score-descending
      val (tp, fp, np) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("n_pos"))
      val (p, rec, f1) = (r.getAs[Long]("prec_ppm"), r.getAs[Long]("rec_ppm"),
        r.getAs[Long]("f1_ppm"))
      assert(tp <= np && p <= 1000000L && rec <= 1000000L)
      assert(p == 1000000L * tp / (tp + fp) && rec == 1000000L * tp / np)
      assert(rec >= lastRec, "recall must grow as the threshold loosens")
      lastRec = rec
      if (p + rec > 0) assert(f1 == 2L * p * rec / (p + rec))
    }
    assert(lastRec == 1000000L, "loosest threshold must reach full recall")
  }

  test("absorption: hit probability is monotone in k and stays in [0,1e6]") {
    val rows = run("q_absorption")
    assert(rows.nonEmpty)
    val byState = rows.groupBy(_.getAs[String]("state"))
    byState.foreach { case (st, rs) =>
      val hs = rs.sortBy(_.getAs[Long]("k")).map(_.getAs[Long]("hit_ppm"))
      assert(hs.length == 6, s"$st must have k=1..6")
      hs.foreach(h => assert(h >= 0 && h <= 1000000L, s"$st hit $h out of range"))
      // first-passage probabilities CUMULATE: more steps, more chances
      // (truncating divisions can only lose <1 ppm per round, and the
      // added round's mass dominates on this chain)
      hs.toSeq.sliding(2).foreach { w =>
        assert(w(1) >= w(0) - 1, s"$st: H_k not monotone (${w(0)} -> ${w(1)})") }
    }
  }

  test("perplexity: held-out NLL is strictly positive and finite-ish") {
    val rows = run("q_perplexity")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") > 0)
      val nll = r.getAs[Long]("avg_nll_micro")
      // every smoothed probability is < 1, so each -ln term is > 0;
      // and with add-one smoothing p ≥ 1/(c1+V) bounds NLL above by
      // ln of the train mass — micro-nats in (0, 30e6) is the sane band
      assert(nll > 0 && nll < 30000000L, s"avg NLL $nll out of band")
    }
  }

  test("langid_eval: rows partition each truth class (shares ≈ 1e6)") {
    val rows = run("q_langid_eval")
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val nTruth = rs.head.getAs[Long]("n_truth")
      assert(rs.map(_.getAs[Long]("n")).sum == nTruth,
        s"$lang cells don't partition the truth row")
      val shares = rs.map(_.getAs[Long]("share_ppm")).sum
      // truncation loses < 1 ppm per cell
      assert(shares > 1000000L - rs.length && shares <= 1000000L,
        s"$lang shares sum $shares")
    }
  }

  test("cohen kappa recomposes from q_langid_eval's confusion cells") {
    val kappa = run("q_cohen_kappa").head
    val cells = run("q_langid_eval")
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred"), r.getAs[Long]("n")))
    val n = BigInt(cells.map(_._3).sum)
    val agree = BigInt(cells.filter(c => c._1 == c._2).map(_._3).sum)
    val rows = cells.groupBy(_._1).view.mapValues(x => BigInt(x.map(_._3).sum))
    val cols = cells.groupBy(_._2).view.mapValues(x => BigInt(x.map(_._3).sum))
    val pe2 = rows.toSeq.map { case (c, r) => r * cols.getOrElse(c, BigInt(0)) }.sum
    assert(BigInt(kappa.getAs[Long]("n_docs")) == n)
    assert(BigInt(kappa.getAs[Long]("n_agree")) == agree)
    val expected = (BigInt(1000000) * (n * agree - pe2)) / (n * n - pe2)
    assert(BigInt(kappa.getAs[Long]("kappa_ppm")) == expected,
      "kappa must recompose from the published confusion matrix")
  }

  test("permutation test: p-value laws and identity with its counts") {
    val r = run("q_permutation_test").head
    val (ne, p) = (r.getAs[Long]("n_extreme"), r.getAs[Long]("p_ppm"))
    assert(ne >= 0 && ne <= 64)
    assert(p == 1000000L * ne / 64)
    assert(r.getAs[Long]("n_days") > 0)
  }

  test("burstiness: dispersion nonnegative, zero iff constant dailies") {
    val rows = run("q_burstiness")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dispersion_ppm") >= 0)
      assert(r.getAs[Long]("total") > 0 && r.getAs[Long]("n_days") > 0)
    }
  }

  test("readability: flesch recomposes from its published terms") {
    val rows = run("q_readability")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, sn, sy) = (r.getAs[Long]("words"), r.getAs[Long]("sentences"),
        r.getAs[Long]("syllables"))
      assert(w > 0 && sn > 0 && sy > 0)
      val wps = 1000000L * w / sn; val spw = 1000000L * sy / w
      assert(r.getAs[Long]("wps_ppm") == wps)
      assert(r.getAs[Long]("spw_ppm") == spw)
      assert(r.getAs[Long]("flesch_milli") ==
        206835L - (1015L * wps) / 1000000L - (84600L * spw) / 1000000L)
    }
  }

  test("rec_eval: exact local replay of coverage and novelty") {
    import org.apache.spark.sql.functions._
    val items = graft.sources.Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val cooc = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for ((_, ps) <- byOrder; i <- ps.indices; j <- i + 1 until ps.size)
      cooc((ps(i), ps(j))) = cooc.getOrElse((ps(i), ps(j)), 0) + 1
    val rec = cooc.filter(_._2 >= 2).keys
      .flatMap(p => Seq(p._1, p._2)).toSet
    val deg = items.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
    val nOrders = byOrder.size
    val nParts = graft.sources.Tables.part(spark, sfTiny).count()
    val siSum = rec.toSeq.map(pk => math.round(
      -(math.log(deg(pk).toDouble / nOrders.toDouble) / 0.6931471805599453)
        * 1e6)).sum
    val r = run("q_rec_eval").head
    assert(r.getAs[Long]("n_rec_items") == rec.size)
    assert(r.getAs[Long]("n_parts") == nParts)
    assert(r.getAs[Long]("coverage_ppm") == 1000000L * rec.size / nParts)
    assert(r.getAs[Long]("novelty_ubits") == siSum / rec.size)
    // recommended items can never be novel beyond the rarest item
    val maxSi = deg.values.min
    assert(r.getAs[Long]("novelty_ubits") <= math.round(
      -(math.log(maxSi.toDouble / nOrders.toDouble) / 0.6931471805599453) * 1e6))
  }
}
