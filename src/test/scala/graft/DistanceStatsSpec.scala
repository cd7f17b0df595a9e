package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for the wave-12/13 distribution/association stats
  * (q_hellinger + q_dispersion in queries.DistributionQueries;
  * q_odds_ratio + q_cochran_armitage in queries.StatsQueries6;
  * q_beta in queries.SeriesQueries2; q_turning_points in
  * queries.DiagnosticsQueries): exact local replays plus each
  * statistic's structural bounds (H ∈ [0,1], CI brackets the point
  * estimate, Z² ≥ 0, Σᵢβᵢ = 1).
  */
class DistanceStatsSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("hellinger: micro-rounded sqrt-term replay, bounded in [0,1]") {
    val rows = run("q_hellinger")
    assert(rows.nonEmpty)
    val binned = graft.sources.Tables.orders(spark, sfTiny)
      .where(year(col("o_orderdate")).isin(1998, 1999))
      .groupBy(col("o_orderpriority").as("pri"),
        expr("CAST(round(o_totalprice*100,0) AS LONG) div 100000").as("bin"))
      .agg(sum((year(col("o_orderdate")) === 1998).cast("long")).as("a"),
        sum((year(col("o_orderdate")) === 1999).cast("long")).as("b"))
      .collect()
      .groupBy(_.getString(0))
    for (r <- rows) {
      val cells = binned(r.getString(0))
        .map(x => (x.getAs[Long]("a"), x.getAs[Long]("b")))
      val (na, nb) = (cells.map(_._1).sum, cells.map(_._2).sum)
      assert(r.getAs[Long]("n_1998") == na && r.getAs[Long]("n_1999") == nb)
      val sm = cells.map { case (a, b) =>
        BigDecimal(math.sqrt(a.toDouble * b.toDouble) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
      }.sum
      val h = math.sqrt(math.max(0.0,
        1.0 - sm.toDouble / (math.sqrt(na.toDouble * nb.toDouble) * 1e6)))
      val want = BigDecimal(h).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      assert((BigDecimal(r.getAs[Double]("hellinger")) - want).abs < 1e-9,
        r.getString(0))
      assert(r.getAs[Double]("hellinger") >= 0.0 &&
        r.getAs[Double]("hellinger") <= 1.0)
    }
  }

  test("odds_ratio: exact 2x2 replay; CI brackets the point estimate") {
    val vals = graft.sources.Tables.orders(spark, sfTiny)
      .select((col("o_orderpriority") === "1-URGENT").cast("long"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), BigInt(r.getLong(1))))
    val thr = vals.map(_._2).sum / vals.length
    val a = vals.count(v => v._1 == 1 && v._2 > thr)
    val b = vals.count(v => v._1 == 1 && v._2 <= thr)
    val c = vals.count(v => v._1 == 0 && v._2 > thr)
    val dd = vals.count(v => v._1 == 0 && v._2 <= thr)
    val r = run("q_odds_ratio").head
    assert(r.getAs[Long]("a") == a && r.getAs[Long]("b") == b &&
      r.getAs[Long]("c") == c && r.getAs[Long]("d") == dd)
    val or = r.getAs[Double]("odds_ratio")
    assert(math.abs(or - a.toDouble * dd / (b.toDouble * c)) < 1e-5)
    assert(r.getAs[Double]("ci_lo") <= or && or <= r.getAs[Double]("ci_hi"))
  }

  test("cochran_armitage: cleared-integer trend statistic replay") {
    val vals = graft.sources.Tables.orders(spark, sfTiny)
      .select(expr("CAST(substring(o_orderpriority,1,1) AS LONG)"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), BigInt(r.getLong(1))))
    val thr = vals.map(_._2).sum / vals.length
    val g = vals.groupBy(_._1).view.mapValues(xs =>
      (BigInt(xs.length), BigInt(xs.count(_._2 > thr)))).toMap
    val nn = g.values.map(_._1).sum
    val rr = g.values.map(_._2).sum
    val sr = g.map { case (s, (_, r0)) => BigInt(s) * r0 }.sum
    val sn = g.map { case (s, (n0, _)) => BigInt(s) * n0 }.sum
    val ssn = g.map { case (s, (n0, _)) => BigInt(s) * BigInt(s) * n0 }.sum
    val u = nn * sr - rr * sn
    val z2 = (u * u * nn).toDouble /
      (rr * (nn - rr) * (nn * ssn - sn * sn)).toDouble
    val r = run("q_cochran_armitage").head
    assert(r.getAs[Long]("k") == g.size.toLong)
    assert(r.getAs[Long]("n_total") == nn.toLong &&
      r.getAs[Long]("n_success") == rr.toLong)
    assert(math.abs(r.getAs[Double]("ca_z2") - z2) < 1e-5)
    assert(r.getAs[Double]("ca_z2") >= 0.0)
  }


  test("dispersion: cleared variance-to-mean replay over the full day grid") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val byDay = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getAs[java.sql.Date]("day").toString).view
      .mapValues(_.map(r => r.getString(1) -> r.getAs[Long]("c")).toMap).toMap
    val rows = run("q_dispersion")
    assert(rows.map(_.getString(0)).toSeq == types)
    for (r <- rows) {
      val cs = byDay.values.map(m => BigInt(m.getOrElse(r.getString(0), 0L))).toSeq
      val (n, sc, qc) = (BigInt(cs.length), cs.sum, cs.map(c => c * c).sum)
      assert(r.getAs[Long]("n_days") == cs.length.toLong)
      assert(r.getAs[Long]("n_events") == sc.toLong)
      val d0 = (n * qc - sc * sc).toDouble / ((n - 1).toDouble * sc.toDouble)
      assert(math.abs(r.getAs[Double]("dispersion") - d0) < 1e-5, r.getString(0))
      assert(r.getAs[Double]("chi2") >= 0.0)
    }
  }

  test("beta: component betas against their own total sum to 1") {
    val rows = run("q_beta")
    assert(rows.length == 5)
    // x = Σ_i y_i  ⇒  Σ_i cov(y_i, x) = var(x)  ⇒  Σ_i β_i = 1,
    // up to the per-row output rounding (5 × 0.5e-9)
    val bsum = rows.map(_.getAs[Double]("beta")).sum
    assert(math.abs(bsum - 1.0) < 1e-8, s"beta sum $bsum")
    for (r <- rows) assert(r.getAs[Double]("r2") >= 0.0 && r.getAs[Double]("r2") <= 1.0 + 1e-9)
  }

  test("turning_points: exact extremum count replay") {
    val ser = graft.sources.Tables.orders(spark, sfTiny)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("y"))
      .collect().map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("y")))
      .sortBy(_._1).map(_._2)
    val t = (1 until ser.length - 1).count(i =>
      (BigInt(ser(i)) - BigInt(ser(i - 1))) * (BigInt(ser(i + 1)) - BigInt(ser(i))) < 0)
    val r = run("q_turning_points").head
    assert(r.getAs[Long]("n_days") == ser.length.toLong)
    assert(r.getAs[Long]("turning_points") == t.toLong)
  }

  test("err: cascade bounds and zero-relevance queries score zero") {
    val rows = run("q_err")
    assert(rows.length == 5)
    for (r <- rows) {
      val err = r.getAs[Long]("err_uppm")
      // first-position max: (1/1)·(1/2) = 0.5 → 500000 µ
      assert(err >= 0L && err <= 500000L)
      if (r.getAs[Long]("n_rel_at_10") == 0L) assert(err == 0L)
      else assert(err > 0L)
    }
  }

  test("mld: micro-nat replay + GE(2) cleared-form replay") {
    val xs = graft.sources.Tables.orders(spark, sfTiny)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("x"))
      .collect().map(r => BigInt(r.getAs[Long]("x"))).toSeq
    val (n, sx, qx) = (BigInt(xs.length), xs.sum, xs.map(x => x * x).sum)
    val sl = xs.map { x =>
      BigDecimal((math.log(sx.toDouble) - math.log(n.toDouble * x.toDouble)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
    }.sum
    val r = run("q_mld").head
    assert(r.getAs[Long]("n_cust") == n.toLong)
    assert(BigInt(r.getAs[Long]("mld_micronats")) == sl / n)
    val ge2 = (n * qx - sx * sx).toDouble / (2.0 * sx.toDouble * sx.toDouble)
    assert(math.abs(r.getAs[Double]("ge2") - ge2) < 1e-8)
    // GE(0) ≥ 0 by Jensen
    assert(r.getAs[Long]("mld_micronats") >= -1L)
  }

  test("lognormal_fit: exact ln-moment replay; mean >= median") {
    val ls = graft.sources.Tables.orders(spark, sfTiny)
      .select(round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r =>
        BigDecimal(math.log(r.getLong(0).toDouble) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt).toSeq
    val (n, sl, ql) = (BigInt(ls.length), ls.sum, ls.map(l => l * l).sum)
    val r = run("q_lognormal_fit").head
    assert(r.getAs[Long]("n_orders") == n.toLong)
    assert(BigInt(r.getAs[Long]("mu_micronats")) == sl / n)
    val sig = math.sqrt((n * ql - sl * sl).toDouble /
      (n.toDouble * (n.toDouble - 1.0))) / 1e6
    assert(math.abs(r.getAs[Double]("sigma_nats") - sig) < 1e-8)
    assert(r.getAs[Double]("mean_cents") >= r.getAs[Double]("median_cents"))
  }

  test("capture_recapture: Chapman replay over even/odd prefix sets") {
    val pre = graft.sources.Tables.documents(spark, sfTiny)
      .select(expr("array_join(slice(filter(split(text, ' '), x -> x != ''), 1, 8), ' ')").as("h"),
        expr("CAST(substring(source, 4) AS LONG) % 2").as("par"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val inA = pre.filter(_._2 == 0L).map(_._1).toSet
    val inB = pre.filter(_._2 == 1L).map(_._1).toSet
    val (na, nb, m) = (inA.size, inB.size, (inA & inB).size)
    val r = run("q_capture_recapture").head
    assert(r.getAs[Long]("na") == na.toLong && r.getAs[Long]("nb") == nb.toLong
      && r.getAs[Long]("m") == m.toLong)
    val nhat = (na + 1.0) * (nb + 1.0) / (m + 1.0) - 1.0
    assert(math.abs(r.getAs[Double]("n_hat") - nhat) < 1e-3)
    // the estimate can never fall below what was directly observed
    assert(r.getAs[Double]("n_hat") >= (na + nb - m).toDouble - 1e-9 || m == 0)
  }

  test("rate_ratio: exact half-split counts; CI brackets the ratio") {
    val rows = run("q_rate_ratio")
    assert(rows.length == 5)
    for (r <- rows) {
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val (ta, tb) = (r.getAs[Long]("ta"), r.getAs[Long]("tb"))
      val rr = (a.toDouble / ta) / (b.toDouble / tb)
      assert(math.abs(r.getAs[Double]("rate_ratio") - rr) < 1e-5)
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("rate_ratio") + 1e-9)
      assert(r.getAs[Double]("rate_ratio") <= r.getAs[Double]("ci_hi") + 1e-9)
    }
    // exposures partition the observed day count
    val nDays = graft.sources.Tables.events(spark, sfTiny)
      .select(to_date(col("ts"))).distinct().count()
    assert(rows.head.getAs[Long]("ta") + rows.head.getAs[Long]("tb") == nDays)
  }

  test("burrows_delta: symmetric bounded distances, no self-pairs") {
    val rows = run("q_burrows_delta")
    assert(rows.nonEmpty && rows.length <= 10)
    for (r <- rows) {
      assert(r.getString(0) < r.getString(1)) // canonical pair order
      assert(r.getAs[Long]("delta_micro") >= 0L)
    }
    // sorted ascending by delta (the "most-alike first" contract)
    val ds = rows.map(_.getAs[Long]("delta_micro")).toSeq
    assert(ds == ds.sorted)
  }

  test("truncation_waste: integer min-sum replay; waste shrinks with L") {
    val ns = graft.sources.Tables.documents(spark, sfTiny)
      .select(size(expr("filter(split(text, ' '), x -> x != '')")).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    val rows = run("q_truncation_waste")
    assert(rows.map(_.getAs[Long]("context_len")).toSeq == Seq(128L, 512L, 2048L))
    for (r <- rows) {
      val l = r.getAs[Long]("context_len")
      assert(r.getAs[Long]("docs_truncated") == ns.count(_ > l).toLong)
      val tot = ns.sum; val kept = ns.map(n => math.min(n, l)).sum
      assert(r.getAs[Long]("tokens_total") == tot)
      assert(r.getAs[Long]("lost_ppm") == BigInt(1000000) * (tot - kept) / tot)
    }
    val losses = rows.map(_.getAs[Long]("lost_ppm")).toSeq
    assert(losses == losses.sorted.reverse) // monotone non-increasing in L
  }

  test("vocab_coverage: coverage is monotone in k and covered+oov = 1e6") {
    val rows = run("q_vocab_coverage")
    assert(rows.map(_.getAs[Long]("vocab_k")).toSeq == Seq(100L, 1000L, 10000L))
    val cov = rows.map(_.getAs[Long]("covered_ppm")).toSeq
    assert(cov == cov.sorted)
    for (r <- rows)
      assert(r.getAs[Long]("covered_ppm") + r.getAs[Long]("oov_ppm") <= 1000000L)
  }

  test("dup_threshold_sweep: pair counts are monotone non-increasing in the cut") {
    val rows = run("q_dup_threshold_sweep")
    assert(rows.length == 5)
    val ps = rows.map(_.getAs[Long]("n_pairs")).toSeq
    assert(ps == ps.sorted.reverse)
    val ds = rows.map(_.getAs[Long]("docs_dropped")).toSeq
    assert(ds == ds.sorted.reverse)
    for (r <- rows) assert(r.getAs[Long]("docs_dropped") <= r.getAs[Long]("n_pairs"))
  }

  test("hapax: per-source type-count replay; bounds hold") {
    val rows = run("q_hapax")
    assert(rows.length == 20)
    val counts = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("source"), explode(expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0))
    for (r <- rows) {
      val cs = counts(r.getString(0)).map(_.getAs[Long]("n"))
      assert(r.getAs[Long]("n_types") == cs.length.toLong)
      assert(r.getAs[Long]("hapax") == cs.count(_ == 1L).toLong)
      assert(r.getAs[Long]("dis") == cs.count(_ == 2L).toLong)
      assert(r.getAs[Long]("hapax") + r.getAs[Long]("dis") <= r.getAs[Long]("n_types"))
      assert(r.getAs[Long]("hapax_type_ppm") <= 1000000L)
    }
  }

  test("ccf: lag-0 equals the direct Pearson of the two aligned series") {
    val rows = run("q_ccf")
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (-5L to 5L))
    for (r <- rows) assert(math.abs(r.getAs[Double]("r")) <= 1.0 + 1e-9)
    val daily = graft.sources.Tables.events(spark, sfTiny)
      .where(col("event_type").isin("view", "purchase"))
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y")).collect()
    val v = daily.filter(_.getString(1) == "view")
      .map(r => r.getAs[java.sql.Date]("day").toString -> BigInt(r.getAs[Long]("y"))).toMap
    val p = daily.filter(_.getString(1) == "purchase")
      .map(r => r.getAs[java.sql.Date]("day").toString -> BigInt(r.getAs[Long]("y"))).toMap
    val common = (v.keySet & p.keySet).toSeq
    val xs = common.map(v); val ys = common.map(p)
    val n = BigInt(common.length)
    val (sx, sy) = (xs.sum, ys.sum)
    val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val want = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    val lag0 = rows.find(_.getAs[Long]("lag") == 0L).get
    assert(lag0.getAs[Long]("n_days") == common.length.toLong)
    assert(math.abs(lag0.getAs[Double]("r") - want) < 1e-8)
  }

  test("term_cooccurrence: full top-10 pair grid with consistent counts") {
    val rows = run("q_term_cooccurrence")
    assert(rows.length == 45) // C(10, 2): every pair co-occurs in this corpus
    for (r <- rows) {
      assert(r.getString(0) < r.getString(1))
      assert(r.getAs[Long]("n_both") >= 1L)
      // lift and PMI agree in sign: lift > 1e6 <=> pmi > 0
      val lift = r.getAs[Long]("lift_ppm"); val pmi = r.getAs[Long]("pmi_micronats")
      assert((lift >= 1000000L && pmi >= 0L) || (lift <= 1000000L && pmi <= 1L))
    }
  }

  test("growth_accounting: the DAU books balance day over day") {
    val rows = run("q_growth_accounting").sortBy(_.getAs[java.sql.Date]("day").toString)
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Long]("active") ==
        r.getAs[Long]("new_users") + r.getAs[Long]("retained") + r.getAs[Long]("resurrected"))
    for (Seq(prev, cur) <- rows.sliding(2).map(_.toSeq).toSeq
         if cur.getAs[java.sql.Date]("day").toLocalDate ==
            prev.getAs[java.sql.Date]("day").toLocalDate.plusDays(1)) {
      assert(cur.getAs[Long]("active") - prev.getAs[Long]("active") ==
        cur.getAs[Long]("new_users") + cur.getAs[Long]("resurrected")
          - cur.getAs[Long]("churned"),
        s"accounting identity broke on ${cur.getAs[java.sql.Date]("day")}")
    }
    // day 1: everyone is new
    assert(rows.head.getAs[Long]("new_users") == rows.head.getAs[Long]("active"))
  }

  test("lorenz: curve is convex, ends at 1e6, shares sum to the total") {
    val rows = run("q_lorenz")
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val lor = rows.map(_.getAs[Long]("lorenz_ppm")).toSeq
    assert(lor == lor.sorted)
    assert(lor.last >= 999999L) // cumulative share ends at ~100% (ppm truncation)
    val shares = rows.map(_.getAs[Long]("rev_share_ppm")).toSeq
    assert(shares == shares.sorted) // deciles ordered by revenue -> monotone shares
    assert(math.abs(shares.sum - 1000000L) <= 10L)
  }

  test("topic_coherence: 10 ordered pairs per source, terms non-positive-ish") {
    val rows = run("q_topic_coherence")
    assert(rows.length == 20)
    for (r <- rows) {
      assert(r.getAs[Long]("n_pairs") == 10L) // C(5,2) ordered pairs
      // UMass terms are ln((D_ij+1)/D_j) <= ln((D_j+1)/D_j): near or below 0;
      // a coherence far above 0 would mean D_ij > D_j, impossible
      assert(r.getAs[Long]("coherence_micronats") <= 10L * 700000L)
    }
  }

  test("kendall_w: cleared-form replay from per-day ranks") {
    val daily = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y")).collect()
    val ranks = daily.groupBy(_.getAs[java.sql.Date]("day").toString).values.flatMap { rows =>
      rows.sortBy(r => (-r.getAs[Long]("y"), r.getString(1)))
        .zipWithIndex.map { case (r, i) => r.getString(1) -> BigInt(i + 1) }
    }.toSeq
    val rj = ranks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val m = BigInt(ranks.size / rj.size); val k = rj.size
    val s4 = rj.values.map(r => { val t = 2 * r - m * (k + 1); t * t }).sum
    val w = 3.0 * s4.toDouble / (m.toDouble * m.toDouble * k * (k * k - 1.0))
    val r = run("q_kendall_w").head
    assert(r.getAs[Long]("m") == m.toLong && r.getAs[Long]("k") == k.toLong)
    assert(math.abs(r.getAs[Double]("kendall_w") - w) < 1e-8)
    assert(r.getAs[Double]("kendall_w") >= 0.0 && r.getAs[Double]("kendall_w") <= 1.0 + 1e-9)
  }

  test("dup_growth: prefixes nest and the full-corpus row matches a direct count") {
    val rows = run("q_dup_growth")
    assert(rows.map(_.getAs[Long]("prefix_pct")).toSeq == Seq(25L, 50L, 75L, 100L))
    val ns = rows.map(_.getAs[Long]("n_docs")).toSeq
    assert(ns == ns.sorted) // prefixes nest
    val full = rows.last
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select(md5(col("text"))).collect().map(_.getString(0)).toSeq
    assert(full.getAs[Long]("n_docs") == docs.length.toLong)
    assert(full.getAs[Long]("n_distinct") == docs.distinct.length.toLong)
  }

  test("seasonal_strength: bounded in [0,1]; residual variance never exceeds detrended") {
    val rows = run("q_seasonal_strength")
    assert(rows.length == 5)
    for (r <- rows) {
      val fs = r.getAs[Double]("seasonal_strength")
      assert(fs >= 0.0 && fs <= 1.0 + 1e-9, r.getString(0))
      assert(r.getAs[Long]("n_days") >= 7L)
    }
  }

  test("g_test: replay from exact contingency counts") {
    val cells = graft.sources.Tables.orders(spark, sfTiny)
      .join(graft.sources.Tables.customer(spark, sfTiny),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority").agg(count(lit(1)).as("o"))
      .collect().map(r => ((r.getString(0), r.getString(1)), BigInt(r.getAs[Long]("o"))))
    val rowsM = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val colsM = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val nn = cells.map(_._2).sum
    val st = cells.map { case ((sg, pr), o) =>
      o * BigDecimal(math.log(o.toDouble * nn.toDouble /
        (rowsM(sg).toDouble * colsM(pr).toDouble)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
    }.sum
    val r = run("q_g_test").head
    assert(r.getAs[Long]("n_cells") == cells.length.toLong)
    assert(r.getAs[Long]("n_obs") == nn.toLong)
    assert(math.abs(r.getAs[Double]("g_stat") - 2.0 * st.toDouble / 1e6) < 1e-4)
    assert(r.getAs[Double]("g_stat") >= 0.0)
  }

  test("fisher_z: halves partition the aligned days; |r| <= 1") {
    val r = run("q_fisher_z").head
    assert(math.abs(r.getAs[Double]("r_first")) <= 1.0)
    assert(math.abs(r.getAs[Double]("r_second")) <= 1.0)
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") >= 2L)
    // the z statistic has the sign of (z(r1) - z(r2))
    val z1 = 0.5 * math.log((1 + r.getAs[Double]("r_first")) / (1 - r.getAs[Double]("r_first")))
    val z2 = 0.5 * math.log((1 + r.getAs[Double]("r_second")) / (1 - r.getAs[Double]("r_second")))
    assert(math.signum(r.getAs[Double]("z")) == math.signum(z1 - z2) ||
      math.abs(r.getAs[Double]("z")) < 1e-9)
  }

  test("calendar_gaps: completeness identity and gap bound") {
    val rows = run("q_calendar_gaps")
    assert(rows.length == 5)
    for (r <- rows) {
      assert(r.getAs[Long]("missing_days") ==
        r.getAs[Long]("span_days") - r.getAs[Long]("n_days"))
      assert(r.getAs[Long]("longest_gap") <= r.getAs[Long]("missing_days"))
      assert(r.getAs[Long]("complete_ppm") <= 1000000L)
      if (r.getAs[Long]("missing_days") == 0L)
        assert(r.getAs[Long]("complete_ppm") == 1000000L &&
          r.getAs[Long]("longest_gap") == 0L)
    }
  }

  test("tost: two one-sided statistics replay from exact half moments") {
    val r = run("q_tost").head
    assert(r.getAs[Long]("delta_cents") > 0L)
    // t_lower + t_upper = 2*delta/se > 0 always
    assert(r.getAs[Double]("t_lower") + r.getAs[Double]("t_upper") > 0.0)
    val equiv = r.getAs[Boolean]("equivalent")
    val minT = math.min(r.getAs[Double]("t_lower"), r.getAs[Double]("t_upper"))
    assert(equiv == (minT > 1.645))
  }

  test("price_volume_mix: the bridge adds up exactly by construction") {
    val rows = run("q_price_volume_mix")
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Long]("delta_cents") ==
        r.getAs[Long]("price_effect_cents") + r.getAs[Long]("volume_effect_cents")
          + r.getAs[Long]("mix_effect_cents"),
        r.getString(0))
  }

  test("seasonal_mk: S bounded by within-stratum pair count; z2 defined") {
    val r = run("q_seasonal_mk").head
    val days = graft.sources.Tables.orders(spark, sfTiny)
      .select(to_date(col("o_orderdate")).as("day")).distinct()
      .select(dayofweek(col("day")).cast("long")).collect()
      .map(_.getLong(0)).groupBy(identity).view.mapValues(_.length).toMap
    val pairBound = days.values.map(n => n.toLong * (n - 1) / 2).sum
    assert(r.getAs[Long]("n_days") == days.values.sum.toLong)
    assert(math.abs(r.getAs[Long]("s_stat")) <= pairBound)
    assert(r.getAs[Long]("z2_ppm") >= 0L)
    assert(Seq("inc", "dec", "none").contains(r.getString(4)))
  }

  test("mix_entropy_trend: mean daily entropy replay, bounded by ln(5)") {
    val counts = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getAs[java.sql.Date]("day").toString)
    val hs = counts.values.map { rows =>
      val cs = rows.map(r => BigInt(r.getAs[Long]("c")))
      val n = cs.sum
      def lnMicro(v: BigInt) = BigDecimal(math.log(v.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
      lnMicro(n) - cs.map(c => c * lnMicro(c)).sum / n
    }.toSeq
    val r = run("q_mix_entropy_trend").head
    assert(r.getAs[Long]("n_days") == hs.length.toLong)
    assert(BigInt(r.getAs[Long]("mean_entropy_micronats")) == hs.sum / hs.length)
    assert(r.getAs[Long]("mean_entropy_micronats") <= math.round(math.log(5.0) * 1e6))
  }
}
