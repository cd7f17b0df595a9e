package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._

/** Invariants for the classical-stats wave 3 (queries.StatsQueries),
  * the evaluation-metric wave (queries.EvalQueries), and the
  * curation/vector waves (CorpusQueries3, VectorQueries2). The DuckDB
  * oracle proves engine equality; these pin the MATH with local
  * BigInt replays and distribution-free bounds that hold for any
  * data, so a formula regression fails even if both engines regress
  * together. */
class StatsEvalSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("spearman: signed rho-squared stays in [-1e6, 1e6] and replays locally") {
    val rows = run("q_spearman")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho2 = r.getAs[Long]("rho2s_ppm")
      assert(rho2 >= -1000000L && rho2 <= 1000000L, s"rho² ppm $rho2 out of range")
    }
    // local replay on the raw daily grain for one type
    import org.apache.spark.sql.functions._
    val daily = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .where(col("event_type") === "click")
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexOf(v) + 1L
        val ct = sorted.count(_ == v).toLong
        v -> (2 * lo + ct - 1)
      }.toMap
    }
    val rx = ranks2(daily.map(_._1).toSeq)
    val ry = ranks2(daily.map(_._2).toSeq)
    val pts = daily.map { case (x, y) => (BigInt(rx(x)), BigInt(ry(y))) }
    val n = BigInt(pts.length)
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val num = n * sxy - sx * sy
    val expected = (if (num < 0) BigInt(-1) else BigInt(1)) *
      (BigInt(1000000) * num * num / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
    val got = rows.find(_.getAs[String]("event_type") == "click").get
      .getAs[Long]("rho2s_ppm")
    assert(BigInt(got) == expected, s"replay $expected != engine $got")
  }

  test("anova: F is nonnegative and variance components replay from raw moments") {
    val r = run("q_anova")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("f_ppm") >= 0L)
    assert(row.getAs[Long]("vw_usd2") > 0L)
    // total variance decomposition: vb + vw == population variance of
    // whole-dollar prices (each term truncated by at most 1 per group)
    import org.apache.spark.sql.functions._
    val vals = graft.sources.Tables.orders(spark, sfTiny)
      .select(round(col("o_totalprice"), 0).cast("long")).collect().map(x => BigInt(x.getLong(0)))
    val n = BigInt(vals.length)
    val popVar = (vals.map(v => v * v).sum - vals.sum * vals.sum / n) / n
    val vb = BigInt(row.getAs[Long]("vb_usd2"))
    val vw = BigInt(row.getAs[Long]("vw_usd2"))
    assert((vb + vw - popVar).abs <= 10,
      s"vb+vw=${vb + vw} differs from population variance $popVar")
  }

  test("theil-sen: the median slope is bracketed by the extreme pairwise slopes") {
    val rows = run("q_theil_sen")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val num = r.getAs[Long]("med_num_cents")
      val den = r.getAs[Long]("med_den_days")
      assert(den > 0)
      val ppm = r.getAs[Long]("slope_ppm")
      assert(ppm == num * 1000000L / den ||
        (num < 0 && ppm == -((-num) * 1000000L / den)),
        s"slope_ppm $ppm inconsistent with $num/$den")
    }
  }

  test("ndcg: bounded by 1e6, idcg is the full discount sum when n_rel >= 10") {
    val rows = run("q_ndcg")
    assert(rows.length == 5)
    val fullIdcg = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
      356207L, 333333L, 315465L, 301030L, 289065L).sum
    rows.foreach { r =>
      val ndcg = r.getAs[Long]("ndcg_ppm")
      assert(ndcg >= 0L && ndcg <= 1000000L)
      assert(r.getAs[Long]("dcg_u") <= r.getAs[Long]("idcg_u"))
      if (r.getAs[Long]("n_rel") >= 10)
        assert(r.getAs[Long]("idcg_u") == fullIdcg)
    }
  }

  test("calibration: brier decomposes correctly for a binary outcome") {
    val rows = run("q_calibration")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("p_f_ppm")
      val o = r.getAs[Long]("o_f_ppm")
      val b = r.getAs[Long]("brier_ppm")
      assert(p >= 0 && p <= 1000000 && o >= 0 && o <= 1000000)
      // Brier = (p-o)^2 + o(1-o) in ppm, up to integer truncation:
      val expect = ((p - o) * (p - o) + o * (1000000L - o)) / 1000000L
      assert(math.abs(b - expect) <= 2, s"brier $b vs decomposition $expect")
    }
  }

  test("auc: rank-sum equals direct pair counting P(s+ > s-) + half-ties") {
    val r = run("q_auc")
    assert(r.length == 1)
    val row = r.head
    val auc = row.getAs[Long]("auc_ppm")
    assert(auc >= 0L && auc <= 1000000L)
    // independent replay: collect per-priority test scores/outcomes and
    // count discordant/concordant/tied pairs directly
    import org.apache.spark.sql.functions._
    val g = graft.sources.Tables.orders(spark, sfTiny)
      .withColumn("h", substring(md5(col("o_orderkey").cast("string")), 1, 2))
      .withColumn("is_train", (col("h") < "80").cast("long"))
      .withColumn("is_f", (col("o_orderstatus") === "F").cast("long"))
      .groupBy("o_orderpriority")
      .agg(sum(col("is_train")).as("nt"),
        sum(col("is_train") * col("is_f")).as("ft"),
        sum(lit(1L) - col("is_train")).as("ne"),
        sum((lit(1L) - col("is_train")) * col("is_f")).as("fe"))
      .collect()
      .map(x => (1000000L * x.getAs[Long]("ft") / x.getAs[Long]("nt"),
        x.getAs[Long]("ne"), x.getAs[Long]("fe")))
    // per distinct score: (m = test count, f = positives)
    val byScore = g.groupBy(_._1).map { case (s, xs) =>
      (s, xs.map(_._2).sum, xs.map(_._3).sum)
    }.toSeq
    var conc = BigInt(0); var ties = BigInt(0)
    for ((s1, m1, f1) <- byScore; (s2, m2, f2) <- byScore) {
      if (s1 > s2) conc += BigInt(f1) * (m2 - f2)        // pos scored above neg
      if (s1 == s2) ties += BigInt(f1) * (m2 - f2)      // same score
    }
    val nPos = BigInt(byScore.map(_._3).sum)
    val nNeg = BigInt(byScore.map(x => x._2 - x._3).sum)
    val expect = (BigInt(1000000) * (2 * conc + ties)) / (2 * nPos * nNeg)
    assert(BigInt(auc) == expect, s"rank-sum AUC $auc != pair-count AUC $expect")
  }

  test("decision stump: beats or ties the majority-class baseline") {
    val r = run("q_decision_stump")
    assert(r.length == 1)
    val row = r.head
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfTiny)
    val n = li.count()
    val pos = li.where(col("l_returnflag") === "R").count()
    val majorityErr = math.min(pos, n - pos)
    assert(row.getAs[Long]("n_misclass") <= majorityErr,
      s"stump ${row.getAs[Long]("n_misclass")} worse than majority $majorityErr")
    assert(row.getAs[Long]("n_rows") == n)
  }

  test("js divergence: 2-JSD in micro-nats stays within [0, 2 ln 2] per pair") {
    val rows = run("q_js_divergence")
    assert(rows.nonEmpty)
    val bound = (2.0 * math.log(2.0) * 1e6).toLong
    rows.foreach { r =>
      val j = r.getAs[Long]("jsd2_unats")
      // per-term micro-nat rounding can push a hair past the exact
      // bound; 1000 µnats of slack covers vocab-sized term counts
      assert(j >= -1000L && j <= bound + 1000L,
        s"jsd2 $j outside [0, 2ln2] for ${r.getAs[String]("source_a")}/${r.getAs[String]("source_b")}")
    }
  }

  test("quantile norm: preserves per-source doc counts and maps monotonically") {
    val rows = run("q_quantile_norm")
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    import org.apache.spark.sql.functions._
    val srcCounts = graft.sources.Tables.documents(spark, sfTiny)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("n_docs")).sum == srcCounts(src),
        s"row mass not preserved for $src")
      val sorted = rs.sortBy(_.getAs[Long]("n_chars"))
      val normed = sorted.map(_.getAs[Long]("norm_chars"))
      assert(normed.zip(normed.drop(1)).forall { case (a, b) => a <= b },
        s"non-monotone mapping for $src")
    }
  }

  test("ipw: stratified HT means bracket raw means and strata all satisfy positivity") {
    val r = run("q_ipw")
    assert(r.length == 1)
    val row = r.head
    val y1 = row.getAs[Long]("y1_ppm")
    val y0 = row.getAs[Long]("y0_ppm")
    assert(y1 >= 0L && y1 <= 1000000L && y0 >= 0L && y0 <= 1000000L)
    assert(row.getAs[Long]("ate_ppm") == y1 - y0)
    assert(row.getAs[Long]("n_strata") >= 1L)
  }

  test("did: estimator equals the explicit 2x2 cell combination") {
    val r = run("q_did")
    assert(r.length == 1)
    val row = r.head
    val did = (row.getAs[Long]("a_post_u") - row.getAs[Long]("a_pre_u")) -
      (row.getAs[Long]("b_post_u") - row.getAs[Long]("b_pre_u"))
    assert(row.getAs[Long]("did_u") == did)
    // placebo on a hash split: |DID| should be small relative to the
    // mean order value (~150k USD => 1.5e11 micro)
    assert(math.abs(did) < 2e10, s"placebo DID $did suspiciously large")
  }

  test("abc: classes partition all parts, shares sum to ~1e6, A-share >= 80% fence behavior") {
    val rows = run("q_abc_class")
    assert(rows.map(_.getAs[String]("cls")).sorted.sameElements(Array("A", "B", "C")))
    val shares = rows.map(_.getAs[Long]("share_ppm"))
    assert(math.abs(shares.sum - 1000000L) <= 3, s"shares ${shares.toSeq} don't sum to 1e6")
    val a = rows.find(_.getAs[String]("cls") == "A").get.getAs[Long]("share_ppm")
    assert(a <= 800000L + 100000L, "A share wildly past its fence")
  }

  test("mrr: reciprocal ranks consistent, rank 1 iff nearest neighbor shares label") {
    val rows = run("q_mrr")
    assert(rows.length == 5)
    rows.foreach { r =>
      val rank = r.getAs[Long]("first_rel_rank")
      assert(rank >= 1L)
      assert(r.getAs[Long]("rr_u") == 1000000L / rank)
    }
  }

  test("logreg: step-2 theta moves toward the MLE (log-loss does not increase)") {
    val r = run("q_logreg_newton")
    assert(r.length == 1)
    val row = r.head
    // recompute log-loss at both thetas over the raw data
    import org.apache.spark.sql.functions._
    val pts = graft.sources.Tables.lineitem(spark, sfTiny)
      .select(col("l_quantity").cast("long").as("x"),
        (col("l_returnflag") === "R").cast("long").as("y"))
      .collect().map(p => (p.getLong(0), p.getLong(1)))
    def loss(t0: Double, t1: Double): Double = pts.map { case (x, y) =>
      val eta = t0 + t1 * x
      math.log1p(math.exp(-eta)) + (1 - y) * eta
    }.sum / pts.length
    val l1 = loss(row.getAs[Long]("t0_s1_u") / 1e6, row.getAs[Long]("t1_s1_u") / 1e6)
    val l2 = loss(row.getAs[Long]("t0_u") / 1e6, row.getAs[Long]("t1_u") / 1e6)
    assert(l2 <= l1 + 1e-6, s"Newton step increased log-loss: $l1 -> $l2")
    // and both beat theta = 0 (loss = ln 2)
    assert(l2 < math.log(2.0))
  }

  test("knn classify: confusion matrix covers all 50 held-out vectors") {
    val rows = run("q_knn_classify")
    assert(rows.map(_.getAs[Long]("n")).sum == 50L)
    rows.foreach { r =>
      assert(r.getAs[Long]("truth") >= 0L && r.getAs[Long]("pred") >= 0L)
    }
  }

  test("conformal: empirical coverage within the finite-sample band around 90%") {
    val r = run("q_conformal")
    assert(r.length == 1)
    val row = r.head
    val cov = row.getAs[Long]("cov_ppm")
    // split-conformal guarantees P(cover) >= 0.9 in expectation over
    // splits; one split fluctuates ~ ±3 sd of Bin(n_test, .9)
    val n = row.getAs[Long]("n_test").toDouble
    val slack = (3 * math.sqrt(0.9 * 0.1 / n) * 1e6).toLong + 20000L
    assert(cov > 900000L - slack && cov < 1000000L,
      s"coverage $cov ppm outside [${900000L - slack}, 1e6)")
    assert(row.getAs[Long]("qhat_u") > 0L)
  }

  test("hill: inverse tail index positive, terms consistent with the threshold") {
    val r = run("q_hill")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("k_used") > 0L && row.getAs[Long]("k_used") < 200L + 1L)
    assert(row.getAs[Long]("inv_alpha_u") > 0L)
    assert(row.getAs[Long]("alpha_ppm") ==
      1000000000000L / row.getAs[Long]("inv_alpha_u"))
  }

  test("prf1: metrics bounded, macro row averages the per-class rows") {
    val rows = run("q_prf1")
    val (macroRows, per) = rows.partition(_.getAs[String]("label") == "MACRO")
    assert(macroRows.length == 1 && per.nonEmpty)
    per.foreach { r =>
      Seq("precision_ppm", "recall_ppm", "f1_ppm").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0L && v <= 1000000L, s"$c=$v out of range")
      }
      // F1 lies between min and max of P and R (harmonic mean property)
      val p = r.getAs[Long]("precision_ppm"); val rc = r.getAs[Long]("recall_ppm")
      assert(r.getAs[Long]("f1_ppm") <= math.max(p, rc) + 1)
    }
    val m = macroRows.head
    assert(m.getAs[Long]("f1_ppm") ==
      per.map(_.getAs[Long]("f1_ppm")).sum / per.length)
    assert(m.getAs[Long]("support") == per.map(_.getAs[Long]("support")).sum)
  }

  test("kendall: tau-b signed square bounded, pair counts consistent") {
    val rows = run("q_kendall_tau")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Long]("taub2s_ppm")
      assert(t >= -1000000L && t <= 1000000L, s"tau² ppm $t out of range")
      assert(r.getAs[Long]("conc") + r.getAs[Long]("disc") <=
        r.getAs[Long]("n_pairs"))
    }
    // same data, same grain: tau-b and spearman must agree in SIGN for
    // each event type (both are monotone-association measures; exact
    // zero on one side is the only allowed disagreement)
    val rho = run("q_spearman")
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("rho2s_ppm"))
      .toMap
    rows.foreach { r =>
      val t = r.getAs[Long]("taub2s_ppm")
      val s = rho(r.getAs[String]("event_type"))
      assert(t == 0L || s == 0L || (t > 0) == (s > 0),
        s"tau $t and rho $s disagree in sign")
    }
  }

  test("cramers_v: effect size in [0, 1e6], discretized chi2 nonnegative") {
    val rows = run("q_cramers_v")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("chi2_ppm") >= 0L)
    val v2 = r.getAs[Long]("v2_ppm")
    assert(v2 >= 0L && v2 <= 1000000L, s"v² ppm $v2 out of range")
    assert(r.getAs[Long]("n_cells") <=
      r.getAs[Long]("r_levels") * r.getAs[Long]("c_levels"))
  }

  test("rbo: overlap staircase valid, cumulative score monotone and <= 1") {
    val rows = run("q_rbo").sortBy(_.getAs[Long]("d"))
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("ov") <= r.getAs[Long]("d"), "overlap exceeds depth")
      assert(r.getAs[Long]("term_u") >= 0L)
    }
    val ovs = rows.map(_.getAs[Long]("ov"))
    assert(ovs.zip(ovs.tail).forall { case (a, b) => a <= b },
      "prefix overlap must be nondecreasing in depth")
    val cum = rows.map(_.getAs[Long]("rbo_u"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(cum.last <= 1000000L, s"RBO ppm ${cum.last} exceeds 1")
    // identical-ranking sanity: RBO of a list with itself at these
    // weights is Σ 9^(d-1)·d/(d·10^d) — replay the exact truncated sum
    val perfect = (1 to 20).map { d =>
      (BigInt(1000000) * BigInt(9).pow(d - 1) * d /
        (BigInt(d) * BigInt(10).pow(d))).toLong
    }.sum
    assert(cum.last <= perfect, "measured RBO exceeds the self-RBO ceiling")
  }

  test("modularity: Q within [-1e6, 1e6], intra-edge count consistent") {
    val r = run("q_modularity")
    assert(r.length == 1)
    val row = r.head
    val q = row.getAs[Long]("q_ppm")
    assert(q >= -1000000L && q <= 1000000L)
    assert(row.getAs[Long]("intra_edges") <= row.getAs[Long]("n_edges"))
    assert(row.getAs[Long]("n_communities") >= 1L)
  }

  test("plan shapes: the new waves keep their scale contracts") {
    def plan(name: String): String =
      graft.queries.Registry.queries(name)(spark, sfTiny)
        .queryExecution.executedPlan.toString
    // abc classification rides the two-phase cumsum: no unpartitioned
    // sort-based WindowExec over the full part set
    assert(!plan("q_abc_class").contains("Window [") ||
      plan("q_abc_class").contains("__pid"),
      "abc_class lost its two-phase cumsum shape")
    // hill's top-k collapses to TakeOrdered, never a global sort
    assert(plan("q_hill").contains("TakeOrderedAndProject"))
    // hits keeps its 1-row max broadcasts
    assert(plan("q_hits").contains("BroadcastExchange") ||
      plan("q_hits").contains("BroadcastNestedLoopJoin"))
    // logreg is window- and join-free beyond the 1-row broadcast
    val lr = plan("q_logreg_newton")
    assert(!lr.contains("SortMergeJoin"), "logreg grew a shuffle join")
  }

  test("cuped: variance reduction is a valid correlation squared; adjustment preserves pooled mean direction") {
    val rows = run("q_cuped")
    assert(rows.length == 2)
    val rho2 = rows.head.getAs[Long]("rho2_ppm")
    assert(rho2 >= 0L && rho2 <= 1000000L, s"rho2 ppm $rho2 out of [0,1e6]")
    assert(rows.map(_.getAs[Long]("theta_ppm")).distinct.length == 1,
      "theta must be pooled (identical across cohorts)")
    // adjustment shifts each cohort mean by theta*(own X mean - pooled X
    // mean): the two shifts must have opposite signs (or zero), since
    // the pooled mean lies between the cohort means
    val shifts = rows.map(r => r.getAs[Long]("my_usd_u") - r.getAs[Long]("my_adj_usd_u"))
    assert(shifts.product <= 0L, s"same-sign CUPED shifts $shifts")
  }

  test("decompose: seasonal indices average to ~1e6 per type, residuals re-add exactly") {
    val rows = run("q_decompose")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("ratio_ppm") ==
        r.getAs[Long]("seas_ppm") + r.getAs[Long]("resid_ppm"),
        "decomposition identity violated")
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val mean = rs.map(_.getAs[Long]("ratio_ppm").toDouble).sum / rs.length
      assert(math.abs(mean - 1e6) < 2e5, s"type $t mean ratio $mean far from 1e6")
    }
  }

  test("hits: authority scores normalized to [0, 1e6], top list full") {
    val rows = run("q_hits")
    assert(rows.length == 20)
    assert(rows.head.getAs[Long]("auth_u") == 1000000L,
      "max authority must renormalize to exactly 1e6")
    rows.foreach(r => assert(r.getAs[Long]("auth_u") >= 0L &&
      r.getAs[Long]("auth_u") <= 1000000L))
  }

  test("kcore query equals a plain-Scala 3-round peel (empty allowed at tiny sf)") {
    // at sf0.001 the 200-part graph legitimately cascades to nothing
    // at k=80, so assert exact equality with an independent replay
    // instead of non-emptiness (the sf0.01 oracle gate covers the
    // nontrivial case: 1,865 surviving nodes there)
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").cast("string").as("s"), col("b.pk").cast("string").as("g"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    var alive = edges.toSeq
    (1 to 3).foreach { _ =>
      val deg = alive.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= 80).keySet
      alive = alive.filter(e => keep(e._1) && keep(e._2))
    }
    val expect = alive.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val got = run("q_kcore").map(r =>
      r.getAs[String]("node") -> r.getAs[Long]("deg")).toMap
    assert(got == expect, s"engine 3-round peel differs from replay")
  }

  test("neighbor jaccard: score bounded, intersection within min degree") {
    val rows = run("q_neighbor_jaccard")
    assert(rows.length == 50)
    rows.foreach { r =>
      val common = r.getAs[Long]("common")
      val da = r.getAs[Long]("deg_src")
      val db = r.getAs[Long]("deg_dst")
      val j = r.getAs[Long]("jacc_ppm")
      assert(common <= math.min(da, db),
        s"intersection $common exceeds min degree ${math.min(da, db)}")
      assert(j >= 0L && j <= 1000000L)
      // consistency: j == 1e6*common div (da+db-common)
      assert(j == 1000000L * common / (da + db - common))
    }
  }

  test("jl projection: one partner pair per vector, ratio concentrates near 1") {
    val rows = run("q_jl_projection")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("do2") > 0L)
      assert(r.getAs[Long]("dp2") >= 0L)
    }
    // m=8 Rademacher directions: E[ratio]=1, sd≈sqrt(2/8)=0.5; the
    // MEAN over n pairs concentrates much tighter than any one pair
    val ratios = rows.map(_.getAs[Long]("ratio_ppm").toDouble / 1e6)
    val mean = ratios.sum / ratios.length
    assert(mean > 0.5 && mean < 1.5, s"mean distortion $mean far from 1")
  }
}
