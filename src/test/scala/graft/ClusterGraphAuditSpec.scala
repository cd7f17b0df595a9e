package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._

/** Invariants for the clustering-quality audits (q_silhouette /
  * q_davies_bouldin), the graph-statistics pair (q_clustering_coeff /
  * q_assortativity) and the governance/engagement readouts
  * (q_k_anonymity / q_stickiness). The DuckDB oracle proves engine
  * equality; these pin the MATH against independent local replays in
  * exact BigInt arithmetic, so a formula regression fails even if
  * both engines regress together. */
class ClusterGraphAuditSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  /** Local exact replay of the micro-quantized label centroids and
    * per-point squared distances, straight from the parquet rows. */
  private lazy val localPoints: Seq[(Long, Array[Long])] =
    spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .collect()
      .map { r =>
        val vu = r.getSeq[Float](r.fieldIndex("embedding"))
          .map(x => math.round(x.toDouble * 1e6)).toArray
        (r.getInt(r.fieldIndex("label")).toLong, vu)
      }.toSeq

  private def d2(a: Array[Long], b: Array[Long]): BigInt =
    a.zip(b).map { case (x, y) => BigInt(x - y) * (x - y) }.sum

  test("silhouette: engine result equals an exact local replay") {
    // BigInt./ truncates toward zero for same-sign operands; sums of
    // micro-units can be negative, so replicate Spark's `div`
    // (truncation) explicitly via BigInt quot semantics (BigInt./ IS
    // truncating division in Scala).
    val cents = localPoints.groupBy(_._1).map { case (l, pts) =>
      val n = pts.size
      (l, Array.tabulate(64) { i =>
        (pts.map(p => BigInt(p._2(i))).sum / n).toLong
      })
    }
    val perLabel = localPoints.groupBy(_._1).map { case (l, pts) =>
      val sps = pts.map { case (_, vu) =>
        val a = d2(vu, cents(l))
        val b = cents.collect { case (l2, c2) if l2 != l => d2(vu, c2) }.min
        if (a.max(b) > 0) (BigInt(1000000) * (b - a)) / a.max(b) else BigInt(0)
      }
      (l, sps.sum / pts.size)
    }
    val rows = run("q_silhouette")
    assert(rows.length == perLabel.size)
    rows.foreach { r =>
      val l = r.getAs[Long]("label")
      assert(r.getAs[Long]("silhouette_ppm") == perLabel(l).toLong,
        s"label $l silhouette mismatch vs local replay")
      assert(math.abs(r.getAs[Long]("silhouette_ppm")) <= 1000000L)
    }
  }

  test("davies_bouldin: R uses the worst partner and scatter matches") {
    val cents = localPoints.groupBy(_._1).map { case (l, pts) =>
      (l, Array.tabulate(64) { i =>
        (pts.map(p => BigInt(p._2(i))).sum / pts.size).toLong
      })
    }
    val scatter = localPoints.groupBy(_._1).map { case (l, pts) =>
      (l, pts.map { case (_, vu) => d2(vu, cents(l)) }.sum / pts.size)
    }
    val rows = run("q_davies_bouldin")
    rows.foreach { r =>
      val l = r.getAs[Long]("label")
      assert(r.getAs[Long]("s_d2") == scatter(l).toLong, s"scatter of $l")
      val exp = cents.keys.filter(_ != l).map { j =>
        val m = d2(cents(l), cents(j))
        ((BigInt(1000000) * (scatter(l) + scatter(j))) / m, j)
      }.toSeq.sortBy { case (rp, j) => (-rp, j) }.head
      assert(r.getAs[Long]("db_ppm") == exp._1.toLong, s"R_max of $l")
      assert(r.getAs[Long]("partner") == exp._2, s"partner of $l")
      assert(r.getAs[Long]("partner") != l)
    }
  }

  test("clustering coeff: transitivity identity and wedge bound") {
    val r = run("q_clustering_coeff").head
    val (tri, wed, ppm) = (r.getAs[Long]("triangles"), r.getAs[Long]("wedges"),
      r.getAs[Long]("transitivity_ppm"))
    assert(wed >= 3 * tri, "each triangle closes exactly 3 wedges")
    assert(ppm == 3000000L * tri / wed)
    assert(ppm >= 0 && ppm <= 1000000L)
  }

  test("assortativity: |r| <= 1 and matches a local brute replay") {
    val li = spark.read.parquet(s"$sfTiny/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ed = li.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.size)
        yield (parts(i), parts(j))
    }.toSet
    val sym = ed.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = sym.groupBy(_._1).map { case (n, es) => (n, es.size.toLong) }
    val xy = sym.map { case (a, b) => (deg(a), deg(b)) }
    val n = xy.size.toDouble
    val sx = xy.map(_._1).sum.toDouble; val sy = xy.map(_._2).sum.toDouble
    val sxx = xy.map(p => p._1 * p._1).sum.toDouble
    val sxy = xy.map(p => p._1 * p._2).sum.toDouble
    val syy = xy.map(p => p._2 * p._2).sum.toDouble
    val expected = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val r = run("q_assortativity").head
    val got = r.getAs[Double]("assortativity")
    assert(r.getAs[Long]("n_edges") == sym.size)
    assert(math.abs(got) <= 1.0)
    assert(math.abs(got - expected) < 1e-6,
      s"assortativity $got vs local $expected")
  }

  test("k-anonymity: thresholds are monotone, class total is constant") {
    val rows = run("q_k_anonymity").sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(2L, 5L, 10L, 25L))
    val nClasses = rows.map(_.getAs[Long]("n_classes")).distinct
    assert(nClasses.length == 1, "class count must not depend on k")
    val below = rows.map(_.getAs[Long]("classes_below"))
    val atRisk = rows.map(_.getAs[Long]("rows_at_risk"))
    assert(below.zip(below.tail).forall { case (a, b) => a <= b })
    assert(atRisk.zip(atRisk.tail).forall { case (a, b) => a <= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("classes_below") <= r.getAs[Long]("n_classes"))
      assert(r.getAs[Long]("risk_ppm") >= 0 &&
        r.getAs[Long]("risk_ppm") <= 1000000L)
    }
  }

  test("l-diversity: monotone in l, sensitive domain bounds ldiv") {
    val rows = run("q_l_diversity").sortBy(_.getAs[Long]("l"))
    assert(rows.map(_.getAs[Long]("l")).toSeq == Seq(2L, 3L, 5L))
    val below = rows.map(_.getAs[Long]("classes_below"))
    assert(below.zip(below.tail).forall { case (a, b) => a <= b })
    assert(rows.map(_.getAs[Long]("n_classes")).distinct.length == 1)
    rows.foreach(r => assert(r.getAs[Long]("risk_ppm") <= 1000000L))
  }

  test("time_to_convert: ordered percentiles match a local replay") {
    val ev = spark.read.parquet(s"$sfTiny/events.parquet")
    // normalize either ts encoding like Tables.events does
    val tsNs = if (ev.schema("ts").dataType.typeName == "long")
      ev.selectExpr("user_id", "event_type", "ts AS ts_ns")
    else ev.selectExpr("user_id", "event_type",
      "unix_micros(cast(ts as timestamp)) * 1000 AS ts_ns")
    val evs = tsNs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstView = evs.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, es) => (u, es.map(_._3).min) }
    val durs = evs.filter(_._2 == "purchase")
      .flatMap { case (u, _, t) =>
        firstView.get(u).filter(t >= _).map(v => (u, (t - v) / 1000000000L))
      }
      .groupBy(_._1).map { case (u, ds) => (ds.map(_._2).min, u) }
      .toSeq.sorted
    val n = durs.size
    val r = run("q_time_to_convert").head
    assert(r.getAs[Long]("n_users") == n)
    assert(r.getAs[Long]("p25_s") == durs((n + 3) / 4 - 1)._1)
    assert(r.getAs[Long]("median_s") == durs((n + 1) / 2 - 1)._1)
    assert(r.getAs[Long]("p90_s") == durs((9 * n + 9) / 10 - 1)._1)
    assert(r.getAs[Long]("p25_s") <= r.getAs[Long]("median_s") &&
      r.getAs[Long]("median_s") <= r.getAs[Long]("p90_s"))
  }

  test("robustness: survival decreases with k, edge total constant") {
    val rows = run("q_robustness").sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(1L, 5L, 25L))
    assert(rows.map(_.getAs[Long]("edges_total")).distinct.length == 1)
    val surv = rows.map(_.getAs[Long]("edges_surviving"))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b },
      "removing more hubs cannot ADD surviving edges")
    rows.foreach { r =>
      assert(r.getAs[Long]("edges_surviving") <= r.getAs[Long]("edges_total"))
      assert(r.getAs[Long]("survival_ppm") ==
        1000000L * r.getAs[Long]("edges_surviving") / r.getAs[Long]("edges_total"))
    }
  }

  test("degree_dist: node and degree mass conservation, bucket law") {
    val rows = run("q_degree_dist")
    val cc = run("q_clustering_coeff").head
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == cc.getAs[Long]("nodes"))
    // each undirected edge contributes 2 to total degree
    assert(rows.map(_.getAs[Long]("degree_mass")).sum ==
      2 * cc.getAs[Long]("edges"))
    rows.foreach { r =>
      val b = r.getAs[Long]("log2_bucket")
      val (lo, hi) = (1L << b, (1L << (b + 1)) - 1)
      // bucket mass must be achievable by n_nodes degrees inside [2^b, 2^(b+1))
      assert(r.getAs[Long]("degree_mass") >= lo * r.getAs[Long]("n_nodes"))
      assert(r.getAs[Long]("degree_mass") <= hi * r.getAs[Long]("n_nodes"))
    }
  }

  test("ab_srm: weights sum to 256, chi2 is the term sum") {
    val rows = run("q_ab_srm")
    assert(rows.map(_.getAs[String]("split")).sorted.toSeq ==
      Seq("test", "train", "val"))
    val expected = rows.map(r =>
      r.getAs[String]("split") -> r.getAs[Long]("expected_ppm")).toMap
    assert(expected("train") == 1000000L * 204 / 256)
    assert(expected("val") == 1000000L * 26 / 256)
    assert(expected("test") == 1000000L * 26 / 256)
    val chi2 = rows.map(_.getAs[Long]("chi2_milli")).distinct
    assert(chi2.length == 1, "total chi2 must repeat identically per row")
    assert(chi2.head == rows.map(_.getAs[Long]("term_milli")).sum)
  }

  test("stickiness: bounded by 1e6 and exact against per-day replay") {
    val rows = run("q_stickiness")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Long]("stickiness_ppm")
      // DAU <= MAU every day, so sum_dau <= n_days * mau
      assert(s >= 0 && s <= 1000000L, s"stickiness $s out of [0, 1e6]")
      assert(r.getAs[Long]("n_days") >= 1 && r.getAs[Long]("mau") >= 1)
    }
  }
}
