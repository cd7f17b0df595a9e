package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for evaluation wave 2 (queries.EvalQueries2): the
  * oracle proves engine equality, these pin the semantics — hardness
  * of the mined negatives, ROUGE clipped-count laws, lift/gain
  * boundary identities, Brier decomposition consistency. */
class EvalWave2Spec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("hard_negatives: cross-label only, contiguous ranks, dominated by kNN") {
    val labels = graft.sources.Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = run("q_hard_negatives")
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    for ((q, rs) <- byQuery) {
      // every negative really is cross-label
      for (r <- rs)
        assert(labels(r.getAs[Long]("id")) != labels(q) &&
          r.getAs[Long]("lab") == labels(r.getAs[Long]("id")))
      // ranks 1..k with non-increasing cosine
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to rs.length))
      val cs = sorted.map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // the best cross-label neighbor can never beat the best overall
    val knnBest = run("q_knn_graph").filter(_.getAs[Long]("rnk") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    for ((q, rs) <- byQuery; if knnBest.contains(q))
      assert(rs.map(_.getAs[Double]("cosine")).max <= knnBest(q))
  }

  test("rouge_pairs: exact clipped-count local replay over every pair") {
    val toks = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    def counts(ws: Seq[String], n: Int): Map[String, Long] =
      (if (n == 1) ws else ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq)
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def clipped(a: Map[String, Long], b: Map[String, Long]): Long =
      a.keysIterator.map(k => math.min(a(k), b.getOrElse(k, 0L))).sum
    val rows = run("q_rouge_pairs")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (wa, wb) = (toks(r.getAs[Long]("id_a")), toks(r.getAs[Long]("id_b")))
      val (ua, ub) = (counts(wa, 1), counts(wb, 1))
      val (ba, bb) = (counts(wa, 2), counts(wb, 2))
      val ov1 = clipped(ua, ub); val ov2 = clipped(ba, bb)
      assert(r.getAs[Long]("ov1") == ov1)
      assert(r.getAs[Long]("ov2") == ov2)
      assert(r.getAs[Long]("r1_p_ppm") == 1000000L * ov1 / math.max(wb.size, 1))
      assert(r.getAs[Long]("r1_r_ppm") == 1000000L * ov1 / math.max(wa.size, 1))
      assert(r.getAs[Long]("r1_f_ppm") ==
        2000000L * ov1 / math.max(wa.size + wb.size, 1))
      val nb2 = math.max(wa.size - 1, 0) + math.max(wb.size - 1, 0)
      assert(r.getAs[Long]("r2_f_ppm") == 2000000L * ov2 / math.max(nb2, 1))
    }
  }

  test("lift_curve: boundary identities and monotone gains") {
    val rows = run("q_lift_curve").sortBy(-_.getAs[Long]("score"))
    assert(rows.nonEmpty)
    val last = rows.last
    assert(last.getAs[Long]("depth_ppm") == 1000000L)
    assert(last.getAs[Long]("gain_ppm") == 1000000L)
    assert(last.getAs[Long]("lift_ppm") == 1000000L)
    val gains = rows.map(_.getAs[Long]("gain_ppm"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b })
    // cumulative counts reconstruct from the per-bin columns
    var (cn, cp) = (0L, 0L)
    for (r <- rows) {
      cn += r.getAs[Long]("m"); cp += r.getAs[Long]("f")
      assert(r.getAs[Long]("cum_n") == cn && r.getAs[Long]("cum_pos") == cp)
    }
  }

  test("isotonic: calibrated rates monotone, mass-preserving, PAVA replay") {
    val rows = run("q_isotonic_calibration").sortBy(_.getAs[Long]("score"))
    assert(rows.nonEmpty)
    val cal = rows.map(_.getAs[Long]("calibrated_ppm"))
    assert(cal.zip(cal.tail).forall { case (a, b) => a <= b },
      s"not monotone: ${cal.toSeq}")
    for (r <- rows)
      assert(r.getAs[Long]("raw_ppm") ==
        1000000L * r.getAs[Long]("pos") / r.getAs[Long]("n"))
    // local PAVA replay over the (n, pos) bins
    case class G(n: Long, pos: Long)
    var gs = rows.map(r => G(r.getAs[Long]("n"), r.getAs[Long]("pos"))).toList
    var changed = true
    while (changed) {
      changed = false
      val merged = scala.collection.mutable.ListBuffer.empty[G]
      for (g <- gs) {
        if (merged.nonEmpty &&
            merged.last.pos * g.n > g.pos * merged.last.n) {
          val l = merged.remove(merged.size - 1)
          merged += G(l.n + g.n, l.pos + g.pos)
          changed = true
        } else merged += g
      }
      // re-check backwards merges until stable
      gs = merged.toList
    }
    // expand pooled rates back to bins
    val pooledRates = {
      val out = scala.collection.mutable.ListBuffer.empty[Long]
      var i = 0
      var remaining = rows.map(r => (r.getAs[Long]("n"), r.getAs[Long]("pos"))).toList
      for (g <- gs) {
        var acc = 0L
        while (acc < g.n) {
          val (n0, _) = remaining.head
          remaining = remaining.tail
          acc += n0
          out += 1000000L * g.pos / g.n
          i += 1
        }
        assert(acc == g.n, "pool boundaries must align with bins")
      }
      out.toList
    }
    assert(cal.toList == pooledRates)
  }

  test("ece: gap replay against a local scorer rebuild; mce bounds ece") {
    val h = substring(md5(col("o_orderkey").cast("string")), 1, 2)
    val cal = graft.sources.Tables.orders(spark, sfTiny)
      .withColumn("is_train", (h < "80").cast("long"))
      .withColumn("is_f", (col("o_orderstatus") === "F").cast("long"))
      .groupBy("o_orderpriority")
      .agg(sum(col("is_train")).as("n_train"),
        sum(col("is_train") * col("is_f")).as("f_train"),
        sum(lit(1L) - col("is_train")).as("n_test"),
        sum((lit(1L) - col("is_train")) * col("is_f")).as("f_test"))
      .collect()
    val bins = cal.groupBy(r =>
      1000000L * r.getAs[Long]("f_train") / r.getAs[Long]("n_train"))
      .map { case (sp, rs) =>
        val nk = rs.map(_.getAs[Long]("n_test")).sum
        val pk = rs.map(_.getAs[Long]("f_test")).sum
        (nk, math.abs(sp - 1000000L * pk / nk))
      }.toSeq
    val n = bins.map(_._1).sum
    val ece = bins.map { case (nk, g) => nk * g }.sum / n
    val r = run("q_ece").head
    assert(r.getAs[Long]("n_test") == n)
    assert(r.getAs[Long]("ece_ppm") == ece)
    assert(r.getAs[Long]("mce_ppm") == bins.map(_._2).max)
    assert(r.getAs[Long]("mce_ppm") >= r.getAs[Long]("ece_ppm"))
  }

  test("simpson_check: counters are consistent and bounded by strata") {
    val rows = run("q_simpson_check")
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (ns, na, nr) = (r.getAs[Long]("n_strata"),
        r.getAs[Long]("n_agree"), r.getAs[Long]("n_reversed"))
      assert(na + nr <= ns && na >= 0 && nr >= 0)
      if (r.getAs[Boolean]("paradox"))
        assert(r.getAs[Long]("agg_sign") != 0 && na == 0)
      if (r.getAs[Long]("agg_sign") == 0) assert(nr == 0)
    }
  }

  test("brier_decomp: non-negative terms, bounded score, tight identity") {
    val rows = run("q_brier_decomp")
    assert(rows.length == 1)
    val r = rows.head
    for (c <- Seq("brier_ppm", "rel_ppm", "res_ppm", "unc_ppm")) {
      val v = r.getAs[Long](c)
      assert(v >= 0 && v <= 1000000, s"$c=$v")
    }
    // Murphy identity holds exactly in rationals; the integral
    // truncations leave at most a few ppm of residue
    assert(math.abs(r.getAs[Long]("decomp_gap_ppm")) <= 5,
      s"gap=${r.getAs[Long]("decomp_gap_ppm")}")
    // uncertainty is the base-rate variance: replay it
    val (n, p) = (r.getAs[Long]("n_test"), r.getAs[Long]("n_pos"))
    assert(r.getAs[Long]("unc_ppm") == 1000000L * p * (n - p) / (n * n))
  }
}
