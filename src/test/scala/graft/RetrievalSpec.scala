package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._

/** Invariants for the retrieval-serving wave
  * (queries.RetrievalQueries). The DuckDB oracle proves engine
  * equality; these pin ranking MATH that holds for any corpus. */
class RetrievalSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("bm25: scores positive, non-increasing, and term counts bounded by query size") {
    val rows = run("q_bm25")
    assert(rows.nonEmpty && rows.length <= 50)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0.0), "BM25 of a matching doc is positive")
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "result is ordered by score desc")
    assert(rows.map(_.getAs[Long]("n_terms")).forall(n => n >= 1 && n <= 4))
  }

  test("bm25: a doc matching more distinct query terms outscores a same-length doc with fewer (idf>0)") {
    // indirectly pinned by positivity + ordering; directly pin that the
    // top doc matches at least as many terms as the median result doc
    val rows = run("q_bm25")
    val top = rows.head.getAs[Long]("n_terms")
    val med = rows(rows.length / 2).getAs[Long]("n_terms")
    assert(top >= med)
  }

  test("rrf: fused score equals the sum of its two reciprocal-rank terms") {
    val rows = run("q_rrf_fusion")
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val kw = Option(r.getAs[java.lang.Long]("kw_rnk")).map(_.toLong)
      val sem = Option(r.getAs[java.lang.Long]("sem_rnk")).map(_.toLong)
      assert(kw.isDefined || sem.isDefined, "a fused doc appears in >=1 list")
      val expected =
        kw.map(rk => math.round(1e9 / (60.0 + rk))).getOrElse(0L) +
          sem.map(rk => math.round(1e9 / (60.0 + rk))).getOrElse(0L)
      val got = math.round(r.getAs[Double]("rrf") * 1e9)
      assert(got == expected, s"rrf ${r.getAs[Double]("rrf")} != $expected/1e9")
    }
  }

  test("rrf: fused max dominates any single rank-1 contribution (some doc is rank 1 somewhere)") {
    val rows = run("q_rrf_fusion")
    val top = rows.head.getAs[Double]("rrf")
    // the kw-rank-1 doc alone scores 1/61, so the fused winner must
    // score at least that — a bound that holds for any corpus
    assert(top >= math.round(1e9 / 61.0) / 1e9,
      s"fused winner $top below the single-list rank-1 floor")
    // and no score can exceed a double rank-1 (2/61 + rounding)
    assert(top <= 2.0 * math.round(1e9 / 61.0) / 1e9 + 1e-9)
  }

  test("mmr replays the exact greedy trajectory against a local reference") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.Registry.queries("q_mmr")(spark, sfTiny)
      .orderBy("pick").collect()
      .map(r => (r.getAs[Long]("pick"), r.getAs[Long]("id"), r.getAs[Long]("rel_u")))
    assert(got.map(_._1).toSeq == (1L to 5L))
    assert(got.map(_._2).distinct.length == 5)
    // local greedy replay over the same top-20 candidate set
    val e = graft.sources.Tables.embeddings(spark, sfTiny)
    val q0 = e.where(col("vec_id") === 0)
    val cand = graft.operators.Similarity.bruteForceTopK(
        e, col("vec_id"), col("embedding"), q0, col("vec_id"), col("embedding"), 20)
      .select(col("id"), round(col("cosine") * 1e6, 0).cast("long").as("rel_u"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = e.where(col("vec_id").isin(cand.keySet.toSeq: _*))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Long = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      val d = a.indices.foldLeft(0.0)((acc, i) => acc + (a(i) / na) * (b(i) / nb))
      math.round(math.round(d * 1e6).toDouble / 1e6 * 1e6) // round-6 then micro
    }
    var selected = Vector(cand.toSeq.maxBy { case (id, r) => (r, -id) }._1)
    // note maxBy tie rule: highest rel_u, then LOWEST id
    while (selected.length < 5) {
      val rem = cand.keySet -- selected
      val next = rem.map { c =>
        val ms = selected.map(s0 => cos(vecs(c), vecs(s0))).max
        (c, 7L * cand(c) - 3L * ms)
      }.toSeq.maxBy { case (id, m) => (m, -id) }._1
      selected :+= next
    }
    assert(got.map(_._2).toSeq == selected,
      s"engine picks ${got.map(_._2).toSeq} != local greedy $selected")
    // relevance of pick 1 is the candidate max (pure-relevance seed)
    assert(got.head._3 == cand.values.max)
  }

  test("ql_dirichlet: negative log-likelihoods, non-increasing, local replay") {
    val qTerms = Set("spark", "join", "window", "stream")
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val tt = docs.map(_._2.size.toLong).sum
    val ctf = qTerms.map(t => t -> docs.map(_._2.count(_ == t).toLong).sum).toMap
    def score(ws: Seq[String]): Option[(Long, Double)] = {
      val matched = qTerms.toSeq.map(t => t -> ws.count(_ == t).toLong)
        .filter(_._2 > 0)
      if (matched.isEmpty) None else {
        val mSu = matched.map { case (t, tf) =>
          math.round(math.log(1.0 + tf.toDouble * tt.toDouble /
            (1000.0 * ctf(t).toDouble)) * 1e6) }.sum
        val lenU = math.round(math.log(1000.0 / (ws.size.toDouble + 1000.0))
          * qTerms.size.toDouble * 1e6)
        Some((matched.size.toLong,
          BigDecimal((mSu + lenU).toDouble / 1e6)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    val expect = docs.flatMap { case (id, ws) => score(ws).map(s => (id, s)) }
      .sortBy { case (id, (_, ql)) => (-ql, id) }.take(50)
    val got = run("q_ql_dirichlet").map(r =>
      (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_terms"), r.getAs[Double]("ql"))))
    assert(got.toSeq == expect.toSeq)
    // (the emitted score drops the doc-independent Σ ln P(t|C) shift,
    // so it is rank-equivalent, not a raw negative log-likelihood)
    val qs = got.map(_._2._2)
    assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
  }

  test("prf_expansion: no query terms, length floor, weights ranked") {
    val qTerms = Set("spark", "join", "window", "stream")
    val rows = run("q_prf_expansion")
    assert(rows.length == 20)
    for (r <- rows) {
      val t = r.getString(0)
      assert(!qTerms.contains(t) && t.length >= 3, t)
      assert(r.getAs[Long]("n_docs") >= 1 && r.getAs[Long]("n_docs") <= 10)
    }
    val ws = rows.map(_.getAs[Long]("w"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }
}
