package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._

/** Exact local replays for the external-evaluation wave: ARI/purity
  * of the integer k-means against stored labels, the McNemar
  * truncation ablation, and kNN-graph hubness. Each test recomputes
  * the full statistic from the raw parquet rows in plain Scala BigInt
  * arithmetic — an engine-independent third opinion beside the DuckDB
  * oracle. */
class ExternalEvalSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  /** Local integer k-means, mirroring MlQueries.kmeansFit: micro
    * quantization, lowest-id seeds, truncating-division centroid
    * means, (dist, cluster) tie-break, 3 rounds. */
  private lazy val localAssignment: Seq[(Long, Long, Long)] = { // (id, label, cluster)
    val pts = spark.read.parquet(s"$sfTiny/embeddings.parquet").collect()
      .map { r =>
        (r.getLong(r.fieldIndex("vec_id")),
          r.getInt(r.fieldIndex("label")).toLong,
          r.getSeq[Float](r.fieldIndex("embedding"))
            .map(x => math.round(x.toDouble * 1e6)).toArray)
      }.sortBy(_._1).toSeq
    var cents: Array[Array[Long]] = pts.take(4).map(_._3).toArray
    def assign(vu: Array[Long]): (Long, Long) = // (cluster, dist)
      cents.zipWithIndex.map { case (c, i) =>
        (vu.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, i.toLong)
      }.min match { case (d, cl) => (cl, d) }
    for (_ <- 1 to 3) {
      val byCluster = pts.groupBy(p => assign(p._3)._1)
      val next = cents.clone()
      byCluster.foreach { case (cl, members) =>
        next(cl.toInt) = Array.tabulate(64) { i =>
          (members.map(m => BigInt(m._3(i))).sum / members.size).toLong
        }
      }
      cents = next
    }
    pts.map(p => (p._1, p._2, assign(p._3)._1))
  }

  test("rand_index: ARI matches the exact pair-counting local replay") {
    val cells = localAssignment.groupBy(p => (p._3, p._2))
      .map { case (k, v) => (k, BigInt(v.size)) }
    def pairs(x: BigInt) = x * (x - 1) / 2
    val n = cells.values.sum
    val s = cells.values.map(pairs).sum
    val rr = cells.groupBy(_._1._1).values.map(g => pairs(g.map(_._2).sum)).sum
    val cc = cells.groupBy(_._1._2).values.map(g => pairs(g.map(_._2).sum)).sum
    val t = pairs(n)
    val ariPpm = (2 * t * s - 2 * rr * cc) * 1000000 / (t * (rr + cc) - 2 * rr * cc)
    val r = run("q_rand_index").head
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("sum_pairs") == s.toLong)
    assert(r.getAs[Long]("ari_ppm") == ariPpm.toLong,
      s"ARI ${r.getAs[Long]("ari_ppm")} vs local $ariPpm")
    assert(math.abs(r.getAs[Long]("ari_ppm")) <= 1000000L)
  }

  test("purity: per-cluster majority shares match the local replay") {
    val rows = run("q_purity")
    val byCluster = localAssignment.groupBy(_._3)
    assert(rows.length == byCluster.size)
    rows.foreach { r =>
      val cl = r.getAs[Long]("cluster")
      val members = byCluster(cl)
      val (majLabel, majN) = members.groupBy(_._2)
        .map { case (l, v) => (l, v.size) }
        .toSeq.sortBy { case (l, c) => (-c, l) }.head
      assert(r.getAs[Long]("n_members") == members.size)
      assert(r.getAs[Long]("majority_label") == majLabel)
      assert(r.getAs[Long]("majority_n") == majN)
      assert(r.getAs[Long]("purity_ppm") == 1000000L * majN / members.size)
    }
  }

  test("mcnemar: b/c cells and chi2 match a local langid replay") {
    val profiles = Seq(
      "en" -> Set("the", "a", "of", "and", "to"),
      "es" -> Set("el", "la", "de", "los", "y"),
      "de" -> Set("der", "die", "das", "und", "ist"),
      "fr" -> Set("le", "les", "des", "et", "une"))
    def predict(text: String): String = {
      val toks = text.split(" ", -1).filter(_.nonEmpty)
      val c = profiles.map { case (l, ws) => l -> toks.count(ws) }.toMap
      if (c("en") > 0 && c("en") >= c("es") && c("en") >= c("de") && c("en") >= c("fr")) "en"
      else if (c("es") > 0 && c("es") >= c("de") && c("es") >= c("fr")) "es"
      else if (c("de") > 0 && c("de") >= c("fr")) "de"
      else if (c("fr") > 0) "fr"
      else "und"
    }
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    var (b, c0, nFull, nTrunc) = (0L, 0L, 0L, 0L)
    docs.foreach { case (text, lang) =>
      val full = predict(text) == lang
      val trunc = predict(text.take(120)) == lang
      if (full) nFull += 1
      if (trunc) nTrunc += 1
      if (full && !trunc) b += 1
      if (!full && trunc) c0 += 1
    }
    val r = run("q_mcnemar").head
    assert(r.getAs[Long]("n_docs") == docs.length)
    assert(r.getAs[Long]("full_correct") == nFull)
    assert(r.getAs[Long]("trunc_correct") == nTrunc)
    assert(r.getAs[Long]("b") == b && r.getAs[Long]("c") == c0)
    val expChi = if (b + c0 > 0) 1000L * (b - c0) * (b - c0) / (b + c0) else 0L
    assert(r.getAs[Long]("chi2_milli") == expChi)
  }

  test("label_noise: verdicts equal a local vote replay over the same edges") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sfTiny/embeddings.parquet")
    val edges = graft.operators.Similarity.bruteForceTopK(
      e, col("vec_id"), col("embedding"),
      e, col("vec_id"), col("embedding"), k = 5)
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = e.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    val pred = edges.groupBy(_._1).map { case (q, es) =>
      val votes = es.map(x => labels(x._2)).groupBy(identity)
        .map { case (l, v) => (l, v.size) }
      (q, votes.toSeq.sortBy { case (l, v) => (-v, l) }.head._1)
    }
    val expected = pred.toSeq.groupBy(p => labels(p._1)).map { case (l, ps) =>
      (l, (ps.size.toLong, ps.count(p => p._2 != l).toLong))
    }
    val rows = run("q_label_noise")
    assert(rows.map(_.getAs[Long]("n")).sum == labels.size)
    rows.foreach { r =>
      val l = r.getAs[Long]("label")
      val (n, noisy) = expected(l)
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("noisy") == noisy,
        s"label $l verdicts diverge from the local vote replay")
      assert(r.getAs[Long]("noise_ppm") == 1000000L * noisy / n)
    }
  }

  test("ngram_novelty: per-source shares match a local set replay") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val grams = docs.flatMap { case (id, src, text) =>
      val t = text.split(" ", -1).filter(_.nonEmpty)
      t.sliding(3).filter(_.size == 3).map(g => (id, src, g.mkString(" "))).toSet
    }
    val owner = grams.groupBy(_._3).map { case (g, v) => (g, v.map(_._1).min) }
    val expected = grams.groupBy(_._2).map { case (src, gs) =>
      (src, (gs.size.toLong, gs.count(x => owner(x._3) == x._1).toLong))
    }
    val rows = run("q_ngram_novelty")
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (types, novel) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("gram_types") == types)
      assert(r.getAs[Long]("novel_types") == novel)
      assert(r.getAs[Long]("novelty_ppm") == 1000000L * novel / types)
    }
    // every gram type has exactly one owner doc, so novelty sums to
    // the global distinct-gram count across sources
    assert(rows.map(_.getAs[Long]("novel_types")).sum == owner.size)
  }

  test("heaps_law: growth curve is monotone and ends at the full corpus") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).filter(_.nonEmpty)))
    val rows = run("q_heaps_law").sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val toks = rows.map(_.getAs[Long]("cum_tokens"))
    val vocab = rows.map(_.getAs[Long]("cum_vocab"))
    assert(toks.zip(toks.tail).forall { case (a, b) => a <= b })
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b })
    // decile 10 covers every doc
    assert(toks.last == docs.map(_._2.length.toLong).sum)
    assert(vocab.last == docs.flatMap(_._2).distinct.length.toLong)
    // vocabulary can never outgrow the token count
    rows.foreach(r =>
      assert(r.getAs[Long]("cum_vocab") <= r.getAs[Long]("cum_tokens")))
  }

  test("fertility: per-lang ratios match a local regex replay") {
    val bpe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val words = ds.map(_._2.split(" ", -1).count(_.nonEmpty).toLong).sum
      val sub = ds.map(d => bpe.findAllIn(d._2).size.toLong).sum
      val chars = ds.map(_._2.length.toLong).sum
      (lang, (ds.size.toLong, words, sub, chars))
    }
    val rows = run("q_fertility")
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (nd, w, sw, ch) = expected(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") == nd && r.getAs[Long]("n_words") == w)
      assert(r.getAs[Long]("n_subwords") == sw && r.getAs[Long]("fertility_ppm") == 1000000L * sw / w)
      assert(r.getAs[Long]("chars_per_subword_milli") == 1000L * ch / sw)
    }
  }

  test("shingle_df_profile: doc-mass conserves against ngram_novelty") {
    val prof = run("q_shingle_df_profile")
    val nov = run("q_ngram_novelty")
    // Σ df over shingle types == Σ per-doc distinct gram types
    assert(prof.map(_.getAs[Long]("doc_mass")).sum ==
      nov.map(_.getAs[Long]("gram_types")).sum)
    // Σ types across buckets == global distinct grams == Σ novel types
    assert(prof.map(_.getAs[Long]("n_shingles")).sum ==
      nov.map(_.getAs[Long]("novel_types")).sum)
    prof.foreach { r =>
      val b = r.getAs[Long]("log2_df")
      val (lo, hi) = (1L << b, (1L << (b + 1)) - 1)
      assert(r.getAs[Long]("doc_mass") >= lo * r.getAs[Long]("n_shingles"))
      assert(r.getAs[Long]("doc_mass") <= hi * r.getAs[Long]("n_shingles"))
    }
  }

  test("interarrival: percentiles match a local gap replay") {
    val ev = spark.read.parquet(s"$sfTiny/events.parquet")
    val tsNs = if (ev.schema("ts").dataType.typeName == "long")
      ev.selectExpr("user_id", "event_id", "ts AS ts_ns")
    else ev.selectExpr("user_id", "event_id",
      "unix_micros(cast(ts as timestamp)) * 1000 AS ts_ns")
    val gaps = tsNs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values.flatMap { es =>
        val sorted = es.sortBy(e => (e._3, e._2))
        sorted.zip(sorted.tail).map { case (a, b) =>
          ((b._3 - a._3) / 1000000000L, a._1, b._2)
        }
      }.map(g => (g._1, g._2, g._3)).toSeq.sortBy(g => (g._1, g._2, g._3))
    val n = gaps.size
    val r = run("q_interarrival").head
    assert(r.getAs[Long]("n_gaps") == n)
    assert(r.getAs[Long]("p50_s") == gaps((n + 1) / 2 - 1)._1)
    assert(r.getAs[Long]("p90_s") == gaps((9 * n + 9) / 10 - 1)._1)
    assert(r.getAs[Long]("p99_s") == gaps((99 * n + 99) / 100 - 1)._1)
  }

  test("mutual_info: matches local replay and is bounded by margins") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = docs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val rm = cells.groupBy(_._1._1).map { case (k, v) => (k, v.values.sum) }
    val cm = cells.groupBy(_._1._2).map { case (k, v) => (k, v.values.sum) }
    val n = docs.length.toDouble
    val mi = cells.map { case ((s0, l0), c) =>
      math.round(c / n * math.log(c * n / (rm(s0) * cm(l0)).toDouble) * 1e6)
    }.sum
    val h = (m: Map[String, Long]) =>
      m.values.map(v => math.round(v / n * math.log(v / n) * -1e6)).sum
    val r = run("q_mutual_info").head
    assert(r.getAs[Long]("n_docs") == docs.length)
    assert(r.getAs[Long]("mi_micro_nats") == mi, "MI diverges from local replay")
    assert(r.getAs[Long]("h_source_u") == h(rm) && r.getAs[Long]("h_lang_u") == h(cm))
    // information inequality, with per-cell rounding slack
    val slack = r.getAs[Long]("n_cells")
    assert(r.getAs[Long]("mi_micro_nats") >= -slack)
    assert(r.getAs[Long]("mi_micro_nats") <=
      math.min(r.getAs[Long]("h_source_u"), r.getAs[Long]("h_lang_u")) + slack)
  }

  test("hubness: histogram equals the in-degree fold of q_knn_graph") {
    val edges = run("q_knn_graph")
    val indeg = edges.groupBy(_.getAs[Long]("id"))
      .map { case (_, es) => es.size.toLong }
    val nVectors = spark.read.parquet(s"$sfTiny/embeddings.parquet").count()
    val hist = (indeg.groupBy(identity).map { case (d, v) => (d, v.size.toLong) } +
      (0L -> (nVectors - indeg.size))).filter(_._2 > 0)
    val rows = run("q_hubness")
    assert(rows.map(r => (r.getAs[Long]("in_deg"), r.getAs[Long]("n_nodes")))
      .toMap == hist)
    // mass conservation: every vector appears in exactly one bucket
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == nVectors)
  }
}
