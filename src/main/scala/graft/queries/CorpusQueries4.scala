package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions._
import graft.operators.Graph

/** SURVEY §2.6 corpus wave 4 (r5): TextRank keyword extraction (the
  * graph-ranking upgrade over q_rake's frequency heuristics) and
  * label-centroid drift between dataset halves (the embedding-space
  * stability audit a retraining pipeline gates on).
  */
object CorpusQueries4 {

  private val trIters = 8
  private val trScale = 10000000000L // 1e10: headroom for ~1e7-word vocabs

  /** TextRank (Mihalcea & Tarau 2004) over the adjacent-token
    * co-occurrence graph of content words (length ≥ 4): distinct
    * directed pairs, symmetrized, ranked by the SAME exact-integer
    * damped recurrence as q_pagerank (operators.Graph.pageRank,
    * BIGINT units, truncating div — partition-order invariant, so an
    * iterative keyword ranker becomes hash-checkable). Top-50 words.
    * Scale shape: per round one dst-keyed agg shuffle + one node
    * join; the graph is vocabulary-sized, not corpus-sized. */
  private val qTextrank = BoundQuery("q_textrank", (s, d) => {
    val toks = Tables.documents(s, d)
      .select(tokens(col("text")).as("w"))
    val pairs = toks.select(explode(when(size(col("w")) >= 2,
        transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(element_at(col("w"), i).as("a"),
            element_at(col("w"), i + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .select(col("p.a").as("src"), col("p.b").as("dst"))
      .where(length(col("src")) >= 4 && length(col("dst")) >= 4 &&
        col("src") =!= col("dst"))
    val edges = pairs.union(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    Graph.pageRank(edges, "src", "dst", iters = trIters, scale = trScale)
      .orderBy(desc("rank"), col("node")).limit(50)
      .select(col("node").as("word"), col("rank"))
  }, Some {
    val base = 15L * trScale / 100L
    def step(k: Int) = s"""
    pr$k AS (
      SELECT n.node,
             CAST($base + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(p.rank // d.d) AS BIGINT) AS s
        FROM pr${k - 1} p
        JOIN deg d ON p.node = d.src
        JOIN edges e ON e.src = p.node
        GROUP BY e.dst) c ON n.node = c.node)"""
    s"""
    WITH toks AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents),
    bi AS (
      SELECT unnest(list_transform(range(1, len(w)),
        i -> struct_pack(a := w[i], b := w[i+1]))) AS p
      FROM toks WHERE len(w) >= 2),
    e0 AS (
      SELECT DISTINCT p.a AS src, p.b AS dst FROM bi
      WHERE len(p.a) >= 4 AND len(p.b) >= 4 AND p.a <> p.b),
    edges AS (SELECT src, dst FROM e0
              UNION SELECT dst, src FROM e0),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    pr0 AS (SELECT node, CAST($trScale AS BIGINT) AS rank FROM nodes),
    ${(1 to trIters).map(step).mkString(",")}
    SELECT node AS word, rank FROM pr$trIters
    ORDER BY rank DESC, word LIMIT 50
  """
  })

  /** Label-centroid drift between the even- and odd-id halves of the
    * embedding collection — "did this label's region move?" without
    * any float mean: per label and coordinate the milli-unit sums
    * (sa, sb) and counts (na, nb) give the EXACT squared centroid
    * distance Σ_i (sa_i·nb − sb_i·na)² div (na·nb)², in milli² units
    * (the cross-multiplied mean-difference identity — the same trick
    * as the scatter matrix's n²-scaling). One exploded aggregation,
    * decimal headroom on the cross products, no windows. */
  private val qCentroidDrift = BoundQuery("q_centroid_drift", (s, d) => {
    val dm = Tables.embeddings(s, d)
      .select(col("label"), (col("vec_id") % 2 === 0).cast("long").as("isA"),
        posexplode(transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long")))
          .as(Seq("i", "xm")))
    dm.groupBy("label", "i")
      .agg(sum(col("isA") * col("xm")).as("sa"),
        sum((lit(1L) - col("isA")) * col("xm")).as("sb"),
        sum(col("isA")).as("na"), sum(lit(1L) - col("isA")).as("nb"))
      .groupBy("label")
      .agg(max(col("na")).as("n_even"), max(col("nb")).as("n_odd"),
        sum(expr("""(CAST(sa AS DECIMAL(38,0)) * nb - CAST(sb AS DECIMAL(38,0)) * na)
                    * (CAST(sa AS DECIMAL(38,0)) * nb - CAST(sb AS DECIMAL(38,0)) * na)"""))
          .as("num"))
      .select(col("label").cast("long").as("label"), col("n_even"), col("n_odd"),
        expr("""CAST(num div (CAST(n_even AS DECIMAL(38,0)) * n_even
                              * n_odd * n_odd) AS BIGINT)""")
          .as("dist2_milli2"))
      .orderBy("label")
  }, Some("""
    WITH dm AS (
      SELECT label,
        CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS isA,
        i,
        CAST(round(CAST(embedding[i] AS DOUBLE)*1000, 0) AS BIGINT) AS xm
      FROM embeddings, unnest(range(1, 65)) AS t(i)),
    percoord AS (
      SELECT label, i,
        CAST(sum(isA * xm) AS BIGINT) AS sa,
        CAST(sum((1 - isA) * xm) AS BIGINT) AS sb,
        CAST(sum(isA) AS BIGINT) AS na,
        CAST(sum(1 - isA) AS BIGINT) AS nb
      FROM dm GROUP BY 1, 2)
    SELECT CAST(label AS BIGINT) AS label,
      max(na) AS n_even, max(nb) AS n_odd,
      CAST(sum((CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na)
             * (CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na))
        // (CAST(max(na) AS HUGEINT) * max(na) * max(nb) * max(nb)) AS BIGINT)
        AS dist2_milli2
    FROM percoord GROUP BY label ORDER BY label
  """))

  /** LSH band-occupancy statistics for the q_minhash_pairs family —
    * the TUNING readout production dedup watches before paying for a
    * run: per band, how many buckets exist, how big the largest one
    * is, and how many candidate pairs Σ C(sz,2) the band join will
    * emit. A band whose max bucket explodes is the boilerplate-skew
    * signature (the maxBucket guard's trigger condition), visible
    * here BEFORE the join runs. Same arithmetic hash family as the
    * oracle-replayed q_minhash_pairs, so every bucket count
    * hash-matches DuckDB. One banding pass + one two-level agg. */
  private val qMinhashBandStats = BoundQuery("q_minhash_band_stats", (s, d) => {
    graft.operators.Dedup.arithBandKeys(Tables.documents(s, d),
        col("doc_id"), col("text"), shingleSize = 3, bands = 8, rowsPerBand = 4)
      .groupBy("band", "bkey").agg(count(lit(1)).as("sz"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("sz")).as("n_docs"),
        sum((col("sz") === 1L).cast("long")).as("singletons"),
        max(col("sz")).as("max_bucket"),
        sum(expr("(sz * (sz - 1)) div 2")).as("cand_pairs"))
      .select(col("band").cast("long").as("band"), col("n_buckets"),
        col("n_docs"), col("singletons"), col("max_bucket"), col("cand_pairs"))
      .orderBy("band")
  }, Some {
    val P = graft.operators.Dedup.MinhashPrime
    val sigExprs = graft.operators.Dedup.minhashPermConsts(32).map { case (a, b) =>
      s"list_min(list_transform(hs, x -> (${a}*x + ${b}) % ${P}))"
    }.mkString(",\n        ")
    val bandVals = (0 until 8).map(b => s"($b)").mkString(",")
    s"""
    WITH sh AS (
      SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(w)-1, 1)),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w
            FROM documents)
      WHERE len(w) >= 3),
    xs AS (
      SELECT doc_id,
        list_transform(shingles, s ->
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, length(s)+1),
              i -> CAST(ascii(substring(s, i, 1)) AS BIGINT))),
            (a, b) -> (a*31 + b) % ${P})) AS hs
      FROM sh WHERE len(shingles) > 0),
    sigl AS (
      SELECT doc_id, [
        ${sigExprs}
      ] AS sig FROM xs),
    bands AS (
      SELECT doc_id, b.band AS band,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_slice(sig, b.band*4+1, b.band*4+4)),
          (acc, v) -> (acc*1048573 + v) % ${P}) AS bkey
      FROM sigl CROSS JOIN (VALUES ${bandVals}) b(band)),
    buckets AS (
      SELECT band, bkey, CAST(count(*) AS BIGINT) AS sz
      FROM bands GROUP BY 1, 2)
    SELECT CAST(band AS BIGINT) AS band,
      CAST(count(*) AS BIGINT) AS n_buckets,
      CAST(sum(sz) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singletons,
      CAST(max(sz) AS BIGINT) AS max_bucket,
      CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS cand_pairs
    FROM buckets GROUP BY band ORDER BY band
  """
  })

  /** Chapman capture–recapture estimate of the true distinct-content
    * population (Chapman 1951; the mark-recapture corpus-size audit:
    * "given what even- and odd-numbered sources share, how much
    * unique content exists that NO source has captured yet?").
    * Capture A = 8-token prefixes seen in even sources, capture B =
    * odd sources, marks = prefixes seen in BOTH.
    * N̂ = (nA+1)(nB+1)/(m+1) − 1 with the Seber variance; both are
    * double finishes over four exact integers. One token scan, one
    * prefix-grain aggregate — the q_prefix_dedup shape. */
  private val qCaptureRecapture = BoundQuery("q_capture_recapture", (s, d) => {
    val marks = Tables.documents(s, d)
      .select(array_join(slice(tokens(col("text")), 1, 8), " ").as("h"),
        expr("CAST(substring(source, 4) AS LONG) % 2").as("par"))
      .groupBy("h")
      .agg(max(when(col("par") === 0L, 1L).otherwise(0L)).as("inA"),
        max(when(col("par") === 1L, 1L).otherwise(0L)).as("inB"))
    marks.agg(sum(col("inA")).as("na"), sum(col("inB")).as("nb"),
        sum(col("inA") * col("inB")).as("m"))
      .select(col("na"), col("nb"), col("m"),
        round(expr("""(CAST(na + 1 AS DOUBLE) * CAST(nb + 1 AS DOUBLE))
          / CAST(m + 1 AS DOUBLE) - 1.0"""), 4).as("n_hat"),
        round(expr("""sqrt((CAST(na + 1 AS DOUBLE) * CAST(nb + 1 AS DOUBLE)
            * CAST(na - m AS DOUBLE) * CAST(nb - m AS DOUBLE))
          / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
             * CAST(m + 2 AS DOUBLE)))"""), 4).as("se_hat"))
  }, Some("""
    WITH docs AS (
      SELECT array_to_string(
          (list_filter(string_split(text,' '), x -> x <> ''))[1:8], ' ') AS h,
        CAST(substring(source, 4) AS BIGINT) % 2 AS par
      FROM documents),
    marks AS (
      SELECT h,
        CAST(max(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS BIGINT) AS inA,
        CAST(max(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS BIGINT) AS inB
      FROM docs GROUP BY h),
    m AS (
      SELECT CAST(sum(inA) AS BIGINT) AS na, CAST(sum(inB) AS BIGINT) AS nb,
        CAST(sum(inA * inB) AS BIGINT) AS m
      FROM marks)
    SELECT na, nb, m,
      round((CAST(na + 1 AS DOUBLE) * CAST(nb + 1 AS DOUBLE))
        / CAST(m + 1 AS DOUBLE) - 1.0, 4) AS n_hat,
      round(sqrt((CAST(na + 1 AS DOUBLE) * CAST(nb + 1 AS DOUBLE)
          * CAST(na - m AS DOUBLE) * CAST(nb - m AS DOUBLE))
        / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
           * CAST(m + 2 AS DOUBLE))), 4) AS se_hat
    FROM m
  """))

  /** Burrows' Delta authorship distance between sources (Burrows
    * 2002; Evert 2017 review): z-score each source's usage rate of
    * the corpus's top-20 tokens against the across-source
    * distribution, then Δ(a,b) = mean_t |z_a − z_b|. The stylometric
    * "which slices write alike" audit — duplicated/near-templated
    * sources sit at tiny Δ. Exactness: per-source token rates are
    * truncating ppm; z = (k·r − S)/√(kQ − S²) is one IEEE-exact-sqrt
    * double per cell over exact integers; each |z_a − z_b| is
    * micro-rounded ONCE and summed exactly, Δ finishing with one
    * truncating division. The (source × token) grid completes by a
    * bounded 20×20 cross join; pairs are k(k−1)/2 rows. */
  private val qBurrowsDelta = BoundQuery("q_burrows_delta", (s, d) => {
    val tok = graft.util.CacheScope.persist(
      Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("t")))
    val top = tok.groupBy("t").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("t")).limit(20)
      .select(col("t"))
    val srcTotals = tok.groupBy("source").agg(count(lit(1)).as("tot"))
    val grid = srcTotals.crossJoin(broadcast(top))
    val counts = tok.join(broadcast(top), "t")
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
    val rates = grid.join(counts, Seq("source", "t"), "left_outer")
      .select(col("source"), col("t"),
        expr("(1000000 * coalesce(c, 0L)) div tot").as("r"))
    val z = graft.util.CacheScope.persist(
      rates.groupBy("t")
        .agg(count(lit(1)).as("k"),
          sum(col("r")).as("sr"),
          sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("qr"))
        .join(rates, "t")
        .select(col("source"), col("t"),
          expr("""CAST(k AS DOUBLE) * CAST(r AS DOUBLE) - CAST(sr AS DOUBLE)""")
            .divide(expr("""sqrt(CAST(k AS DOUBLE) * CAST(qr AS DOUBLE)
              - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))""")).as("z")))
    z.as("a").join(z.as("b"),
        col("a.t") === col("b.t") && col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        expr("CAST(round(abs(a.z - b.z) * 1000000, 0) AS DECIMAL(38,0))")
          .as("zd"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_tokens"), sum(col("zd")).as("szd"))
      .select(col("src_a"), col("src_b"),
        expr("CAST(szd div n_tokens AS BIGINT)").as("delta_micro"))
      .orderBy(col("delta_micro"), col("src_a"), col("src_b"))
      .limit(10)
  }, Some("""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split(text,' '), x -> x <> ''))
        AS t
      FROM documents),
    top AS (
      SELECT t FROM (SELECT t, count(*) AS n FROM tok GROUP BY t
                     ORDER BY n DESC, t LIMIT 20)),
    st AS (SELECT source, CAST(count(*) AS BIGINT) AS tot FROM tok GROUP BY 1),
    grid AS (SELECT source, tot, t FROM st CROSS JOIN top),
    counts AS (
      SELECT source, t, CAST(count(*) AS BIGINT) AS c
      FROM tok JOIN top USING (t) GROUP BY 1, 2),
    rates AS (
      SELECT g.source, g.t,
        (1000000 * COALESCE(c.c, 0)) // g.tot AS r
      FROM grid g LEFT JOIN counts c ON g.source = c.source AND g.t = c.t),
    mom AS (
      SELECT t, CAST(count(*) AS BIGINT) AS k, CAST(sum(r) AS BIGINT) AS sr,
        CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT) AS qr
      FROM rates GROUP BY 1),
    z AS (
      SELECT source, rates.t,
        (CAST(k AS DOUBLE) * CAST(r AS DOUBLE) - CAST(sr AS DOUBLE))
          / sqrt(CAST(k AS DOUBLE) * CAST(qr AS DOUBLE)
                 - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)) AS z
      FROM rates JOIN mom ON rates.t = mom.t),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
        CAST(round(abs(a.z - b.z) * 1000000, 0) AS HUGEINT) AS zd
      FROM z a JOIN z b ON a.t = b.t AND a.source < b.source)
    SELECT src_a, src_b,
      CAST(sum(zd) // count(*) AS BIGINT) AS delta_micro
    FROM pairs GROUP BY 1, 2
    ORDER BY delta_micro, src_a, src_b LIMIT 10
  """))

  /** Hapax/dis legomena profile per source: the share of token TYPES
    * seen exactly once/twice — the classic productivity readout
    * (Baayen 2001) that separates template-stamped sources (tiny
    * hapax share) from genuinely productive text, and the direct
    * input to Good–Turing mass estimates (q_chao1's richness cousin
    * at the source grain). Fully integer: two cascaded counts and
    * truncating ppm divisions. */
  private val qHapax = BoundQuery("q_hapax", (s, d) => {
    Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_types"),
        sum(when(col("n") === 1L, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("n") === 2L, 1L).otherwise(0L)).as("dis"),
        sum(col("n")).as("n_tokens"))
      .select(col("source"), col("n_types"), col("hapax"), col("dis"),
        col("n_tokens"),
        expr("(1000000 * hapax) div n_types").as("hapax_type_ppm"),
        expr("(1000000 * hapax) div n_tokens").as("hapax_token_ppm"))
      .orderBy("source")
  }, Some("""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split(text,' '), x -> x <> ''))
        AS t
      FROM documents),
    tc AS (
      SELECT source, t, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY 1, 2),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_types,
        CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
        CAST(sum(n) AS BIGINT) AS n_tokens
      FROM tc GROUP BY 1)
    SELECT source, n_types, hapax, dis, n_tokens,
      (1000000 * hapax) // n_types AS hapax_type_ppm,
      (1000000 * hapax) // n_tokens AS hapax_token_ppm
    FROM g ORDER BY source
  """))

  /** Document-level term co-occurrence lift among the corpus's top-10
    * tokens: observed co-document count vs the independence
    * expectation n_a·n_b/N, as exact-ppm lift plus the micro-rounded
    * PMI — which vocabulary actually travels together at DOCUMENT
    * grain (q_pmi_collocations reads adjacency; this reads topics).
    * Presence sets are doc-distinct; the 45-pair join is top-k × top-k
    * bounded, never vocabulary-sized. */
  private val qTermCooccurrence = BoundQuery("q_term_cooccurrence", (s, d) => {
    val docTok = graft.util.CacheScope.persist(
      Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
        .distinct())
    val top = docTok.groupBy("t").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("t")).limit(10)
    val pres = graft.util.CacheScope.persist(docTok.join(broadcast(top), "t"))
    val tot = Tables.documents(s, d).agg(count(lit(1)).as("nn"))
    pres.as("a").join(pres.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("t_a"), col("b.t").as("t_b"))
      .agg(count(lit(1)).as("n_both"),
        max(col("a.n")).as("na"), max(col("b.n")).as("nb"))
      .crossJoin(broadcast(tot))
      .select(col("t_a"), col("t_b"), col("n_both"),
        expr("(1000000 * n_both * nn) div (na * CAST(nb AS DECIMAL(38,0)))")
          .cast("long").as("lift_ppm"),
        expr("""CAST(round(ln(CAST(n_both AS DOUBLE) * CAST(nn AS DOUBLE)
          / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) * 1000000, 0) AS LONG)""")
          .as("pmi_micronats"))
      .orderBy(desc("lift_ppm"), col("t_a"), col("t_b"))
  }, Some("""
    WITH docTok AS (
      SELECT DISTINCT doc_id, t FROM (
        SELECT doc_id,
          unnest(list_filter(string_split(text,' '), x -> x <> '')) AS t
        FROM documents)),
    top AS (
      SELECT t, CAST(count(*) AS BIGINT) AS n
      FROM docTok GROUP BY t ORDER BY n DESC, t LIMIT 10),
    pres AS (SELECT doc_id, docTok.t, n FROM docTok JOIN top USING (t)),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
    pairs AS (
      SELECT a.t AS t_a, b.t AS t_b, CAST(count(*) AS BIGINT) AS n_both,
        CAST(max(a.n) AS BIGINT) AS na, CAST(max(b.n) AS BIGINT) AS nb
      FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.t < b.t
      GROUP BY 1, 2)
    SELECT t_a, t_b, n_both,
      CAST((1000000 * n_both * nn) // (na * CAST(nb AS HUGEINT)) AS BIGINT)
        AS lift_ppm,
      CAST(round(ln(CAST(n_both AS DOUBLE) * CAST(nn AS DOUBLE)
        / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) * 1000000, 0) AS BIGINT)
        AS pmi_micronats
    FROM pairs, tot ORDER BY lift_ppm DESC, t_a, t_b
  """))

  /** UMass topic coherence of each source's top-5 tokens (Mimno et
    * al. 2011): treating a source's characteristic vocabulary as a
    * "topic", coherence = Σ_{i>j} ln((D(wᵢ,wⱼ)+1)/D(wⱼ)) over corpus
    * doc-frequencies — the standard "is this a coherent topic or
    * noise" gate, here auditing whether sources are topically tight.
    * Top-5 per source by in-source doc frequency (WindowGroupLimit,
    * token tie-break); pair doc-counts come from presence-set joins
    * restricted to the ≤100 selected tokens; each ln term is
    * micro-rounded once and summed exactly. */
  private val qTopicCoherence = BoundQuery("q_topic_coherence", (s, d) => {
    val docTok = graft.util.CacheScope.persist(
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("t"))
        .distinct())
    val topPerSource = docTok.groupBy("source", "t")
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(desc("n"), col("t"))))
      .where(col("rnk") <= 5)
      .select(col("source"), col("t"), col("rnk"))
    val sel = topPerSource.select("t").distinct()
    val pres = graft.util.CacheScope.persist(
      docTok.select("doc_id", "t").distinct().join(broadcast(sel), "t"))
    val dfT = pres.groupBy("t").agg(count(lit(1)).as("dfj"))
    val dPair = pres.as("a").join(pres.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.t") =!= col("b.t"))
      .groupBy(col("a.t").as("ti"), col("b.t").as("tj"))
      .agg(count(lit(1)).as("dij"))
    topPerSource.as("hi")
      .join(topPerSource.as("lo"),
        col("hi.source") === col("lo.source") && col("hi.rnk") > col("lo.rnk"))
      .select(col("hi.source").as("source"),
        col("hi.t").as("ti"), col("lo.t").as("tj"))
      .join(broadcast(dfT.select(col("t").as("tj"), col("dfj"))), Seq("tj"))
      .join(broadcast(dPair), Seq("ti", "tj"), "left_outer")
      .select(col("source"),
        expr("""CAST(round(ln((CAST(coalesce(dij, 0L) AS DOUBLE) + 1.0)
          / CAST(dfj AS DOUBLE)) * 1000000, 0) AS DECIMAL(38,0))""").as("term"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_pairs"),
        expr("CAST(sum(term) AS BIGINT)").as("coherence_micronats"))
      .orderBy("source")
  }, Some("""
    WITH docTok AS (
      SELECT DISTINCT doc_id, source, t FROM (
        SELECT doc_id, source,
          unnest(list_filter(string_split(text,' '), x -> x <> '')) AS t
        FROM documents)),
    tops AS (
      SELECT source, t, rnk FROM (
        SELECT source, t,
          row_number() OVER (PARTITION BY source
            ORDER BY count(*) DESC, t) AS rnk
        FROM docTok GROUP BY source, t)
      WHERE rnk <= 5),
    sel AS (SELECT DISTINCT t FROM tops),
    pres AS (
      SELECT DISTINCT doc_id, docTok.t
      FROM docTok JOIN sel ON docTok.t = sel.t),
    dfT AS (SELECT t, CAST(count(*) AS BIGINT) AS dfj FROM pres GROUP BY t),
    dPair AS (
      SELECT a.t AS ti, b.t AS tj, CAST(count(*) AS BIGINT) AS dij
      FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.t <> b.t
      GROUP BY 1, 2),
    terms AS (
      SELECT hi.source,
        CAST(round(ln((CAST(COALESCE(dij, 0) AS DOUBLE) + 1.0)
          / CAST(dfj AS DOUBLE)) * 1000000, 0) AS HUGEINT) AS term
      FROM tops hi JOIN tops lo
        ON hi.source = lo.source AND hi.rnk > lo.rnk
      JOIN dfT ON dfT.t = lo.t
      LEFT JOIN dPair ON dPair.ti = hi.t AND dPair.tj = lo.t)
    SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
      CAST(sum(term) AS BIGINT) AS coherence_micronats
    FROM terms GROUP BY source ORDER BY source
  """))

  val all: Seq[BoundQuery] = Seq(qTextrank, qCentroidDrift,
    qMinhashBandStats, qCaptureRecapture, qBurrowsDelta, qHapax,
    qTermCooccurrence, qTopicCoherence)
}
