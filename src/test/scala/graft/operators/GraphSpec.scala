package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark._

/** Graph primitives pinned against plain-Scala references on seeded
  * random graphs — same integer recurrences, independent code. */
class GraphSpec extends AnyFunSuite {

  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  /** Random undirected graph: 60 nodes, ~150 edges, plus a hub
    * (node 0 connected to 20 others) to exercise skew paths. */
  private val undirected: Seq[(String, String)] = {
    val random = (0 until 150).map { _ =>
      (s"n${rnd.nextInt(60)}", s"n${rnd.nextInt(60)}")
    }
    val hub = (1 to 20).map(i => ("n0", s"n$i"))
    (random ++ hub).filter(e => e._1 != e._2).distinct
  }
  private val symmetric: Seq[(String, String)] =
    (undirected ++ undirected.map(_.swap)).distinct

  test("pageRank equals the plain-Scala integer recurrence") {
    val scale = Graph.DefaultScale
    val iters = 6
    val edges = symmetric
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var ranks: Map[String, Long] = nodes.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      val in = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      edges.foreach { case (s, t) => in(t) += ranks(s) / deg(s) }
      ranks = nodes.map(n => n -> (15L * scale / 100L + 85L * in(n) / 100L)).toMap
    }
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == ranks)
    // the hub outranks every leaf it feeds
    assert((1 to 20).forall(i => got("n0") >= got(s"n$i") || deg(s"n$i") > deg("n0")))
  }

  test("pageRankUntil: early exit on residual, exact parity with the fixed unroll") {
    val edges = symmetric.toDF("src", "dst")
    // a loose threshold stops at the FIRST probe: exactly checkEvery
    // rounds run, and the ranks equal pageRank at that round count
    val (r4, n4, res4) = Graph.pageRankUntil(edges, "src", "dst",
      residualPpm = 1000000L, maxIters = 50, checkEvery = 4)
    assert(n4 == 4, s"loose threshold must stop at the first probe, ran $n4")
    val fixed4 = Graph.pageRank(edges, "src", "dst", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got4 = r4.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got4 == fixed4, "segmented lazy-checkpoint unroll must be bit-identical")
    // an unreachable threshold runs to maxIters; the residual at 8
    // rounds must be tighter than at 4 (monotone contraction — the
    // property q_pagerank_converge measures on the testdata graph)
    val (_, n8, res8) = Graph.pageRankUntil(edges, "src", "dst",
      residualPpm = 0L, maxIters = 8, checkEvery = 4)
    assert(n8 == 8)
    assert(res8 < res4, s"residual must contract: r4=$res4 ppm, r8=$res8 ppm")
    // a threshold between the two residuals exits at 8, not 50
    val (_, nMid, resMid) = Graph.pageRankUntil(edges, "src", "dst",
      residualPpm = (res8 + res4) / 2, maxIters = 50, checkEvery = 4)
    assert(nMid == 8 && resMid <= (res8 + res4) / 2,
      s"mid threshold must exit at the second probe: ran $nMid, resid $resMid")
  }

  test("pageRankUntil residual stays exact on hub-heavy diffs (no long overflow)") {
    // a 2000-leaf star (symmetrized): the hub's round-over-round rank
    // diff is hundreds of times DefaultScale, so `linf * 1e6` would
    // wrap a long negative and fake instant convergence (review fix —
    // the residual is now BigInt-exact)
    val star = (1 to 2000).flatMap(i => Seq(("hub", s"l$i"), (s"l$i", "hub")))
      .toDF("src", "dst")
    val (_, n, resid) = Graph.pageRankUntil(star, "src", "dst",
      residualPpm = 0L, maxIters = 2, checkEvery = 1)
    assert(n == 2, s"zero threshold must run to maxIters, ran $n")
    assert(resid > 0L, s"hub-graph residual must stay positive, got $resid")
    assert(resid > 1000000L,
      s"round-2 hub diff is many times the base mass; got $resid ppm")
  }

  test("triangleCount equals the naive enumeration, any input orientation") {
    val canon = undirected.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    val es = canon.toSet
    val ns = canon.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val naive = (for {
      i <- ns.indices; j <- (i + 1) until ns.size; k <- (j + 1) until ns.size
      if es(( ns(i), ns(j) )) && es(( ns(j), ns(k) )) && es(( ns(i), ns(k) ))
    } yield 1).size.toLong
    // feed a messy orientation: random direction per edge + some dupes
    val messy = undirected ++ undirected.take(40).map(_.swap)
    val row = Graph.triangleCount(messy.toDF("a", "b"), "a", "b").collect()(0)
    assert(row.getAs[Long]("triangles") == naive)
    assert(row.getAs[Long]("nodes") == ns.size.toLong)
    assert(row.getAs[Long]("edges") == canon.size.toLong)
  }

  test("bfsHops equals plain BFS and omits unreachable nodes") {
    // directed chain with a branch and an island
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e",
      "a" -> "x", "x" -> "d",          // shortcut: d at hop 2, e at 3
      "i1" -> "i2")                    // unreachable island
    val sources = Seq("a")
    def bfs(maxHops: Int): Map[String, Long] = {
      var dist = Map("a" -> 0L)
      (1 to maxHops).foreach { h =>
        edges.foreach { case (s, t) =>
          if (dist.contains(s) && dist(s) == h - 1 && !dist.contains(t))
            dist += t -> h.toLong
        }
      }
      dist
    }
    val got = Graph.bfsHops(edges.toDF("src", "dst"), "src", "dst",
        sources.toDF("node"), "node", maxHops = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == bfs(10))
    assert(!got.contains("i1") && !got.contains("i2"))
    // hop bound respected when tighter than the diameter
    val capped = Graph.bfsHops(edges.toDF("src", "dst"), "src", "dst",
        sources.toDF("node"), "node", maxHops = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped == Map("a" -> 0L, "b" -> 1L, "x" -> 1L))
  }

  test("bfsHops on the symmetric random graph matches reference") {
    val edges = symmetric
    val sources = Seq("n0", "n1")
    def bfs(maxHops: Int): Map[String, Long] = {
      var dist: Map[String, Long] = sources.map(_ -> 0L).toMap
      var frontier = sources.toSet
      var h = 1L
      while (h <= maxHops && frontier.nonEmpty) {
        val next = edges.filter(e => frontier(e._1) && !dist.contains(e._2))
          .map(_._2).toSet
        dist ++= next.map(_ -> h)
        frontier = next
        h += 1
      }
      dist
    }
    val got = Graph.bfsHops(edges.toDF("src", "dst"), "src", "dst",
        sources.toDF("node"), "node", maxHops = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == bfs(4))
  }

  test("kCore fixpoint equals plain-Scala peeling and satisfies the core property") {
    // canonical a<b distinct edges
    val canon = undirected.map(e => if (e._1 < e._2) e else e.swap).distinct
    def peel(k: Int): Map[String, Int] = {
      var alive = canon
      var changed = true
      while (changed) {
        val deg = alive.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = alive.filter(e => keep(e._1) && keep(e._2))
        changed = next.size != alive.size
        alive = next
      }
      alive.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
    }
    val k = 3
    val got = Graph.kCore(canon.toDF("a", "b"), "a", "b", k)
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(got == peel(k), "engine k-core differs from plain-Scala peeling")
    // the defining property: every surviving node keeps >= k surviving edges
    assert(got.values.forall(_ >= k))
    // bounded twin converges to the same fixpoint once rounds suffice
    val bounded = Graph.kCore(canon.toDF("a", "b"), "a", "b", k, maxRounds = 50)
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(bounded == got)
  }

  test("katz: local walk-count replay over the bipartite testdata graph") {
    import org.apache.spark.sql.functions._
    val sp = graft.sources.Tables.lineitem(spark, graft.TestSpark.sfTiny)
      .select(concat(lit("s"), col("l_suppkey")).as("a"),
        concat(lit("p"), col("l_partkey")).as("b"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val adj = (sp ++ sp.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val w1 = adj.view.mapValues(ns => BigInt(ns.size)).toMap
    def step(w: Map[String, BigInt]): Map[String, BigInt] =
      adj.view.mapValues(ns => ns.map(w).sum).toMap
    val w2 = step(w1); val w3 = step(w2)
    val katz = adj.keys.map(v =>
      v -> (w1(v) * 100 + w2(v) * 10 + w3(v))).toMap
    val expectTop = katz.toSeq.sortBy { case (v, k) => (-k, v) }.take(50)
    val got = graft.queries.Registry.queries("q_katz")(
      spark, graft.TestSpark.sfTiny).collect()
      .map(r => (r.getAs[String]("node"), BigInt(r.getAs[Long]("katz_milli"))))
    assert(got.toSeq == expectTop)
  }
}
