package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for q_kmeanspp (farthest-first seeding) and
  * q_mixture_rates (water-filling sampling rates). */
class SeedingMixtureSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("kmeanspp: exact farthest-first replay; radius curve non-increasing") {
    val vs = graft.sources.Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => BigInt(math.round(x.toDouble * 1e6))).toArray)
      .sortBy(_._1)
    def sq(a: Array[BigInt], b: Array[BigInt]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var seeds = Seq(vs.head._1)
    var dmin = vs.map { case (id, v) => id -> sq(v, vs.head._2) }.toMap
    var sel = Seq((1L, vs.head._1, BigInt(0)))
    val byId = vs.toMap
    for (k <- 2 to 4) {
      val (nid, nd) = dmin.toSeq.maxBy { case (id, dd) => (dd, -id) }
      sel :+= ((k.toLong, nid, nd))
      seeds :+= nid
      dmin = dmin.map { case (id, dd) => id -> dd.min(sq(byId(id), byId(nid))) }
    }
    val got = run("q_kmeanspp").sortBy(_.getAs[Long]("seed_rank"))
      .map(r => (r.getAs[Long]("seed_rank"), r.getAs[Long]("vec_id"),
        BigInt(r.getAs[Long]("sel_dist"))))
    assert(got.toSeq == sel)
    // Gonzalez radius curve: each later seed is no farther than the prior
    val ds = sel.drop(1).map(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    assert(got.map(_._2).distinct.length == 4, "seeds must be distinct")
  }

  test("mixture_rates: water-filling laws and local replay") {
    val sizes = graft.sources.Tables.documents(spark, sfTiny)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = sizes.values.sum
    val b = n / 2
    val k = sizes.size.toLong
    // local replay of the cut
    val sorted = sizes.toSeq.sortBy { case (s, c) => (c, s) }
    val caps = sorted.indices.map { m =>
      val pref = sorted.take(m).map(_._2).sum
      (m, (b - pref) / (k - m))
    }
    val cut = caps.find { case (m, cap) =>
      (m == 0 || sorted(m - 1)._2 <= cap) && cap < sorted(m)._2 }.get
    val rows = run("q_mixture_rates")
    assert(rows.length == sizes.size)
    var kept = 0L
    for (r <- rows) {
      val src = r.getString(0)
      val nd = r.getAs[Long]("n_docs"); val kd = r.getAs[Long]("kept_docs")
      assert(nd == sizes(src))
      val rank = sorted.indexWhere(_._1 == src)
      val expect = if (rank < cut._1) nd else cut._2
      assert(kd == expect, s"$src")
      assert(r.getAs[Long]("rate_ppm") == 1000000L * kd / nd)
      assert(r.getAs[Long]("budget_docs") == b)
      kept += kd
    }
    // budget met to within the truncation slack of the capped sources
    assert(kept <= b && kept >= b - k)
    // every capped source keeps the same count (max-uniformity)
    val capped = rows.filter(r =>
      r.getAs[Long]("kept_docs") < r.getAs[Long]("n_docs"))
      .map(_.getAs[Long]("kept_docs")).distinct
    assert(capped.length <= 1)
  }
}
