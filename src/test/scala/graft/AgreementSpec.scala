package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for the survey-statistics wave (queries.AgreementQueries). */
class AgreementSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("ipf_raking: one sweep lands the COLUMN margins on target exactly-ish") {
    val rows = run("q_ipf_raking")
    assert(rows.length > 1)
    val cells = rows.map(r => (r.getString(0), r.getString(1),
      r.getAs[Long]("n"), r.getAs[Long]("w_ppm")))
    val total = cells.map(_._3).sum
    val kc = cells.map(_._2).distinct.length
    val target = 1000000L * total / kc
    // after the column pass, each column's weighted mass matches the
    // target within per-cell truncation slack (< 1 ppm per cell)
    for ((p, cs) <- cells.groupBy(_._2)) {
      val mass = cs.map(c => BigInt(c._3) * c._4).sum
      assert((BigInt(target) - mass).abs <= cs.map(c => BigInt(c._3)).sum,
        s"col $p mass $mass vs $target")
    }
    // raking upweights under-represented rows: weight orders inversely
    // with row size
    val rowSize = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val rowW = cells.groupBy(_._1).view
      .mapValues(cs => cs.map(_._4).sum / cs.length).toMap
    val bySize = rowSize.toSeq.sortBy(_._2).map(_._1)
    assert(rowW(bySize.head) >= rowW(bySize.last),
      "smallest row must not get the smallest weight")
  }

  test("fleiss_kappa: exact replay from the three raters") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.langId(
          graft.functions.TextFunctions.tokens(col("text"))).as("p1"),
        graft.functions.TextFunctions.langId(
          graft.functions.TextFunctions.tokens(
            substring(col("text"), 1, 120))).as("p2"))
      .collect()
      .map(r => (r.getLong(0), Seq(r.getString(1), r.getString(2), r.getString(3))))
    val n = BigInt(docs.length)
    val sp = docs.map { case (_, rs) =>
      rs.groupBy(identity).values.map(g => BigInt(g.size) * g.size).sum - 3
    }.sum
    val c2 = docs.flatMap(_._2).groupBy(identity).values
      .map(g => BigInt(g.size) * g.size).sum
    val kappa = BigInt(1000000) * (3 * n * sp - 2 * c2) / (18 * n * n - 2 * c2)
    val row = run("q_fleiss_kappa").head
    assert(row.getAs[Long]("n_docs") == docs.length)
    assert(BigInt(row.getAs[Long]("sp")) == sp)
    assert(BigInt(row.getAs[Long]("c2")) == c2)
    assert(BigInt(row.getAs[Long]("kappa_ppm")) == kappa)
    assert(BigInt(row.getAs[Long]("p_bar_ppm")) ==
      BigInt(1000000) * sp / (6 * n))
    // κ is bounded above by 1
    assert(row.getAs[Long]("kappa_ppm") <= 1000000L)
  }
}
