package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._

/** Pins operators.DbscanGrid's algorithmic laws — the oracle proves
  * engine equality on the bound query; these prove the MATH on the
  * real data plus a hand-built fixture with known answers. */
class DbscanSpec extends AnyFunSuite {

  private val epsU = 15000L
  private def pts = graft.sources.Tables.embeddings(spark, sfTiny)
    .select(col("vec_id"),
      (round(element_at(col("embedding"), 1).cast("double") * 1e6, 0).cast("long")
        + 1000000L).as("x"),
      (round(element_at(col("embedding"), 2).cast("double") * 1e6, 0).cast("long")
        + 1000000L).as("y"))

  test("grid blocking is lossless: pairs == brute-force pairs") {
    val rows = pts.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("x"), r.getAs[Long]("y")))
    val brute = (for {
      (ia, xa, ya) <- rows; (ib, xb, yb) <- rows
      if ia < ib && (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= epsU * epsU
    } yield (ia, ib)).toSet
    // re-derive the operator's internal pair set from its outputs:
    // degree law below needs it; here recompute via the public API by
    // running with minPts=1 (every paired point becomes core) and
    // checking the neighbor counts match brute-force degrees.
    val out = DbscanGrid.cluster(pts, col("vec_id"), col("x"), col("y"), epsU, 1)
      .collect()
    val bruteDeg = brute.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    // minPts=1: every point is core (self counts); cluster = min id of
    // its ε-connected component over brute pairs
    assert(out.length == rows.length)
    assert(out.forall(_.getAs[String]("role") == "core"))
    // components from brute pairs (union-find)
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
    def find(a: Long): Long = { var x = a; while (parent(x) != x) x = parent(x); x }
    brute.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = rows.map(r => r._1 -> find(r._1)).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Long]("cluster_id") == comp(id),
        s"component mismatch for $id — grid join dropped a pair")
    }
    assert(bruteDeg.values.sum == brute.size * 2)
  }

  test("roles partition the points and obey the density laws") {
    val out = DbscanGrid.cluster(pts, col("vec_id"), col("x"), col("y"), epsU, 5)
      .collect()
    val n = pts.count()
    assert(out.length == n, "output must cover every point exactly once")
    val byRole = out.groupBy(_.getAs[String]("role")).view.mapValues(_.length).toMap
    assert(byRole.keySet.subsetOf(Set("core", "border", "noise")))
    assert(byRole.getOrElse("core", 0) > 0)
    // every non-noise point has a cluster id; noise has none
    out.foreach { r =>
      val cl = Option(r.get(r.fieldIndex("cluster_id")))
      if (r.getAs[String]("role") == "noise") assert(cl.isEmpty)
      else assert(cl.nonEmpty)
    }
    // cluster representatives are themselves core members of the cluster
    val coreIds = out.filter(_.getAs[String]("role") == "core")
      .map(_.getAs[Long]("id")).toSet
    val reps = out.filter(_.getAs[String]("role") != "noise")
      .map(_.getAs[Long]("cluster_id")).toSet
    assert(reps.subsetOf(coreIds), "cluster id must be a core point's id")
  }

  test("hand fixture: two blobs + an isolated point give 2 clusters + noise") {
    import spark.implicits._
    // blob A around (0,0): 5 mutually-in-range points; blob B around
    // (10ε, 10ε); one far straggler within ε of blob A's edge point
    // (border), one isolated (noise).
    val eps = 100L
    val a = Seq((1L, 0L, 0L), (2L, 50L, 0L), (3L, 0L, 50L), (4L, 50L, 50L), (5L, 25L, 25L))
    val b = Seq((11L, 1000L, 1000L), (12L, 1050L, 1000L), (13L, 1000L, 1050L),
      (14L, 1050L, 1050L), (15L, 1025L, 1025L))
    val border = Seq((21L, 150L, 0L))   // within ε only of id=2 (dist 100)
    val noise = Seq((31L, 5000L, 5000L))
    val df = (a ++ b ++ border ++ noise).toDF("vec_id", "x", "y")
    val out = DbscanGrid.cluster(df, col("vec_id"), col("x"), col("y"), eps, 5)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("role"), Option(r.get(r.fieldIndex("cluster_id"))))).toMap
    a.foreach { case (id, _, _) => assert(out(id) == (("core", Some(1L))), s"id $id") }
    b.foreach { case (id, _, _) => assert(out(id) == (("core", Some(11L))), s"id $id") }
    assert(out(21L) == (("border", Some(1L))))
    assert(out(31L) == (("noise", None)))
  }
}
