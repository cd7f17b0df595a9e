package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for q_tree_depth2: an exact local replay of the greedy
  * Gini growth plus the conservation laws of a partition tree. */
class TreeSpec extends AnyFunSuite {

  test("tree_depth2: exact greedy replay and partition conservation") {
    val base = graft.sources.Tables.orders(spark, sfTiny)
      .join(graft.sources.Tables.customer(spark, sfTiny),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"),
        (col("o_orderstatus") === "F").cast("long").as("bad"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def score(rows: Seq[(String, String, Long)], f: Int, v: String)
        : Option[(BigInt, String, String)] = {
      val (in, out) = rows.partition(r => (if (f == 0) r._1 else r._2) == v)
      if (in.isEmpty || out.isEmpty) None else {
        def a(g: Seq[(String, String, Long)]) = {
          val n = BigInt(g.size); val b = BigInt(g.map(_._3).sum)
          val gd = n - b
          (n, n * n - gd * gd - b * b)
        }
        val (nl, al) = a(in); val (nr, ar) = a(out)
        Some((BigInt(1000) * (al * nr + ar * nl) / (nl * nr),
          if (f == 0) "seg" else "pri", v))
      }
    }
    def best(rows: Seq[(String, String, Long)]) =
      (for {
        f <- 0 to 1
        v <- rows.map(r => if (f == 0) r._1 else r._2).distinct
        s <- score(rows, f, v)
      } yield s).minBy { case (s, f, v) => (s, f, v) }
    val (s1, f1, v1) = best(base)
    val (left, right) = base.partition(r =>
      (if (f1 == "seg") r._1 else r._2) == v1)
    val rows = graft.queries.Registry.queries("q_tree_depth2")(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("root", "L", "R", "LL", "LR", "RL", "RR"))
    val root = rows("root")
    assert(root.getAs[String]("split_feature") == f1)
    assert(root.getAs[String]("split_value") == v1)
    assert(BigInt(root.getAs[Long]("score_milli")) == s1)
    assert(root.getAs[Long]("n") == base.size)
    for ((side, subset) <- Seq("L" -> left, "R" -> right)) {
      val (s2, f2, v2) = best(subset)
      val node = rows(side)
      assert(node.getAs[String]("split_feature") == f2, side)
      assert(node.getAs[String]("split_value") == v2, side)
      assert(BigInt(node.getAs[Long]("score_milli")) == s2, side)
      assert(node.getAs[Long]("n") == subset.size)
      val (ll, lr) = subset.partition(r =>
        (if (f2 == "seg") r._1 else r._2) == v2)
      assert(rows(side + "L").getAs[Long]("n") == ll.size)
      assert(rows(side + "R").getAs[Long]("n") == lr.size)
      assert(rows(side + "L").getAs[Long]("n_bad") == ll.map(_._3).sum)
      assert(rows(side + "R").getAs[Long]("n_bad") == lr.map(_._3).sum)
    }
    // conservation: children partition each parent
    assert(rows("L").getAs[Long]("n") + rows("R").getAs[Long]("n") ==
      rows("root").getAs[Long]("n"))
    assert(Seq("LL", "LR", "RL", "RR").map(rows(_).getAs[Long]("n")).sum ==
      rows("root").getAs[Long]("n"))
  }

  test("gbm_boost: training MSE never increases across stages") {
    val rows = graft.queries.Registry.queries("q_gbm_boost")(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("init", "round1", "round2"))
    val m0 = rows("init").getAs[Long]("mse_c2")
    val m1 = rows("round1").getAs[Long]("mse_c2")
    val m2 = rows("round2").getAs[Long]("mse_c2")
    // L2 boosting with a half-step side-mean update can only shrink
    // the quadratic (up to the 1-cent truncation of the predictions)
    assert(m1 <= m0 && m2 <= m1, s"$m0 -> $m1 -> $m2")
    // init prediction is the exact global mean
    val base = graft.sources.Tables.orders(spark, sfTiny)
      .join(graft.sources.Tables.customer(spark, sfTiny),
        col("o_custkey") === col("c_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("s"),
        count(lit(1)).as("n")).collect().head
    assert(rows("init").getAs[Long]("base_pred_c") ==
      base.getAs[Long]("s") / base.getAs[Long]("n"))
    for (st <- Seq("round1", "round2"))
      assert(rows(st).getAs[String]("split_feature") != null)
  }
}
