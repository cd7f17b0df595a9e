package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Invariants for the commerce-analytics wave (queries.EconQueries). */
class EconSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("funnel_sig: arm counts partition q_funnel's step totals") {
    val funnel = run("q_funnel")
      .map(r => r.getString(0) -> r.getAs[Long]("users")).toMap
    val rows = run("q_funnel_sig").map(r => r.getString(0) -> r).toMap
    val vc = rows("view_to_click"); val cp = rows("click_to_purchase")
    assert(vc.getAs[Long]("n_a") + vc.getAs[Long]("n_b") == funnel("1_view"))
    assert(vc.getAs[Long]("conv_a") + vc.getAs[Long]("conv_b") ==
      funnel("2_click"))
    assert(cp.getAs[Long]("n_a") + cp.getAs[Long]("n_b") ==
      funnel("2_click"))
    assert(cp.getAs[Long]("conv_a") + cp.getAs[Long]("conv_b") ==
      funnel("3_purchase"))
    for (r <- rows.values) assert(r.getAs[Long]("z2_milli") >= 0)
  }

  test("elasticity: exact micro-nat moment replay per brand") {
    val data = graft.sources.Tables.part(spark, sfTiny)
      .join(graft.sources.Tables.lineitem(spark, sfTiny)
        .groupBy(col("l_partkey"))
        .agg(sum(round(col("l_quantity") * 100, 0).cast("long")).as("qc")),
        col("p_partkey") === col("l_partkey"))
      .where(col("qc") > 0)
      .select(col("p_brand"), col("p_retailprice"), col("qc"))
      .collect()
      .map(r => (r.getString(0),
        BigInt(math.round(math.log(r.getDouble(1)) * 1e6)),
        BigInt(math.round(math.log(r.getLong(2).toDouble / 100.0) * 1e6))))
    val rows = run("q_elasticity").map(r => r.getString(0) -> r).toMap
    for ((brand, g) <- data.groupBy(_._1)) {
      val n = BigInt(g.length)
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val slope = BigInt(1000000) * (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val r = rows(brand)
      assert(r.getAs[Long]("n_parts") == g.length, brand)
      assert(BigInt(r.getAs[Long]("elasticity_ppm")) == slope, brand)
    }
  }

  test("xyz_class: classes partition the sold parts; labels well-formed") {
    val soldParts = graft.sources.Tables.lineitem(spark, sfTiny)
      .select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val rows = run("q_xyz_class")
    assert(rows.map(_.getAs[Long]("n_parts")).sum == soldParts)
    assert(rows.forall(r => Set("X", "Y", "Z")(r.getString(1))))
    assert(rows.forall(_.getAs[Long]("qty_c") > 0))
  }
}
