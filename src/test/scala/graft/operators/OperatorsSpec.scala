package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark._
import graft.functions.Num

class OperatorsSpec extends AnyFunSuite {

  private lazy val cust = graft.sources.Tables.customer(spark, sfTiny)

  test("Pagination.page returns disjoint ordered pages") {
    val p1 = Pagination.page(cust, Seq(col("c_custkey")), 1, 10)
      .select("c_custkey").collect().map(_.getLong(0)).toSeq
    val p2 = Pagination.page(cust, Seq(col("c_custkey")), 2, 10)
      .select("c_custkey").collect().map(_.getLong(0)).toSeq
    assert(p1.size == 10 && p2.size == 10)
    assert(p1 == p1.sorted && p2 == p2.sorted)
    assert(p1.toSet.intersect(p2.toSet).isEmpty)
    assert(p1.max < p2.min)
  }

  test("Pagination.keysetPage seeks past lastSeen") {
    val first = Pagination.keysetPage(cust, col("c_custkey"), None, 10)
      .select("c_custkey").collect().map(_.getLong(0)).toSeq
    val next = Pagination.keysetPage(cust, col("c_custkey"), Some(lit(first.max)), 10)
      .select("c_custkey").collect().map(_.getLong(0)).toSeq
    assert(next.min > first.max)
    // keyset page == offset page 2 (same ordering, same data)
    val offset = Pagination.page(cust, Seq(col("c_custkey")), 2, 10)
      .select("c_custkey").collect().map(_.getLong(0)).toSeq
    assert(next == offset)
  }

  test("TopKPerGroup caps rows per group with dense ranks") {
    val df = TopKPerGroup.topK(cust, Seq(col("c_mktsegment")),
      Seq(desc("c_acctbal"), col("c_custkey")), 3)
    val got = df.groupBy("c_mktsegment").count().collect()
    assert(got.forall(_.getAs[Long]("count") <= 3))
  }

  test("Search combines keyword OR tokens AND range, dedups key") {
    val part = graft.sources.Tables.part(spark, sfTiny)
    val res = Search.search(part,
      keyword = Some("red"), keywordFields = Seq(col("p_name")),
      range = Some((col("p_retailprice"), lit(0.0), lit(10000.0))),
      tokenCol = Some(col("p_brand")), tokens = Seq("Brand#1"),
      dedupKey = Seq("p_partkey")).collect()
    assert(res.nonEmpty)
    assert(res.forall { r =>
      r.getAs[String]("p_name").toLowerCase.contains("red") ||
      r.getAs[String]("p_brand") == "Brand#1"
    })
    val keys = res.map(_.getAs[Long]("p_partkey"))
    assert(keys.distinct.length == keys.length)
  }

  test("AsOfJoin: purchases match themselves; non-purchase events get latest prior") {
    val ev = graft.sources.Tables.events(spark, sfTiny)
      .select("event_id", "user_id", "ts_ns", "event_type")
    val purchases = ev.where(col("event_type") === "purchase")
    val joined = AsOfJoin.lastAtOrBefore(ev, purchases,
      col("user_id"), col("ts_ns"), col("event_id"), "purchase_id").collect()
    val selfMatch = joined.filter(_.getAs[String]("event_type") == "purchase")
    assert(selfMatch.nonEmpty)
    assert(selfMatch.forall(r =>
      r.getAs[Long]("asof_purchase_id") == r.getAs[Long]("event_id")))
    // a user's first event before any purchase has a null asof id
    assert(joined.exists(_.isNullAt(joined.head.fieldIndex("asof_purchase_id"))))
  }

  test("approx_count_distinct lands within 5% of exact") {
    // the gate's 15% (3σ) envelope booleans
    val r = graft.queries.Registry.queries("q_approx_distinct")(spark, sfTiny).collect()(0)
    assert(r.getAs[Long]("exact_users") > 0)
    assert(r.getAs[Boolean]("users_in_envelope"))
    assert(r.getAs[Boolean]("orders_in_envelope"))
    // and the raw estimate is in fact much tighter at this sf
    val o = graft.sources.Tables.orders(spark, sfTiny)
    val row = o.agg(
      approx_count_distinct(col("o_custkey")).as("a"),
      countDistinct(col("o_custkey")).as("e")).collect()(0)
    val (approx, exact) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact <= 0.05, s"approx $approx vs exact $exact")
  }

  test("Num.cents is an exact per-row integer scale") {
    val df = spark.range(1).select(
      Num.cents(lit(185.22)).as("a"), Num.cents(lit(9.64)).as("b"),
      Num.cents(lit(-3.555)).as("c"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 18522L && r.getLong(1) == 964L)
  }
}
