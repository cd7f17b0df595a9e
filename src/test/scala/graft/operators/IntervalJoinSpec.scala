package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Losslessness and exactness of the bucket-blocked interval-overlap
  * join, against brute force on adversarial fixtures (boundary
  * touches, bucket straddles, nested spans, negative coordinates). */
class IntervalJoinSpec extends AnyFunSuite {

  import spark.implicits._

  private def brute(a: Seq[(Long, Long, Long, Long)],
                    b: Seq[(Long, Long, Long, Long)]) =
    (for {
      (ka, ia, sa, ea) <- a
      (kb, ib, sb, eb) <- b
      if ka == kb && sa <= eb && sb <= ea
    } yield (ka, ia, ib, math.min(ea, eb) - math.max(sa, sb))).toSet

  private def run(a: Seq[(Long, Long, Long, Long)],
                  b: Seq[(Long, Long, Long, Long)], width: Long) =
    IntervalJoin.overlapPairs(
        a.toDF("key", "id", "start", "end"),
        b.toDF("key", "id", "start", "end"), width)
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("a_id"),
        r.getAs[Long]("b_id"), r.getAs[Long]("overlap"))).toSet

  test("random fixture matches brute force at several bucket widths") {
    val rnd = new scala.util.Random(7)
    val a = (0 until 120).map(i =>
      (rnd.nextInt(5).toLong, i.toLong,
        rnd.nextInt(1000).toLong - 300, 0L)).map {
      case (k, i, s, _) => (k, i, s, s + rnd.nextInt(200)) }
    val b = (0 until 120).map(i =>
      (rnd.nextInt(5).toLong, i.toLong,
        rnd.nextInt(1000).toLong - 300, 0L)).map {
      case (k, i, s, _) => (k, i, s, s + rnd.nextInt(200)) }
    val want = brute(a, b)
    assert(want.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 1000L, 100000L))
      assert(run(a, b, w) == want, s"width $w")
  }

  test("boundary semantics: touching endpoints overlap with length 0") {
    val a = Seq((1L, 1L, 0L, 10L))
    val b = Seq((1L, 2L, 10L, 20L), (1L, 3L, 11L, 20L))
    assert(run(a, b, 4L) == Set((1L, 1L, 2L, 0L)))
  }

  test("pairs meeting in many buckets emit exactly once") {
    val a = Seq((1L, 1L, 0L, 1000L))
    val b = Seq((1L, 2L, 0L, 1000L))
    assert(run(a, b, 10L) == Set((1L, 1L, 2L, 1000L)))
  }
}
