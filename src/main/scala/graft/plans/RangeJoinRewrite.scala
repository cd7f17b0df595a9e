package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite point-in-interval joins
  * (`p >= lo AND p <= hi`, i.e. BETWEEN — no equi keys) from the
  * BroadcastNestedLoopJoin Spark would otherwise plan into the
  * bucketed equi-join shape of operators.RangeJoin:
  *
  *   points ⋈[p∈[lo,hi]] ranges
  *     ⇒ Project(Join(points + bucket(p),
  *                    Generate(explode(sequence(bucket(lo), bucket(hi))), ranges),
  *                    bucket = bucket AND p∈[lo,hi]))
  *
  * The residual BETWEEN stays in the join condition, so the rewrite is
  * an identity on results; the added equality turns an O(|points| x
  * |ranges|) nested loop into a shuffle/broadcast HASH join on bucket
  * id — the difference between hours and seconds once either side
  * stops fitting in one broadcast.
  *
  * Registered via GraftExtensions (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations`. Bucket width comes from
  * `spark.graft.rangeJoin.bucketWidth` (default 10000.0; pick ~the
  * median interval width). Disable with
  * `spark.graft.rangeJoin.enabled=false`.
  *
  * Sizing: each range row explodes into (hi-lo)/bucketWidth buckets.
  * Rows whose span exceeds `spark.graft.rangeJoin.maxBucketsPerRow`
  * (default 10000) are split off into a nested-loop fallback branch
  * (a Union of bucketed-join-on-small-spans and plain-join-on-huge-
  * spans): a width orders of magnitude below some outlier interval's
  * span can therefore never turn a working (slow) query into a
  * Sequence runtime failure or an executor OOM — the rewrite
  * degrades, worst case, to exactly the nested loop it replaces, and
  * only for the outlier rows. Set the width per workload (it is a
  * runtime conf) to keep the fallback branch empty.
  *
  * Re-application is self-guarding: the rewritten bucketed join's
  * condition gains a top-level equality conjunct and the fallback
  * join's a top-level span-guard conjunct — either breaks the
  * two-comparison BETWEEN shape the matcher requires, so transform's
  * descent into the rewritten children cannot match again.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private def conf(key: String, default: String): String =
    SQLConf.get.getConfString(s"spark.graft.rangeJoin.$key", default)

  def apply(plan: LogicalPlan): LogicalPlan =
    if (conf("enabled", "true") != "true") plan
    else plan.transform {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        extract(cond, l, r)
          .map { case (p, lo, hi) => rewrite(j.output, l, r, p, lo, hi, cond, hint) }
          .orElse(extract(cond, r, l)
            .map { case (p, lo, hi) => rewrite(j.output, r, l, p, lo, hi, cond, hint) })
          .getOrElse(j)
    }

  private def refsIn(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  /** Match `p >= lo AND p <= hi` with p from `pointSide`, bounds from
    * the other side (either argument order per comparison). */
  private def extract(cond: Expression, pointSide: LogicalPlan, rangeSide: LogicalPlan)
      : Option[(Expression, Expression, Expression)] = {
    def geq(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(p, lo) if refsIn(p, pointSide) && refsIn(lo, rangeSide) => Some((p, lo))
      case LessThanOrEqual(lo, p) if refsIn(p, pointSide) && refsIn(lo, rangeSide) => Some((p, lo))
      case _ => None
    }
    def leq(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(p, hi) if refsIn(p, pointSide) && refsIn(hi, rangeSide) => Some((p, hi))
      case GreaterThanOrEqual(hi, p) if refsIn(p, pointSide) && refsIn(hi, rangeSide) => Some((p, hi))
      case _ => None
    }
    cond match {
      case And(a, b) =>
        (for ((p1, lo) <- geq(a); (p2, hi) <- leq(b) if p1.semanticEquals(p2)) yield (p1, lo, hi))
          .orElse(for ((p1, lo) <- geq(b); (p2, hi) <- leq(a) if p1.semanticEquals(p2)) yield (p1, lo, hi))
          .filter { case (p, lo, hi) => numeric(p) && numeric(lo) && numeric(hi) }
      case _ => None
    }
  }

  private def rewrite(output: Seq[Attribute], pointSide: LogicalPlan, rangeSide: LogicalPlan,
                      p: Expression, lo: Expression, hi: Expression,
                      cond: Expression, hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint)
      : LogicalPlan = {
    val w = Literal(conf("bucketWidth", "10000.0").toDouble, DoubleType)
    val maxBuckets = Literal(conf("maxBucketsPerRow", "10000").toLong, LongType)
    def bucketOf(e: Expression): Expression = Floor(Divide(Cast(e, DoubleType), w))
    val pBkt = Alias(bucketOf(p), "__graft_p_bkt")()
    val points = Project(pointSide.output :+ pBkt, pointSide)
    val rBkt = AttributeReference("__graft_r_bkt", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: without a timezone stamp it
    // reports unresolved and fails plan validation (optimizer rules
    // run after the analyzer, nothing re-resolves for us).
    val loB = bucketOf(lo)
    val hiB = bucketOf(hi)
    val span = Subtract(hiB, loB)
    val seq = new Sequence(loB, hiB, Literal(1L, LongType))
      .withTimeZone(SQLConf.get.sessionLocalTimeZone)
    // inverted/empty intervals must emit zero buckets, not throw
    // (sequence rejects start > stop with a positive step)
    val guarded = If(LessThanOrEqual(loB, hiB), seq,
      Literal.create(Array.empty[Long],
        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
    // Small-span rows take the bucketed equi-join; rows whose interval
    // would explode into more than maxBucketsPerRow buckets fall back
    // to the plain (nested-loop) join. Null-span rows (null bound)
    // drop from both branches — they cannot satisfy the BETWEEN
    // anyway. Identical output set, bounded per-row work.
    val smallRanges = Filter(LessThanOrEqual(span, maxBuckets), rangeSide)
    val ranges = Generate(
      Explode(guarded),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(rBkt), child = smallRanges)
    val bucketed = Project(output,
      Join(points, ranges, Inner,
        Some(And(EqualTo(pBkt.toAttribute, rBkt), cond)), hint))
    val fallback = Project(output,
      Join(pointSide, rangeSide, Inner,
        Some(And(GreaterThan(span, maxBuckets), cond)), hint))
    Union(Seq(bucketed, fallback))
  }
}
