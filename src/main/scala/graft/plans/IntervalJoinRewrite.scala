package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite interval-OVERLAP joins
  * (`a.s <= b.e AND b.s <= a.e` — no equi keys) from the nested loop
  * Spark would otherwise plan into the bucket-blocked equi-join shape
  * of operators.IntervalJoin — RangeJoinRewrite's interval×interval
  * sibling, so even raw SQL `ON a.s <= b.e AND b.s <= a.e` escapes
  * the O(n·m) plan.
  *
  * Both sides explode into the fixed-width buckets their spans cover
  * and join on bucket equality. The subtlety interval×interval adds
  * over point-in-interval: a pair can share MANY buckets, which would
  * duplicate output rows. Rather than a dedup (which would break
  * multiplicity semantics for non-distinct inputs), the join keeps a
  * pair only in its CANONICAL bucket — the one containing
  * greatest(a.s, b.s). For every truly overlapping pair that instant
  * lies in both spans, so the canonical bucket is emitted by both
  * sides and the pair matches EXACTLY once; non-overlapping pairs
  * fail the residual predicate as before. The rewrite is therefore an
  * identity on results including duplicates.
  *
  * Oversized spans (> maxBucketsPerRow buckets) and REVERSED spans
  * (s > e — the condition shape matches any numeric conjunct pair, so
  * nothing guarantees well-formed intervals, and a reversed row can
  * still satisfy `a.s <= b.e AND b.s <= a.e`) on EITHER side fall
  * back to the plain join branch under a span guard, exactly
  * partitioning the pair space — the RangeJoinRewrite degradation
  * contract: worst case is the nested loop it replaced, and only for
  * outlier rows. Confs: `spark.graft.intervalJoin.{enabled,
  * bucketWidth, maxBucketsPerRow}` (width default 10000.0 — pick ~the
  * typical span).
  *
  * Unlike RangeJoinRewrite's strict two-conjunct matcher, this one
  * searches the CONJUNCT LIST for the overlap pair, so composite
  * conditions (`key = key AND s <= e AND s <= e`) rewrite too — the
  * residual conjuncts (the key equality) simply ride along into the
  * join condition, where Catalyst folds them into the hash keys.
  * Self-guarding is therefore explicit: the rule skips any join whose
  * condition references a `__graft_`-prefixed attribute (the bucketed
  * branch) or carries a top-level OR conjunct (the fallback's span
  * guard — user conditions with top-level ORs are conservatively left
  * alone, stated here).
  */
object IntervalJoinRewrite extends Rule[LogicalPlan]
    with PredicateHelper {

  private def conf(key: String, default: String): String =
    SQLConf.get.getConfString(s"spark.graft.intervalJoin.$key", default)

  def apply(plan: LogicalPlan): LogicalPlan =
    if (conf("enabled", "true") != "true") plan
    else plan.transform {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        extract(cond, l, r)
          .map { case (sa, ea, sb, eb) =>
            rewrite(j.output, l, r, sa, ea, sb, eb, cond, hint) }
          .getOrElse(j)
    }

  private def refsIn(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  /** Find conjuncts `sa <= eb` and `sb <= ea` with (sa, ea) drawn
    * from the left side and (sb, eb) from the right (either
    * comparison orientation, any position in the conjunct list).
    * Returns (sa, ea, sb, eb). */
  private def extract(cond: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    // re-application guards (see the object Scaladoc)
    if (cond.references.exists(_.name.startsWith("__graft_"))) return None
    val conjs = splitConjunctivePredicates(cond)
    if (conjs.exists(_.isInstanceOf[Or])) return None
    // conjunct of shape left_expr <= right_expr (start_l vs end_r)
    def lLeR(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(a, b) if refsIn(a, l) && refsIn(b, r) => Some((a, b))
      case GreaterThanOrEqual(b, a) if refsIn(a, l) && refsIn(b, r) => Some((a, b))
      case _ => None
    }
    // conjunct of shape right_expr <= left_expr (start_r vs end_l)
    def rLeL(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(b, a) if refsIn(b, r) && refsIn(a, l) => Some((b, a))
      case GreaterThanOrEqual(a, b) if refsIn(b, r) && refsIn(a, l) => Some((b, a))
      case _ => None
    }
    (for {
      c1 <- conjs.iterator; c2 <- conjs.iterator if c1 ne c2
      (sa, eb) <- lLeR(c1).iterator; (sb, ea) <- rLeL(c2).iterator
      if Seq(sa, ea, sb, eb).forall(numeric) &&
        // a degenerate "interval" where one bound expression IS the
        // other (p BETWEEN lo AND hi matched as overlap of [p,p]) is
        // RangeJoinRewrite's territory; both rules rewrite it
        // correctly, but prefer the cheaper one-sided explode there
        !(sa.semanticEquals(ea) || sb.semanticEquals(eb))
    } yield (sa, ea, sb, eb)).nextOption()
  }

  private def rewrite(output: Seq[Attribute], l: LogicalPlan, r: LogicalPlan,
                      sa: Expression, ea: Expression,
                      sb: Expression, eb: Expression,
                      cond: Expression,
                      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint)
      : LogicalPlan = {
    val w = Literal(conf("bucketWidth", "10000.0").toDouble, DoubleType)
    val maxBuckets = Literal(conf("maxBucketsPerRow", "10000").toLong, LongType)
    def bucketOf(e: Expression): Expression = Floor(Divide(Cast(e, DoubleType), w))
    def bucketsOf(s: Expression, e: Expression): Expression = {
      val seq = new Sequence(bucketOf(s), bucketOf(e), Literal(1L, LongType))
        .withTimeZone(SQLConf.get.sessionLocalTimeZone)
      If(LessThanOrEqual(bucketOf(s), bucketOf(e)), seq,
        Literal.create(Array.empty[Long],
          org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
    }
    def spanOf(s: Expression, e: Expression): Expression =
      Subtract(bucketOf(e), bucketOf(s))
    val aBkt = AttributeReference("__graft_a_bkt", LongType, nullable = false)()
    val bBkt = AttributeReference("__graft_b_bkt", LongType, nullable = false)()
    val zero = Literal(0L, LongType)
    // a row is bucketable iff 0 <= span <= maxBuckets; reversed spans
    // (s > e) must route to the fallback, not silently explode to
    // nothing (a reversed row can still satisfy the overlap condition)
    def bucketable(s: Expression, e: Expression): Expression =
      And(GreaterThanOrEqual(spanOf(s, e), zero),
        LessThanOrEqual(spanOf(s, e), maxBuckets))
    val smallL = Filter(bucketable(sa, ea), l)
    val smallR = Filter(bucketable(sb, eb), r)
    val genL = Generate(Explode(bucketsOf(sa, ea)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(aBkt), child = smallL)
    val genR = Generate(Explode(bucketsOf(sb, eb)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bBkt), child = smallR)
    // the canonical-bucket pin: exactly one (aBkt, bBkt) combination
    // survives per overlapping pair — multiplicity preserved, no dedup.
    // sa/sb may carry different analyzer-coerced numeric types, and
    // Greatest requires same-typed children — cast both to double
    // (matching bucketOf) before comparing.
    val canon = EqualTo(aBkt, bucketOf(
      Greatest(Seq(Cast(sa, DoubleType), Cast(sb, DoubleType)))))
    val bucketed = Project(output,
      Join(genL, genR, Inner,
        Some(And(EqualTo(aBkt, bBkt), And(canon, cond))), hint))
    // complement of (bucketable(l) AND bucketable(r)): oversized OR
    // reversed span on either side. Null spans fail cond anyway.
    val eitherHuge = Or(
      Or(GreaterThan(spanOf(sa, ea), maxBuckets),
        LessThan(spanOf(sa, ea), zero)),
      Or(GreaterThan(spanOf(sb, eb), maxBuckets),
        LessThan(spanOf(sb, eb), zero)))
    val fallback = Project(output,
      Join(l, r, Inner, Some(And(eitherHuge, cond)), hint))
    Union(Seq(bucketed, fallback))
  }
}
