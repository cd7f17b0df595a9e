package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Physical-plan assertions for layout-aware pipelines. A bucketed or
  * pre-partitioned layout only pays off if the planner actually skips
  * the exchange — these checks make that a testable property instead
  * of a .explain() eyeball (BucketingSpec generalizes on them).
  */
object PlanChecks {

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: collectAll(a.executedPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(collectAll)
  }

  /** All shuffle exchanges in the (executed, AQE-unwrapped) plan. */
  def shuffleExchanges(df: DataFrame): Seq[ShuffleExchangeLike] =
    collectAll(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }

  /** Shuffle exchanges whose output partitioning mentions a column
    * whose name contains `key` — e.g. the join key that bucketing was
    * supposed to pre-distribute. */
  def shuffleExchangesOn(df: DataFrame, key: String): Seq[ShuffleExchangeLike] =
    shuffleExchanges(df).filter(_.outputPartitioning.toString.contains(key))
}
