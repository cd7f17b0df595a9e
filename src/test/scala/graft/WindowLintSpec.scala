package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import graft.queries.Registry

/** Lint: an UNPARTITIONED window (`WindowExec: No Partition Defined`)
  * funnels the whole input through one task — a straggler at 100 TB.
  * Every bound query's physical plan is walked; any WindowExec /
  * WindowGroupLimitExec with an empty partitionSpec must appear in
  * the explicit whitelist below, where each entry is a documented
  * BOUNDED-INPUT contract (driver-page slices, post-aggregation
  * windows over ≤K-row aggregate outputs, calendar-bounded daily
  * series). A new data-sized global window fails this spec instead of
  * warning into the log (round-4 verdict item 3: 315 unasserted WARN
  * instances).
  */
class WindowLintSpec extends AnyFunSuite {
  import TestSpark._

  /** query name -> why its unpartitioned window is input-bounded */
  private val whitelist: Map[String, String] = Map(
    "q_paginate"    -> "Pagination driver-page contract: window over one bounded page slice",
    "q_decile"      -> "documented quarantine: ntile over a bounded customer slice (custkey < 200)",
    "q_equi_depth"  -> "same quarantine as q_decile: bounded slice feeding the depth histogram",
    "q_rfm"         -> "ntile windows over the customer-grain AGGREGATE (|customers| << |orders|)",
    "q_gap_fill"    -> "7-day MA over the gap-filled DAILY series (calendar-bounded rows)",
    "q_zipf"        -> "rank over the TakeOrdered top-100 tokens (exactly 100 rows)",
    "q_percent_total" -> "share-of-total over the 5-row event-type aggregate",
    "q_auc"         -> "cumulative rank over DISTINCT SCORES (<= 5 priority-grain rows)",
    "q_pr_curve"    -> "one descending window over the <= 5 distinct scores",
    "q_lift_curve"  -> "depth walk over the <= 5-row score-domain aggregate",
    "q_decision_stump" -> "split scan over the 50-distinct-quantity feature domain",
    "q_isotonic_calibration" -> "PAVA rounds over <= 5 score bins (18 windows, all bin-sized)",
    "q_rbo"         -> "overlap walk over two TakeOrdered top-20 lists (<= 20 rows)",
    "q_fdr"         -> "Benjamini-Hochberg pass over the m = 15 hypothesis table",
    "q_wilcoxon"    -> "rank over the calendar-bounded daily diff set (<= 366 rows/yr)",
    "q_kruskal_wallis" -> "global rank over the (type, day) calendar grain (<= 366*k rows/yr)",
    "q_moods_median" -> "cumulation over the domain-bounded count table (q_brown_forsythe shape)",
    "q_logrank"     -> "risk-set walk over the distinct day-gap domain (calendar-bounded)",
    "q_survival"    -> "Kaplan-Meier risk cumulation over the distinct-gap histogram (~2.4k rows)",
    "q_engle_granger" -> "Dickey-Fuller recurrence over the DAILY revenue series (calendar-bounded)",
    "q_mixture_rates" -> "cap feasibility scan over the k-row source-size table",
    "q_quantile_norm" -> "rank mapping over DISTINCT values (~1e3 domain rows, q_decile rule)",
    "q_youden"      -> "ROC walk over DISTINCT SCORES (<= 5 priority-grain rows, q_auc contract)",
    "q_variance_ratio" -> "lag differences over the DAILY revenue series (calendar-bounded, q_engle_granger shape)")

  test("every unpartitioned window sits on a documented bounded input") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = Registry.allQueries.flatMap { q =>
        val plan =
          try q.run(spark, sfTiny).queryExecution.executedPlan
          catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
        val bare = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty           => w
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
        }
        if (bare.nonEmpty) Some(q.name -> bare.size) else None
      }.toMap
      val unexplained = offenders.keySet -- whitelist.keySet
      assert(unexplained.isEmpty,
        s"queries with UNWHITELISTED unpartitioned windows (bound the input or " +
          s"partition the spec): ${unexplained.toSeq.sorted.map(n => s"$n(${offenders(n)})").mkString(", ")}")
      val stale = whitelist.keySet -- offenders.keySet
      assert(stale.isEmpty,
        s"whitelist entries whose plans no longer have unpartitioned windows " +
          s"(remove them): ${stale.toSeq.sorted.mkString(", ")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
