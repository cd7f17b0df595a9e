package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregation: maintain a (key -> partial sums) state
  * table and fold in deltas, instead of re-aggregating history — how
  * a 100 TB/day pipeline keeps daily rollups O(delta), not O(all
  * time). Works for any algebraic aggregate (sum/count/min/max and
  * anything derivable from them — avg, variance via moment sums);
  * the merge is the same commutative agg applied to state ∪ delta.
  *
  * Scale notes: both inputs are already keyed aggregates, so the
  * merge shuffle carries |keys| rows, not |events|; with the state
  * bucketed on the key the exchange disappears entirely
  * (BucketingSpec shows the pattern).
  */
object Incremental {

  /** Merge two partial-aggregate tables sharing `keys` + numeric
    * partial columns (each summed). min/max partials go in
    * `mins`/`maxs`. */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
            sums: Seq[String], mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    require(sums.nonEmpty || mins.nonEmpty || maxs.nonEmpty,
      "merge needs at least one partial column")
    val aggs = sums.map(c => sum(col(c)).as(c)) ++
      mins.map(c => min(col(c)).as(c)) ++ maxs.map(c => max(col(c)).as(c))
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Retraction-capable state for NON-invertible aggregates (min/max):
    * the classic plain `merge` min/max partials cannot process a
    * DELETE — once the minimum leaves, the old partial is a lie. The
    * standard fix (materialized-view maintenance literature, e.g.
    * Flink's retractable aggregates) keeps a (key, value) →
    * multiplicity histogram instead: inserts are +1 deltas, deletes
    * −1, and the merge is still one commutative SUM — so everything
    * `merge` guarantees (O(delta) maintenance, partial-agg shuffle on
    * keys, bucketing-compatible) carries over. State size is bounded
    * by DISTINCT values per key, not history length. */
  def mergeHistogram(state: DataFrame, delta: DataFrame,
                     keys: Seq[String], valueCol: String,
                     cntCol: String = "cnt"): DataFrame = {
    state.unionByName(delta)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(sum(col(cntCol)).as(cntCol))
      .where(col(cntCol) =!= 0)
  }

  /** Current min/max per key from a multiplicity histogram. Rows with
    * non-positive multiplicity (over-deletes in flight) don't count. */
  def extremesOf(hist: DataFrame, keys: Seq[String], valueCol: String,
                 cntCol: String = "cnt"): DataFrame =
    hist.where(col(cntCol) > 0)
      .groupBy(keys.map(col): _*)
      .agg(min(col(valueCol)).as(s"min_$valueCol"),
        max(col(valueCol)).as(s"max_$valueCol"))
}
