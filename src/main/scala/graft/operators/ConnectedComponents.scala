package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the missing
  * last step of near-dup deduplication: candidate PAIRS (minhash /
  * simhash / exact-jaccard) must be grouped into duplicate CLUSTERS
  * so one canonical document per cluster survives. The reference stops
  * at `dropDuplicates` (data_cleaner.py:84, exact only); a training-
  * data pipeline needs the transitive closure of near-dup pairs.
  *
  * Algorithm: min-label propagation with pointer-doubling (the
  * DataFrame form of hash-to-min, Rastogi et al., "Finding Connected
  * Components in Map-Reduce in Logarithmic Rounds", ICDE 2013). Each
  * node holds a candidate label (initially itself); every round each
  * node takes the min of its own and its neighbors' labels, THEN
  * follows its label's label (shortcutting). Neighbor-min alone needs
  * O(diameter) rounds — a 1M-node chain would need 1M shuffles; the
  * shortcut halves remaining path length each round, so rounds =
  * O(log diameter). Each round is two shuffles keyed by node id —
  * never materializes anything super-linear in |edges|.
  *
  * Scale notes: `localCheckpoint` every round truncates the lineage so
  * plan size stays O(1) across iterations (iterative DataFrame jobs
  * otherwise re-plan an exponentially growing tree); convergence is
  * detected with a cheap count of changed labels.
  */
object ConnectedComponents {

  /** Edge list (aCol, bCol: long node ids, undirected) → (id, component)
    * for every node appearing in an edge; `component` is the minimum
    * node id of the component (deterministic canonical choice).
    *
    * If `maxIter` is hit before convergence (possible only on graphs
    * whose diameter >> 2^maxIter-reachable — pathological at 25), the
    * labels are PARTIAL: a cluster may carry several "canonical" ids.
    * That must not pass silently into a dedup pipeline, so this either
    * throws (`requireConvergence = true`) or logs a loud warning;
    * callers needing the flag programmatically use
    * `labelPropagationWithStatus`. */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       maxIter: Int = 25, requireConvergence: Boolean = false): DataFrame =
    labelPropagationWithStatus(edges, aCol, bCol, maxIter, requireConvergence)._1

  /** As labelPropagation, additionally returning whether the labels
    * converged within maxIter rounds. */
  def labelPropagationWithStatus(edges: DataFrame, aCol: String, bCol: String,
                                 maxIter: Int = 25, requireConvergence: Boolean = false)
      : (DataFrame, Boolean) = {
    val e = edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
    // Undirected: propagate both ways. Persist PRE-HASHED on the join
    // key (explicit partition count — exempt from AQE coalescing, so
    // the layout stays join-compatible round after round): every
    // round's neighbor-min joins adj on `b`, and an unhashed cache
    // re-exchanges the EDGE LIST — the big side — once per round. At
    // 100 TB that is `rounds` full-data shuffles for one.
    val P = edges.sparkSession.sessionState.conf.numShufflePartitions
    val adj = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(P, col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = adj.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // min label among neighbors, then min with own label — as ONE
      // aggregation over the union of neighbor labels and own labels
      // (round 9: the former shape aggregated neighbor minima and then
      // LEFT JOINed them back onto `labels` for the least(); identical
      // algebra — min over the union ≡ least(own, coalesce(nbrMin,
      // own)) — but the join re-exchanged and sorted both node-grain
      // sides every round; the union rides the same single exchange
      // the aggregation needs anyway)
      val stepped = adj.join(labels, adj("b") === labels("id"))
        .select(adj("a").as("id"), col("label"))
        .union(labels)
        .groupBy("id").agg(min(col("label")).as("label"))
      // pointer doubling: label := label(label). Labels are node ids of
      // the same component, so this only ever jumps closer to the min.
      val roots = stepped.select(col("id").as("rid"), col("label").as("rlabel"))
      val next = stepped.join(roots, stepped("label") === roots("rid"), "left")
        .select(stepped("id"),
          least(stepped("label"), coalesce(col("rlabel"), stepped("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.as("n").join(labels.as("o"), Seq("id"))
        .where(col("n.label") =!= col("o.label")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    adj.unpersist()
    if (!converged) {
      val msg = s"ConnectedComponents.labelPropagation did NOT converge within " +
        s"$maxIter rounds — labels are partial (multiple canonical ids per cluster possible)"
      if (requireConvergence) throw new IllegalStateException(msg)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    (labels.select(col("id"), col("label").as("component")), converged)
  }
}
