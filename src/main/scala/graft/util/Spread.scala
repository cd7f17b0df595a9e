package graft.util

import org.apache.spark.sql.DataFrame

/** Guard against FILE-BOUND parallelism starvation ahead of
  * compute-heavy stages: a scan's partition count is set by input
  * splits, and a table that arrives as one small file (or a cache
  * persisted from one) funnels every downstream per-row computation
  * through a single task — 1 core busy, 31 idle. Measured on the
  * sf10 scale fixture: the minhash signature stage (per-char rolling
  * hashes, interpreted HOFs) ran ONE core for 30+ minutes because
  * documents.parquet yielded 3 input splits on a 32-core session.
  *
  * `Spread(df)` repartitions to `defaultParallelism` ONLY when the
  * planned partitioning is below it, so on real multi-file inputs
  * (where scans already carry hundreds of splits) it is a no-op and
  * no gratuitous full-data shuffle ever happens at 100 TB. Apply it
  * where per-row compute dominates scan cost (signature/encode/train
  * stages), not on plain scans — for cheap aggregations the exchange
  * costs more than the parallelism wins (measured: repartition-
  * before-persist regressed the sf0.1 bench ~35%, see
  * sources.Tables.warm).
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
