package graft.util

import org.apache.spark.sql.SparkSession

/** The canonical bench-session configuration, extracted from
  * [[graft.Bench]] so the measurement tools (PlanTime, ExplainAudit,
  * BucketedTpch) can build sessions that plan EXACTLY like the graded
  * bench instead of each carrying a drifting copy of the conf block.
  * A plan dumped under a different shuffle width or broadcast
  * threshold is evidence about a different query — round 9's first
  * finding (the pagerank standing-layout mismatch) was invisible under
  * ExplainAudit's old local[8]/no-AQE-width session.
  *
  * Keep this list bit-identical to what Bench.main used inline through
  * round 8; Bench itself now calls it (BenchSessionSpec pins the
  * values). */
object BenchConfs {

  /** Apply the standard bench confs for `cpus` cores to `b`.
    * Master is NOT set here — Bench sets local[cpus] per the driver
    * contract; tools may choose their own. */
  def apply(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
}
