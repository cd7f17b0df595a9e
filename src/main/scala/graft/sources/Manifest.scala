package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file manifest: row count + per-column min/max for every
  * physical file of a dataset — the queryable layout-audit surface
  * (SURVEY §8). At 100 TB layout IS performance: whether a write
  * actually produced the clustering its sortBy promised (disjoint
  * ascending per-file key ranges → parquet min/max stats prune; one
  * interleaved straggler file → every range filter scans everything)
  * is exactly what this table answers, the same bookkeeping
  * Delta/Iceberg keep in their manifests, derived here on demand from
  * any plain parquet directory. One scan, partial-aggregated on the
  * file-name grouping key.
  */
object Manifest {

  /** Manifest of an existing DataFrame scan. `file` is the basename
    * (stable across mount points); stats cover the requested columns. */
  def fileStatsOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileStatsOf needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(regexp_extract(input_file_name(), "[^/]+$", 0).as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Manifest of a parquet directory/file. */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    fileStatsOf(spark.read.parquet(path), cols)
}
