package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Registry => R}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real content lives in graft.queries.Registry (one BoundQuery
  * per SURVEY §2 inventory row, oracle SQL colocated with the Spark
  * plan so names/aliases cannot drift apart).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = R.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = R.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = R.oracles
}
