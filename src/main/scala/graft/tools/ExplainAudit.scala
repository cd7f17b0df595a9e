package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans of the headline queries for the
  * scale audit (SURVEY §5): verify PushedFilters reach the scans,
  * small dims broadcast, no unexpected exchanges, codegen spans wide. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
                else graft.queries.Registry.headlines.map(_.name)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(graft.queries.Registry.queries(n)(spark, d)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
