package graft.tools

import org.apache.spark.sql.SparkSession

/** Audits headline plans for UNPARTITIONED window specs — the
  * single-task funnel (`WindowExec: No Partition Defined`) that turns
  * a distributed plan into one straggler at scale. Run after adding
  * or changing a headline; the expected output is silence. */
object WinAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    graft.queries.Registry.headlines.foreach { q =>
      val plan = try q.run(spark, d).queryExecution.executedPlan.toString
                 catch { case e: Throwable => s"ERR ${e.getMessage}" }
      // an unpartitioned spec's first sort direction precedes the first
      // comma: windowspecdefinition(<col> ASC ... vs (<pcol>#1, <col> ASC
      val bare = plan.split("\n").filter(_.contains("Window ")).filter { l =>
        val spec = l.substring(l.indexOf("windowspecdefinition(") +
          "windowspecdefinition(".length)
        val firstComma = spec.indexOf(',')
        val dirs = Seq(spec.indexOf(" ASC"), spec.indexOf(" DESC")).filter(_ >= 0)
        dirs.nonEmpty && (firstComma < 0 || dirs.min < firstComma)
      }
      if (bare.nonEmpty) println(s"[win] ${q.name}: ${bare.length} unpartitioned window(s)")
    }
    spark.stop()
  }
}
