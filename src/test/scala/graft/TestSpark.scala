package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs (one JVM-wide session; Test/fork). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // codegen lint: a whole-stage method janino rejects (>64 KB)
      // normally falls back to interpreted with only a log line — a
      // silent 5-20x regression at scale. In tests, make it THROW so
      // any operator that outgrows codegen fails its spec instead.
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfTiny = "/root/testdata/sf0.001"
}
