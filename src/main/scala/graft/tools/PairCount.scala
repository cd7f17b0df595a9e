package graft.tools
import org.apache.spark.sql.SparkSession
object PairCount {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    for (d <- args) {
      val t0 = System.nanoTime()
      val n = graft.util.CacheScope.withScope {
        graft.queries.Registry.queries("q_lsh_cosine_pairs")(s, d).count()
      }
      println(s"[paircount] $d pairs=$n sec=${(System.nanoTime()-t0)/1e9}")
    }
    s.stop()
  }
}
