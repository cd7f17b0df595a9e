package graft.tools

import org.apache.spark.sql.SparkSession

/** Planning-vs-execution split for one query: times (a) DataFrame
  * construction, (b) analysis+optimization+physical planning
  * (executedPlan forced, nothing run), (c) first execution, (d) a
  * second warm execution inside the same cache scope. Diagnostic
  * only — lets a "query X is slow" finding be attributed to the
  * driver (Catalyst) or the cluster (jobs) before optimizing either.
  *
  * Usage: runMain graft.tools.PlanTime <query> <dir>
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val Array(q, d) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.util.BenchConfs(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.warm(s, d)
    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000L
    graft.util.CacheScope.withScope {
      var t0 = System.nanoTime()
      val df = graft.queries.Registry.queries(q)(s, d)
      val build = ms(t0)
      t0 = System.nanoTime()
      df.queryExecution.executedPlan
      val plan = ms(t0)
      t0 = System.nanoTime()
      val n = df.count()
      val exec1 = ms(t0)
      t0 = System.nanoTime()
      df.count()
      val exec2 = ms(t0)
      // a rebuilt frame (fresh lazy plan, warm operator caches) — the
      // steady-state serving latency Bench's best-of-2 reports
      t0 = System.nanoTime()
      graft.queries.Registry.queries(q)(s, d).count()
      val rebuild = ms(t0)
      println(s"[plantime] $q rows=$n build=${build}ms plan=${plan}ms " +
        s"exec1=${exec1}ms exec2=${exec2}ms rebuild=${rebuild}ms")
    }
    s.stop()
  }
}
