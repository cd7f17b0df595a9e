package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (SURVEY §2.5 + marked
  * bench anchors) on SPARK_GRAFT_SF_DIR, prints one JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // sf1 knob study (BASELINE.md round-5 appendix): at tens-of-MB
      // shuffle sizes AQE's default 64 MB advisory coalesces post-
      // shuffle stages below the core count, and the 10 MB broadcast
      // default shuffle-joins dimension tables that fit in memory
      // 6× over. 2 MB/64 MB measured: tpch10 sf1 11.7→10.5 s, sf0.1
      // headliners 8.5→8.0 (tpch10 sf0.1 unchanged within noise).
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_CONF="k=v;k2=v2" — ad-hoc config overrides for local
    // tuning experiments (the driver never sets it)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v)              => builder.config(k.trim, v.trim)
        case Array(s) if s.trim.isEmpty => () // tolerate ';;' / trailing ';'
        case _ => sys.error(s"bad SPARK_GRAFT_CONF segment (want k=v): '$kv'")
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Service mode, matching the reference's cached served DataFrame
    // (main.py:147 df.cache()): tables persist once, queries run
    // against the warm cache. Also absorbs JIT/codegen warm-up before
    // the first timed query.
    graft.sources.Tables.warm(spark, sfDir)
    graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").count().count()
    // Default: the pinned headline set graded against BASELINE.md.
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b times an ad-hoc subset instead
    // (local measurement runs; the driver never sets it).
    val hs = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(names) =>
        val want = names.split(',').map(_.trim).filter(_.nonEmpty)
        val byName = queries.Registry.allQueries.map(q => q.name -> q).toMap
        val unknown = want.filterNot(byName.contains)
        if (unknown.nonEmpty) sys.error(
          s"unknown SPARK_GRAFT_BENCH_ONLY queries: ${unknown.mkString(", ")}" +
            s" (valid names are Registry.allQueries keys, e.g. ${byName.keys.take(5).mkString(", ")} ...)")
        want.toSeq.map(byName)
      case None => queries.Registry.headlines
    }
    // Best-of-2 timed passes per query, mirroring the DuckDB baseline's
    // best-of-3 (tools/bench_baseline.py): both engines report their
    // best observed steady-state latency, so one GC pause or scheduler
    // hiccup doesn't masquerade as a plan regression (r4's three
    // "doubled" headliners were exactly that — see BASELINE.md round-5
    // re-measurement). Timed runs execute with warm plan-matched
    // operator caches, the SERVING semantics every committed round has
    // measured (the r1 warm-up pass already primed them for the timed
    // pass); the scope closing each SECTION (not each run) is what
    // bounds the memory.
    // A failed run must NEVER read as a speedup (round-5 advice item:
    // elapsed-until-exception used to be recorded as the latency, so a
    // fast-failing query silently improved the totals). Failures are
    // poisoned to a sentinel that regresses every subtotal AND listed
    // in the emitted JSON so the driver/judge see the breakage.
    val FailSentinel = 999.0
    val failures = scala.collection.mutable.LinkedHashSet.empty[String]
    def timeOnce(q: queries.BoundQuery): Double = {
      val t0 = System.nanoTime()
      try {
        val n = q.run(spark, sfDir).count()
        require(n >= 0)
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        failures += q.name
        FailSentinel
      }
    }
    def timeAll(qs: Seq[queries.BoundQuery]): Seq[(String, Double)] =
      qs.map(q => q.name -> math.min(timeOnce(q), timeOnce(q)))
    // Untimed warm-up pass first: materializes every table's cache and
    // JITs each query's generated code, so the timed passes measure the
    // steady-state service latency (the reference's serving shape —
    // main.py:147 serves from a warm cache), not first-hit compilation
    // noise. Warm-up and timed passes share one SECTION scope: internal
    // caches stay warm across a query's runs, but are all dropped
    // before the next section (measured: tpch10 queries read ~1 s
    // higher after the 12 headliners' LSH/shingle caches than
    // isolated).
    val results = graft.util.CacheScope.withScope {
      hs.foreach { q =>
        try q.run(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
      timeAll(hs)
    }
    // the ten TPC-H completions ride along as a TRACKED, non-headline
    // subtotal (r3 verdict item 2): "value" stays the 12-headliner
    // total BASELINE.md's cross-round ratio is defined on; "tpch10"
    // is graded against its own same-session DuckDB row in BASELINE.md
    val tpchTen = Seq("q6_forecast_revenue", "q8_market_share",
      "q10_returned_items", "q13_order_distribution", "q14_promo_effect",
      "q15_top_supplier", "q17_small_qty_revenue", "q18_large_orders",
      "q19_discounted_revenue", "q22_dormant_customers")
    val byName = queries.Registry.allQueries.map(q => q.name -> q).toMap
    val tpchResults =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) Seq.empty
      else {
        val missing = tpchTen.filterNot(byName.contains)
        require(missing.isEmpty,
          s"tpch10 subtotal lost queries (renamed/removed?): ${missing.mkString(", ")}")
        val qs = tpchTen.map(byName)
        graft.util.CacheScope.withScope {
          qs.foreach(q => try q.run(spark, sfDir).count()
            catch { case _: Throwable => () }) // same untimed warm-up
          timeAll(qs)
        }
      }
    // bench30 (round-5 verdict item 3): frozen per-family regression
    // set, timed exactly like the other sections (untimed warm-up +
    // best-of-2 inside one section scope), reported as its own
    // subtotal. SPARK_GRAFT_SKIP_BENCH30=1 skips it for quick local
    // headline iterations.
    val bench30Results =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY") ||
          sys.env.contains("SPARK_GRAFT_SKIP_BENCH30")) Seq.empty
      else {
        val qs = queries.Registry.bench30
        graft.util.CacheScope.withScope {
          qs.foreach(q => try q.run(spark, sfDir).count()
            catch { case _: Throwable => () }) // same untimed warm-up
          timeAll(qs)
        }
      }
    val qs = (results ++ tpchResults ++ bench30Results)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val tpchField =
      if (tpchResults.isEmpty) ""
      else s""""tpch10":${tpchResults.map(_._2).sum},"""
    val b30Field =
      if (bench30Results.isEmpty) ""
      else s""""bench30":${bench30Results.map(_._2).sum},"""
    val failField =
      if (failures.isEmpty) ""
      else failures.map("\"" + _ + "\"").mkString(""""failures":[""", ",", "],")
    println(s"""{"metric":"total","value":$total,"unit":"sec",$tpchField$b30Field$failField"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
