package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark._
import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite {

  test("streaming hourly rollup replayed over parquet equals the batch twin") {
    // file stream sources need a directory, not a single file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfTiny/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStreams.hourlyCounts(spark, dir.toString)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val batch = graft.queries.Registry.queries("q_stream_hourly")(spark, sfTiny)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch, s"stream/batch diverge: ${streamed.size} vs ${batch.size}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful mapGroupsWithState converges to batch per-user counts on replay") {
    val dir = java.nio.file.Files.createTempDirectory("events_state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfTiny/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStreams.userRunningCounts(spark, dir.toString)
      .writeStream.outputMode("update")
      .format("memory").queryName("user_state_out")
      .start()
    try {
      q.processAllAvailable()
      // update mode may emit a row per micro-batch; the LAST state per
      // user must equal the batch truth
      val streamed = spark.table("user_state_out")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.sources.Tables.events(spark, sfTiny)
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered events, equals batch distinct") {
    // simulate at-least-once delivery: the same parquet file lands twice
    val dir = java.nio.file.Files.createTempDirectory("events_dup")
    Seq("events_a.parquet", "events_b.parquet").foreach { n =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfTiny/events.parquet"), dir.resolve(n))
    }
    val q = EventStreams.dedupedTypeCounts(spark, dir.toString)
      .writeStream.outputMode("complete")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_out")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = graft.sources.Tables.events(spark, sfTiny)
        .dropDuplicates("event_id")
        .groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == batch, s"dedup diverges: $streamed vs $batch")
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join on replay") {
    val dir = java.nio.file.Files.createTempDirectory("events_ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfTiny/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStreams.viewPurchaseJoin(spark, dir.toString)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_out")
        .select("v_user_event", "p_user_event")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ev = graft.sources.Tables.events(spark, sfTiny)
      val v = ev.where(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("event_id").as("ve"), col("ts").as("vts"))
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("pe"), col("ts").as("pts"))
      val batch = v.join(p, col("vu") === col("pu") &&
          col("pts") >= col("vts") &&
          col("pts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
        .select("ve", "pe").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch + Incremental.merge maintains exact per-key state") {
    // the streaming face of q_incremental: each micro-batch is
    // partially aggregated and merged into driver-held state; after
    // replay the state equals the batch aggregate exactly
    val dir = java.nio.file.Files.createTempDirectory("events_fb")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfTiny/events.parquet"),
      dir.resolve("events.parquet"))
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = EventStreams.raw(spark, dir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = batch.groupBy("event_type")
          .agg(count(lit(1)).as("cnt"))
        val merged = state match {
          case Some(s0) => graft.operators.Incremental.merge(
            s0, delta, keys = Seq("event_type"), sums = Seq("cnt"))
          case None => delta
        }
        // materialize so the merged state doesn't re-read consumed batches
        state = Some(merged.localCheckpoint(true))
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val got = state.get.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = graft.sources.Tables.events(spark, sfTiny)
        .groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer emits exactly the closed sessions") {
    val dir = java.nio.file.Files.createTempDirectory("events_fmgs")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfTiny/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStreams.sessionizedCounts(spark, dir.toString, gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("fmgs_out")
      .start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("fmgs_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch truth: native session_window with the same gap
      val batch = graft.sources.Tables.events(spark, sfTiny)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), unix_micros(col("w.start")), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the stream never closes each user's final session (NoTimeout):
      // emitted = batch minus exactly one trailing session per user
      val users = batch.map(_._1)
      assert(emitted.subsetOf(batch), s"phantom sessions: ${emitted -- batch}")
      assert(batch.size - emitted.size == users.size,
        s"${batch.size} batch vs ${emitted.size} emitted for ${users.size} users")
    } finally q.stop()
  }

  test("exactly-once sink: idempotent partition overwrite survives redelivery") {
    // the production sink pattern: each micro-batch dynamically
    // overwrites ONLY the partitions it carries, so replaying a batch
    // (restart, at-least-once source) rewrites the same partitions with
    // the same rows instead of appending duplicates
    val src = java.nio.file.Files.createTempDirectory("events_eo_src")
    val out = java.nio.file.Files.createTempDirectory("events_eo_out").toString + "/agg"
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfTiny/events.parquet"),
      src.resolve("events.parquet"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    def runOnce(): Unit = {
      val q = EventStreams.raw(spark, src.toString)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.groupBy("event_type").agg(count(lit(1)).as("cnt"))
            .write.mode("overwrite").partitionBy("event_type").parquet(out)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      runOnce()
      runOnce() // fresh query, no checkpoint: the whole input replays
      val got = spark.read.parquet(out)
        .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("cnt")).toMap
      val want = graft.sources.Tables.events(spark, sfTiny)
        .groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"replay duplicated or lost rows: $got vs $want")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("GraftExtensions registers custom SQL functions") {
    graft.expressions.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       simhash64(array('a','b')) AS s,
        |       size(shingle_hash64(array('a','b','c'), 2)) AS n""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(2) == 2)
  }

  test("multimodal feature extraction is deterministic and complete") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
    val packed = graft.multimodal.BinaryColumns.packPayload(docs, col("doc_id"), col("text"), "text")
    val f1 = graft.multimodal.BinaryColumns.extractFeatures(packed)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val f2 = graft.multimodal.BinaryColumns.extractFeatures(packed)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(f1 == f2)
    assert(f1.size == docs.count())
    assert(f1.forall { case (_, w, h) => w >= 64 && h >= 64 })
  }
}
