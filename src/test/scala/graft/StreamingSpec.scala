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
