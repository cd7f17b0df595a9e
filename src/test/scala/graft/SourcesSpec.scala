package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark._
import graft.sources.Tables

class SourcesSpec extends AnyFunSuite {

  test("json write -> schema-ful read roundtrips the documents table") {
    val docs = Tables.documents(spark, sfTiny)
    val dir = java.nio.file.Files.createTempDirectory("json_rt").toString
    Tables.writeJson(docs, s"$dir/docs")
    val back = Tables.readJson(spark, s"$dir/docs", docs.schema)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      docs.schema.map(f => (f.name, f.dataType)))
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("partitioned parquet write prunes partitions on read") {
    val docs = Tables.documents(spark, sfTiny)
    val dir = java.nio.file.Files.createTempDirectory("part_pq").toString
    Tables.writeParquet(docs, s"$dir/docs", partitionBy = Seq("lang"))
    val back = spark.read.parquet(s"$dir/docs").where(col("lang") === "en")
    val expected = docs.where(col("lang") === "en").count()
    assert(back.count() == expected && expected > 0)
    // partition pruning visible in the scan's location filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || back.inputFiles.forall(_.contains("lang=en")))
  }

  test("csv write -> schema-ful read roundtrips simple columns") {
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "lang", "source", "n_chars") // text has newlines; csv is for flat columns
    val dir = java.nio.file.Files.createTempDirectory("csv_rt").toString
    Tables.writeCsv(docs, s"$dir/docs")
    val back = Tables.readCsv(spark, s"$dir/docs", docs.schema)
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("sortBy layout clusters values so range scans skip row groups") {
    val orders = Tables.orders(spark, sfTiny)
    val dir = java.nio.file.Files.createTempDirectory("sorted_pq").toString
    Tables.writeParquet(orders.repartition(4), s"$dir/o", sortBy = Seq("o_totalprice"))
    val back = spark.read.parquet(s"$dir/o")
    // correctness: nothing lost
    assert(back.count() == orders.count())
    // layout: each file internally sorted on the cluster column
    val perFile = back.select(input_file_name().as("f"), col("o_totalprice"))
      .collect().groupBy(_.getString(0))
    perFile.values.foreach { rows =>
      val vs = rows.map(_.getDouble(1)).toSeq
      assert(vs == vs.sorted, "file not internally sorted")
    }
    assert(perFile.size > 1)
  }

  test("events source exposes both exact ts_ns and usable ts") {
    val ev = Tables.events(spark, sfTiny)
    val r = ev.select(col("ts_ns"), unix_micros(col("ts")).as("us")).first()
    assert(r.getLong(0) / 1000L == r.getLong(1))
  }
}
