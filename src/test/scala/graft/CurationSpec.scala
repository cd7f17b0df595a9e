package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Behavior specs for the round-3 retrieval/curation queries
  * (q_contamination, q_inverted_index, q_compaction_plan) beyond the
  * oracle gate.
  */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  test("contamination never exceeds a doc's own gram count and excludes the holdout") {
    val df = Registry.queries("q_contamination")(spark, sfTiny).cache()
    try {
      assert(df.where(col("n_matched") > col("n_grams")).count() == 0)
      assert(df.where(col("contaminated") =!= (col("n_matched") > 0)).count() == 0)
      // the report covers exactly the non-holdout docs
      val docs = graft.sources.Tables.documents(spark, sfTiny)
      val nonHoldout = docs.where(substring(md5(col("text")), 1, 2) >= "10").count()
      assert(df.count() == nonHoldout)
      // a doc with fewer than 8 words has zero grams, zero matches
      assert(df.where(col("n_grams") === 0 && col("n_matched") =!= 0).count() == 0)
    } finally df.unpersist()
  }

  test("a planted benchmark copy is flagged as contaminated") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfTiny)
    // plant: find any doc with >= 8 words whose hash puts it in the
    // holdout; its exact text also appearing as a corpus doc must flag
    val hold = docs.where(substring(md5(col("text")), 1, 2) < "10" &&
        size(filter(split(col("text"), " "), w => w =!= lit(""))) >= 8)
      .select("text").head().getString(0)
    val planted = docs.unionByName(
      Seq((999999L, hold + " x", "en", "plant", hold.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    // run the same pipeline inline over the planted corpus: the planted
    // doc shares all the holdout doc's 8-grams (same prefix words)
    val tmp = java.nio.file.Files.createTempDirectory("contam").toString
    planted.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // copy the other tables the loader may resolve lazily is not needed:
    // q_contamination only reads documents
    val rep = Registry.queries("q_contamination")(spark, tmp)
    val row = rep.where(col("doc_id") === 999999L).collect()
    assert(row.length == 1 && row(0).getAs[Boolean]("contaminated"),
      "planted near-copy of a holdout doc must be flagged")
  }

  test("inverted index postings are sorted, capped at 10, consistent with df") {
    val df = Registry.queries("q_inverted_index")(spark, sfTiny).cache()
    try {
      val rows = df.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val posts = r.getAs[String]("postings").split(",").map(_.toLong)
        assert(posts.length <= 10)
        assert(posts.sorted.sameElements(posts), "postings must ascend")
        assert(posts.length <= r.getAs[Long]("df"))
        assert(r.getAs[Long]("cf") >= r.getAs[Long]("df"))
      }
    } finally df.unpersist()
  }

  test("compaction bins are contiguous in file order and near target size") {
    val df = Registry.queries("q_compaction_plan")(spark, sfTiny)
    val rows = df.orderBy("file").collect()
    val bins = rows.map(_.getAs[Long]("bin"))
    // bins ascend as files do (cumulative rule ⇒ contiguity)
    assert(bins.sameElements(bins.sorted))
    val total = rows.map(_.getAs[Long]("bytes")).sum
    val target = (total + 7) / 8
    // every bin except possibly the last holds < target + max file size
    val maxFile = rows.map(_.getAs[Long]("bytes")).max
    rows.groupBy(_.getAs[Long]("bin")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("bytes")).sum <= target + maxFile)
    }
  }
}
