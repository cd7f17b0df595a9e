package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark._
import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.expressions.SimHash64

class TextSpec extends AnyFunSuite {

  private lazy val docs = graft.sources.Tables.documents(spark, sfTiny)

  private lazy val exactDupPairs: Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet

  test("corpus has planted near-dups and jaccard finds them") {
    assert(exactDupPairs.nonEmpty)
  }

  test("minhash LSH candidates recall the exact near-dup pairs") {
    val cand = Dedup.minhashCandidates(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val recall = exactDupPairs.count(cand.contains).toDouble / exactDupPairs.size
    assert(recall >= 0.8, s"minhash recall $recall over ${exactDupPairs.size} pairs")
  }

  test("simhash pairs overlap the exact near-dup pairs") {
    val sim = Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxHamming = 6)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val recall = exactDupPairs.count(sim.contains).toDouble / exactDupPairs.size
    assert(recall >= 0.3, s"simhash recall $recall")
  }

  test("simhash64 registers for SQL and is stable on identical input") {
    SimHash64.register(spark)
    val r = spark.sql(
      "SELECT simhash64(array('a','b','c')) AS h1, simhash64(array('a','b','c')) AS h2")
      .collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    // near-identical token sets → small hamming distance
    val d = spark.sql(
      """SELECT bit_count(simhash64(array('a','b','c','d','e','f','g','x')) ^
        |                 simhash64(array('a','b','c','d','e','f','g','y'))) AS d""".stripMargin)
      .collect()(0).getInt(0)
    assert(d <= 20, s"hamming of near-identical sets was $d")
  }

  test("containment dominates jaccard on every shared pair") {
    // |A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| always; equality iff A ⊆ B or B ⊆ A
    val jac = graft.operators.Dedup
      .ngramJaccardPairs(docs, col("doc_id"), col("text"), 5, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val con = graft.operators.Dedup
      .ngramContainmentPairs(docs, col("doc_id"), col("text"), 5, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac.keySet == con.keySet && jac.nonEmpty)
    jac.foreach { case (k, j) => assert(con(k) >= j - 1e-12, s"pair $k") }
  }

  test("NormalizeString canonicalizes composed/decomposed to one form") {
    import graft.expressions.NormalizeString.normalizeString
    import spark.implicits._
    val composed = "Caf\u00e9"       // e-acute as one codepoint
    val decomposed = "Cafe\u0301"    // e + combining acute
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "s")
    val nfc = df.select(normalizeString(spark, col("s"), "NFC").as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(nfc(0) == nfc(1) && nfc(0) == composed)
    // idempotent; registered for SQL; exact dedup now sees ONE document
    graft.expressions.NormalizeString.register(spark)
    // NB Spark's chr() is ASCII-only (mod 256), unlike DuckDB's —
    // use a \u escape in the SQL literal instead
    val viaSql = spark.sql("SELECT normalize_string('Cafe\\u0301', 'NFC')")
      .collect()(0).getString(0)
    assert(viaSql == composed)
    assert(df.select(normalizeString(spark, col("s"), "NFC").as("n"))
      .distinct().count() == 1)
  }

  test("rolling fingerprint equals a reference implementation") {
    val got = docs.limit(5).select(col("text"), rollingFingerprint(col("text")).as("fp"))
      .collect()
    got.foreach { r =>
      val expected = r.getAs[String]("text").foldLeft(0L)((a, c) =>
        (a * 31 + c.toInt) % 1000000007L)
      assert(r.getAs[Long]("fp") == expected)
    }
  }

  test("wordShingles guards short docs (no descending sequence)") {
    val df = spark.range(1).select(wordShingles(lit("a b"), 3).as("sh"),
      wordShingles(lit("a b c d"), 3).as("sh2"))
    val r = df.collect()(0)
    assert(r.getSeq[String](0).isEmpty)
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
  }
}
