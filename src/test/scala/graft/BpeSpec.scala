package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark._
import graft.ml.BpeTrainer

/** BPE merge training pinned against an independent single-machine
  * reference: same greedy algorithm (freq-weighted pair counts,
  * count-desc/pair-asc tiebreak, leftmost non-overlapping merge
  * application) written over plain Scala collections. */
class BpeSpec extends AnyFunSuite {

  import spark.implicits._

  private def referenceBpe(texts: Seq[String], numMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = texts
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w.map(_.toString).toVector -> ws.size.toLong }
    val out = scala.collection.mutable.ListBuffer[(String, String, Long)]()
    var continue = true
    while (out.size < numMerges && continue) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (toks, f) =>
        toks.zip(toks.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        vocab = vocab.map { case (toks, f) =>
          val merged = toks.foldLeft(Vector.empty[String]) { (acc, t) =>
            if (acc.nonEmpty && acc.last == l && t == r) acc.init :+ (l + r)
            else acc :+ t
          }
          merged -> f
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
    }
    out.toSeq
  }

  test("merge sequence equals the reference on a corpus with known structure") {
    val texts = Seq(
      "low low low low low", "lower lower", "newest newest newest",
      "widest widest", "low lower newest")
    val df = texts.toDF("text")
    val got = BpeTrainer.train(df, col("text"), numMerges = 8)
      .map(m => (m.left, m.right, m.count))
    val want = referenceBpe(texts, 8)
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty)
  }

  test("merge sequence equals the reference on real corpus text") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .where(col("doc_id") < 40)
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val got = BpeTrainer.train(docs, col("text"), numMerges = 10)
      .map(m => (m.left, m.right, m.count))
    val want = referenceBpe(texts, 10)
    assert(got == want, s"got $got\nwant $want")
    assert(got.size == 10)
  }

  test("encodeWords segments every distinct word like the reference encoder") {
    val texts = Seq(
      "low low low low low", "lower lower", "newest newest newest",
      "widest widest", "low lower newest")
    val df = texts.toDF("text")
    val merges = BpeTrainer.train(df, col("text"), numMerges = 8)
    // reference: apply merges in rank order, leftmost non-overlapping
    def refEncode(word: String): Vector[String] =
      merges.sortBy(_.rank).foldLeft(word.map(_.toString).toVector) { (toks, m) =>
        toks.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == m.left && t == m.right) acc.init :+ (m.left + m.right)
          else acc :+ t
        }
      }
    val got = BpeTrainer.encodeWords(df, col("text"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val words = texts.flatMap(_.split(" ").filter(_.nonEmpty)).distinct
    assert(got.keySet == words.toSet)
    words.foreach { w =>
      assert(got(w) == refEncode(w), s"word '$w': got ${got(w)}, want ${refEncode(w)}")
      assert(got(w).mkString == w) // segmentation is lossless
    }
    // the most frequent word fuses into few tokens
    assert(got("low").size <= 2)
  }

  test("merging exhausts gracefully when the corpus runs out of pairs") {
    val df = Seq("a b", "a b").toDF("text")
    // single-char words only: zero adjacent pairs, zero merges
    val got = BpeTrainer.train(df, col("text"), numMerges = 5)
    assert(got.isEmpty)
  }
}
