package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016) — the
  * tokenizer-training core of an LLM data pipeline, distributed:
  *
  *   1. corpus → word frequency table (one shuffle; the vocab table,
  *      not the corpus, is the iterated state — 10⁵–10⁶ rows at web
  *      scale, each carrying its frequency weight),
  *   2. per iteration: adjacent-pair counts weighted by word freq
  *      (explode + groupBy, partial-aggregated), argmax with a
  *      deterministic (count desc, pair asc) tiebreak — a one-row
  *      collect, same justified driver-scalar shape as KMeansLite's
  *      centroids — then the merge applied to every word's token
  *      array by a left-to-right HOF fold (standard BPE non-
  *      overlapping leftmost semantics),
  *   3. localCheckpoint per iteration truncates the growing lineage
  *      (the ConnectedComponents discipline for iterative DataFrames).
  *
  * Deterministic end to end: exact integer counts, total-order
  * tiebreaks, no sampling. BpeSpec pins the merge sequence against an
  * independent single-machine reference implementation.
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Split a word into single-character tokens (words from tokens()
    * are non-empty, so the 1..length sequence never inverts). */
  private def chars(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** One BPE merge applied left-to-right: fold the token array,
    * fusing `l`+`r` occurrences non-overlappingly. */
  private def applyMerge(toks: Column, l: String, r: String): Column =
    aggregate(toks,
      array().cast("array<string>"),
      (acc, t) =>
        when(size(acc) > 0 &&
             element_at(acc, -1) === lit(l) && t === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(t))))

  /** Train `numMerges` merges over the whitespace words of `textCol`.
    * Returns the ordered merge table; `wordFreq` lets callers reuse a
    * precomputed frequency table. */
  def train(df: DataFrame, textCol: Column, numMerges: Int): Seq[Merge] = {
    val spark = df.sparkSession
    var vocab = df
      .select(explode(graft.functions.TextFunctions.tokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"), chars(col("word")).as("toks"))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ListBuffer[Merge]()
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val top = vocab
        .select(col("freq"), explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("p"))
        .groupBy(col("p.0").as("l"), col("p.1").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect() // 1-row argmax scalar, by design
      if (top.isEmpty) done = true
      else {
        val (l, rr, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(r, l, rr, cnt)
        vocab = vocab
          .withColumn("toks", applyMerge(col("toks"), l, rr))
          .localCheckpoint(true)
        r += 1
      }
    }
    out.toSeq
  }

  /** The merge table as a DataFrame (rank, left, right, count). */
  def mergesDF(df: DataFrame, textCol: Column, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, numMerges)
      .map(m => (m.rank.toLong, m.left, m.right, m.count))
      .toDF("rank", "left", "right", "count")
  }

  /** Apply a trained merge table to the DISTINCT words of a corpus:
    * (word, toks) where toks is the word's subword segmentation under
    * the merges, applied in rank order with the same leftmost
    * non-overlapping fold as training.
    *
    * Encoding the distinct-word table instead of the corpus is the
    * standard trick that makes BPE application corpus-size-
    * independent: the iterated state is vocab-sized (10⁵–10⁶ rows at
    * web scale), and the corpus only pays one hash join against it.
    * One localCheckpoint per merge keeps the plan depth O(1) — the
    * naive alternative (numMerges nested `aggregate` HOFs in a single
    * expression) blows up analysis/codegen time quadratically. */
  def encodeWords(df: DataFrame, textCol: Column, merges: Seq[Merge]): DataFrame = {
    var words = df
      .select(explode(graft.functions.TextFunctions.tokens(textCol)).as("word"))
      .distinct()
      .withColumn("toks", chars(col("word")))
      .localCheckpoint(true)
    merges.sortBy(_.rank).foreach { m =>
      words = words
        .withColumn("toks", applyMerge(col("toks"), m.left, m.right))
        .localCheckpoint(true)
    }
    words
  }
}
