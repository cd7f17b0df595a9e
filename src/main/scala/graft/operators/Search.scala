package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-criteria search: keyword containment over several text
  * fields, an optional range predicate, and an optional token-set
  * membership — OR-combined match criteria, AND-combined with the
  * range, deduplicated on the logical primary key.
  *
  * Reference: queries.py:367 `search_photos` (keyword over
  * title/description/tags/username + datePosted range + tag list,
  * `dropDuplicates(["id"])`). The reference materialized an exploded
  * tag copy of the table per criterion and unioned; here each
  * criterion is a Column predicate on the original rows, so the whole
  * search is one pushdown-friendly scan — no explode, no union, no
  * duplicate generation to clean up afterwards.
  */
object Search {
  def search(df: DataFrame,
             keyword: Option[String],
             keywordFields: Seq[Column],
             range: Option[(Column, Column, Column)], // (col, lo, hi)
             tokenCol: Option[Column],
             tokens: Seq[String],
             dedupKey: Seq[String]): DataFrame = {
    val kwPred: Option[Column] = keyword.map { kw =>
      keywordFields.map(f => lower(f).contains(kw.toLowerCase))
        .reduce(_ || _)
    }
    val tokPred: Option[Column] = tokenCol.filter(_ => tokens.nonEmpty)
      .map(c => c.isin(tokens: _*))
    val matchPred = (kwPred, tokPred) match {
      case (Some(a), Some(b)) => Some(a || b)
      case (a, b)             => a.orElse(b)
    }
    val rangePred = range.map { case (c, lo, hi) => c.between(lo, hi) }
    val pred = Seq(matchPred, rangePred).flatten.reduceOption(_ && _)
    val filtered = pred.map(df.where).getOrElse(df)
    if (dedupKey.nonEmpty) filtered.dropDuplicates(dedupKey) else filtered
  }
}
