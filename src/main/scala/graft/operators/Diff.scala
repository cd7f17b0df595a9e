package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot diff: classify every key of two table versions as
  * added / removed / changed / same — the data-validation primitive
  * behind safe pipeline deploys (diff yesterday's output against
  * today's before publishing) and incremental CDC extraction.
  *
  * Scale shape: ONE full-outer join on the key; payload comparison is
  * a null-safe conjunction evaluated inside the join's codegen stage,
  * so cost is the co-partitioned join of the two snapshots — no
  * row-serialization, no driver collection, no per-column passes.
  */
object Diff {

  /** @param payload columns compared null-safely (<=>) for "changed" */
  def byKey(a: DataFrame, b: DataFrame, keyCol: String,
            payload: Seq[String]): DataFrame = {
    val an = a.as("a"); val bn = b.as("b")
    val same = payload.map(c => col(s"a.$c") <=> col(s"b.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    an.join(bn, col(s"a.$keyCol") === col(s"b.$keyCol"), "full_outer")
      .select(
        coalesce(col(s"a.$keyCol"), col(s"b.$keyCol")).as(keyCol),
        when(col(s"a.$keyCol").isNull, lit("added"))
          .when(col(s"b.$keyCol").isNull, lit("removed"))
          .when(!same, lit("changed"))
          .otherwise(lit("same")).as("status"))
  }
}
