package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE / upsert: apply a change stream to a base snapshot — the
  * batch core of CDC-style table maintenance (the reference refreshes
  * its served dataset by rewriting it whole; an engine at 100 TB
  * applies deltas instead).
  *
  * Scale shape: the change stream is first collapsed to one winner per
  * key (window by key, newest version first — a shuffle on key, sized
  * by the DELTA not the base), then a single full-outer join on key
  * merges it with the base. Both shuffles key on the same column so
  * AQE can co-plan them; the base is never rewritten per-change.
  */
object Upsert {

  /** Latest-wins upsert. `base` and `changes` share the schema
    * `keyCol :: payload cols`; `versionCol` orders changes (larger =
    * newer, ties broken by `tiebreak` for determinism). Returns the
    * merged snapshot with an `op` column: 'U' where a change replaced
    * a base row, 'I' where a change inserted a new key, 'K' where the
    * base row was kept. A winning change row replaces the base row
    * WHOLESALE (keyed on the change row's presence, not per-column
    * coalesce), so an explicit NULL payload in a change nulls the
    * field out — true MERGE 'update set row' semantics; a coalesce
    * merge would silently make null-out updates unexpressible. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   versionCol: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(versionCol.desc, tiebreak.desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val payload = base.columns.filterNot(_ == keyCol)
    val b = base.as("b")
    val c = latest.as("c")
    val merged = b.join(c, col(s"b.$keyCol") === col(s"c.$keyCol"), "full_outer")
    val fromChange = col(s"c.$keyCol").isNotNull
    val cols =
      when(fromChange, col(s"c.$keyCol")).otherwise(col(s"b.$keyCol")).as(keyCol) +:
        payload.map(p => when(fromChange, col(s"c.$p")).otherwise(col(s"b.$p")).as(p)) :+
        when(fromChange && col(s"b.$keyCol").isNotNull, lit("U"))
          .when(fromChange, lit("I"))
          .otherwise(lit("K")).as("op")
    merged.select(cols: _*)
  }
}
