package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for cross-engine (Spark vs DuckDB oracle)
  * numeric parity.
  *
  * Floating-point SUM/AVG is accumulation-order dependent, so two
  * engines (or two partitionings of the same engine!) produce results
  * differing in the last ulps. Every aggregate the library emits is
  * therefore computed over exact integers: monetary doubles are scaled
  * per-row to cents (`round(x*100)` — a per-row double op with one
  * deterministic result), summed exactly as longs, and only divided
  * back to doubles at the very end, where both engines perform the
  * identical IEEE-754 division on identical operands. This also makes
  * results invariant to partitioning — a correctness property at
  * 1000 executors, not just an oracle trick.
  */
object Num {
  /** Per-row exact cents representation of a 2-decimal double column. */
  def cents(c: Column): Column = round(c * lit(100), 0).cast("long")

  /** Exact long sum of a cents column, as Column to alias. */
  def sumCents(c: Column): Column = sum(cents(c))

  /** cents-long -> money double: CAST(x AS DOUBLE)/100.0 on both engines. */
  def money(centsCol: Column): Column = centsCol.cast("double") / lit(100.0)

  /** Deterministic mean from an exact integer sum and a count. */
  def meanOf(sumInt: Column, cnt: Column): Column =
    sumInt.cast("double") / cnt.cast("double")
}
