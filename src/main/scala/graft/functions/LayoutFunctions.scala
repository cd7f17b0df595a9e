package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout primitives. Z-ordering (bit-interleaving two sort
  * dimensions into one key) is the multi-column generalization of the
  * sortWithinPartitions clustering in sources.Tables.writeParquet: a
  * file sorted by z-value is simultaneously clustered on BOTH columns,
  * so parquet min/max stats prune range filters on either dimension —
  * the layout trick behind Delta/Iceberg Z-ORDER compaction, as a
  * plain codegen'd Column. */
object LayoutFunctions {

  /** Interleave the low `bits` bits of two non-negative longs:
    * result bit 2i = bit i of x, bit 2i+1 = bit i of y. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
}
