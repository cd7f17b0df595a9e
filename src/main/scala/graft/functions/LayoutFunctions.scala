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
    * result bit 2i = bit i of x, bit 2i+1 = bit i of y.
    *
    * TRUNCATION WARNING: keys ≥ 2^bits alias to the same z-value and
    * the two-dimensional clustering silently degrades for them — size
    * `bits` to ceil(log2(max key + 1)) of the wider column. The
    * default of 21 (42-bit z-value) covers key domains to ~2M; pass
    * bits explicitly for larger ids (up to 31 for two full int
    * domains). */
  def zValue2(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"zValue2 bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }
}
